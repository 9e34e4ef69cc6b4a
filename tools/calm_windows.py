"""Opportunistic scaling sampler for a noisy shared host.

The sandbox VM suffers bursty co-tenant interference (observed: steal
spikes of >100k jiffies during a single build, 20× wall-clock swings).
``tools/scaling_bench.py`` interleaves reps and takes the best per
level, but when the host is disturbed for tens of minutes every rep is
wasted.  This runner instead WAITS for a calm window (steal rate below a
threshold over a probe interval), then fires one (hi, lo, cpu-ceiling)
sample, and keeps only samples whose own steal stayed low.  It appends
every sample to a JSONL file and stops after ``--good`` clean pairs or
``--max-min`` minutes.

Two pollution sources are guarded independently per run:
  * co-tenant interference — /proc/stat steal jiffies (hypervisor denies
    this VM its vCPUs);
  * co-load on THIS VM (e.g. a test suite running next to the campaign)
    — total busy jiffies during the run must not exceed what the child
    itself can account for (``guarded_run``).  Steal never sees this.

Usage:
  python tools/calm_windows.py [n_docs] [--corpus-dir=DIR]
      [--cores=4,16] [--layout=4,8,16] [--good=3] [--max-min=240]
      [--out=/tmp/calm_samples.jsonl] [--probe-steal=150]
      [--max-run-steal=3000]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_bench import cpu_ceiling  # noqa: E402


def steal() -> int:
    return int(open("/proc/stat").readline().split()[8])


def busy() -> int:
    """This-VM busy jiffies (user+nice+system) across all CPUs."""
    f = open("/proc/stat").readline().split()
    return int(f[1]) + int(f[2]) + int(f[3])


def steal_rate(window_s: float = 20.0) -> float:
    s0 = steal()
    time.sleep(window_s)
    return (steal() - s0) / window_s


def wide_probe(hi: int, iters: int = 32_000_000) -> tuple[int, float]:
    """Steal jiffies observed DURING a short hi-process CPU burn (~4 s).

    Round-3 evidence (evidence/): idle steal 0/s does NOT predict a
    clean wide run — the wide vCPU demand itself triggers co-tenant
    contention (final r3 probe: 0/s idle, then 138,901 steal jiffies
    the instant a 16-core build started).  A few seconds of wide burn
    reproduces the demand for ~1% of a full sample's cost, so dirty
    windows are rejected before burning a full hi build on them."""
    from tools.microbench import burn_cpu, measure

    s0 = steal()
    t0 = time.time()
    measure(burn_cpu, iters, hi)
    return steal() - s0, time.time() - t0


def guarded_run(cores: int, corpus: str, out_dir: str, layout: str) -> dict:
    """run_child plus a CO-LOAD guard: if total VM busy jiffies during the
    run exceed what the child itself can account for (cores × wall × 100,
    with slack for JVM service threads), something ELSE was running on
    this VM — the sample is polluted even though /proc/stat steal (which
    only sees the hypervisor) stays low.  Records the evidence."""
    from tools.scaling_bench import run_child

    b0, t0 = busy(), time.time()
    r = run_child(cores, corpus, out_dir, layout)
    wall = time.time() - t0
    r["busy_jiffies"] = busy() - b0
    r["busy_budget"] = int((cores + 2) * 100 * wall * 1.15)
    r["co_load_clean"] = r["busy_jiffies"] <= r["busy_budget"]
    return r


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 490_000
    lo, hi = 4, 16
    layout = "4,8,16"
    good_target, max_min = 3, 240
    out_path = "/tmp/calm_samples.jsonl"
    corpus = None
    probe_thresh, run_thresh = 150.0, 3000
    for a in sys.argv[2:]:
        if a.startswith("--cores="):
            lo, hi = (int(x) for x in a.split("=", 1)[1].split(","))
        elif a.startswith("--layout="):
            layout = a.split("=", 1)[1]
        elif a.startswith("--good="):
            good_target = int(a.split("=", 1)[1])
        elif a.startswith("--max-min="):
            max_min = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--corpus-dir="):
            corpus = a.split("=", 1)[1]
        elif a.startswith("--probe-steal="):
            probe_thresh = float(a.split("=", 1)[1])
        elif a.startswith("--max-run-steal="):
            run_thresh = int(a.split("=", 1)[1])

    work = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    if corpus is None:
        corpus = f"{work}/sparksearch_scaling_corpus_{n_docs}"
    if not os.path.isdir(corpus):
        from sparksearch.session import get_spark
        from sparksearch.synth import generate_docs

        spark = get_spark("scaling-gen", cores=hi)
        docs = generate_docs(spark, n_docs, seed=42).select("doc_id", "text")
        docs.filter("text is not null").repartition(128).write.mode(
            "overwrite"
        ).parquet(corpus)
        spark.stop()

    deadline = time.time() + max_min * 60
    good = 0
    while good < good_target and time.time() < deadline:
        rate = steal_rate(20.0)
        if rate > probe_thresh:
            print(f"waiting: steal rate {rate:.0f}/s > {probe_thresh}",
                  file=sys.stderr, flush=True)
            time.sleep(30)
            continue
        wsteal, wsec = wide_probe(hi)
        if wsteal > run_thresh * wsec / 30.0:  # scale threshold to probe len
            print(f"waiting: wide probe drew {wsteal} steal jiffies "
                  f"in {wsec:.1f}s", file=sys.stderr, flush=True)
            time.sleep(30)
            continue
        r_hi = guarded_run(hi, corpus, f"{work}/calm_idx_{hi}", layout)
        if r_hi["steal_jiffies"] > run_thresh:
            # hi (the wider vCPU demand) collides with the co-tenant far
            # more often than lo; don't burn minutes on a lo run that
            # can't rescue the pair
            print(json.dumps({"ts": round(time.time(), 1), "layout": layout,
                              "hi": r_hi, "skipped_lo": True, "clean": False}),
                  flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps({"ts": round(time.time(), 1), "hi": r_hi,
                                    "skipped_lo": True, "clean": False}) + "\n")
            continue
        r_lo = guarded_run(lo, corpus, f"{work}/calm_idx_{lo}", layout)
        ceil = cpu_ceiling(lo, hi)
        clean = (r_hi["steal_jiffies"] <= run_thresh
                 and r_lo["steal_jiffies"] <= run_thresh
                 and r_hi["co_load_clean"] and r_lo["co_load_clean"])
        sample = {
            "ts": round(time.time(), 1),
            "layout": layout,
            "hi": r_hi,
            "lo": r_lo,
            "cpu_ceiling": ceil["efficiency"],
            "clean": clean,
            "efficiency": round(
                r_hi["docs_per_sec"] / (r_lo["docs_per_sec"] * (hi / lo)), 3
            ),
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(sample) + "\n")
        print(json.dumps(sample), flush=True)
        if clean:
            good += 1
    print(f"done: {good} clean pairs", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
