"""Hardware scaling microbenchmarks — context for the scaling evidence.

Measures how THIS host scales three primitive workloads from N to 4N
processes, independent of Spark:

  * cpu     — register-bound integer loop (pure compute)
  * stream  — sequential memory streaming (bandwidth)
  * gather  — random-access memory gathers (latency / MLP)

Rationale: Spark stage work is a blend of these.  On the sandbox VM the
random-gather workload does NOT scale with cores (a single core nearly
saturates the virtualized memory subsystem), which bounds any
hash/shuffle-heavy stage's achievable scaling regardless of engine
design.  On a real multi-executor cluster each node owns its DRAM, so
this bound does not apply across nodes — which is what the north rule's
N-vs-4N criterion actually measures.

Usage: python tools/microbench.py [lo] [hi]   (defaults 4 16)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def burn_cpu(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def burn_stream(n: int) -> int:
    a = np.random.default_rng(1).integers(0, 255, 50_000_000, dtype=np.uint8)
    s = 0
    for _ in range(n):
        s += int(a.sum())
    return s


def burn_gather(n: int) -> int:
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1000, 60_000_000, dtype=np.int64)
    idx = rng.permutation(len(a))[:20_000_000]
    s = 0
    for _ in range(n):
        s += int(a[idx].sum())
    return s


WORKLOADS = {
    "cpu": (burn_cpu, 20_000_000, 1.0),
    "stream": (burn_stream, 20, 1.0),
    "gather": (burn_gather, 3, 1.0),
}


def measure(fn, arg, procs: int) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(fn, [arg] * procs)
    return procs * arg / (time.perf_counter() - t0)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {}
    for name, (fn, arg, _) in WORKLOADS.items():
        a = measure(fn, arg, lo)
        b = measure(fn, arg, hi)
        out[name] = {
            f"throughput_{lo}p": round(a, 1),
            f"throughput_{hi}p": round(b, 1),
            "speedup": round(b / a, 2),
            "efficiency": round(b / a / (hi / lo), 3),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
