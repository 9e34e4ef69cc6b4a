"""Headline benchmark for the sparksearch engine (driver contract).

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": ...}

Stages benched:
  * index_build      — full packed inverted-index build over documents
  * bm25_p50 / p95   — per-query latency over a 20-query set on the
                       packed index (reported in seconds)
  * bm25_exhaustive  — one no-index DataFrame BM25 top-k
  * dedup_minhash    — MinHash+LSH near-dup pairs (verified Jaccard)
  * upsert_1pct / upsert_1pct_delta / delete_1pct — incremental index
                       mutation: in-place merge vs the generational
                       delta path (run last; informational, not in the
                       e2e total)
  * dedup_simhash    — per-doc SimHash
  * textstats        — quality + langid + fingerprints in one pass
  * sim_cosine       — brute-force cosine top-k over embeddings
  * hybrid_rrf        — packed-BM25 + HNSW legs fused by RRF
                       (informational, not in the e2e total)
  * ann_index_build / ann_recall_default_* — the DEFAULT persisted ANN
                       index (per-shard HNSW) and its measured recall@10
                       vs exact on uniform AND clustered vectors;
                       ann_recall_ivf_tuned_* report the opt-in IVF at
                       its recall-floor-tuned nprobe (curve in an extra
                       JSON key)

  * phrase_indexed / bool_indexed / agg_terms_indexed / lexicon_build /
    positions_build / phrase_positional / prefix_indexed /
    fuzzy_indexed / suggest_indexed / sigterms_indexed / mlt_indexed /
    rescore_indexed — the round-4 query-DSL surface over the packed
    index and its sidecars (informational, not in the e2e total)

Extra keys (informational, not part of the contract): docs_per_sec for
the build, n_docs, cores, and two host-speed keys: steal_jiffies
(hypervisor CPU denial during the run) plus host_calib_cpu_sec /
host_membw_gbps (fixed single-thread kernels timed before Spark
starts — a slow calib marks a slow HOST window, the r3/r4 evidence/
campaign's memory-bandwidth contention that steal alone misses).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "batch", "scan", "data", "window", "customer",
    "scan filter join window", "data stream merge", "hash join",
    "small fast slow", "query sort order", "table part row",
    "Data, STREAM; merge!", "batch window spark", "agg key value",
    "big small", "line item order", "slow fast", "filter value table",
    "spark query plan", "stream batch window join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = 10

    from pyspark.sql import functions as F

    from sparksearch.ops import dedup as dd
    from sparksearch.ops import similarity as sim
    from sparksearch.ops import textstats as ts
    from sparksearch.pipeline import build_and_load
    from sparksearch.query.bm25 import bm25_topk_df
    from sparksearch.session import get_spark

    def _steal() -> int:
        try:
            return int(open("/proc/stat").readline().split()[8])
        except Exception:
            return 0

    # Host-speed calibration (before Spark starts): the SAME fixed
    # kernels every run, so two artifacts taken in different windows can
    # be compared honestly.  Steal jiffies only catch CPU denial; this
    # also catches the memory-bandwidth contention this host shows (r3/r4
    # evidence/): a slow calib means the HOST was slow, not the engine.
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal(2_000_000)
    t0 = time.perf_counter()
    for _ in range(5):
        s = float(np.sort(a)[::7].sum())
    calib_cpu = time.perf_counter() - t0
    big = rng.standard_normal(32_000_000)  # 256 MB
    dst = np.empty_like(big)
    np.copyto(dst, big)  # touch every dst page before timing
    t0 = time.perf_counter()
    for _ in range(4):
        np.copyto(dst, big)
    calib_mem = time.perf_counter() - t0
    membw_gbps = round(4 * 2 * big.nbytes / calib_mem / 1e9, 2)
    del big, dst

    steal0 = _steal()
    spark = get_spark("sparksearch-bench", cores=cores, shuffle_partitions=cores)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs.cache()
    n_docs = docs.count()

    stages: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 4)
        return out

    # --- index build -----------------------------------------------------
    index_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_index")
    idx = timed(
        "index_build",
        lambda: build_and_load(spark, docs.select("doc_id", "text"), index_dir),
    )

    # --- packed BM25 latency over the query set --------------------------
    lat: list[float] = []
    for q in BENCH_QUERIES:
        t0 = time.perf_counter()
        idx.search(q, k=k).collect()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    stages["bm25_p50"] = round(statistics.median(lat), 4)
    stages["bm25_p95"] = round(lat[min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)], 4)
    stages["bm25_total"] = round(sum(lat), 4)

    # --- batched multi-query: all 20 queries in ONE job ------------------
    timed(
        "bm25_batch_total",
        lambda: idx.search_many(list(BENCH_QUERIES), k=k).collect(),
    )

    # --- driver-native (coordinator) latency: no Spark job per query -----
    loc: list[float] = []
    for q in BENCH_QUERIES:
        t0 = time.perf_counter()
        idx.search_local(q, k=k)
        loc.append(time.perf_counter() - t0)
    loc.sort()
    stages["bm25_local_p50"] = round(statistics.median(loc), 4)
    stages["bm25_local_p95"] = round(loc[min(len(loc) - 1, math.ceil(0.95 * len(loc)) - 1)], 4)

    # --- exhaustive (no-index) BM25 --------------------------------------
    timed(
        "bm25_exhaustive",
        lambda: bm25_topk_df(docs, "scan filter join window", k).collect(),
    )

    # --- training-data ops ----------------------------------------------
    timed("dedup_minhash", lambda: dd.minhash_lsh_pairs(docs, threshold=0.5).count())
    timed("dedup_simhash", lambda: dd.simhash(docs).count())

    def _textstats():
        q = ts.quality_scores(docs)
        l = ts.langid(docs)
        f_ = ts.fingerprints(docs)
        return q.join(l, "doc_id").join(f_, "doc_id").count()

    timed("textstats", _textstats)
    timed("sim_cosine", lambda: sim.cosine_topk(emb, 0, k).collect())

    # --- ANN recall accounting (informational; not in the e2e total) -----
    # The DEFAULT persisted index (build_vector_index kind="auto" →
    # per-shard HNSW since r4) must hold recall@10 ≥ 0.9 on BOTH the
    # uniform synthetic embeddings (IVF's worst case) and a clustered
    # set (real web embeddings cluster) — VERDICT r3 ask #3.  The tuned
    # IVF operating point (nprobe raised to a measured floor at build
    # time) is reported alongside, with its pre-tuning curve.
    import numpy as np

    pdf = emb.toPandas()  # ground truth fits the driver at bench scale
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    qpos = list(range(0, len(ids), max(1, len(ids) // 8)))[:8]

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((20, mat.shape[1]))
    lab = rng.integers(0, 20, len(ids))
    cmat = centers[lab] + 0.15 * rng.standard_normal((len(ids), mat.shape[1]))
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    emb_c = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cmat)],
        "vec_id long, embedding array<double>",
    )

    def recall_at_k(index, qmat, qids, all_ids, topk_kw=None) -> float:
        hits = 0
        for p, qid in qids:
            cos = qmat @ qmat[p]
            cos[all_ids == qid] = -2.0  # exclude the query vector itself
            exact = set(all_ids[np.argsort(-cos, kind="stable")[:k]].tolist())
            got = {
                int(r["vec_id"])
                for r in index.topk(
                    qmat[p].tolist(), k, exclude_vec_id=qid, **(topk_kw or {})
                ).collect()
            }
            hits += len(exact & got)
        return round(hits / (k * len(qids)), 4)

    uni_q = [(p, int(ids[p])) for p in qpos]
    clu_q = [(p, p) for p in qpos]
    cids = np.arange(len(ids))

    # default path: one build call, no layout/probe parameters anywhere
    vi_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_vecidx")
    timed("ann_index_build", lambda: sim.build_vector_index(spark, emb, vi_dir))
    vidx = sim.open_vector_index(spark, vi_dir)
    stages["ann_recall_default_at10"] = recall_at_k(vidx, mat, uni_q, ids)
    # hybrid retrieval over the two persisted indexes (informational):
    # packed-BM25 leg + HNSW leg fused by RRF — one number for the
    # combined path a hybrid query pays end-to-end
    from sparksearch.ops.hybrid import hybrid_search_indexed

    timed(
        "hybrid_rrf",
        lambda: hybrid_search_indexed(
            idx, vidx, BENCH_QUERIES[5], mat[qpos[0]].tolist(), k,
            exclude_vec_id=int(ids[qpos[0]]),
        ).collect(),
    )
    # --- query-DSL ops over the packed index (informational) -------------
    # one number each for the round-4 request-body surface: phrase
    # verification on the posting-list conjunction, a 3-kind bool
    # compound, an indexed terms facet, and the two MultiTermQuery
    # rewrites through the lexicon sidecar
    from sparksearch.index.lexicon import build_lexicon
    from sparksearch.query.aggs import terms_agg_indexed
    from sparksearch.query.boolq import bool_search
    from sparksearch.query.phrase import match_phrase_indexed
    from sparksearch.query.termq import fuzzy_search, prefix_search

    # steady-state timing (one untimed warmup): the first call pays
    # Python-worker spin-up for the postings-decode kernels — a once-
    # per-executor cost that amortizes at scale and would otherwise
    # dominate these sub-second queries
    match_phrase_indexed(idx, docs, "table hash", k).collect()
    timed(
        "phrase_indexed",
        lambda: match_phrase_indexed(idx, docs, "table hash", k).collect(),
    )
    # positional sidecar: build once (timed), then the index-resident
    # phrase path — verification reads position lists, never text
    from sparksearch.index.positions import (
        build_positions,
        match_phrase_positional,
    )

    timed("positions_build", lambda: build_positions(spark, docs, index_dir))
    match_phrase_positional(idx, "table hash", k).collect()
    timed(
        "phrase_positional",
        lambda: match_phrase_positional(idx, "table hash", k).collect(),
    )
    from sparksearch.index.positions import phrase_local

    phrase_local(idx, "table hash", k)
    timed("phrase_local", lambda: phrase_local(idx, "table hash", k))
    bool_search(idx, must=["scan filter"], k=k).collect()
    timed(
        "bool_indexed",
        lambda: bool_search(
            idx, must=["scan filter"], should=["window"], must_not=["vector"], k=k
        ).collect(),
    )
    timed(
        "agg_terms_indexed",
        lambda: terms_agg_indexed(idx, docs, BENCH_QUERIES[5], "source", 10).collect(),
    )
    timed("lexicon_build", lambda: build_lexicon(spark, docs, index_dir))
    timed("prefix_indexed", lambda: prefix_search(idx, "ta", k).collect())
    timed("fuzzy_indexed", lambda: fuzzy_search(idx, "tble", k).collect())
    from sparksearch.query.mlt import more_like_this_indexed
    from sparksearch.query.rescore import rescore_search
    from sparksearch.query.sigterms import significant_text_indexed
    from sparksearch.query.suggest import term_suggest_indexed

    timed(
        "suggest_indexed",
        lambda: term_suggest_indexed(idx, "tble scn", 5).collect(),
    )
    timed(
        "sigterms_indexed",
        lambda: significant_text_indexed(idx, "dup", 10).collect(),
    )
    like_id = int(docs.select("doc_id").first()[0])
    timed("mlt_indexed", lambda: more_like_this_indexed(idx, like_id, k).collect())
    timed(
        "rescore_indexed",
        lambda: rescore_search(
            idx, docs, "table hash", k, window_size=50
        ).collect(),
    )

    vc_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_vecidx_c")
    sim.build_vector_index(spark, emb_c, vc_dir)
    stages["ann_recall_default_clustered_at10"] = recall_at_k(
        sim.open_vector_index(spark, vc_dir), cmat, clu_q, cids
    )

    # IVF opt-in: auto layout + recall-floor nprobe tuning at build time
    iv_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_ivfidx")
    timed(
        "ann_ivf_build_tuned",
        lambda: sim.build_vector_index(spark, emb, iv_dir, kind="ivf"),
    )
    ividx = sim.VectorIndex(spark, iv_dir)
    tuned_nprobe = int(ividx.meta.get("nprobe", 0))
    stages["ann_recall_ivf_tuned_at10"] = recall_at_k(ividx, mat, uni_q, ids)
    auto_nprobe = max(2, min(sim.AUTO_NPROBE_CAP, -(-int(ividx.meta["n_cells"]) // 8)))
    curve: dict[str, float] = {}
    for nprobe in sorted({1, 2, auto_nprobe, tuned_nprobe} - {0}):
        curve[str(nprobe)] = recall_at_k(
            ividx, mat, uni_q, ids, topk_kw={"nprobe": nprobe}
        )
    iv_c_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_ivfidx_c")
    sim.build_vector_index(spark, emb_c, iv_c_dir, kind="ivf")
    stages["ann_recall_ivf_tuned_clustered_at10"] = recall_at_k(
        sim.VectorIndex(spark, iv_c_dir), cmat, clu_q, cids
    )

    # PQ opt-in: 64-bit ADC codes (queries never scan raw vectors) +
    # FAISS-style exact refine — adc-only recall shows the code
    # distortion, rerank=64 the refined path users actually run
    from sparksearch.ops.pq import PqIndex, build_pq_index

    pq_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_pqidx")
    timed(
        "ann_pq_build",
        lambda: build_pq_index(spark, emb, pq_dir, n_sub=16, k_codes=32),
    )
    pqidx = PqIndex(spark, pq_dir)
    stages["ann_recall_pq_adc_at10"] = recall_at_k(pqidx, mat, uni_q, ids)
    stages["ann_recall_pq_rerank64_at10"] = recall_at_k(
        pqidx, mat, uni_q, ids, topk_kw={"rerank": 64, "emb": emb}
    )

    # --- incremental 1% mutations (run last: they mutate the index) ------
    # upsert_1pct = the in-place MERGE path (r2/r3-comparable number);
    # upsert_1pct_delta = the generational path (r4 default for small
    # deltas: no base repack — wall time should be far below merge and
    # stay ~flat as the corpus grows); delete_1pct rides the same default.
    from sparksearch.index.upsert import delete_docs, upsert_index

    def _delta(mod_rem: int, tag: str):
        return (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) == mod_rem)
            .select(
                "doc_id",
                F.concat(F.lit(f"updated {tag} revision "), F.col("text")).alias("text"),
            )
        )

    timed(
        "upsert_1pct",
        lambda: upsert_index(spark, _delta(0, "merge"), index_dir, mode="merge"),
    )
    timed(
        "upsert_1pct_delta",
        lambda: upsert_index(spark, _delta(2, "gen"), index_dir, mode="delta"),
    )
    timed(
        "delete_1pct",
        lambda: delete_docs(
            spark, index_dir,
            docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) == 1).select("doc_id"),
        ),
    )

    total = round(
        stages["index_build"] + stages["bm25_total"] + stages["bm25_exhaustive"]
        + stages["dedup_minhash"] + stages["dedup_simhash"]
        + stages["textstats"] + stages["sim_cosine"],
        4,
    )
    out = {
        "metric": "sparksearch e2e: index build + packed BM25 latency + dedup/simhash/textstats/cosine",
        "value": total,
        "unit": "sec",
        "queries": stages,
        "sf": sf_dir,
        "n_docs": n_docs,
        "cores": cores,
        "build_docs_per_sec": round(n_docs / stages["index_build"], 2),
        "ann_recall_curve_nprobe": curve,
        "ann_ivf_n_cells": int(ividx.meta["n_cells"]),
        "ann_ivf_tuned_nprobe": tuned_nprobe,
        # host-interference self-audit: steal jiffies the hypervisor
        # denied this VM during the run.  Round 2/3 BENCH artifacts were
        # silently contaminated (>100k jiffies → every stage 2-5×
        # slower); with this key the artifact carries its own validity
        # evidence.  Clean runs on this host measure <3k.
        "steal_jiffies": _steal() - steal0,
        "host_calib_cpu_sec": round(calib_cpu, 4),
        "host_membw_gbps": membw_gbps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
