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
  * upsert_1pct / delete_1pct — incremental index mutation (run last;
                       informational, not in the e2e total)
  * dedup_simhash    — per-doc SimHash
  * textstats        — quality + langid + fingerprints in one pass
  * sim_cosine       — brute-force cosine top-k over embeddings
  * ann_index_build / ann_recall_at10 — auto-layout IVF index build and
                       measured recall@10 vs exact (informational; the
                       nprobe→recall curve is an extra JSON key)

Extra keys (informational, not part of the contract): docs_per_sec for
the build, n_docs, cores.
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
    # Auto-layout IVF index (cells/probes derived from corpus size), then
    # recall@10 vs numpy exact ground truth over a query sample, at
    # nprobe = 1 / 2 / auto — the documented operating curve.
    import numpy as np

    vi_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_vecidx")
    timed("ann_index_build", lambda: sim.build_vector_index(spark, emb, vi_dir))
    vidx = sim.VectorIndex(spark, vi_dir)
    pdf = emb.toPandas()  # ground truth fits the driver at bench scale
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    qpos = list(range(0, len(ids), max(1, len(ids) // 8)))[:8]
    auto_nprobe = max(2, min(sim.AUTO_NPROBE_CAP, -(-int(vidx.meta["n_cells"]) // 8)))
    curve: dict[str, float] = {}
    for nprobe in sorted({1, 2, auto_nprobe}):
        hits = 0
        for p in qpos:
            qid = int(ids[p])
            cos = mat @ mat[p]
            cos[ids == qid] = -2.0  # exclude the query vector itself
            exact = set(ids[np.argsort(-cos, kind="stable")[:k]].tolist())
            got = {
                int(r["vec_id"])
                for r in vidx.topk(mat[p].tolist(), k, nprobe=nprobe,
                                   exclude_vec_id=qid).collect()
            }
            hits += len(exact & got)
        curve[str(nprobe)] = round(hits / (k * len(qpos)), 4)
    stages["ann_recall_at10"] = curve[str(auto_nprobe)]

    # Same measurement on CLUSTERED vectors (real web embeddings cluster;
    # the synthetic embeddings table is uniform random — IVF's worst
    # case, where recall ≈ probed fraction by construction).  20
    # deterministic Gaussian clusters, same N/dim as the table.
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((20, mat.shape[1]))
    lab = rng.integers(0, 20, len(ids))
    cmat = centers[lab] + 0.15 * rng.standard_normal((len(ids), mat.shape[1]))
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    emb_c = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cmat)],
        "vec_id long, embedding array<double>",
    )
    vc_dir = os.path.join(tempfile.gettempdir(), "sparksearch_bench_vecidx_c")
    sim.build_vector_index(spark, emb_c, vc_dir)
    vidx_c = sim.VectorIndex(spark, vc_dir)
    hits = 0
    for p in qpos:
        cos = cmat @ cmat[p]
        cos[p] = -2.0
        exact = set(np.argsort(-cos, kind="stable")[:k].tolist())
        got = {
            int(r["vec_id"])
            for r in vidx_c.topk(cmat[p].tolist(), k, exclude_vec_id=p).collect()
        }
        hits += len(exact & got)
    stages["ann_recall_clustered_at10"] = round(hits / (k * len(qpos)), 4)

    # --- graph-ANN (per-shard HNSW): build + recall@10 vs exact ----------
    # Same uniform embeddings table and query sample as the IVF recall
    # stage; candidates are approximate, scores exact (re-ranked).
    from sparksearch.ops import graph_ann as ga

    n_shards = max(4, len(ids) // 1000)
    g = [None]
    timed(
        "ann_hnsw_build",
        lambda: g.__setitem__(
            0, ga.build_hnsw_graph(emb, n_shards=n_shards).persist()
        ) or g[0].count(),
    )
    hits = 0
    for p in qpos:
        qid = int(ids[p])
        cos = mat @ mat[p]
        cos[ids == qid] = -2.0
        exact = set(ids[np.argsort(-cos, kind="stable")[:k]].tolist())
        got = {
            int(r["vec_id"])
            for r in ga.hnsw_candidates(g[0], mat[p].tolist(), k,
                                        exclude_vec_id=qid).collect()
        }
        hits += len(exact & got)
    stages["ann_recall_hnsw_at10"] = round(hits / (k * len(qpos)), 4)
    g[0].unpersist()

    # --- incremental upsert of a 1% delta (runs last: mutates the index) --
    def _upsert():
        from sparksearch.index.upsert import upsert_index

        delta = (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) == 0)
            .select("doc_id", F.concat(F.lit("updated revision "), F.col("text")).alias("text"))
        )
        return upsert_index(spark, delta, index_dir)

    timed("upsert_1pct", _upsert)

    def _delete():
        from sparksearch.index.upsert import delete_docs

        gone = docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) == 1).select("doc_id")
        return delete_docs(spark, index_dir, gone)

    timed("delete_1pct", _delete)

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
        "ann_n_cells": int(vidx.meta["n_cells"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
