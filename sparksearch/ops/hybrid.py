"""Hybrid retrieval: fuse a BM25 leg and a vector leg into one ranking.

OpenSearch exposes this as the ``hybrid`` query + a search pipeline with
either a ``normalization-processor`` (min-max + arithmetic mean, the
documented default) or a ``score-ranker-processor`` (reciprocal rank
fusion).  The reference repo ships keyword search and semantic search as
two separate apps over the same corpus
(``keyword_search/functions/helper_functions.py`` query body vs
``semantic_search/tests/test_semantic_search.py`` knn body); hybrid
fusion is the operator a user of both runs to combine them, so it is
implemented here as a first-class op.

Fusion semantics (pinned, mirrored exactly by the DuckDB twin):

* Each leg retrieves its own top-``n_candidates`` ``(id, score)`` list.
* Ranks are assigned on the leg's ROUNDED score (4 dp, the engine's
  cross-engine score contract) descending, id ascending — rounding
  before ranking makes leg ranks identical across engines even when the
  raw float64 sums differ in the last bits.
* ``rrf``:    fused(d) = Σ_legs  w_leg / (rrf_k + rank_leg(d)),
  missing docs contribute 0 (Cormack, Clarke & Buettcher 2009; the
  OpenSearch ``rrf`` technique, default ``rank_constant`` 60).
* ``minmax``: per leg, norm = (s - min) / (max - min) over the leg's
  candidate list (0.5 when max == min, matching OpenSearch's
  single-point convention of treating an undefined range as neutral);
  fused(d) = Σ w_leg · norm_leg(d) / Σ w_leg, docs absent from a leg
  contribute 0 for that leg (OpenSearch arithmetic-mean combination).

Scale: each leg is a distributed top-n (packed MaxScore kernel / HNSW
shard fan-out); the fusion itself only ever touches ``legs × n``
candidate rows, so the windowed rank over a single partition is bounded
by ``n_candidates``, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearch.query.bm25 import bm25_topk_df, bm25_topk_sql
from sparksearch.ops.similarity import cosine_topk, cosine_topk_sql

RRF_K = 60  # OpenSearch rank_constant default
FUSE_ROUND = 6


def _leg_ranks(leg: DataFrame, id_col: str, score_col: str) -> DataFrame:
    """(id, rank) with rank over ROUNDED score desc, id asc.

    ``leg`` is already top-n-limited, so the un-partitioned window sees
    at most n_candidates rows regardless of corpus size.
    """
    w = Window.orderBy(F.desc(F.round(F.col(score_col), 4)), F.asc(id_col))
    return leg.select(
        F.col(id_col).alias("doc_id"), F.row_number().over(w).alias("rank")
    )


def _leg_minmax(leg: DataFrame, id_col: str, score_col: str) -> DataFrame:
    """(id, norm) min-max normalized over the leg's candidate list."""
    s = F.round(F.col(score_col), 4)
    scored = leg.select(F.col(id_col).alias("doc_id"), s.alias("s"))
    bounds = scored.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    norm = F.when(F.col("hi") == F.col("lo"), F.lit(0.5)).otherwise(
        (F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id", norm.alias("norm")
    )


def fuse_legs(
    legs: list[tuple[DataFrame, str, str]],
    k: int = 10,
    *,
    method: str = "rrf",
    rrf_k: int = RRF_K,
    weights: list[float] | None = None,
) -> DataFrame:
    """Fuse ranked legs → (doc_id, fused) top-k.

    ``legs`` = [(top-n DataFrame, id_col, score_col), ...].
    """
    ws = weights or [1.0] * len(legs)
    if len(ws) != len(legs):
        raise ValueError("weights must match legs")
    parts = []
    for (leg, id_col, score_col), w in zip(legs, ws):
        if method == "rrf":
            p = _leg_ranks(leg, id_col, score_col).select(
                "doc_id", (F.lit(w) / (F.lit(rrf_k) + F.col("rank"))).alias("part")
            )
        elif method == "minmax":
            p = _leg_minmax(leg, id_col, score_col).select(
                "doc_id", (F.lit(w) * F.col("norm")).alias("part")
            )
        else:
            raise ValueError(f"unknown fusion method {method!r}")
        parts.append(p)
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    denom = sum(ws) if method == "minmax" else 1.0
    out = (
        fused.groupBy("doc_id")
        .agg((F.sum("part") / F.lit(denom)).alias("raw"))
    )
    return (
        out.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("raw", FUSE_ROUND).alias("fused"))
    )


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    *,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = RRF_K,
    weights: list[float] | None = None,
) -> DataFrame:
    """Exhaustive hybrid search: DataFrame BM25 leg + exact-cosine leg.

    ``emb.vec_id`` is taken as the document id of the embedded doc (the
    synthetic tables share the id domain; real pipelines join through a
    chunk→doc map first).  Output: (doc_id, fused) top-k.
    """
    bm = bm25_topk_df(docs, query_text, n_candidates, round_scores=False)
    vec = cosine_topk(emb, query_vec_id, n_candidates)
    return fuse_legs(
        [(bm, "doc_id", "score"), (vec, "vec_id", "cos")],
        k, method=method, rrf_k=rrf_k, weights=weights,
    )


def hybrid_search_indexed(
    index,
    vector_index,
    query_text: str,
    query_vec: list[float],
    k: int = 10,
    *,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = RRF_K,
    weights: list[float] | None = None,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Engine path: packed-index BM25 leg + persisted-ANN vector leg.

    Same fusion as :func:`hybrid_search`; the legs come from the
    MaxScore kernel (``InvertedIndex.search``) and the HNSW/IVF index
    (``.topk``), so at scale each leg is the engine's pruned top-n, not
    an exhaustive scan.  Rank-identical to the exhaustive path whenever
    both legs are (pytest-pinned).
    """
    bm = index.search(query_text, k=n_candidates)
    vec = vector_index.topk(query_vec, n_candidates, exclude_vec_id=exclude_vec_id)
    return fuse_legs(
        [(bm, "doc_id", "score"), (vec, "vec_id", "cos")],
        k, method=method, rrf_k=rrf_k, weights=weights,
    )


def hybrid_search_sql(
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    *,
    n_candidates: int = 50,
    method: str = "rrf",
    rrf_k: int = RRF_K,
    weights: tuple[float, float] = (1.0, 1.0),
    docs_table: str = "documents",
    emb_table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`hybrid_search` (same rounding/rank/fusion)."""
    bm_sql = bm25_topk_sql(query_text, n_candidates, table=docs_table)
    vec_sql = cosine_topk_sql(query_vec_id, n_candidates, table=emb_table)
    w_bm, w_vec = weights
    if method == "rrf":
        part_bm = f"{w_bm} / ({rrf_k} + rank)"
        part_vec = f"{w_vec} / ({rrf_k} + rank)"
        leg_bm = f"""
  SELECT doc_id, {part_bm} AS part FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(score, 4) DESC, doc_id ASC) AS rank
    FROM bm_leg)"""
        leg_vec = f"""
  SELECT vec_id AS doc_id, {part_vec} AS part FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY round(cos, 4) DESC, vec_id ASC) AS rank
    FROM vec_leg)"""
        denom = "1.0"
    elif method == "minmax":
        leg_bm = f"""
  SELECT doc_id, {w_bm} * (CASE WHEN hi = lo THEN 0.5
         ELSE (s - lo) / (hi - lo) END) AS part FROM (
    SELECT doc_id, round(score, 4) AS s,
           min(round(score, 4)) OVER () AS lo,
           max(round(score, 4)) OVER () AS hi
    FROM bm_leg)"""
        leg_vec = f"""
  SELECT vec_id AS doc_id, {w_vec} * (CASE WHEN hi = lo THEN 0.5
         ELSE (s - lo) / (hi - lo) END) AS part FROM (
    SELECT vec_id, round(cos, 4) AS s,
           min(round(cos, 4)) OVER () AS lo,
           max(round(cos, 4)) OVER () AS hi
    FROM vec_leg)"""
        denom = str(w_bm + w_vec)
    else:
        raise ValueError(f"unknown fusion method {method!r}")
    return f"""
WITH bm_leg AS ({bm_sql}),
vec_leg AS ({vec_sql}),
parts AS ({leg_bm}
  UNION ALL{leg_vec}
)
SELECT doc_id, round(sum(part) / {denom}, {FUSE_ROUND}) AS fused
FROM parts GROUP BY doc_id
ORDER BY sum(part) / {denom} DESC, doc_id ASC LIMIT {k}
""".strip()
