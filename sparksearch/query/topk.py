"""Top-k search API over a built index.

Spark restatement of the reference's query lifecycle
(``keyword_search/test_keyword_search.py:22-63``): analyze the query
string with the SAME analyzer as the documents → look up term stats →
partition-pruned scan of the query terms' posting blocks → per-segment
DAAT scoring (``applyInPandas``) → global ``orderBy().limit(k)`` merge
(Spark plans this as TakeOrderedAndProject — no single-partition window).

Plan properties worth `.explain()`-checking:
* the postings scan carries ``PushedFilters: [In(term_id, ...)]`` and
  only touches ``term_bucket=<b>`` directories of the query's terms
  (directory-level partition pruning);
* stats lookups are O(query terms): served from a driver-side cache when
  the vocabulary is small enough (auto-selected by stats row count at
  open — a web-scale vocab stays distributed and each lookup becomes a
  pushed-filter scan / broadcast join).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.index.manifest import read_meta
from sparksearch.query.wand import SCORE_SCHEMA, lucene_idf, make_segment_scorer


class InvertedIndex:
    """Handle to an on-disk index (meta + stats + postings paths).

    ``cache_stats=None`` (default) auto-selects the term-stats lookup
    mode by vocabulary size: a vocab up to ``stats_cache_max_terms``
    rows is pulled to the driver once (O(query terms) dict lookups per
    query); a web-scale vocab stays distributed and each lookup becomes
    a pushed-filter parquet scan.  Explicit True/False overrides.
    """

    # ~3M terms ≈ 200 MB driver pandas frame — safe default ceiling
    STATS_CACHE_MAX_TERMS = 3_000_000

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache_stats: bool | None = None,
                 cache_postings: bool = False, driver_path_max_postings: int = 200_000,
                 stats_cache_max_terms: int | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.driver_path_max_postings = driver_path_max_postings
        self.meta = read_meta(index_dir)
        self.postings_path = os.path.join(index_dir, "postings")
        self.stats_path = os.path.join(index_dir, "stats")
        self._stats_pdf: pd.DataFrame | None = None
        self._postings_df: DataFrame | None = None
        if cache_stats is None:
            limit = stats_cache_max_terms or self.STATS_CACHE_MAX_TERMS
            # metadata-only count: parquet row counts come from footers
            n_terms = self.spark.read.parquet(self.stats_path).count()
            cache_stats = n_terms <= limit
        if cache_stats:
            self._stats_pdf = (
                self.spark.read.parquet(self.stats_path)
                .select("term", "term_id", "df")
                .toPandas()
                .set_index("term")
            )
        if cache_postings:
            self._postings_df = self.spark.read.parquet(self.postings_path).persist()
            self._postings_df.count()  # materialize the cache

    # -- term stats -----------------------------------------------------
    def lookup_terms(self, terms: list[str]) -> dict[int, tuple[float, int]]:
        """term strings → {term_id: (idf, df)}; OOV terms are dropped."""
        n = self.meta["n_docs"]
        if self._stats_pdf is not None:
            hit = self._stats_pdf.loc[self._stats_pdf.index.intersection(terms)]
            return {
                int(tid): (float(lucene_idf(n, float(df))), int(df))
                for tid, df in zip(hit["term_id"], hit["df"])
            }
        rows = (
            self.spark.read.parquet(self.stats_path)
            .filter(F.col("term").isin(terms))
            .select("term_id", "df")
            .collect()
        )
        return {
            int(r["term_id"]): (float(lucene_idf(n, float(r["df"]))), int(r["df"]))
            for r in rows
        }

    def postings(self) -> DataFrame:
        if self._postings_df is not None:
            return self._postings_df
        return self.spark.read.parquet(self.postings_path)

    # -- search ---------------------------------------------------------
    def search(self, query_text: str, k: int = 5) -> DataFrame:
        """BM25 top-k → DataFrame(doc_id long, score double), ranked.

        Ties broken by doc_id asc (deterministic; reference relies on
        Lucene's internal doc order, which is not reproducible — ours is
        pinned instead, cf. SURVEY §5.2).
        """
        meta = self.meta
        terms = sorted(set(tokenize_str(query_text)))
        info = self.lookup_terms(terms)
        if not info:
            return self.spark.createDataFrame([], SCORE_SCHEMA)
        term_idf = {tid: idf for tid, (idf, _) in info.items()}
        buckets = sorted({tid % meta["n_buckets"] for tid in term_idf})
        blocks = (
            self.postings()
            .filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term_id").isin(list(term_idf)))
        )
        total_df = sum(df for _, df in info.values())
        if total_df <= self.driver_path_max_postings:
            # coordinator path: the pruned scan is small — pull the blocks
            # to the driver and score in one numpy pass (one Spark job, no
            # python-worker shuffle).  Same kernel, same tie-break, bit-
            # identical result; head-term queries on a big corpus exceed
            # the threshold and take the distributed path below.
            scorer = make_segment_scorer(
                term_idf, meta["k1"], meta["b"], meta["avgdl"], k
            )
            pdf = blocks.drop("term_bucket", "unit").toPandas()
            out = scorer(pdf)
            return self.spark.createDataFrame(out, SCORE_SCHEMA)
        scorer = make_segment_scorer(term_idf, meta["k1"], meta["b"], meta["avgdl"], k)
        candidates = (
            blocks.drop("term_bucket", "unit")
            .groupBy("segment_id")
            .applyInPandas(scorer, SCORE_SCHEMA)
        )
        return candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search(spark: SparkSession, index_dir: str, query_text: str, k: int = 5) -> DataFrame:
    """One-shot convenience wrapper (loads the index handle each call)."""
    return InvertedIndex(spark, index_dir).search(query_text, k)


def best_fields_search(
    indexes: dict[str, "InvertedIndex"], query_text: str, k: int = 5
) -> DataFrame:
    """Multi-field ``best_fields`` top-k — the reference's ``multi_match``
    default (``test_keyword_search.py:29-36``): score(doc) = max over
    fields of that field's BM25 score (dis_max, tie_breaker 0).

    Implemented as a union of per-field candidate sets → groupBy(doc)
    max → global top-k.  Each field is its own postings namespace (one
    index per field), exactly like Lucene's per-field inverted index.
    Candidate completeness: every doc in the true top-k has its best
    field's score among that field's candidates, and per-field search
    returns ≥k candidates, so the merged top-k is exact.
    """
    per_field = []
    spark = None
    for field, idx in indexes.items():
        spark = idx.spark
        per_field.append(idx.search(query_text, k=k).select("doc_id", "score"))
    if not per_field:
        raise ValueError("no indexes given")
    allc = per_field[0]
    for df in per_field[1:]:
        allc = allc.unionByName(df)
    return (
        allc.groupBy("doc_id")
        .agg(F.max("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
