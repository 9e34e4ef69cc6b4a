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
  ``cache_stats=True`` (sandbox default; on a 10^12-doc corpus flip it
  off and the lookup becomes a pushed-filter scan / broadcast join).
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
    """Handle to an on-disk index (meta + stats + postings paths)."""

    def __init__(self, spark: SparkSession, index_dir: str, cache_stats: bool = True,
                 cache_postings: bool = False):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = read_meta(index_dir)
        self.postings_path = os.path.join(index_dir, "postings")
        self.stats_path = os.path.join(index_dir, "stats")
        self._stats_pdf: pd.DataFrame | None = None
        self._postings_df: DataFrame | None = None
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
    def lookup_terms(self, terms: list[str]) -> dict[int, float]:
        """term strings → {term_id: idf}; OOV terms are dropped."""
        n = self.meta["n_docs"]
        if self._stats_pdf is not None:
            hit = self._stats_pdf.loc[self._stats_pdf.index.intersection(terms)]
            return {
                int(tid): float(lucene_idf(n, float(df)))
                for tid, df in zip(hit["term_id"], hit["df"])
            }
        rows = (
            self.spark.read.parquet(self.stats_path)
            .filter(F.col("term").isin(terms))
            .select("term_id", "df")
            .collect()
        )
        return {int(r["term_id"]): float(lucene_idf(n, float(r["df"]))) for r in rows}

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
        term_idf = self.lookup_terms(terms)
        if not term_idf:
            return self.spark.createDataFrame([], SCORE_SCHEMA)
        buckets = sorted({tid % meta["n_buckets"] for tid in term_idf})
        blocks = (
            self.postings()
            .filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term_id").isin(list(term_idf)))
        )
        scorer = make_segment_scorer(term_idf, meta["k1"], meta["b"], meta["avgdl"], k)
        candidates = blocks.groupBy("segment_id").applyInPandas(scorer, SCORE_SCHEMA)
        return candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search(spark: SparkSession, index_dir: str, query_text: str, k: int = 5) -> DataFrame:
    """One-shot convenience wrapper (loads the index handle each call)."""
    return InvertedIndex(spark, index_dir).search(query_text, k)
