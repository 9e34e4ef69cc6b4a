"""Match-set extraction from the packed index (no scoring).

Aggregations, phrase verification, and constant-score queries
(prefix / fuzzy) need the SET of matching doc ids, not a scored top-k.
This module decodes the query terms' pruned posting blocks per segment
and emits doc ids:

* ``mode="any"`` — docs holding at least one query term (OpenSearch
  ``match`` OR-semantics; feeds aggregations).
* ``mode="all"`` — docs holding EVERY query term (conjunction; the
  candidate superset for phrase verification — a doc can only contain
  the phrase if it contains each phrase term).

Scale shape: the scan is pruned to the terms' ``term_bucket=``
directories + a ``term_id IN`` row-group predicate, grouped by
``segment_id`` so each task decodes one segment's blocks and resolves
ordinals through the per-segment sidecar — identical pruning to
``InvertedIndex.search`` (`query/topk.py`), minus the scoring kernel.
The corpus table is never read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sparksearch.index.ordmap import OrdinalMap, cached_map, cached_tombstones
from sparksearch.query.wand import _decode_term, _sort_blocks

IDS_SCHEMA = StructType([StructField("doc_id", LongType(), False)])
COUNTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_matched", LongType(), False),
    ]
)
PAIRS_SCHEMA = StructType(
    [
        StructField("term_id", LongType(), False),
        StructField("doc_id", LongType(), False),
    ]
)


def make_match_kernel(term_ids: list[int], n_terms_required: int, lookup):
    """Per-segment ``applyInPandas`` kernel → doc ids with ≥ required terms.

    ``n_terms_required`` = 1 is the OR match; ``len(term_ids)`` is the
    conjunction.  ``lookup`` is the same picklable ``{"index_dir",
    "gen"}`` spec (or a driver-side :class:`OrdinalMap`) the scoring
    kernel uses.
    """
    tids = sorted(term_ids)
    need = int(n_terms_required)

    def _map_for(pdf: pd.DataFrame) -> OrdinalMap:
        if isinstance(lookup, OrdinalMap):
            return lookup
        segs = sorted(int(s) for s in pdf["segment_id"].unique())
        return cached_map(lookup["index_dir"], lookup["gen"], segs)

    def _tombs_for() -> np.ndarray | None:
        if isinstance(lookup, OrdinalMap):
            return None
        return cached_tombstones(lookup["index_dir"], lookup["gen"])

    def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64)})
        omap = _map_for(pdf)
        tb = _tombs_for()
        hits: list[np.ndarray] = []
        for tid in tids:
            sub = pdf[pdf["term_id"] == tid]
            if len(sub) == 0:
                if need == len(tids):
                    return pd.DataFrame({"doc_id": np.zeros(0, np.int64)})
                continue
            ords, _ = _decode_term(_sort_blocks(sub), tb)
            hits.append(np.unique(ords))
        if not hits:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64)})
        if need <= 1:
            ords = np.unique(np.concatenate(hits))
        elif need == len(tids) and len(hits) == len(tids):
            ords = hits[0]
            for h in hits[1:]:
                ords = np.intersect1d(ords, h, assume_unique=True)
                if len(ords) == 0:
                    break
        else:  # generic ≥-need counting (minimum_should_match analog)
            allo = np.concatenate(hits)
            uniq, cnt = np.unique(allo, return_counts=True)
            ords = uniq[cnt >= need]
        if len(ords) == 0:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64)})
        docs, _ = omap.resolve(ords)
        return pd.DataFrame({"doc_id": docs.astype(np.int64)})

    return match_segment


def make_count_kernel(term_ids: list[int], lookup):
    """Per-segment kernel → (doc_id, n_matched distinct query terms).

    The per-doc-requirement queries (``terms_set``: need read from a
    document FIELD) can't use :func:`make_match_kernel`'s fixed ``need``
    — they join this counts frame against the per-doc requirement
    instead.  Same decode, pruning, and ordinal resolution."""
    tids = sorted(term_ids)

    def _map_for(pdf: pd.DataFrame) -> OrdinalMap:
        if isinstance(lookup, OrdinalMap):
            return lookup
        segs = sorted(int(s) for s in pdf["segment_id"].unique())
        return cached_map(lookup["index_dir"], lookup["gen"], segs)

    def _tombs_for() -> np.ndarray | None:
        if isinstance(lookup, OrdinalMap):
            return None
        return cached_tombstones(lookup["index_dir"], lookup["gen"])

    def count_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": np.zeros(0, np.int64), "n_matched": np.zeros(0, np.int64)}
        )
        if len(pdf) == 0:
            return empty
        omap = _map_for(pdf)
        tb = _tombs_for()
        hits: list[np.ndarray] = []
        for tid in tids:
            sub = pdf[pdf["term_id"] == tid]
            if len(sub) == 0:
                continue
            ords, _ = _decode_term(_sort_blocks(sub), tb)
            hits.append(np.unique(ords))
        if not hits:
            return empty
        uniq, cnt = np.unique(np.concatenate(hits), return_counts=True)
        docs, _ = omap.resolve(uniq)
        return pd.DataFrame(
            {"doc_id": docs.astype(np.int64), "n_matched": cnt.astype(np.int64)}
        )

    return count_segment


def match_counts_for_terms(index, terms: list[str]) -> DataFrame:
    """DataFrame(doc_id, n_matched) over the pruned postings — how many
    of ``terms`` (distinct) each matching doc holds.  OOV terms simply
    never contribute; docs matching zero terms are absent."""
    index._refresh_if_stale()
    spark = index.spark
    terms = sorted(set(terms))
    info = index.lookup_terms(terms) if terms else {}
    if not info:
        return spark.createDataFrame([], COUNTS_SCHEMA)
    tids = sorted(info)
    meta = index.meta
    buckets = sorted({t % meta["n_buckets"] for t in tids})
    blocks = (
        index.postings()
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term_id").isin(tids))
    )
    kernel = make_count_kernel(tids, index._lookup_spec())
    return (
        blocks.drop("term_bucket", "unit")
        .groupBy("segment_id")
        .applyInPandas(kernel, COUNTS_SCHEMA)
    )


def make_pairs_kernel(term_ids: list[int], lookup):
    """Per-segment kernel → (term_id, doc_id) PAIRS from the pruned
    postings — the raw membership relation (percolation joins stored
    queries against it).  Same decode, pruning, and ordinal resolution
    as the match/count kernels."""
    tids = sorted(term_ids)

    def _map_for(pdf: pd.DataFrame) -> OrdinalMap:
        if isinstance(lookup, OrdinalMap):
            return lookup
        segs = sorted(int(s) for s in pdf["segment_id"].unique())
        return cached_map(lookup["index_dir"], lookup["gen"], segs)

    def _tombs_for() -> np.ndarray | None:
        if isinstance(lookup, OrdinalMap):
            return None
        return cached_tombstones(lookup["index_dir"], lookup["gen"])

    def pairs_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"term_id": np.zeros(0, np.int64), "doc_id": np.zeros(0, np.int64)}
        )
        if len(pdf) == 0:
            return empty
        omap = _map_for(pdf)
        tb = _tombs_for()
        out_t: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for tid in tids:
            sub = pdf[pdf["term_id"] == tid]
            if len(sub) == 0:
                continue
            ords, _ = _decode_term(_sort_blocks(sub), tb)
            ords = np.unique(ords)
            if len(ords) == 0:
                continue
            docs, _ = omap.resolve(ords)
            out_t.append(np.full(len(docs), tid, np.int64))
            out_d.append(docs.astype(np.int64))
        if not out_t:
            return empty
        return pd.DataFrame(
            {
                "term_id": np.concatenate(out_t),
                "doc_id": np.concatenate(out_d),
            }
        )

    return pairs_segment


def term_doc_pairs_for_ids(index, term_ids: list[int]) -> DataFrame:
    """DataFrame(term_id, doc_id) for the given term ids, decoded from
    the bucket-pruned postings (cost = Σ df over the ids)."""
    index._refresh_if_stale()
    spark = index.spark
    tids = sorted(set(int(t) for t in term_ids))
    if not tids:
        return spark.createDataFrame([], PAIRS_SCHEMA)
    meta = index.meta
    buckets = sorted({t % meta["n_buckets"] for t in tids})
    blocks = (
        index.postings()
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term_id").isin(tids))
    )
    kernel = make_pairs_kernel(tids, index._lookup_spec())
    return (
        blocks.drop("term_bucket", "unit")
        .groupBy("segment_id")
        .applyInPandas(kernel, PAIRS_SCHEMA)
    )


def match_ids_df(index, query_text: str, *, mode: str = "any") -> DataFrame:
    """DataFrame(doc_id) of docs matching the query via the packed index.

    ``index`` is an ``InvertedIndex`` handle; ``mode`` is ``"any"``
    (OR) or ``"all"`` (conjunction).  OOV terms: dropped under
    ``"any"``; under ``"all"`` an OOV term means NO doc can match.
    """
    return match_ids_for_terms(
        index, sorted(set(index._tokenize(query_text))), mode=mode
    )


def match_ids_for_terms(index, terms: list[str], *, mode: str = "any",
                        min_match: int | None = None) -> DataFrame:
    """Like :func:`match_ids_df` over an already-analyzed term list
    (multi-term rewrites — prefix/fuzzy expansions — land here).

    ``min_match`` overrides ``mode`` with an explicit ≥-n distinct-term
    requirement (the ``minimum_should_match`` engine leg): OOV terms
    can never be matched, so in-vocab terms < n ⇒ empty.
    """
    index._refresh_if_stale()
    spark = index.spark
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], IDS_SCHEMA)
    info = index.lookup_terms(terms)
    if mode == "all" and len(info) < len(terms):
        return spark.createDataFrame([], IDS_SCHEMA)  # an OOV conjunct
    if min_match is not None and len(info) < min_match:
        return spark.createDataFrame([], IDS_SCHEMA)
    if not info:
        return spark.createDataFrame([], IDS_SCHEMA)
    tids = sorted(info)
    need = (
        int(min_match) if min_match is not None
        else (len(tids) if mode == "all" else 1)
    )
    meta = index.meta
    buckets = sorted({t % meta["n_buckets"] for t in tids})
    blocks = (
        index.postings()
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term_id").isin(tids))
    )
    kernel = make_match_kernel(tids, need, index._lookup_spec())
    return (
        blocks.drop("term_bucket", "unit")
        .groupBy("segment_id")
        .applyInPandas(kernel, IDS_SCHEMA)
    )
