"""Search aggregations (terms / stats / range) + index match-set parity.

Pins the facet semantics against hand-computed pandas aggregations of
the same match set, and the packed-index match-set extraction (any /
all modes) against the exhaustive token-array definition.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query import aggs
from sparksearch.query.matchset import match_ids_df

from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]} {_V[7]}"  # terms that exist in the synth corpus


@pytest.fixture(scope="module")
def faceted(corpus):
    """Corpus + a categorical and a numeric facet field."""
    return corpus.withColumn(
        "cat", (F.pmod(F.col("doc_id"), F.lit(5))).cast("string")
    ).withColumn("n", F.length("text"))


def _match_rows(faceted):
    terms = set(tokenize_str(QUERY))
    return [
        r
        for r in faceted.select("doc_id", "cat", "n", "text").collect()
        if terms & set(tokenize_str(r["text"]))
    ]


def test_terms_agg_matches_manual(spark, faceted):
    rows = _match_rows(faceted)
    want = {}
    for r in rows:
        want[r["cat"]] = want.get(r["cat"], 0) + 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = aggs.terms_agg(faceted, QUERY, "cat", 3).collect()
    assert [(r["key"], r["doc_count"]) for r in got] == top


def test_stats_agg_matches_manual(spark, faceted):
    rows = _match_rows(faceted)
    ns = [r["n"] for r in rows]
    got = aggs.stats_agg(faceted, QUERY, "n").first()
    assert got["count"] == len(ns)
    assert got["min"] == float(min(ns))
    assert got["max"] == float(max(ns))
    assert got["avg"] == round(sum(ns) / len(ns), aggs.AVG_ROUND)
    assert got["sum"] == float(sum(ns))


def test_range_agg_buckets_overlap_and_empty(spark, faceted):
    rows = _match_rows(faceted)
    ns = [r["n"] for r in rows]
    lo, hi = min(ns), max(ns)
    mid = (lo + hi) / 2
    ranges = [
        (None, float(mid)),          # *-mid
        (float(mid), None),          # mid-*
        (float(lo), float(hi) + 1),  # overlaps both
        (float(hi) + 10, None),      # empty bucket must still appear
    ]
    got = aggs.range_agg(faceted, QUERY, "n", ranges).collect()
    assert [r["bucket_idx"] for r in got] == [0, 1, 2, 3]
    assert got[0]["doc_count"] == sum(1 for n in ns if n < mid)
    assert got[1]["doc_count"] == sum(1 for n in ns if n >= mid)
    assert got[2]["doc_count"] == len(ns)
    assert got[3]["doc_count"] == 0
    assert got[3]["key"] == f"{hi + 10:g}-*"


def test_match_ids_any_all_vs_exhaustive(spark, corpus, built_index):
    terms = set(tokenize_str(QUERY))
    toks = [
        (r["doc_id"], set(tokenize_str(r["text"])))
        for r in corpus.select("doc_id", "text").collect()
    ]
    want_any = {d for d, ts in toks if terms & ts}
    want_all = {d for d, ts in toks if terms <= ts}
    got_any = {r["doc_id"] for r in match_ids_df(built_index, QUERY).collect()}
    got_all = {
        r["doc_id"] for r in match_ids_df(built_index, QUERY, mode="all").collect()
    }
    assert got_any == want_any and len(want_any) > 0
    assert got_all == want_all


def test_terms_agg_indexed_parity(spark, faceted, built_index):
    ex = aggs.terms_agg(faceted, QUERY, "cat", 5).collect()
    ix = aggs.terms_agg_indexed(built_index, faceted, QUERY, "cat", 5).collect()
    assert [(r["key"], r["doc_count"]) for r in ex] == [
        (r["key"], r["doc_count"]) for r in ix
    ]


def test_oov_and_all_with_oov_conjunct(spark, faceted, built_index):
    assert aggs.terms_agg(faceted, "zzzzqqqq", "cat").count() == 0
    assert match_ids_df(built_index, "zzzzqqqq").count() == 0
    # OOV conjunct → empty under mode="all" even if other terms match
    assert match_ids_df(built_index, "scan zzzzqqqq", mode="all").count() == 0
    with pytest.raises(ValueError):
        aggs.range_agg(faceted, QUERY, "n", [])


def test_terms_stats_subagg_matches_manual(spark, faceted):
    """Nested stats inside each parent bucket, parent order unchanged."""
    rows = _match_rows(faceted)
    buckets = {}
    for r in rows:
        buckets.setdefault(r["cat"], []).append(r["n"])
    top = sorted(buckets.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:3]
    got = aggs.terms_stats_agg(faceted, QUERY, "cat", "n", 3).collect()
    assert [(r["key"], r["doc_count"]) for r in got] == [
        (k, len(v)) for k, v in top
    ]
    for r, (k, v) in zip(got, top):
        assert r["min"] == float(min(v)) and r["max"] == float(max(v))
        assert r["avg"] == round(sum(v) / len(v), aggs.AVG_ROUND)
        assert r["sum"] == float(sum(v))


def test_percentiles_agg_matches_manual(spark, faceted):
    import numpy as np

    rows = _match_rows(faceted)
    ns = np.asarray(sorted(r["n"] for r in rows), dtype=np.float64)
    got = aggs.percentiles_agg(faceted, QUERY, "n", (25.0, 50.0, 99.0)).collect()
    assert [r["percent"] for r in got] == [25.0, 50.0, 99.0]
    for r in got:
        # numpy 'linear' interpolation == Spark percentile == quantile_cont
        want = round(float(np.percentile(ns, r["percent"])), aggs.AVG_ROUND)
        assert r["value"] == want, r
    with pytest.raises(ValueError):
        aggs.percentiles_agg(faceted, QUERY, "n", ())
