"""rescore: window membership, phrase boost algebra, weight handling."""

import pytest
from pyspark.sql import functions as F

from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.query.rescore import rescore_topk
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]}"
K = 8


def _rounded_order(corpus, n=10_000):
    """Full primary ranking under the engine's deterministic tie rule
    (rounded score desc, doc_id asc) — rescore windows are selected on
    THIS order, which can differ from bm25_topk_df's raw-score order
    inside a rounded tie at a boundary."""
    rows = bm25_topk_df(corpus, QUERY, n).collect()
    return sorted(
        ((r["doc_id"], r["score"]) for r in rows), key=lambda t: (-t[1], t[0])
    )


def test_zero_rescore_weight_is_the_primary_page(spark, corpus):
    got = rescore_topk(
        corpus, QUERY, K, window_size=10_000,
        query_weight=1.0, rescore_weight=0.0,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == _rounded_order(corpus)[:K]


def test_phrase_hits_get_boosted(spark):
    rows = [
        (1, "alpha beta gamma delta"),        # exact phrase "alpha beta"
        (2, "alpha gamma beta delta"),        # both terms, no phrase
        (3, "alpha delta gamma epsilon"),     # one term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = rescore_topk(
        df, "alpha beta", 3, window_size=3,
        query_weight=1.0, rescore_weight=5.0,
    ).collect()
    assert got[0]["doc_id"] == 1  # the phrase doc wins under the boost
    by_id = {r["doc_id"]: r["score"] for r in got}
    prim = {r["doc_id"]: r["score"]
            for r in bm25_topk_df(df, "alpha beta", 3).collect()}
    assert by_id[1] > prim[1]          # boosted
    assert by_id[2] == prim[2]         # no phrase → primary only
    assert by_id[3] == prim[3]


def test_window_caps_the_rescored_set(spark, corpus):
    # window == k: the page is exactly the primary top-k (raw-score
    # membership, same as bm25_topk_df), re-ordered by the boost
    got = rescore_topk(corpus, QUERY, K, window_size=K).collect()
    prim = {r["doc_id"] for r in bm25_topk_df(corpus, QUERY, K).collect()}
    assert {r["doc_id"] for r in got} == prim
    with pytest.raises(ValueError):
        rescore_topk(corpus, QUERY, 20, window_size=10)


def test_empty_query(spark, corpus):
    assert rescore_topk(corpus, "!!!", K, window_size=K).count() == 0


def test_engine_parity(spark, corpus, built_index):
    from sparksearch.query.rescore import rescore_search

    for case in (dict(window_size=25), dict(window_size=8, rescore_weight=5.0)):
        ex = rescore_topk(corpus, QUERY, K, **case).collect()
        ix = rescore_search(built_index, corpus, QUERY, K, **case).collect()
        assert [(r["doc_id"], r["score"]) for r in ex] == [
            (r["doc_id"], r["score"]) for r in ix
        ] and ex, case
