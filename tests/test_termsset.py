"""terms_set (per-doc minimum_should_match_field) + constant_score."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.query.matchq import (
    match_topk,
    terms_set_search,
    terms_set_sql,
    terms_set_topk,
)
from sparksearch.query.rank import (
    constant_score_search,
    constant_score_sql,
    constant_score_topk,
)
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
K = 10


@pytest.fixture(scope="module")
def doc_req(corpus):
    """corpus + a per-doc requirement field (deterministic 1..3) and a
    numeric field for structured filters."""
    return corpus.select(
        "doc_id",
        "text",
        (1 + F.pmod("doc_id", F.lit(3))).cast("long").alias("req"),
        F.length("text").alias("n"),
    ).cache()


def test_terms_set_golden(spark):
    rows = [
        (1, "a b c", 2),   # 3 matched >= 2 → hit
        (2, "a x y", 2),   # 1 matched < 2 → miss
        (3, "a b x", 3),   # 2 matched < 3 → miss
        (4, "a b c", 0),   # req clamps to 1; 3 matched → hit
        (5, "x y z", 1),   # 0 matched → miss (never matches on 0)
        (6, "a c c", None),  # null req never matches
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, req long")
    got = {
        r.doc_id
        for r in terms_set_topk(docs, ["a", "b", "c"], "req", 100).collect()
    }
    assert got == {1, 4}


def test_terms_set_is_match_msm_at_constant_req(spark, doc_req):
    """With every doc's req = const n, terms_set == match msm=n."""
    terms = sorted({_V[0], _V[3], _V[7]})
    docs2 = doc_req.withColumn("req", F.lit(2))
    a = terms_set_topk(docs2, terms, "req", 10_000).collect()
    b = match_topk(
        doc_req, " ".join(terms), 10_000, minimum_should_match=2
    ).collect()
    assert [(r.doc_id, r.score) for r in a] == [
        (r.doc_id, r.score) for r in b
    ] and a


def test_terms_set_three_engine_parity(spark, doc_req, built_index):
    terms = sorted({_V[0], _V[3], _V[7], _V[11]})
    ex = terms_set_topk(doc_req, terms, "req", K).collect()
    assert ex
    ix = terms_set_search(built_index, terms, "req", K, docs=doc_req).collect()
    assert [(r.doc_id, r.score) for r in ex] == [
        (r.doc_id, r.score) for r in ix
    ]
    con = duckdb.connect()
    con.register("documents", doc_req.toPandas())
    oq = con.execute(terms_set_sql(terms, "req", K)).fetchall()
    assert [(r.doc_id, r.score) for r in ex] == [(d, s) for d, s in oq]


def test_terms_set_validation(spark, doc_req, built_index):
    with pytest.raises(ValueError, match="analyzer token"):
        terms_set_topk(doc_req, ["Not A Token"], "req", K)
    with pytest.raises(ValueError, match="analyzer token"):
        terms_set_sql(["a-b"], "req", K)
    with pytest.raises(ValueError, match="docs="):
        terms_set_search(built_index, [_V[0]], "req", K)
    # empty terms → empty result, no crash
    assert terms_set_topk(doc_req, [], "req", K).count() == 0


# ---------------------------------------------------------------------------
# constant_score
# ---------------------------------------------------------------------------


def test_constant_score_string_filter(spark, doc_req, built_index):
    q = _V[0] + " " + _V[3]
    ex = constant_score_topk(doc_req, q, 10_000, boost=1.7).collect()
    # membership == the OR match set; every score == boost
    want = {
        r.doc_id
        for r in match_topk(doc_req, q, 10_000).collect()
    }
    assert {r.doc_id for r in ex} == want and want
    assert {r.score for r in ex} == {1.7}
    # doc_id-ordered page
    ids = [r.doc_id for r in ex]
    assert ids == sorted(ids)
    ix = constant_score_search(built_index, q, 10_000, boost=1.7).collect()
    assert [(r.doc_id, r.score) for r in ex] == [
        (r.doc_id, r.score) for r in ix
    ]


def test_constant_score_structured_three_engines(spark, doc_req, built_index):
    med = doc_req.agg(F.expr("percentile_approx(n, 0.5)")).first()[0]
    filt = {"range": {"field": "n", "lt": int(med)}}
    ex = constant_score_topk(doc_req, filt, K, boost=2.0).collect()
    assert ex and all(r.score == 2.0 for r in ex)
    ix = constant_score_search(
        built_index, filt, K, boost=2.0, docs=doc_req
    ).collect()
    assert [(r.doc_id, r.score) for r in ex] == [
        (r.doc_id, r.score) for r in ix
    ]
    con = duckdb.connect()
    con.register("documents", doc_req.toPandas())
    oq = con.execute(constant_score_sql(filt, K, boost=2.0)).fetchall()
    assert [(r.doc_id, r.score) for r in ex] == [(d, s) for d, s in oq]


def test_constant_score_validation_and_empty(spark, doc_req, built_index):
    for bad in (
        {"match_phrase": "a b"},
        {"range": {"lt": 3}},
        {"terms": {"field": "n", "values": []}},
        {"nope": {"field": "n"}},
    ):
        with pytest.raises(ValueError):
            constant_score_topk(doc_req, bad, K)
        with pytest.raises(ValueError):
            constant_score_sql(bad, K)
    with pytest.raises(ValueError, match="docs="):
        constant_score_search(built_index, {"exists": {"field": "n"}}, K)
    # empty-analysis string filter matches nothing
    assert constant_score_topk(doc_req, "!!!", K).count() == 0
    assert constant_score_search(built_index, "!!!", K).count() == 0
