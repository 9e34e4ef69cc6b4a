"""rank_feature / distance_feature: pinned scoring math, positivity
gate, geometric-mean pivot, bool composition (query/featq.py)."""

import math

import pytest
from pyspark.sql import functions as F

from sparksearch.query import featq as fq

_ROWS = [
    (1, 10.0), (2, 100.0), (3, 1000.0),
    (4, None), (5, 0.0), (6, -3.0),  # never match rank_feature
]


@pytest.fixture(scope="module")
def feats(spark):
    return spark.createDataFrame(_ROWS, "doc_id long, pop double")


def _got(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def test_saturation_explicit_pivot(feats):
    got = _got(fq.rank_feature_topk(feats, "pop", 10, pivot=100.0))
    want = sorted(
        (
            (d, round(x / (x + 100.0), 4))
            for d, x in _ROWS
            if x is not None and x > 0
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == want
    assert {d for d, _ in got} == {1, 2, 3}  # null/0/negative never match


def test_saturation_geometric_mean_default(feats):
    # exact geometric mean of {10, 100, 1000} = 100
    got = _got(fq.rank_feature_topk(feats, "pop", 10))
    want = _got(fq.rank_feature_topk(feats, "pop", 10, pivot=100.0))
    assert got == pytest.approx(want)


def test_log_and_sigmoid(feats):
    got = _got(fq.rank_feature_topk(feats, "pop", 10, fn="log",
                                    scaling_factor=1.0))
    assert dict(got)[3] == round(math.log(1001.0), 4)
    sig = dict(_got(fq.rank_feature_topk(
        feats, "pop", 10, fn="sigmoid", pivot=100.0, exponent=2.0
    )))
    assert sig[2] == 0.5  # x == pivot -> 0.5 at any exponent
    assert sig[3] == round(1000.0**2 / (1000.0**2 + 100.0**2), 4)
    with pytest.raises(ValueError):
        fq.rank_feature_topk(feats, "pop", 10, fn="linear")


def test_distance_feature_numeric(feats):
    got = dict(_got(fq.distance_feature_topk(feats, "pop", 100.0, 50.0, 10)))
    assert got[2] == 1.0  # at the origin
    assert got[1] == round(50.0 / (50.0 + 90.0), 4)
    assert 4 not in got and 5 in got and 6 in got  # nulls drop, others match
    with pytest.raises(ValueError):
        fq.distance_feature_topk(feats, "pop", 100.0, 0.0, 10)


def test_distance_feature_date(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-15 01:00:00"), (2, "2024-01-15 00:00:00"),
         (3, "2024-01-14 23:00:00"), (4, None)],
        "doc_id long, ts string",
    ).select("doc_id", F.to_timestamp("ts").alias("ts"))
    got = dict(_got(fq.distance_feature_topk(
        df, "ts", "2024-01-15 00:00:00", 3_600_000.0, 10, date=True
    )))
    assert got[2] == 1.0
    assert got[1] == got[3] == 0.5  # 1h away on either side
    assert 4 not in got


def test_bool_composition_keeps_unfeatured_docs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta", 10.0), (2, "alpha gamma", None)],
        "doc_id long, text string, pop double",
    )
    got = dict(_got(fq.rank_feature_bool_topk(
        docs, "alpha", "pop", 10, pivot=10.0
    )))
    # both docs match the must clause; doc 2 has no feature -> +0
    assert set(got) == {1, 2}
    assert got[1] > got[2]
    base = dict(
        (r.doc_id, r.raw)
        for r in __import__(
            "sparksearch.query.bm25", fromlist=["bm25_scores_df"]
        ).bm25_scores_df(docs, "alpha").collect()
    )
    assert got[2] == round(base[2], 4)
    assert got[1] == round(base[1] + 0.5, 4)  # 10/(10+10)
