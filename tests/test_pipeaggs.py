"""Pipeline aggregations: pinned semantics over a hand-built bucket
frame + DuckDB twin parity (the OpenSearch coordinator-reducer model —
see sparksearch/query/pipeaggs.py docstring)."""

import duckdb
import pandas as pd
import pytest

from sparksearch.query import pipeaggs as pa

_BUCKETS = [(0, 4), (100, 10), (200, 0), (300, 7), (400, 7), (500, 1)]
_PARENT_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"({k}, {c})" for k, c in _BUCKETS)
    + ") AS t(key, doc_count)"
)


@pytest.fixture(scope="module")
def buckets(spark):
    return spark.createDataFrame(_BUCKETS, "key long, doc_count long")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_cumulative_sum(buckets):
    got = _rows(pa.cumulative_sum(buckets))
    acc, want = 0, []
    for k, c in _BUCKETS:
        acc += c
        want.append((k, c, float(acc)))
    assert got == want


def test_derivative_omits_first_bucket(buckets):
    got = _rows(pa.derivative(buckets))
    want = [
        (k, c, float(c - _BUCKETS[i - 1][1]))
        for i, (k, c) in enumerate(_BUCKETS)
        if i >= 1
    ]
    assert got == want


def test_serial_diff_lag2(buckets):
    got = _rows(pa.derivative(buckets, lag=2, out="sdiff"))
    want = [
        (k, c, float(c - _BUCKETS[i - 2][1]))
        for i, (k, c) in enumerate(_BUCKETS)
        if i >= 2
    ]
    assert got == want
    with pytest.raises(ValueError):
        pa.derivative(buckets, lag=0)


def test_moving_fn_trailing_inclusive(buckets):
    got = _rows(pa.moving_fn(buckets, window=3, fn="avg"))
    vals = [c for _, c in _BUCKETS]
    want = [
        (k, c, sum(vals[max(0, i - 2): i + 1]) / len(vals[max(0, i - 2): i + 1]))
        for i, (k, c) in enumerate(_BUCKETS)
    ]
    assert got == want
    # min over window 2: current bucket counts (trailing INCLUSIVE pin)
    got_min = _rows(pa.moving_fn(buckets, window=2, fn="min", out="m"))
    assert got_min[2][2] == 0.0  # bucket 200 (count 0) includes itself
    with pytest.raises(ValueError):
        pa.moving_fn(buckets, fn="median")


def test_stats_bucket(buckets):
    row = pa.stats_bucket(buckets).collect()[0]
    vals = [c for _, c in _BUCKETS]
    assert (row["count"], row["min"], row["max"], row["sum"]) == (
        len(vals), float(min(vals)), float(max(vals)), float(sum(vals))
    )
    assert row["avg"] == round(sum(vals) / len(vals), 6)


def test_bucket_sort_ties_and_paging(buckets):
    got = _rows(pa.bucket_sort(buckets, size=3))
    # counts desc, tie on 7 broken by key asc (300 before 400)
    assert got == [(100, 10), (300, 7), (400, 7)]
    page2 = _rows(pa.bucket_sort(buckets, size=3, from_=3))
    assert page2 == [(0, 4), (500, 1), (200, 0)]


def test_bucket_selector_ops(buckets):
    assert _rows(pa.bucket_selector(buckets, op=">", value=6)) == [
        (100, 10), (300, 7), (400, 7)
    ]
    assert _rows(pa.bucket_selector(buckets, op="==", value=0)) == [(200, 0)]
    with pytest.raises(ValueError):
        pa.bucket_selector(buckets, op="~")


def test_normalize_percent_of_sum(buckets):
    got = _rows(pa.normalize(buckets))
    total = sum(c for _, c in _BUCKETS)
    want = [(k, c, round(c / total, 6)) for k, c in _BUCKETS]
    assert got == want


def test_normalize_rescale_0_1(buckets):
    got = _rows(pa.normalize(buckets, method="rescale_0_1"))
    lo = min(c for _, c in _BUCKETS)
    hi = max(c for _, c in _BUCKETS)
    want = [(k, c, round((c - lo) / (hi - lo), 6)) for k, c in _BUCKETS]
    assert got == want
    with pytest.raises(ValueError):
        pa.normalize(buckets, method="zscore")


def test_normalize_degenerate_span_is_zero(spark):
    flat = spark.createDataFrame(
        [(0, 5), (1, 5)], "key long, doc_count long"
    )
    got = _rows(pa.normalize(flat, method="rescale_0_1"))
    assert [v for _, _, v in got] == [0.0, 0.0]


def test_bucket_script_skips_null_refs(spark):
    rows = [(0, 4, 8.0), (1, 2, None), (2, 5, 10.0)]
    b = spark.createDataFrame(rows, "key long, doc_count long, sum double")
    got = _rows(
        pa.bucket_script(
            b, "`sum` / doc_count", refs=["sum", "doc_count"], out="per_doc"
        )
    )
    assert got == [(0, 4, 8.0, 2.0), (2, 5, 10.0, 2.0)]


def test_duckdb_twin_parity(buckets):
    con = duckdb.connect()
    cases = [
        (pa.cumulative_sum(buckets), pa.cumulative_sum_sql(_PARENT_SQL)),
        (pa.normalize(buckets), pa.normalize_sql(_PARENT_SQL)),
        (
            pa.normalize(buckets, method="mean"),
            pa.normalize_sql(_PARENT_SQL, method="mean"),
        ),
        (
            pa.bucket_script(buckets, "doc_count * 3 + key", out="v"),
            pa.bucket_script_sql(_PARENT_SQL, "doc_count * 3 + key", out="v"),
        ),
        (pa.derivative(buckets), pa.derivative_sql(_PARENT_SQL)),
        (
            pa.moving_fn(buckets, window=3, fn="max"),
            pa.moving_fn_sql(_PARENT_SQL, window=3, fn="max"),
        ),
        (pa.stats_bucket(buckets), pa.stats_bucket_sql(_PARENT_SQL)),
        (
            pa.bucket_sort(buckets, size=4, from_=1),
            pa.bucket_sort_sql(_PARENT_SQL, size=4, from_=1),
        ),
        (
            pa.bucket_selector(buckets, op="<=", value=4),
            pa.bucket_selector_sql(_PARENT_SQL, op="<=", value=4),
        ),
    ]
    for sdf, sql in cases:
        a = sdf.toPandas()
        b = con.sql(sql).df()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b[a.columns].reset_index(drop=True),
            check_dtype=False,
        )
