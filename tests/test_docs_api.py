"""_mget and the pinned query: request-order pins, found flags,
pinned-then-organic ranking, DuckDB twin parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparksearch.query.docs_api import mget, mget_sql, pinned_sql, pinned_topk
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.synth import make_vocab

_V = make_vocab(100)


def _ids(corpus, n):
    return [r.doc_id for r in corpus.select("doc_id").orderBy("doc_id").limit(n).collect()]


def test_mget_request_order_and_found(spark, corpus):
    present = _ids(corpus, 3)
    ids = [present[2], 999_999_999_999, present[0]]
    out = mget(corpus, ids).collect()
    assert [r.doc_id for r in out] == ids
    assert [r.found for r in out] == [True, False, True]
    assert out[1].text is None and out[0].text is not None


def test_mget_plan_broadcast_and_pushdown(spark, corpus, tmp_path):
    """The executed plan must be a broadcast hash join with the id list
    pushed to the parquet scan — NOT a corpus-wide sort-merge shuffle
    (the r4 bug: broadcast-left of a left join is unsupported and
    silently degrades)."""
    path = str(tmp_path / "docs")
    corpus.select("doc_id", "text").write.parquet(path)
    docs = spark.read.parquet(path)
    ids = _ids(corpus, 3)
    plan = mget(docs, ids)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [" in plan and "In(doc_id" in plan


def test_mget_validation(spark, corpus):
    with pytest.raises(ValueError):
        mget(corpus, [])
    with pytest.raises(ValueError):
        mget_sql([1, 1])


def test_pinned_layout(spark, corpus):
    q = f"{_V[0]} {_V[1]} {_V[2]} {_V[3]}"
    organic = [(r.doc_id, r.score) for r in bm25_topk_df(corpus, q, 10).collect()]
    assert organic
    pins = [organic[3][0], 999_999_999_999, organic[0][0]]
    out = pinned_topk(corpus, pins, q, 10).collect()
    # missing pin skipped; surviving pins first in request order
    assert [r.doc_id for r in out[:2]] == [pins[0], pins[2]]
    assert all(r.pinned for r in out[:2])
    # organic tail excludes the pinned ids and keeps BM25 order
    tail = [(r.doc_id, r.score) for r in out[2:]]
    want = [(d, s) for d, s in organic if d not in pins][: 10 - 2]
    assert tail == want
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


def test_pinned_duckdb_parity(spark, corpus):
    con = duckdb.connect()
    con.register("documents", corpus.select("doc_id", "text").toPandas())
    q = f"{_V[0]} {_V[1]} {_V[2]} {_V[3]}"
    pins = _ids(corpus, 2)
    a = pinned_topk(corpus, pins, q, 10).toPandas()
    b = con.sql(pinned_sql(pins, q, 10)).df()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b[a.columns].reset_index(drop=True),
        check_dtype=False,
    )
    ids = [pins[1], 123_456_789_000, pins[0]]
    a = mget(corpus, ids).toPandas()
    b = con.sql(mget_sql(ids)).df()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b[a.columns].reset_index(drop=True),
        check_dtype=False,
    )
