"""_termvectors: per-doc term vectors (tf, corpus df/ttf, 0-based
positions) — manual pin, DuckDB parity, sidecar-path parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.index.lexicon import build_lexicon
from sparksearch.index.positions import build_positions
from sparksearch.query.termvectors import (
    termvectors,
    termvectors_indexed,
    termvectors_sql,
)
from sparksearch.synth import make_vocab

_V = make_vocab(100)


@pytest.fixture(scope="module")
def tv_index(spark, corpus, built_index):
    build_lexicon(spark, corpus, built_index.index_dir)
    build_positions(spark, corpus, built_index.index_dir)
    return built_index


def test_termvectors_manual(spark):
    rows = [
        (1, "a b a c"),
        (2, "b b c"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["tf"], r["df"], r["ttf"], list(r["positions"]))
        for r in termvectors(df, 1).collect()
    }
    assert got == {
        "a": (2, 1, 2, [0, 2]),
        "b": (1, 2, 3, [1]),
        "c": (1, 2, 2, [3]),
    }
    assert termvectors(df, 999).count() == 0


def test_termvectors_duckdb_parity(spark, corpus):
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    some_id = corpus.select("doc_id").head()["doc_id"]
    ex = [
        (r["term"], r["tf"], r["df"], r["ttf"], list(r["positions"]))
        for r in termvectors(corpus, some_id).collect()
    ]
    oq = [
        (t, tf, df, ttf, list(p))
        for t, tf, df, ttf, p in con.execute(
            termvectors_sql(some_id)
        ).fetchall()
    ]
    assert ex == oq and ex


def test_termvectors_indexed_parity(spark, corpus, tv_index):
    ids = [r["doc_id"] for r in corpus.select("doc_id").head(3)]
    for did in ids:
        ex = [
            (r["term"], r["tf"], r["df"], r["ttf"], list(r["positions"]))
            for r in termvectors(corpus, did).collect()
        ]
        ix = [
            (r["term"], r["tf"], r["df"], r["ttf"], list(r["positions"]))
            for r in termvectors_indexed(tv_index, did).collect()
        ]
        assert ex == ix and ex, did
    assert termvectors_indexed(tv_index, 10**15).count() == 0


def test_termvectors_indexed_reads_no_text(spark, tv_index):
    plan = (
        termvectors_indexed(tv_index, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "text" not in plan
