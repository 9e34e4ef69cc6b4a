"""Tokenizer (Q1) — hand-counted lists + three-engine agreement."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import (
    DUCKDB_TOKENS_EXPR,
    doc_length_col,
    tokenize_str,
    tokens_col,
)

CASES = [
    ("Hello, World!", ["hello", "world"]),
    ("BM25 k1=1.2 b=0.75", ["bm25", "k1", "1", "2", "b", "0", "75"]),
    ("  spaces   everywhere  ", ["spaces", "everywhere"]),
    ("don't stop-me_now", ["don", "t", "stop", "me", "now"]),
    ("", []),
    ("!!!", []),
    ("MiXeD CaSe", ["mixed", "case"]),
    ("a1b2c3", ["a1b2c3"]),
]


@pytest.mark.parametrize("text,expected", CASES, ids=range(len(CASES)))
def test_tokenize_str(text, expected):
    assert tokenize_str(text) == expected


def test_three_engines_agree(spark):
    texts = [t for t, _ in CASES] + ["Ünïcode stripped ok", "tab\tand\nnewline"]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_toks = [r[0] for r in sdf.select(tokens_col("text")).collect()]
    py_toks = [tokenize_str(t) for t in texts]
    con = duckdb.connect()
    expr = DUCKDB_TOKENS_EXPR.format(col="text")
    duck_toks = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS text)", [t]).fetchone()[0]
        for t in texts
    ]
    for t, s, p, d in zip(texts, spark_toks, py_toks, duck_toks):
        assert s == p == d, (t, s, p, d)


def test_doc_length(spark):
    sdf = spark.createDataFrame([("one two three!",)], "text string")
    assert sdf.select(doc_length_col("text")).collect()[0][0] == 3
