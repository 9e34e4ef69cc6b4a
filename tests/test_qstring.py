"""query_string: parser occur rules + engine/oracle parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.query.qstring import (
    MUST,
    MUST_NOT,
    SHOULD,
    QueryStringError,
    parse_query_string,
    query_string_sql,
    query_string_topk,
)
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
K = 8


def _occurs(q, **kw):
    ast = parse_query_string(q, **kw)
    assert ast[0] == "bool"
    return [occ for occ, _ in ast[1]]


def test_parser_occur_rules():
    # default OR → SHOULD; explicit AND upgrades both neighbours
    assert _occurs("a b") == [SHOULD, SHOULD]
    assert _occurs("a b", default_operator="and") == [MUST, MUST]
    assert _occurs("a AND b c") == [MUST, MUST, SHOULD]
    # AND with a modified right operand still upgrades the left
    assert _occurs("a AND NOT b") == [MUST, MUST_NOT]
    assert _occurs("+a -b c") == [MUST, MUST_NOT, SHOULD]
    assert _occurs("a OR b", default_operator="and") == [MUST, SHOULD]


def test_parser_structure_and_boost():
    ast = parse_query_string('(a OR b)^2 "x y"~1 f:[3 TO *}')
    kinds = [(occ, node[0]) for occ, node in ast[1]]
    assert kinds == [
        (SHOULD, "boost"), (SHOULD, "phrase"), (SHOULD, "frange"),
    ]
    boost = ast[1][0][1]
    assert boost[2] == 2.0 and boost[1][0] == "bool"
    assert ast[1][1][1][2] == 1  # slop
    _, _, lo, hi, lo_inc, hi_inc = ast[1][2][1]
    assert (lo, hi, lo_inc, hi_inc) == (3.0, None, True, False)


def test_parser_noop_and_errors():
    # a clause that analyzes to nothing is a Lucene no-op
    assert _occurs("a ;;; b") == [SHOULD, SHOULD]
    for bad in ("(a", "a)", "AND a", "NOT", "+", "a~2", "a:b:c AND ("):
        with pytest.raises(QueryStringError):
            parse_query_string(bad)
    with pytest.raises(QueryStringError):
        parse_query_string("f:[a TO b]")  # non-numeric range
    with pytest.raises(QueryStringError):
        parse_query_string("bad-field!:x AND y")


def _meta(corpus):
    return corpus.withColumn("n", F.length("text")).withColumn(
        "grp", F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
    )


def _parity(doc, q, **kw):
    got = [
        (r["doc_id"], r["score"])
        for r in query_string_topk(doc, q, K, **kw).collect()
    ]
    con = duckdb.connect()
    con.register("documents", doc.select(
        "doc_id", "text", "n", "grp").toPandas())
    want = con.execute(query_string_sql(q, K, **kw)).fetchall()
    assert got == [(d, s) for d, s in want]
    return got


def test_parity_full_syntax(spark, corpus):
    doc = _meta(corpus)
    q = (
        f'({_V[0]} OR {_V[3]}) AND "{_V[1]} {_V[2]}"~3 '
        f'-{_V[9]} grp:2^2'
    )
    got = _parity(doc, q)
    assert got  # non-degenerate


def test_parity_default_and_wild_range(spark, corpus):
    doc = _meta(corpus)
    q = f'+{_V[0][:3]}* n:[100 TO 1500] {_V[5]}'
    got = _parity(doc, q, default_operator="and")
    assert got


def test_pure_negative_matches_nothing(spark, corpus):
    doc = _meta(corpus)
    assert query_string_topk(doc, f"-{_V[0]} -{_V[1]}", K).count() == 0


def test_group_scores_add(spark, corpus):
    """score((a OR b)) ≡ score(a b) — the group is the same bool."""
    doc = _meta(corpus)
    a = query_string_topk(doc, f"({_V[0]} OR {_V[3]})", K).collect()
    b = query_string_topk(doc, f"{_V[0]} {_V[3]}", K).collect()
    assert [(r.doc_id, r.score) for r in a] == [
        (r.doc_id, r.score) for r in b
    ]
