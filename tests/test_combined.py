"""combined_fields / script_score / parent_id: semantics + oracle parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import DUCKDB_TOKENS_EXPR, tokens_col
from sparksearch.ops.chunking import chunk_table, chunk_table_sql
from sparksearch.query.combined import combined_fields_sql, combined_fields_topk
from sparksearch.query.joinq import parent_id_topk, parent_id_topk_sql
from sparksearch.query.rank import (
    check_script,
    script_score_sql,
    script_score_topk,
)
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
K = 8
_TOKS = DUCKDB_TOKENS_EXPR.format(col="text")


def _titled(corpus):
    title = F.concat_ws(" ", F.slice(tokens_col("text"), 1, 4))
    return corpus.withColumn("title", title)


def test_combined_fields_parity(spark, corpus):
    doc = _titled(corpus)
    q = f"{_V[0]} {_V[3]} {_V[7]}"
    got = [
        (r["doc_id"], r["score"])
        for r in combined_fields_topk(
            doc, q, {"title": 2.0, "text": 1.0}, K
        ).collect()
    ]
    con = duckdb.connect()
    con.register("documents", corpus.select("doc_id", "text").toPandas())
    sql = combined_fields_sql(
        q,
        {"title": (f"list_slice({_TOKS}, 1, 4)", 2.0), "text": (_TOKS, 1.0)},
        K,
    )
    want = con.execute(sql).fetchall()
    assert got == [(d, s) for d, s in want] and got


def test_combined_fields_is_term_centric(spark, corpus):
    """A title hit must change tf', not add an independent scorer:
    with weight 1 on both fields the combined score over (title, text)
    where title ⊂ text equals single-field BM25 over a doc whose text
    is text+title concatenated — the defining BM25F identity."""
    from sparksearch.query.bm25 import bm25_topk_df

    doc = _titled(corpus)
    q = f"{_V[0]} {_V[3]}"
    a = combined_fields_topk(doc, q, {"title": 1.0, "text": 1.0}, K).collect()
    merged = doc.select(
        "doc_id", F.concat_ws(" ", "text", "title").alias("text")
    )
    b = bm25_topk_df(merged, q, K).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_combined_fields_weight_validation(spark, corpus):
    with pytest.raises(ValueError, match=">= 1"):
        combined_fields_topk(corpus, _V[0], {"text": 0.5}, K)
    with pytest.raises(ValueError, match="at least one"):
        combined_fields_topk(corpus, _V[0], {}, K)


def test_script_score_parity_and_validation(spark, corpus):
    doc = corpus.withColumn("n", F.length("text"))
    q = f"{_V[0]} {_V[3]}"
    script = "sqrt(_score) * ln(1.0 + n / 50.0)"
    got = [
        (r["doc_id"], r["score"])
        for r in script_score_topk(doc, q, script, K).collect()
    ]
    con = duckdb.connect()
    con.register("documents", doc.select("doc_id", "text", "n").toPandas())
    want = con.execute(script_score_sql(q, script, K)).fetchall()
    assert got == [(d, s) for d, s in want] and got

    with pytest.raises(ValueError, match="identifier"):
        check_script("_score * bogus_col", ["n"])
    with pytest.raises(ValueError, match="lex"):
        check_script("_score; DROP TABLE x", ["n"])


def test_parent_id_parity_and_missing(spark, corpus):
    kids = chunk_table(corpus, size=32)
    pid = kids.select("doc_id").first()["doc_id"]
    got = [
        (r["doc_id"], r["chunk_idx"], r["score"])
        for r in parent_id_topk(kids, pid, K).collect()
    ]
    con = duckdb.connect()
    con.register("documents", corpus.select("doc_id", "text").toPandas())
    want = con.execute(
        parent_id_topk_sql(
            pid, K, children_table=f"({chunk_table_sql(size=32)})"
        )
    ).fetchall()
    assert got == [(d, i, s) for d, i, s in want] and got
    assert [i for _, i, _ in got] == sorted(i for _, i, _ in got)
    assert parent_id_topk(kids, 999_999_999_999, K).count() == 0


def test_combined_fields_engine_equals_exhaustive(spark, corpus, tmp_path):
    """BM25F from tfrows/doclens sidecars ≡ the exhaustive path."""
    from sparksearch.index.build import build_index
    from sparksearch.query.combined import combined_fields_search
    from sparksearch.query.topk import InvertedIndex

    doc = _titled(corpus).select("doc_id", "title", "text")
    d = str(tmp_path / "mf")
    build_index(spark, doc, d, fields=["title", "text"],
                n_segments=4, n_buckets=4, n_units=1)
    idx = InvertedIndex(spark, d)
    for q, w in [
        (f"{_V[0]} {_V[3]}", {"title": 2.0, "text": 1.0}),
        (f"{_V[7]}", {"title": 1.0, "text": 1.0}),
        (f"{_V[0]} {_V[3]} {_V[11]}", {"text": 3.0, "title": 1.0}),
    ]:
        ex = [(r.doc_id, r.score)
              for r in combined_fields_topk(doc, q, w, K).collect()]
        en = [(r.doc_id, r.score)
              for r in combined_fields_search(idx, q, w, K).collect()]
        assert en == ex and ex, (q, en[:3], ex[:3])
    with pytest.raises(KeyError, match="unknown field"):
        combined_fields_search(idx, _V[0], {"nope": 1.0}, K)
    assert combined_fields_search(idx, "zzqqxxyy", {"text": 1.0}, K).count() == 0
