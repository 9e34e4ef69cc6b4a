"""match_phrase: adjacency counting, BM25 scoring, index-pruned parity."""

import math

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.query.phrase import (
    match_phrase_indexed,
    match_phrase_topk,
    phrase_tf_col,
)


def _ptf(toks, phrase):
    m = len(phrase)
    return sum(1 for i in range(len(toks) - m + 1) if toks[i : i + m] == phrase)


def test_phrase_tf_overlap_and_edges(spark):
    rows = [
        (1, "a a a"),        # "a a" occurs at 0 and 1 → overlap counts
        (2, "a b a b a"),    # "a b a" at 0 and 2
        (3, "a"),            # shorter than the phrase
        (4, "b a a b"),      # one hit mid-stream
        (5, ""),             # empty token stream
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    got = {
        r["doc_id"]: r["tf"]
        for r in df.select(
            "doc_id", phrase_tf_col(toks, ["a", "a"]).alias("tf")
        ).collect()
    }
    assert got == {1: 2, 2: 0, 3: 0, 4: 1, 5: 0}
    got3 = {
        r["doc_id"]: r["tf"]
        for r in df.select(
            "doc_id", phrase_tf_col(toks, ["a", "b", "a"]).alias("tf")
        ).collect()
    }
    assert got3[2] == 2 and got3[1] == 0


def _pick_phrase(corpus) -> str:
    """A bigram that actually occurs (deterministically) in the corpus."""
    r = corpus.select("text").orderBy("doc_id").first()
    toks = tokenize_str(r["text"])
    return f"{toks[0]} {toks[1]}"


def test_match_phrase_matches_manual(spark, corpus):
    phrase = _pick_phrase(corpus)
    pt = tokenize_str(phrase)
    rows = [
        (r["doc_id"], tokenize_str(r["text"]))
        for r in corpus.select("doc_id", "text").collect()
    ]
    n_docs = len(rows)
    avgdl = sum(len(t) for _, t in rows) / n_docs
    tfs = {d: _ptf(t, pt) for d, t in rows}
    dls = {d: len(t) for d, t in rows}
    df_ = sum(1 for v in tfs.values() if v > 0)
    assert df_ > 0, "picked phrase must occur"
    idf = math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
    want = sorted(
        (
            (d, idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl)))
            for d, tf in tfs.items()
            if tf > 0
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = match_phrase_topk(corpus, phrase, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, round(s, 4)) for d, s in want
    ]


def test_match_phrase_indexed_parity(spark, corpus, built_index):
    phrase = _pick_phrase(corpus)
    ex = match_phrase_topk(corpus, phrase, 10).collect()
    ix = match_phrase_indexed(built_index, corpus, phrase, 10).collect()
    assert len(ex) > 0
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in ix
    ]


def test_single_term_phrase_degrades_to_match(spark, corpus):
    term = tokenize_str(_pick_phrase(corpus))[0]
    a = match_phrase_topk(corpus, term, 10).collect()
    b = bm25_topk_df(corpus, term, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_phrase_empty_and_oov(spark, corpus, built_index):
    assert match_phrase_topk(corpus, "", 10).count() == 0
    assert match_phrase_topk(corpus, "zzzz qqqq", 10).count() == 0
    assert match_phrase_indexed(built_index, corpus, "zzzz qqqq", 10).count() == 0
    # present terms, adjacency never satisfied → candidates but no hits
    toks = tokenize_str(corpus.select("text").orderBy("doc_id").first()["text"])
    never = f"{toks[0]} {toks[0]} {toks[0]} {toks[0]} {toks[0]} {toks[0]}"
    ex = match_phrase_topk(corpus, never, 10).collect()
    ix = match_phrase_indexed(built_index, corpus, never, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in ix
    ]


def test_phrase_slop_golden_and_twin(spark):
    """Pinned sloppy spec on a hand-built corpus: tf = anchors whose
    in-order occurrence spans <= m-1+slop (ordered-only — reversed
    text never matches); DuckDB twin byte-identical; slop=0 == exact."""
    import duckdb

    from pyspark.sql import functions as F

    from sparksearch.query.phrase import (
        match_phrase_sql,
        phrase_tf_col,
    )

    rows = [
        (1, "a b c"), (2, "a x b c"), (3, "a x x b"), (4, "b a"),
        (5, "a a b"), (6, "c b a"), (7, "a b a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        0: {1: 1, 5: 1, 7: 2},
        1: {1: 1, 2: 1, 5: 2, 7: 2},
        2: {1: 1, 2: 1, 3: 1, 5: 2, 7: 2},
    }
    for slop, exp in want.items():
        got = {
            r.doc_id: r.tf
            for r in docs.select(
                "doc_id",
                phrase_tf_col(F.split("text", " "), ["a", "b"], slop).alias("tf"),
            ).collect()
            if r.tf > 0
        }
        assert got == exp, (slop, got, exp)
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    for slop in (0, 1, 2, 3):
        for ph in ("a b", "a b c", "a a", "c b a"):
            a = [
                (r.doc_id, r.score)
                for r in match_phrase_topk(docs, ph, 10, slop=slop).collect()
            ]
            b = list(con.execute(match_phrase_sql(ph, 10, slop=slop)).fetchall())
            assert a == b, (slop, ph, a, b)


def test_phrase_slop_indexed_parity(spark, corpus, built_index):
    from sparksearch.query.phrase import match_phrase_indexed

    ph = _pick_phrase(corpus)
    for slop in (1, 2):
        ex = match_phrase_topk(corpus, ph, 10, slop=slop).collect()
        ix = match_phrase_indexed(built_index, corpus, ph, 10, slop=slop).collect()
        assert [(r.doc_id, r.score) for r in ex] == [
            (r.doc_id, r.score) for r in ix
        ] and ex
