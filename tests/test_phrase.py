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
