"""more_like_this: term selection rules, self-exclusion, sidecar parity."""

import math

from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.index import lexicon as lx
from sparksearch.query.mlt import (
    _select_terms_exhaustive,
    more_like_this,
    more_like_this_indexed,
)


def _pick_doc(corpus):
    """A doc that actually has repeated terms (tf >= 2 exists)."""
    for r in corpus.select("doc_id", "text").collect():
        toks = tokenize_str(r["text"])
        if any(toks.count(t) >= 2 for t in set(toks)):
            return r["doc_id"]
    raise AssertionError("no doc with a repeated term in the fixture corpus")


def test_term_selection_rules(spark, corpus):
    like = _pick_doc(corpus)
    rows = corpus.collect()
    docs = [
        (r["doc_id"], tokenize_str(r["text"]))
        for r in rows
        if r["text"] is not None
    ]
    n = len(docs)
    toks = next(ts for d, ts in docs if d == like)
    tf = {t: toks.count(t) for t in set(toks)}
    df = {
        t: sum(1 for _, ts in docs if t in ts)
        for t in tf
    }
    want = sorted(
        (
            (-round(tf[t] * math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)), 6), t)
            for t in tf
            if tf[t] >= 2 and df[t] >= 5
        ),
    )
    want_terms = [t for _, t in want[:25]]
    got = _select_terms_exhaustive(corpus, like, 25, 2, 5, "doc_id", "text", "ascii")
    assert got == want_terms and got


def test_excludes_self_and_returns_similar(spark, corpus):
    like = _pick_doc(corpus)
    got = more_like_this(corpus, like, 10).collect()
    assert got, "expected similar docs"
    assert all(r["doc_id"] != like for r in got)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_indexed_parity(spark, corpus, built_index):
    lx.build_lexicon(spark, corpus, built_index.index_dir)
    like = _pick_doc(corpus)
    ex = more_like_this(corpus, like, 10).collect()
    ix = more_like_this_indexed(built_index, like, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in ix
    ] and ex


def test_missing_doc_is_empty(spark, corpus):
    assert more_like_this(corpus, -99999999, 10).count() == 0
