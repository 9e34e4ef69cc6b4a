"""significant_text: JLH semantics + index-sidecar plan parity."""

import pytest

from sparksearch.analyze import tokenize_str
from sparksearch.index import lexicon as lx
from sparksearch.query.sigterms import (
    SIG_ROUND,
    significant_text,
    significant_text_indexed,
)
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
# mid-frequency terms: head terms appear in ~every synth doc, making
# the match set ≈ the corpus and fg_pct == bg_pct for everything (a
# correct empty result, but a vacuous test)
QUERY = f"{_V[200]} {_V[210]}"
SIZE = 10
MDC = 3


def _reference(corpus):
    """Pure-python JLH over the same tokenization."""
    qterms = set(tokenize_str(QUERY))
    docs = [
        set(tokenize_str(r["text"]))
        for r in corpus.select("text").collect()
        if r["text"] is not None
    ]
    m = [ts for ts in docs if ts & qterms]
    n, mn = len(docs), len(m)
    bg: dict[str, int] = {}
    fg: dict[str, int] = {}
    for ts in docs:
        for t in ts:
            bg[t] = bg.get(t, 0) + 1
    for ts in m:
        for t in ts:
            fg[t] = fg.get(t, 0) + 1
    out = []
    for t, f in fg.items():
        fp, bp = f / mn, bg[t] / n
        if f >= MDC and fp > bp:
            out.append((t, f, bg[t], round((fp - bp) * (fp / bp), SIG_ROUND)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:SIZE]


def test_matches_python_reference(spark, corpus):
    want = _reference(corpus)
    got = [
        (r["term"], r["fg_count"], r["bg_count"], r["score"])
        for r in significant_text(corpus, QUERY, SIZE, min_doc_count=MDC).collect()
    ]
    assert got == want and got


def test_query_terms_are_trivially_significant(spark, corpus):
    got = significant_text(corpus, QUERY, 10_000, min_doc_count=1).collect()
    terms = {r["term"] for r in got}
    present = {t for t in tokenize_str(QUERY) if t in terms}
    # a query term matched by every fg doc has fg_pct = 1 > bg_pct
    assert present, got[:5]


def test_indexed_parity(spark, corpus, built_index):
    lx.build_lexicon(spark, corpus, built_index.index_dir)
    ex = significant_text(corpus, QUERY, SIZE, min_doc_count=MDC).collect()
    ix = significant_text_indexed(
        built_index, QUERY, SIZE, min_doc_count=MDC
    ).collect()
    assert [tuple(r) for r in ex] == [tuple(r) for r in ix] and ex


def test_oov_and_empty(spark, corpus, built_index):
    assert significant_text(corpus, "zzzznotaword", SIZE).count() == 0
    assert significant_text(corpus, "!!!", SIZE).count() == 0
