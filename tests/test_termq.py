"""Lexicon sidecar + prefix/fuzzy multi-term queries.

Pins the expansion rules (dictionary order / (distance, term) order,
max_expansions cap, Lucene AUTO fuzziness), lexicon-vs-corpus expansion
equality, and engine-path ≡ exhaustive-path for both query types.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.index import lexicon as lx
from sparksearch.query import termq


@pytest.fixture(scope="module")
def lexed_index(spark, corpus, built_index):
    """built_index with its lexicon sidecar materialized."""
    lx.build_lexicon(spark, corpus, built_index.index_dir)
    return built_index


def _vocab(corpus):
    vs = set()
    for r in corpus.select("text").collect():
        vs |= set(tokenize_str(r["text"]))
    return vs


def test_auto_fuzziness():
    assert lx.auto_fuzziness("ab") == 0
    assert lx.auto_fuzziness("abc") == 1
    assert lx.auto_fuzziness("abcde") == 1
    assert lx.auto_fuzziness("abcdef") == 2


def test_lexicon_contents_and_df(spark, corpus, lexed_index):
    vocab = _vocab(corpus)
    rows = lx.read_lexicon(spark, lexed_index.index_dir).collect()
    assert {r["term"] for r in rows} == vocab
    # df spot-check against a brute count
    some = sorted(vocab)[0]
    want = sum(
        1
        for r in corpus.select("text").collect()
        if some in tokenize_str(r["text"])
    )
    got = {r["term"]: r["df"] for r in rows}[some]
    assert got == want


def test_expand_prefix_order_and_cap(spark, corpus, lexed_index):
    vocab = _vocab(corpus)
    p = sorted(vocab)[0][:1]
    want = sorted(t for t in vocab if t.startswith(p))
    got = lx.expand_prefix(spark, lexed_index.index_dir, p, max_expansions=5)
    assert got == want[:5]
    assert lx.expand_prefix(spark, lexed_index.index_dir, "zzzzz") == []
    with pytest.raises(ValueError):
        lx.expand_prefix(spark, lexed_index.index_dir, "")


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_expand_fuzzy_matches_brute(spark, corpus, lexed_index):
    vocab = _vocab(corpus)
    probe = sorted(vocab)[0]
    target = probe[:-1] + "z" if len(probe) > 2 else probe + "zz"
    edits = lx.auto_fuzziness(target)
    want = sorted(
        ((t, _lev(t, target)) for t in vocab if _lev(t, target) <= edits),
        key=lambda kv: (kv[1], kv[0]),
    )
    got = lx.expand_fuzzy(spark, lexed_index.index_dir, target, max_expansions=50)
    assert got == [t for t, _ in want[:50]]


def test_prefix_engine_parity(spark, corpus, lexed_index):
    vocab = _vocab(corpus)
    p = sorted(vocab)[0][:1]
    ex = termq.prefix_topk(corpus, p, 10).collect()
    ix = termq.prefix_search(lexed_index, p, 10).collect()
    assert len(ex) > 0
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in ix
    ]
    assert all(r["score"] == 1.0 for r in ex)  # constant-score semantics
    assert termq.prefix_search(lexed_index, "zzzzz", 10).count() == 0


def test_fuzzy_engine_parity(spark, corpus, lexed_index):
    vocab = _vocab(corpus)
    probe = sorted(vocab, key=len)[-1]
    target = probe[:-1] + ("z" if probe[-1] != "z" else "q")
    ex = termq.fuzzy_topk(corpus, target, 10).collect()
    ix = termq.fuzzy_search(lexed_index, target, 10).collect()
    assert len(ex) > 0
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in ix
    ]
    assert termq.fuzzy_search(lexed_index, "zq", 10).count() == 0


def test_wildcard_expansion_and_engine_parity(spark, corpus, lexed_index):
    from sparksearch.query.termq import (
        _expand_wildcard_exhaustive,
        wildcard_regex,
        wildcard_search,
        wildcard_topk,
    )

    # translation: * and ? plus literal escaping
    assert wildcard_regex("ta*") == "^ta.*$"
    assert wildcard_regex("t?b") == "^t.b$"
    assert wildcard_regex("a.b") == "^a\\.b$"

    import re

    vocab = _vocab(corpus)
    head = sorted(vocab)[len(vocab) // 2]  # a mid-dictionary term
    pat = head[:2] + "*"  # matches every vocab term sharing that head
    want = sorted(t for t in vocab if re.match(wildcard_regex(pat), t))[:50]
    got = _expand_wildcard_exhaustive(corpus, pat, 50, "text", "ascii")
    assert got == want and got

    ex = wildcard_topk(corpus, pat, 10).collect()
    ix = wildcard_search(lexed_index, pat, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in ix
    ] and ex

    # infix wildcard exercises the non-prefix path
    mid = head[0] + "*" + head[-1]
    ex2 = wildcard_topk(corpus, mid, 10).collect()
    ix2 = wildcard_search(lexed_index, mid, 10).collect()
    assert [tuple(r) for r in ex2] == [tuple(r) for r in ix2]
    assert wildcard_topk(corpus, "zzz*qqq", 10).count() == 0
