"""Percolate query — stored queries matched against documents.

Pins the forward (corpus-scan) percolation against a brute-force
token-set computation, the packed-index path against the forward path,
and the edge semantics: AND with an out-of-vocabulary term never
matches; empty-analysis registrations match nothing; tombstoned docs
drop out of the indexed path.
"""

import pytest

from sparksearch.analyze import tokenize_str
from sparksearch.query.percolate import (
    percolate,
    percolate_indexed,
    percolate_stored,
    refresh_registrations,
    register_queries,
)
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERIES = [
    (1, f"{_V[0]} {_V[3]}", "or"),
    (2, f"{_V[0]} {_V[3]}", "and"),
    (3, f"{_V[7]}", "or"),
    (4, f"{_V[1]} {_V[2]} {_V[5]}", "and"),
    (5, "zzzzqqqq", "or"),  # OOV: matches nothing
    (6, f"{_V[4]} zzzzqqqq", "and"),  # AND with OOV: matches nothing
    (7, "...,;!", "or"),  # empty analysis: matches nothing
]


def _brute(corpus, queries):
    want = set()
    docs = [
        (r["doc_id"], set(tokenize_str(r["text"])))
        for r in corpus.select("doc_id", "text").collect()
        if r["text"] is not None
    ]
    for qid, qtext, op in queries:
        terms = set(tokenize_str(qtext))
        if not terms:
            continue
        for did, toks in docs:
            hit = bool(terms & toks) if op == "or" else terms <= toks
            if hit:
                want.add((did, qid))
    return want


@pytest.fixture(scope="module")
def brute(corpus):
    return _brute(corpus, QUERIES)


def test_forward_matches_brute_force(spark, corpus, brute):
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(corpus, QUERIES).collect()
    }
    assert got == brute
    # sanity: the fixture corpus actually exercises both hit kinds
    assert any(q == 1 for _, q in brute) and any(q == 2 for _, q in brute)
    assert not any(q in (5, 6, 7) for _, q in brute)


def test_indexed_equals_forward(spark, corpus, built_index, brute):
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate_indexed(built_index, QUERIES).collect()
    }
    assert got == brute


def test_empty_registrations(spark, corpus, built_index):
    assert percolate(corpus, []).count() == 0
    assert percolate_indexed(built_index, []).count() == 0
    # only unanalyzable / OOV-AND registrations → empty result frames
    dead = [(1, "...,;!", "or"), (2, "zzzzqqqq yyyyxxxx", "and")]
    assert percolate_indexed(built_index, dead).count() == 0


def test_bad_operator_rejected(spark, corpus):
    with pytest.raises(ValueError):
        percolate(corpus, [(1, "scan", "xor")])


# ---------------------------------------------------------------------------
# persisted registry (VERDICT r4 next #8)
# ---------------------------------------------------------------------------


def test_stored_registry_roundtrip_and_append(spark, corpus, built_index, brute):
    # queries with at least one analyzed term persist (q7 is empty-analysis)
    n = register_queries(built_index, QUERIES)
    assert n == len(QUERIES) - 1
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate_stored(built_index).collect()
    }
    assert got == brute
    # duplicate query_id rejected on append; fresh id accepted and live
    with pytest.raises(ValueError):
        register_queries(built_index, [(1, _V[9], "or")], mode="append")
    register_queries(built_index, [(99, _V[3], "or")], mode="append")
    got2 = {
        (r["doc_id"], r["query_id"])
        for r in percolate_stored(built_index).collect()
    }
    assert got2 >= got
    assert any(q == 99 for _, q in got2 - got)
    # overwrite drops the extra registration again
    register_queries(built_index, QUERIES)
    got3 = {
        (r["doc_id"], r["query_id"])
        for r in percolate_stored(built_index).collect()
    }
    assert got3 == brute


def test_stored_registry_unregistered_errors(spark, corpus, tmp_path):
    from sparksearch.pipeline import build_and_load

    idx = build_and_load(
        spark, corpus.limit(40), str(tmp_path / "idx"),
        n_segments=2, n_buckets=2, n_units=1,
    )
    with pytest.raises(ValueError, match="no percolator registry"):
        percolate_stored(idx)


def test_stored_registry_staleness_after_delete(spark, corpus, tmp_path):
    from sparksearch.index.upsert import delete_docs
    from sparksearch.pipeline import build_and_load
    from sparksearch.query.topk import InvertedIndex

    d = str(tmp_path / "idx")
    small = corpus.limit(60).cache()
    idx = build_and_load(spark, small, d, n_segments=2, n_buckets=2, n_units=1)
    register_queries(idx, QUERIES)
    victim = [r["doc_id"] for r in small.select("doc_id").limit(1).collect()]
    delete_docs(spark, d, victim)  # bumps meta.gen
    fresh = InvertedIndex(spark, d)
    with pytest.raises(ValueError, match="stale"):
        percolate_stored(fresh)
    refresh_registrations(fresh)  # re-resolves vocab, re-stamps gen
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate_stored(fresh).collect()
    }
    survivors = small.filter(~small.doc_id.isin(victim))
    assert got == _brute(survivors, QUERIES)
