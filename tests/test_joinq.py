"""Join-field queries — has_child/nested pinned against a brute-force
Python BM25 over the collected child table; has_parent against the
already-pinned parent scorer plus a pandas replay of the join.
"""

import math

import pytest

from sparksearch.analyze import tokenize_str
from sparksearch.ops.chunking import chunk_table
from sparksearch.query import joinq
from sparksearch.query.bm25 import SCORE_ROUND, bm25_scores_df
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]} {_V[7]}"
K = 12


@pytest.fixture(scope="module")
def kids(corpus):
    c = chunk_table(corpus, size=32).cache()
    c.count()
    return c


@pytest.fixture(scope="module")
def kid_rows(kids):
    return [
        (r["doc_id"], r["chunk_idx"], tokenize_str(r["chunk_text"]))
        for r in kids.collect()
    ]


def _brute_child_scores(kid_rows, terms):
    """(parent, idx) → (raw, n_matched) under child-corpus BM25."""
    n_docs = len(kid_rows)
    avgdl = sum(len(t) for _, _, t in kid_rows) / n_docs
    df = {t: 0 for t in terms}
    tfs = []
    for pid, idx, toks in kid_rows:
        tf = {t: toks.count(t) for t in terms if t in toks}
        for t in tf:
            df[t] += 1
        tfs.append((pid, idx, len(toks), tf))
    out = {}
    for pid, idx, dl, tf in tfs:
        if not tf:
            continue
        raw = sum(
            math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            * n / (n + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
            for t, n in tf.items()
        )
        out[(pid, idx)] = (raw, len(tf))
    return out


def _rollup(scores, need, mode):
    perp = {}
    for (pid, _), (raw, nm) in scores.items():
        if nm >= need:
            perp.setdefault(pid, []).append(raw)
    agg = {"max": max, "sum": sum, "min": min,
           "avg": lambda v: sum(v) / len(v)}[mode]
    rows = [(pid, agg(v), len(v)) for pid, v in perp.items()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return [(p, round(r, SCORE_ROUND), n) for p, r, n in rows[:K]]


@pytest.mark.parametrize("mode", ["max", "sum", "avg"])
def test_has_child_modes(kids, kid_rows, mode):
    terms = sorted(set(tokenize_str(QUERY)))
    want = _rollup(_brute_child_scores(kid_rows, terms), 1, mode)
    got = joinq.has_child_topk(kids, QUERY, K, score_mode=mode).collect()
    assert [(r["doc_id"], r["score"], r["n_children"]) for r in got] == [
        (p, pytest.approx(s, abs=10**-SCORE_ROUND), n) for p, s, n in want
    ]


def test_nested_conjunction(kids, kid_rows):
    terms = sorted(set(tokenize_str(QUERY)))
    want = _rollup(_brute_child_scores(kid_rows, terms), len(terms), "max")
    got = joinq.nested_topk(kids, QUERY, K).collect()
    assert [(r["doc_id"], r["n_children"]) for r in got] == [
        (p, n) for p, _, n in want
    ]
    # conjunction is strictly narrower than the OR rollup
    n_or = joinq.has_child_topk(kids, QUERY, 10**6).count()
    n_and = joinq.nested_topk(kids, QUERY, 10**6).count()
    assert 0 < n_and < n_or


def test_has_parent(corpus, kids):
    pscores = {
        r["doc_id"]: r["raw"]
        for r in bm25_scores_df(corpus, QUERY).collect()
    }
    crows = [(r["doc_id"], r["chunk_idx"]) for r in kids.collect()]
    want = sorted(
        ((pid, idx, pscores[pid]) for pid, idx in crows if pid in pscores),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:K]
    got = joinq.has_parent_topk(kids, corpus, QUERY, K).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["score"]) for r in got] == [
        (p, i, pytest.approx(round(s, SCORE_ROUND), abs=1e-9))
        for p, i, s in want
    ]


def test_has_parent_childless_parents(spark, corpus, kids):
    """Parents with no children occupy top ranks but contribute no
    rows — the adaptive probe must widen past them instead of
    returning a short result (the failure mode of a naive top-k
    parent cut)."""
    pscores = {
        r["doc_id"]: r["raw"]
        for r in bm25_scores_df(corpus, QUERY).collect()
    }
    # keep children only for the WORST half of the matching parents:
    # every top-k parent by score is childless
    ranked = sorted(pscores, key=lambda p: (-pscores[p], p))
    childless = set(ranked[: len(ranked) // 2])
    sparse_kids = kids.filter(
        ~kids["doc_id"].isin([int(p) for p in childless])
    )
    crows = [
        (r["doc_id"], r["chunk_idx"])
        for r in sparse_kids.select("doc_id", "chunk_idx").collect()
    ]
    want = sorted(
        ((pid, idx, pscores[pid]) for pid, idx in crows if pid in pscores),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:K]
    assert want, "fixture must leave some matching parents with children"
    got = joinq.has_parent_topk(sparse_kids, corpus, QUERY, K).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["score"]) for r in got] == [
        (p, i, pytest.approx(round(s, SCORE_ROUND), abs=1e-9))
        for p, i, s in want
    ]


def test_has_parent_broadcast_is_literal_topk(spark, corpus, kids):
    """The broadcast side must be a ≤m-row literal relation (the top
    parents), never the full BM25 match-set frame (r4 defect: a
    head-term parent query broadcast a corpus-sized frame)."""
    df = joinq.has_parent_topk(kids, corpus, QUERY, K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the build side comes from a LocalTableScan (collected literal
    # rows), not from the scoring subtree
    assert "LocalTableScan" in plan
    assert "SortMergeJoin" not in plan


def test_edges(kids):
    assert joinq.has_child_topk(kids, "...,;!").count() == 0
    with pytest.raises(ValueError):
        joinq.has_child_topk(kids, QUERY, score_mode="median")
