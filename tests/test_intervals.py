"""intervals query: slotted-alternatives proximity — pinned
anchored-window tf, BM25 parity across the exhaustive Spark path, the
DuckDB twin, and the positional sidecar.  Reference behavior: the
OpenSearch/Lucene ``intervals`` query in the canonical
``all_of(ordered?, max_gaps, [any_of(...), ...])`` normal form."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.index.positions import build_positions
from sparksearch.query.intervals import (
    intervals_positional,
    intervals_sql,
    intervals_tf_col,
    intervals_topk,
)
from sparksearch.synth import make_vocab

_V = make_vocab(100)


@pytest.fixture(scope="module")
def pos_index(spark, corpus, built_index):
    build_positions(spark, corpus, built_index.index_dir)
    return built_index


def _model_tf(toks, slots, max_gaps, ordered):
    """Driver-side model of the pinned anchored-window intervals tf."""
    m = len(slots)
    if len(toks) < m:
        return 0
    hits = 0
    if ordered:
        for p in range(len(toks)):
            if toks[p] not in slots[0]:
                continue
            prev = p
            ok = True
            for g in slots[1:]:
                nxt = next(
                    (q for q in range(prev + 1, len(toks)) if toks[q] in g),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                prev = nxt
            if ok and prev <= p + m - 1 + max_gaps:
                hits += 1
        return hits
    members = {t for g in slots for t in g}
    w = m + max_gaps
    for p in range(len(toks)):
        if toks[p] not in members:
            continue
        win = toks[p : p + w]
        if all(any(x in g for x in win) for g in slots):
            hits += 1
    return hits


_ROWS = [
    (1, "a x b"),      # ordered gaps>=1: a..b; unordered gaps>=1 too
    (2, "b a"),        # unordered only
    (3, "a b"),        # adjacent: both orders, gaps=0
    (4, "c y d"),      # alternative members: c in slot0, d in slot1
    (5, "a c b d"),    # multiple anchors (a and c both slot0)
    (6, "a"),          # too short
    (7, "x y z"),      # no members
    (8, None),
]
_SLOTS = [["a", "c"], ["b", "d"]]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(_ROWS, "doc_id long, text string")


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("gaps", [0, 1, 3])
def test_tf_matches_model(tiny, ordered, gaps):
    got = {
        r["doc_id"]: r["tf"]
        for r in tiny.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            intervals_tf_col(
                F.split(F.col("text"), " "), _SLOTS, gaps, ordered=ordered
            ).alias("tf"),
        )
        .collect()
    }
    for doc_id, text in _ROWS:
        if text is None:
            continue
        toks = text.split(" ")
        want = _model_tf(
            toks, [set(g) for g in _SLOTS], gaps, ordered
        )
        assert got[doc_id] == want, (doc_id, ordered, gaps, got[doc_id], want)


@pytest.mark.parametrize("ordered", [True, False])
def test_duckdb_twin_parity(tiny, ordered):
    con = duckdb.connect()
    con.register("documents", tiny.toPandas())
    for gaps in (0, 2):
        a = intervals_topk(
            tiny, _SLOTS, 10, max_gaps=gaps, ordered=ordered
        ).toPandas()
        b = con.sql(
            intervals_sql(_SLOTS, 10, max_gaps=gaps, ordered=ordered)
        ).df()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True),
            check_dtype=False,
        )


@pytest.mark.parametrize("ordered", [True, False])
def test_positional_rank_identical(spark, corpus, pos_index, ordered):
    slots = [[_V[0], _V[7]], [_V[3], _V[11]]]
    a = [
        (r.doc_id, r.score)
        for r in intervals_topk(
            corpus, slots, 10, max_gaps=2, ordered=ordered
        ).collect()
    ]
    assert a, "corpus query must match something"
    b = [
        (r.doc_id, r.score)
        for r in intervals_positional(
            pos_index, slots, 10, max_gaps=2, ordered=ordered
        ).collect()
    ]
    assert a == b


def test_positional_oov_slot_is_empty(pos_index):
    out = intervals_positional(
        pos_index, [["zzzqqq"], [_V[0]]], 10, max_gaps=1
    )
    assert out.count() == 0


def test_positional_oov_alternative_drops(spark, corpus, pos_index):
    slots_clean = [[_V[0]], [_V[3]]]
    slots_oov = [[_V[0], "zzzqqq"], [_V[3]]]
    a = intervals_positional(pos_index, slots_clean, 10, max_gaps=2).collect()
    b = intervals_positional(pos_index, slots_oov, 10, max_gaps=2).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_validation():
    with pytest.raises(ValueError, match="disjoint"):
        intervals_sql([["a", "b"], ["b"]], 10)
    with pytest.raises(ValueError, match=">= 2 slots"):
        intervals_sql([["a"]], 10)
    with pytest.raises(ValueError, match="analyzer token"):
        intervals_sql([["a"], ["two words"]], 10)
    with pytest.raises(ValueError, match="max_gaps"):
        intervals_sql([["a"], ["b"]], 10, max_gaps=-1)
    with pytest.raises(ValueError, match="non-empty"):
        intervals_sql([["a"], []], 10)
