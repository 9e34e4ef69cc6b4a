"""Field sorting + search_after pagination: cursor ≡ offset algebra."""

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query.sortpage import page_cursor, sorted_hits
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]} {_V[7]}"
SORT = [("n", "desc")]
K = 7


@pytest.fixture(scope="module")
def sortable(corpus):
    return corpus.withColumn("n", F.length("text"))


def _total_order(sortable):
    """The full match set in (n desc, doc_id asc) order, via python."""
    terms = set(tokenize_str(QUERY))
    rows = [
        r
        for r in sortable.select("doc_id", "n", "text").collect()
        if terms & set(tokenize_str(r["text"]))
    ]
    return sorted(rows, key=lambda r: (-r["n"], r["doc_id"]))


def test_first_page_is_the_order_prefix(spark, sortable):
    want = [(r["doc_id"], r["n"]) for r in _total_order(sortable)[:K]]
    got = sorted_hits(sortable, QUERY, SORT, K).collect()
    assert [(r["doc_id"], r["n"]) for r in got] == want


def test_cursor_pages_tile_the_total_order(spark, sortable):
    """Walking pages via search_after reproduces the whole match set in
    order, with no overlaps or gaps — the OFFSET-equivalence the driver
    gate checks, across every page."""
    full = [(r["doc_id"], r["n"]) for r in _total_order(sortable)]
    walked, cursor = [], None
    while True:
        rows = sorted_hits(
            sortable, QUERY, SORT, K, search_after=cursor
        ).collect()
        if not rows:
            break
        walked.extend((r["doc_id"], r["n"]) for r in rows)
        cursor = page_cursor(rows, SORT)
    assert walked == full


def test_ties_break_on_doc_id_across_the_page_boundary(spark, sortable):
    # force ties: constant sort key → order must be pure doc_id asc
    const = sortable.withColumn("n", F.lit(1))
    p1 = sorted_hits(const, QUERY, SORT, K).collect()
    p2 = sorted_hits(
        const, QUERY, SORT, K, search_after=page_cursor(p1, SORT)
    ).collect()
    ids = [r["doc_id"] for r in p1 + p2]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)


def test_asc_direction_and_explicit_tiebreak(spark, sortable):
    got = sorted_hits(sortable, QUERY, [("n", "asc"), ("doc_id", "asc")], K).collect()
    want = sorted(
        ((r["doc_id"], r["n"]) for r in _total_order(sortable)),
        key=lambda t: (t[1], t[0]),
    )[:K]
    assert [(r["doc_id"], r["n"]) for r in got] == want


def test_oov_and_bad_direction(spark, sortable):
    assert sorted_hits(sortable, "zzzznotaword", SORT, K).count() == 0
    with pytest.raises(ValueError):
        sorted_hits(sortable, QUERY, [("n", "down")], K)
    with pytest.raises(ValueError):
        sorted_hits(sortable, QUERY, SORT, K, search_after=(1,))


def test_null_sort_values_excluded(spark, sortable):
    doc = sortable.withColumn(
        "n", F.when(F.pmod("doc_id", F.lit(2)) == 0, F.col("n"))
    )
    walked, cursor = [], None
    while True:
        rows = sorted_hits(doc, QUERY, SORT, K, search_after=cursor).collect()
        if not rows:
            break
        walked.extend(r["doc_id"] for r in rows)
        cursor = page_cursor(rows, SORT)
    # pinned: null sort values are excluded from sorted pages entirely
    assert walked and all(d % 2 == 0 for d in walked)
    want = [r[0] for r in _total_order(sortable) if r[0] % 2 == 0]
    assert walked == want
