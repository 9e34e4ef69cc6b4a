"""geo_polygon / children / reverse_nested / collapse_inner_hits."""

import pytest
from pyspark.sql import functions as F

from sparksearch.ops.chunking import chunk_table
from sparksearch.query.geo import geo_polygon, polygon_contains_expr
from sparksearch.query.joinq import children_agg, reverse_nested_agg
from sparksearch.query.rank import collapse_inner_hits
from sparksearch.synth import make_vocab

_V = make_vocab(2000)


def test_geo_polygon_hand_points(spark):
    # unit square (0,0)-(10,10); in / out / boundary-ish points
    sq = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    pts = spark.createDataFrame(
        [
            (1, 5.0, 5.0),     # inside
            (2, 15.0, 5.0),    # north of it
            (3, 5.0, -1.0),    # west of it
            (4, -5.0, 5.0),    # south of it
            (5, 9.99, 9.99),   # inside, near corner
            (6, None, 5.0),    # null lat never matches
        ],
        ["doc_id", "lat", "lon"],
    )
    got = [r["doc_id"] for r in geo_polygon(pts, sq, 10).collect()]
    assert got == [1, 5]
    # concave chevron: the notch (2,5) is OUTSIDE
    chev = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 10.0), (5.0, 4.0)]
    pts2 = spark.createDataFrame(
        [(1, 7.0, 6.0), (2, 2.0, 5.0)], ["doc_id", "lat", "lon"]
    )
    assert [r["doc_id"] for r in geo_polygon(pts2, chev, 10).collect()] == [1]
    with pytest.raises(ValueError, match=">= 3"):
        polygon_contains_expr([(0.0, 0.0), (1.0, 1.0)])


def test_children_agg_counts_matching_parents_children(spark, corpus):
    kids = chunk_table(corpus, size=32)
    out = children_agg(kids, corpus, _V[0]).collect()[0]
    # independent recount
    from sparksearch.query.aggs import match_set

    m = match_set(corpus, _V[0]).select("doc_id")
    want = kids.join(m, "doc_id", "leftsemi")
    assert out["doc_count"] == want.count() > 0
    assert out["avg_metric"] == round(
        want.agg(F.avg("n_chunk_tokens")).collect()[0][0], 4
    )


def test_reverse_nested_counts_each_parent_once(spark, corpus):
    doc = corpus.withColumn(
        "source", F.pmod(F.col("doc_id"), F.lit(3)).cast("string")
    )
    kids = chunk_table(doc, size=16)  # several chunks per parent
    out = reverse_nested_agg(kids, doc, _V[0], "source", 10).collect()
    from sparksearch.query.aggs import match_set

    parents = (
        match_set(kids, _V[0], text_col="chunk_text")
        .select("doc_id").distinct()
    )
    total = parents.count()
    assert sum(r["doc_count"] for r in out) == total > 0
    # a parent with many matching chunks still counts once
    assert total <= doc.count()


def test_collapse_inner_hits_shape(spark, corpus):
    doc = corpus.withColumn(
        "grp", F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
    )
    q = f"{_V[0]} {_V[3]}"
    rows = collapse_inner_hits(doc, q, "grp", 3, 2).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    assert len(by_key) <= 3
    for hits in by_key.values():
        assert [h["hit_rank"] for h in hits] == list(range(1, len(hits) + 1))
        assert len(hits) <= 2
        scores = [h["score"] for h in hits]
        assert scores == sorted(scores, reverse=True)
    # group order: by leader score desc
    leaders = [r["score"] for r in rows if r["hit_rank"] == 1]
    assert leaders == sorted(leaders, reverse=True)
