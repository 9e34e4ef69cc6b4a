"""best_fields multi-field search (reference Q4: multi_match dis-max)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearch.pipeline import build_and_load
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.query.topk import best_fields_search
from sparksearch.synth import generate_docs, make_vocab


@pytest.fixture(scope="module")
def two_field_corpus(spark):
    """(doc_id, title, text): title = a deterministic token slice."""
    docs = generate_docs(spark, 300, seed=11, vocab_size=500).filter(
        "text is not null"
    )
    toks = F.array_remove(F.split(F.lower("text"), "[^a-z0-9]+"), "")
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, 1, 4)).alias("title"),
        "text",
    ).cache()


@pytest.fixture(scope="module")
def field_indexes(spark, two_field_corpus, tmp_path_factory):
    """Legacy shape: one index per field (still supported)."""
    base = tmp_path_factory.mktemp("mf")
    out = {}
    for field in ("title", "text"):
        d = str(base / field)
        out[field] = build_and_load(
            spark,
            two_field_corpus.select("doc_id", F.col(field).alias("text")),
            d,
            n_segments=4,
            n_buckets=4,
            n_units=1,
        )
    return out


@pytest.fixture(scope="module")
def single_mf_index(spark, two_field_corpus, tmp_path_factory):
    """Canonical shape (VERDICT r3 ask #7): ONE build, both fields."""
    from sparksearch.index.build import build_index
    from sparksearch.query.topk import InvertedIndex

    d = str(tmp_path_factory.mktemp("mf1") / "idx")
    build_index(
        spark, two_field_corpus, d, fields=["title", "text"],
        n_segments=4, n_buckets=4, n_units=1,
    )
    return InvertedIndex(spark, d)


def _oracle_best_fields(corpus, q, k):
    """dis-max of per-field exhaustive BM25 (Phase-1 path as oracle).

    Raw (unrounded) per-field scores — rounding before the max can flip
    near-ties that the engine (which maxes raw scores) orders correctly.
    """
    t = bm25_topk_df(
        corpus.select("doc_id", F.col("title").alias("text")), q, 1000,
        round_scores=False,
    ).withColumnRenamed("score", "s")
    x = bm25_topk_df(
        corpus.select("doc_id", "text"), q, 1000, round_scores=False
    ).withColumnRenamed("score", "s")
    allc = t.unionByName(x)
    return (
        allc.groupBy("doc_id")
        .agg(F.max("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


@pytest.mark.parametrize("qi", [0, 7, 42])
def test_best_fields_matches_oracle(two_field_corpus, field_indexes, qi):
    v = make_vocab(500)
    q = f"{v[qi]} {v[qi + 3]}"
    k = 5
    got = [
        (r["doc_id"], round(r["score"], 4))
        for r in best_fields_search(field_indexes, q, k=k).collect()
    ]
    # oracle fetched past k so boundary ties are visible
    want_ext = [
        (r["doc_id"], round(r["score"], 4))
        for r in _oracle_best_fields(two_field_corpus, q, k + 5).collect()
    ]
    want = want_ext[:k]
    # rounded score sequence must agree exactly; doc_ids must agree at
    # every rank whose rounded score is unique in the extended oracle
    # list (docs tied to 4 decimals may legally permute: the two paths
    # sum float64 in different orders, and dis-max compares across fields)
    gs = [s for _, s in got]
    ws = [s for _, s in want]
    assert gs == ws
    ext_scores = [s for _, s in want_ext]
    for (gd, s), (wd, _) in zip(got, want):
        if ext_scores.count(s) == 1:
            assert gd == wd, (got, want_ext)


@pytest.mark.parametrize("qi", [0, 7, 42])
def test_single_index_best_fields_matches_oracle(
    two_field_corpus, single_mf_index, qi
):
    """ONE multi-field build answers dis-max identically to the oracle
    (and, transitively, to the two-index form)."""
    v = make_vocab(500)
    q = f"{v[qi]} {v[qi + 3]}"
    k = 5
    got = [
        (r["doc_id"], round(r["score"], 4))
        for r in best_fields_search(single_mf_index, q, k=k).collect()
    ]
    want_ext = [
        (r["doc_id"], round(r["score"], 4))
        for r in _oracle_best_fields(two_field_corpus, q, k + 5).collect()
    ]
    want = want_ext[:k]
    assert [s for _, s in got] == [s for _, s in want]
    ext_scores = [s for _, s in want_ext]
    for (gd, s), (wd, _) in zip(got, want):
        if ext_scores.count(s) == 1:
            assert gd == wd, (got, want_ext)


def test_single_index_per_field_matches_exhaustive(
    two_field_corpus, single_mf_index
):
    """Field-scoped search over the shared build == exhaustive BM25 over
    that field's corpus (per-field N/avgdl/df all correctly namespaced)."""
    v = make_vocab(500)
    q = f"{v[0]} {v[3]}"
    for field in ("title", "text"):
        got = [
            (r["doc_id"], round(r["score"], 4))
            for r in single_mf_index.search(q, 5, field=field).collect()
        ]
        want = [
            (r["doc_id"], r["score"])
            for r in bm25_topk_df(
                two_field_corpus.select("doc_id", F.col(field).alias("text")), q, 5
            ).collect()
        ]
        assert got == want, (field, got, want)


def test_multifield_upsert_equals_rebuild(spark, two_field_corpus, tmp_path_factory):
    """build(old) + upsert(delta) on a multi-field index == build(all):
    per-field stats and dis-max answers identical."""
    from sparksearch.index.build import build_index
    from sparksearch.index.upsert import upsert_index
    from sparksearch.query.topk import InvertedIndex

    base = tmp_path_factory.mktemp("mf_up")
    stale = F.pmod(F.col("doc_id"), F.lit(7)) == 0
    old = two_field_corpus.withColumn(
        "title", F.when(stale, F.lit("stale title")).otherwise(F.col("title"))
    )
    delta = two_field_corpus.filter(stale)
    kw = dict(fields=["title", "text"], n_segments=4, n_buckets=4, n_units=1)
    build_index(spark, old, str(base / "up"), **kw)
    upsert_index(spark, delta, str(base / "up"))
    build_index(spark, two_field_corpus, str(base / "full"), **kw)
    u = InvertedIndex(spark, str(base / "up"))
    f = InvertedIndex(spark, str(base / "full"))
    assert u.meta["field_stats"] == f.meta["field_stats"]
    v = make_vocab(500)
    q = f"{v[0]} {v[3]}"
    a = [(r["doc_id"], round(r["score"], 4)) for r in best_fields_search(u, q, 5).collect()]
    b = [(r["doc_id"], round(r["score"], 4)) for r in best_fields_search(f, q, 5).collect()]
    assert a == b


def test_title_match_outranks_body_only(two_field_corpus, field_indexes):
    """A term present in a doc's (short) title scores far higher through the
    title field than through the long body — dis-max must surface it."""
    row = two_field_corpus.select("doc_id", "title").first()
    term = row["title"].split()[0]
    hits = best_fields_search(field_indexes, term, k=5).collect()
    assert len(hits) > 0
    title_docs = {
        r["doc_id"]
        for r in two_field_corpus.filter(
            F.array_contains(F.split(F.lower("title"), "[^a-z0-9]+"), term)
        ).collect()
    }
    assert hits[0]["doc_id"] in title_docs


def test_parse_field_boosts():
    from sparksearch.query.topk import parse_field_boosts

    names, boosts = parse_field_boosts(["title^2", "text", "tag^0.5"])
    assert names == ["title", "text", "tag"]
    assert boosts == {"title": 2.0, "tag": 0.5}


def test_boosted_best_fields_scales_before_combine(
    spark, two_field_corpus, single_mf_index
):
    """boosts multiply each field's scores BEFORE the dis_max combine:
    recompute from the unboosted per-field legs and compare, for both
    tie_breaker 0 (top-k page path) and 0.3 (full-scoring path)."""
    v = make_vocab(60)
    q = f"{v[0]} {v[1]}"
    idx = single_mf_index
    for tb in (0.0, 0.3):
        per = {}
        for f in ("title", "text"):
            leg = (idx.score_all(q, field=f) if tb
                   else idx.search(q, k=10, field=f))
            per[f] = {r["doc_id"]: r["score"] for r in leg.collect()}
        combined = {}
        for d in set(per["title"]) | set(per["text"]):
            s = [per["title"].get(d, 0.0) * 2.0, per["text"].get(d, 0.0)]
            mx, sm = max(s), sum(s)
            combined[d] = mx + tb * (sm - mx)
        want = sorted(combined.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = best_fields_search(
            idx, q, k=10, fields=["title^2", "text"], tie_breaker=tb
        ).collect()
        assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
            (d, round(s, 6)) for d, s in want
        ]
        assert got, tb
