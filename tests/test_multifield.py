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
