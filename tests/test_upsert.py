"""Incremental upsert ≡ full rebuild (reference Q6: doc_as_upsert,
``keyword_search/functions/parsing_functions.py:137``)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparksearch.index.build import build_index
from sparksearch.index.manifest import read_meta
from sparksearch.index.upsert import upsert_index
from sparksearch.pipeline import prepare_corpus
from sparksearch.query.topk import InvertedIndex
from sparksearch.synth import generate_docs, make_vocab


def _read_sorted(spark, path, keys):
    pdf = spark.read.parquet(path).toPandas()
    return pdf.sort_values(keys, kind="stable").reset_index(drop=True)


def _assert_index_equal(spark, dir_a, dir_b):
    for sub, keys in [
        ("postings", ["term_id", "segment_id", "block_id"]),
        ("stats", ["term_id"]),
        ("doclens", ["doc_id"]),
    ]:
        a = _read_sorted(spark, f"{dir_a}/{sub}", keys)
        b = _read_sorted(spark, f"{dir_b}/{sub}", keys)
        a = a[sorted(a.columns)]
        b = b[sorted(b.columns)]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
    ma, mb = read_meta(dir_a), read_meta(dir_b)
    for key in ("n_docs", "total_tokens", "avgdl", "n_segments", "n_buckets"):
        assert ma[key] == mb[key], key


@pytest.fixture(scope="module")
def corpora(spark):
    """old corpus (with stale versions of some docs) + delta (true text,
    some updated, some brand-new) + the merged truth."""
    docs = generate_docs(spark, 300, seed=21, vocab_size=800)
    full = prepare_corpus(docs, lang=None, use_html=False).cache()
    ids = [r["doc_id"] for r in full.select("doc_id").orderBy("doc_id").collect()]
    updated = set(ids[::7])        # every 7th doc gets a stale old version
    new = set(ids[3::11])          # every 11th (offset) doc arrives only in the delta
    new -= updated
    upd_lit = F.lit(sorted(updated)).cast("array<long>")
    new_lit = F.lit(sorted(new)).cast("array<long>")
    old = full.withColumn(
        "text",
        F.when(
            F.array_contains(upd_lit, F.col("doc_id")),
            F.concat(F.lit("stale placeholder version "), F.col("text").substr(1, 40)),
        ).otherwise(F.col("text")),
    ).filter(~F.array_contains(new_lit, F.col("doc_id")))
    delta = full.filter(
        F.array_contains(upd_lit, F.col("doc_id"))
        | F.array_contains(new_lit, F.col("doc_id"))
    )
    assert delta.count() > 10
    return full, old.cache(), delta.cache()


def test_upsert_equals_rebuild(spark, corpora, tmp_path_factory):
    full, old, delta = corpora
    base = tmp_path_factory.mktemp("ups")
    kw = dict(n_segments=4, n_buckets=8, n_units=2)
    build_index(spark, full, str(base / "rebuild"), **kw)
    build_index(spark, old, str(base / "incr"), **kw)
    meta = upsert_index(spark, delta, str(base / "incr"))
    _assert_index_equal(spark, str(base / "rebuild"), str(base / "incr"))
    assert meta["n_docs"] == full.count()


def test_upsert_search_matches_fresh_index(spark, corpora, tmp_path_factory):
    full, old, delta = corpora
    base = tmp_path_factory.mktemp("upq")
    kw = dict(n_segments=4, n_buckets=8, n_units=2)
    build_index(spark, full, str(base / "fresh"), **kw)
    build_index(spark, old, str(base / "incr"), **kw)
    upsert_index(spark, delta, str(base / "incr"))
    fresh = InvertedIndex(spark, str(base / "fresh"))
    incr = InvertedIndex(spark, str(base / "incr"))
    v = make_vocab(100)
    for q in (v[0], f"{v[1]} {v[9]}", f"{v[3]} {v[20]} {v[50]}", "stale placeholder"):
        a = [(r["doc_id"], r["score"]) for r in fresh.search(q, 10).collect()]
        b = [(r["doc_id"], r["score"]) for r in incr.search(q, 10).collect()]
        assert a == b, q


def test_upsert_pure_insert_and_noop(spark, corpora, tmp_path_factory):
    """Inserting brand-new docs only, then an empty delta, stays exact."""
    full, old, delta = corpora
    base = tmp_path_factory.mktemp("upi")
    kw = dict(n_segments=4, n_buckets=8, n_units=2)
    build_index(spark, old.unionByName(delta.join(old.select("doc_id"), "doc_id", "anti")),
                str(base / "want"), **kw)
    build_index(spark, old, str(base / "got"), **kw)
    pure_new = delta.join(old.select("doc_id"), "doc_id", "left_anti")
    upsert_index(spark, pure_new, str(base / "got"))
    meta_before = read_meta(str(base / "got"))
    upsert_index(spark, pure_new.limit(0), str(base / "got"))  # no-op delta
    assert read_meta(str(base / "got")) == meta_before
    _assert_index_equal(spark, str(base / "want"), str(base / "got"))
