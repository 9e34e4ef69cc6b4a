"""Federated multi-index search — the dfs_query_then_fetch identity:
sharding a corpus into N indices must not change any result.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch.pipeline import build_and_load
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.query.federate import search_multi
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
Q = f"{_V[0]} {_V[3]} {_V[7]}"


@pytest.fixture(scope="module")
def shards(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("fed")
    parts = [
        corpus.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)
    ]
    return [
        build_and_load(spark, p, str(root / f"shard_{i}"), n_units=2)
        for i, p in enumerate(parts)
    ]


def test_federation_identity(spark, corpus, built_index, shards):
    """3-way shard split ≡ the single whole-corpus index ≡ exhaustive."""
    whole = [
        (r["doc_id"], round(r["score"], 4))
        for r in built_index.search(Q, 10).collect()
    ]
    fed = [
        (r["doc_id"], round(r["score"], 4))
        for r in search_multi(shards, Q, 10).collect()
    ]
    exh = [
        (r["doc_id"], r["score"]) for r in bm25_topk_df(corpus, Q, 10).collect()
    ]
    assert fed == whole == exh


def test_term_missing_from_one_shard(spark, shards, corpus):
    """A term held by only some shards still gets the GLOBAL df."""
    # find a term present in shard 0's docs only (fall back: rare term)
    rows = corpus.select("doc_id", "text").collect()
    from sparksearch.analyze import tokenize_str

    by_shard = {0: set(), 1: set(), 2: set()}
    for r in rows:
        by_shard[r["doc_id"] % 3].update(tokenize_str(r["text"]))
    only0 = by_shard[0] - by_shard[1] - by_shard[2]
    if not only0:
        pytest.skip("no shard-exclusive term in this synth corpus")
    t = sorted(only0)[0]
    fed = [
        (r["doc_id"], round(r["score"], 4))
        for r in search_multi(shards, t, 5).collect()
    ]
    exh = [(r["doc_id"], r["score"]) for r in bm25_topk_df(corpus, t, 5).collect()]
    assert fed == exh and fed


def test_validation_and_empty(spark, shards):
    assert search_multi(shards, "zzzzqqqq").count() == 0
    with pytest.raises(ValueError):
        search_multi([], Q)
