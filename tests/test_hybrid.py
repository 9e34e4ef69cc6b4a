"""Hybrid retrieval (BM25 + vector fusion).

Pins (1) the RRF formula against a hand-computed fusion of the two
legs, (2) min-max normalization bounds and weighting, and (3) the
engine path (packed index + persisted HNSW) being fused-identical to
the exhaustive path — legs rank on ROUNDED scores, so the parity holds
whenever each leg's candidate set matches, which is exact at this
scale (ef_search covers every shard)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch.ops import similarity as sim
from sparksearch.ops.hybrid import (
    RRF_K,
    fuse_legs,
    hybrid_search,
    hybrid_search_indexed,
)
from sparksearch.query.bm25 import bm25_topk_df

QUERY = "scan filter join window"
K = 10
N_CAND = 30


@pytest.fixture(scope="module")
def corpus_emb(spark, corpus):
    """Embeddings keyed by (a deterministic subset of) corpus doc_ids."""
    ids = [r["doc_id"] for r in
           corpus.select("doc_id").orderBy("doc_id").limit(300).collect()]
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(len(ids), 16)).astype(np.float64)
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.persist().count()
    yield df
    df.unpersist()


def _leg_rank_map(leg_rows, id_key, score_key):
    ranked = sorted(leg_rows, key=lambda r: (-round(r[score_key], 4), r[id_key]))
    return {r[id_key]: i + 1 for i, r in enumerate(ranked)}


def test_rrf_matches_manual_fusion(spark, corpus, corpus_emb):
    qid = corpus_emb.select(F.min("vec_id")).first()[0]
    bm = bm25_topk_df(corpus, QUERY, N_CAND, round_scores=False).collect()
    vec = sim.cosine_topk(corpus_emb, qid, N_CAND).collect()
    rb = _leg_rank_map(bm, "doc_id", "score")
    rv = _leg_rank_map(vec, "vec_id", "cos")
    expect = {}
    for d, r in rb.items():
        expect[d] = expect.get(d, 0.0) + 1.0 / (RRF_K + r)
    for d, r in rv.items():
        expect[d] = expect.get(d, 0.0) + 1.0 / (RRF_K + r)
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    got = hybrid_search(corpus, corpus_emb, QUERY, qid, K,
                        n_candidates=N_CAND).collect()
    assert [(r["doc_id"], r["fused"]) for r in got] == [
        (d, round(s, 6)) for d, s in want
    ]


def test_minmax_bounds_and_weights(spark, corpus, corpus_emb):
    qid = corpus_emb.select(F.min("vec_id")).first()[0]
    rows = hybrid_search(corpus, corpus_emb, QUERY, qid, K,
                         n_candidates=N_CAND, method="minmax").collect()
    assert len(rows) == K
    assert all(0.0 <= r["fused"] <= 1.0 for r in rows)
    # weight 0 on the vector leg == pure (normalized) BM25 ranking
    only_bm = hybrid_search(corpus, corpus_emb, QUERY, qid, K,
                            n_candidates=N_CAND, method="minmax",
                            weights=[1.0, 0.0]).collect()
    bm = bm25_topk_df(corpus, QUERY, N_CAND, round_scores=False).collect()
    top_bm = sorted(bm, key=lambda r: (-round(r["score"], 4), r["doc_id"]))
    assert [r["doc_id"] for r in only_bm][: len(top_bm[:K])] == [
        r["doc_id"] for r in top_bm[:K]
    ]


def test_indexed_path_matches_exhaustive(spark, corpus, corpus_emb,
                                         built_index, tmp_path):
    qid = corpus_emb.select(F.min("vec_id")).first()[0]
    qv = corpus_emb.filter(F.col("vec_id") == qid).first()["embedding"]
    vdir = str(tmp_path / "vecidx")
    sim.build_vector_index(spark, corpus_emb, vdir)
    vidx = sim.open_vector_index(spark, vdir)
    for method in ("rrf", "minmax"):
        ex = hybrid_search(corpus, corpus_emb, QUERY, qid, K,
                           n_candidates=N_CAND, method=method).collect()
        ix = hybrid_search_indexed(built_index, vidx, QUERY, qv, K,
                                   n_candidates=N_CAND, method=method,
                                   exclude_vec_id=qid).collect()
        assert [(r["doc_id"], r["fused"]) for r in ex] == [
            (r["doc_id"], r["fused"]) for r in ix
        ], method


def test_missing_leg_doc_contributes_zero(spark):
    a = spark.createDataFrame([(1, 5.0), (2, 4.0)], "id long, s double")
    b = spark.createDataFrame([(2, 9.0), (3, 1.0)], "id long, s double")
    got = {r["doc_id"]: r["fused"]
           for r in fuse_legs([(a, "id", "s"), (b, "id", "s")], 10).collect()}
    assert got[1] == round(1.0 / (RRF_K + 1), 6)
    assert got[2] == round(1.0 / (RRF_K + 2) + 1.0 / (RRF_K + 1), 6)
    assert got[3] == round(1.0 / (RRF_K + 2), 6)


def test_unknown_method_raises(spark):
    a = spark.createDataFrame([(1, 5.0)], "id long, s double")
    with pytest.raises(ValueError):
        fuse_legs([(a, "id", "s")], 5, method="zscore")
