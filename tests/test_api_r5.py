"""_update_by_query / _mtermvectors / _rank_eval semantics."""

import pytest
from pyspark.sql import functions as F

from sparksearch.query.rankeval import rank_eval
from sparksearch.query.termvectors import mtermvectors, termvectors
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
K = 8


def test_update_by_query_equals_fresh_build(spark, corpus, tmp_path):
    """update_by_query(delta) ≡ a fresh index over the rewritten corpus."""
    from sparksearch.index.build import build_index
    from sparksearch.index.upsert import update_by_query
    from sparksearch.query.topk import InvertedIndex
    from sparksearch.analyze import tokens_col

    docs = corpus.select("doc_id", "text")
    d_upd, d_ref = str(tmp_path / "upd"), str(tmp_path / "ref")
    build_index(spark, docs, d_upd)
    update_by_query(
        spark, docs, d_upd, _V[2], {"text": f"text || ' {_V[5]}'"}
    )
    rewritten = docs.withColumn(
        "text",
        F.when(
            F.array_contains(tokens_col("text"), _V[2]),
            F.concat(F.col("text"), F.lit(f" {_V[5]}")),
        ).otherwise(F.col("text")),
    )
    build_index(spark, rewritten, d_ref)
    q = f"{_V[5]} {_V[0]}"
    a = [(r.doc_id, round(r.score, 4))
         for r in InvertedIndex(spark, d_upd).search(q, K).collect()]
    b = [(r.doc_id, round(r.score, 4))
         for r in InvertedIndex(spark, d_ref).search(q, K).collect()]
    assert a == b and a

    with pytest.raises(ValueError, match="operator"):
        update_by_query(spark, docs, d_upd, _V[2], {"text": "text"},
                        operator="xor")
    with pytest.raises(ValueError, match="set expression"):
        update_by_query(spark, docs, d_upd, _V[2], {})


def test_mtermvectors_equals_per_doc(spark, corpus):
    ids = [r["doc_id"] for r in corpus.select("doc_id").head(3)]
    batch = mtermvectors(corpus, ids + [999_999_999_999])
    rows = batch.collect()
    assert {r["doc_id"] for r in rows} == set(ids)  # missing id: no rows
    for i in ids:
        single = termvectors(corpus, i).collect()
        got = [
            (r["term"], r["tf"], r["df"], r["ttf"], r["positions"])
            for r in rows
            if r["doc_id"] == i
        ]
        want = [
            (r["term"], r["tf"], r["df"], r["ttf"], r["positions"])
            for r in single
        ]
        assert got == want and got
    with pytest.raises(ValueError, match="at least one"):
        mtermvectors(corpus, [])


def test_rank_eval_hand_computed(spark):
    """3-doc corpus with known ranking → hand-checked metrics."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha beta"), (3, "gamma delta")],
        ["doc_id", "text"],
    )
    # query 'alpha': doc 2 ranks first (higher tf, shorter norm), doc 1
    # second.  ratings: doc1 → 3, doc2 → 0, doc3 → 1 (never retrieved).
    ratings = spark.createDataFrame(
        [("q", 1, 3), ("q", 2, 0), ("q", 3, 1)],
        ["query_id", "doc_id", "rating"],
    )
    out = rank_eval(docs, {"q": "alpha"}, ratings, k=2).collect()
    assert len(out) == 1
    r = out[0]
    # retrieved = [2 (rating 0), 1 (rating 3)]
    assert r["precision"] == round(1 / 2, 4)
    assert r["mrr"] == round(1 / 2, 4)
    import math

    dcg = (2**3 - 1) / math.log2(2 + 1)      # rating 3 at rank 2
    idcg = (2**3 - 1) / math.log2(1 + 1) + (2**1 - 1) / math.log2(2 + 1)
    assert r["ndcg"] == round(dcg / idcg, 4)
