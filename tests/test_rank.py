"""collapse + function_score: leader rules, boost algebra, bm25 refactor."""

import math

from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.query.rank import collapse_topk, function_score_topk
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
QUERY = f"{_V[0]} {_V[3]}"
K = 8


def _grouped(corpus):
    return corpus.withColumn(
        "grp", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    ).withColumn("n", F.length("text"))


def test_collapse_leaders_and_order(spark, corpus):
    doc = _grouped(corpus)
    full = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_df(doc, QUERY, 10_000).collect()
    }
    grp = {r["doc_id"]: r["grp"] for r in doc.select("doc_id", "grp").collect()}
    leaders = {}
    for d, s in full.items():
        g = grp[d]
        if g not in leaders or (s, -d) > (
            leaders[g][1], -leaders[g][0]
        ):
            leaders[g] = (d, s)
    want = sorted(
        ((d, g, s) for g, (d, s) in leaders.items()),
        key=lambda r: (-r[2], r[0]),
    )[:K]
    got = [
        (r["doc_id"], r["key"], r["score"])
        for r in collapse_topk(doc, QUERY, "grp", K).collect()
    ]
    assert got == want and got
    assert len({g for _, g, _ in got}) == len(got)  # one hit per group


def test_function_score_boost_algebra(spark, corpus):
    doc = _grouped(corpus)
    raw = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_df(
            doc, QUERY, 10_000, round_scores=False
        ).collect()
    }
    n = {r["doc_id"]: r["n"] for r in doc.select("doc_id", "n").collect()}
    want = sorted(
        (
            (round(s * math.log(1.0 + n[d]), 4), d)
            for d, s in raw.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:K]
    got = [
        (r["score"], r["doc_id"])
        for r in function_score_topk(doc, QUERY, "n", K).collect()
    ]
    assert got == want


def test_function_score_missing_field_sinks(spark, corpus):
    doc = corpus.withColumn(
        "n", F.when(F.pmod("doc_id", F.lit(2)) == 0, F.length("text"))
    )
    got = function_score_topk(doc, QUERY, "n", 10_000).collect()
    # missing=0 → factor ln(1) = 0 → odd-id docs score exactly 0
    assert {r["doc_id"] % 2 for r in got if r["score"] > 0} == {0}
    assert all(r["score"] == 0.0 for r in got if r["doc_id"] % 2 == 1)


def test_bm25_refactor_unchanged(spark, corpus):
    # bm25_topk_df over the extracted bm25_scores_df must equal the
    # python-reference BM25 (guards the shared-front refactor)
    terms = set(tokenize_str(QUERY))
    rows = [
        (r["doc_id"], tokenize_str(r["text"]))
        for r in corpus.collect()
        if r["text"] is not None
    ]
    n = len(rows)
    avgdl = sum(len(ts) for _, ts in rows) / n
    df = {t: sum(1 for _, ts in rows if t in ts) for t in terms}
    scored = []
    for d, ts in rows:
        s = 0.0
        for t in terms & set(ts):
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tf = ts.count(t)
            s += idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
        if s > 0:
            scored.append((-s, d))
    scored.sort()
    want = [(d, round(-s, 4)) for s, d in scored[:K]]
    got = [
        (r["doc_id"], r["score"]) for r in bm25_topk_df(corpus, QUERY, K).collect()
    ]
    assert got == want
