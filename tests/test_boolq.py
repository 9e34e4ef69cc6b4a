"""bool query: combination rules + engine-path parity."""

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.query.boolq import bool_search, bool_topk
from sparksearch.query.bm25 import bm25_topk_df
from sparksearch.synth import make_vocab

_V = make_vocab(2000)
K = 10


def _tok_rows(corpus):
    return [
        (r["doc_id"], set(tokenize_str(r["text"])))
        for r in corpus.select("doc_id", "text").collect()
    ]


def test_must_is_conjunctive(spark, corpus):
    got = bool_topk(corpus, must=[_V[0], _V[3]], k=10_000).collect()
    want = {d for d, ts in _tok_rows(corpus) if _V[0] in ts and _V[3] in ts}
    assert {r["doc_id"] for r in got} == want and want


def test_must_not_excludes(spark, corpus):
    got = bool_topk(corpus, must=[_V[0]], must_not=[_V[3]], k=10_000).collect()
    want = {d for d, ts in _tok_rows(corpus) if _V[0] in ts and _V[3] not in ts}
    assert {r["doc_id"] for r in got} == want and want


def test_filter_matches_but_never_scores(spark, corpus):
    a = bool_topk(corpus, must=[_V[0]], filter=[_V[3]], k=10_000).collect()
    b = bool_topk(corpus, must=[_V[0], _V[3]], k=10_000).collect()
    # same doc set as the conjunction…
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b}
    # …but filter adds no score: every filtered score ≤ its must twin
    sb = {r["doc_id"]: r["score"] for r in b}
    assert all(r["score"] < sb[r["doc_id"]] for r in a)


def test_pure_should_needs_one_match_and_single_clause_is_match_query(
    spark, corpus
):
    # one should clause over one term == the plain match query
    a = bool_topk(corpus, should=[_V[0]], k=K).collect()
    b = bm25_topk_df(corpus, _V[0], K).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_should_adds_on_top_of_must(spark, corpus):
    base = {r["doc_id"]: r["score"]
            for r in bool_topk(corpus, must=[_V[0]], k=10_000).collect()}
    plus = bool_topk(corpus, must=[_V[0]], should=[_V[3]], k=10_000).collect()
    rows = _tok_rows(corpus)
    has3 = {d for d, ts in rows if _V[3] in ts}
    assert {r["doc_id"] for r in plus} == set(base)  # should never gates
    for r in plus:
        if r["doc_id"] in has3:
            assert r["score"] > base[r["doc_id"]]
        else:
            assert r["score"] == base[r["doc_id"]]


def test_minimum_should_match_two(spark, corpus):
    got = bool_topk(
        corpus, should=[_V[0], _V[3], _V[7]], minimum_should_match=2, k=10_000
    ).collect()
    rows = _tok_rows(corpus)
    want = {
        d
        for d, ts in rows
        if sum(1 for t in (_V[0], _V[3], _V[7]) if t in ts) >= 2
    }
    assert {r["doc_id"] for r in got} == want and want


def test_engine_parity(spark, corpus, built_index):
    cases = [
        dict(must=[f"{_V[0]} {_V[5]}"], should=[_V[3]], must_not=[_V[11]]),
        dict(must=[_V[0]], filter=[_V[3]]),
        dict(should=[_V[0], _V[3], _V[7]], minimum_should_match=2),
        dict(must=[_V[0]], must_not=["zzzznotaword"]),
    ]
    for case in cases:
        ex = bool_topk(corpus, k=K, **case).collect()
        ix = bool_search(built_index, k=K, **case).collect()
        assert len(ex) > 0, case
        assert [(r["doc_id"], r["score"]) for r in ex] == [
            (r["doc_id"], r["score"]) for r in ix
        ], case


def test_clauses_thread_the_analyzer():
    # regression: clause analysis must use the caller's analyzer, not
    # silently fall back to ascii (which strips non-Latin to fragments)
    from sparksearch.query.boolq import _clauses

    # Han ideographs tokenize as unigrams under the unicode analyzer
    got = _clauses(["café 東京"], None, None, None, "unicode")
    assert got == [(0, "must", ["café", "京", "東"])]  # 京 U+4EAC < 東 U+6771
    got_ascii = _clauses(["café 東京"], None, None, None, "ascii")
    assert got_ascii == [(0, "must", ["caf"])]


def test_empty_and_oov(spark, corpus, built_index):
    assert bool_topk(corpus, k=K).count() == 0
    assert bool_topk(corpus, must=["zzzznotaword"], k=K).count() == 0
    assert bool_search(built_index, must=["zzzznotaword"], k=K).count() == 0
    # an OOV must_not is vacuously satisfied
    a = bool_topk(corpus, must=[_V[0]], must_not=["zzzznotaword"], k=K).collect()
    b = bool_topk(corpus, must=[_V[0]], k=K).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_structured_filter_and_must_not(spark, corpus):
    from pyspark.sql import functions as F

    doc = corpus.withColumn("n", F.length("text"))
    med = doc.agg(F.expr("percentile_approx(n, 0.5)")).first()[0]
    rng = {"range": {"field": "n", "gte": 0, "lt": int(med)}}
    base = {r["doc_id"]: r["score"]
            for r in bool_topk(doc, must=[_V[0]], k=10_000).collect()}
    short = {r["doc_id"] for r in doc.filter(F.col("n") < med)
             .select("doc_id").collect()}
    got = bool_topk(doc, must=[_V[0]], filter=[rng], k=10_000).collect()
    # gate restricts candidates; scores (corpus-wide stats) unchanged
    assert {r["doc_id"] for r in got} == set(base) & short
    assert all(r["score"] == base[r["doc_id"]] for r in got)
    inv = bool_topk(doc, must=[_V[0]], must_not=[rng], k=10_000).collect()
    assert {r["doc_id"] for r in inv} == set(base) - short


def test_structured_null_field_never_matches(spark, corpus):
    from pyspark.sql import functions as F

    doc = corpus.withColumn(
        "n", F.when(F.pmod("doc_id", F.lit(2)) == 0, F.length("text"))
    )  # odd doc_ids: n is null
    rng = {"range": {"field": "n", "gte": 0}}
    kept = bool_topk(doc, must=[_V[0]], filter=[rng], k=10_000).collect()
    assert all(r["doc_id"] % 2 == 0 for r in kept) and kept
    # must_not on a null field KEEPS the doc
    inv = bool_topk(doc, must=[_V[0]], must_not=[rng], k=10_000).collect()
    assert {r["doc_id"] for r in inv} and all(
        r["doc_id"] % 2 != 0 for r in inv
    )


def test_structured_match_all_and_engine_parity(spark, corpus, built_index):
    from pyspark.sql import functions as F

    doc = corpus.withColumn("n", F.length("text"))
    med = doc.agg(F.expr("percentile_approx(n, 0.5)")).first()[0]
    rng = {"range": {"field": "n", "lt": int(med)}}
    ex_all = bool_topk(doc, filter=[rng], k=10_000).collect()
    assert ex_all and all(r["score"] == 0.0 for r in ex_all)
    ix_all = bool_search(built_index, filter=[rng], k=10_000, docs=doc).collect()
    assert [tuple(r) for r in ex_all] == [tuple(r) for r in ix_all]
    ex = bool_topk(doc, must=[_V[0]], filter=[rng], k=K).collect()
    ix = bool_search(built_index, must=[_V[0]], filter=[rng], k=K, docs=doc).collect()
    assert [tuple(r) for r in ex] == [tuple(r) for r in ix] and ex


def test_structured_rejected_in_scoring_context(spark, corpus, built_index):
    rng = {"range": {"field": "n", "lt": 10}}
    with pytest.raises(ValueError):
        bool_topk(corpus, must=[rng], k=K)
    with pytest.raises(ValueError):
        bool_search(built_index, must=[_V[0]], filter=[rng], k=K)  # no docs=


# ---------------------------------------------------------------------------
# match_phrase clauses inside bool
# ---------------------------------------------------------------------------

_PH = _V[0] + " " + _V[1]  # a bigram that occurs in the synth corpus


@pytest.fixture(scope="module")
def pos_built_index(spark, corpus, built_index):
    from sparksearch.index.positions import build_positions

    if not built_index.meta.get("has_positions"):
        build_positions(spark, corpus, built_index.index_dir)
    return built_index


def test_phrase_must_alone_is_match_phrase(spark, corpus):
    from sparksearch.query.phrase import match_phrase_topk

    a = bool_topk(corpus, must=[{"match_phrase": _PH}], k=10_000).collect()
    b = match_phrase_topk(corpus, _PH, 10_000).collect()
    assert [(r.doc_id, r.score) for r in a] == [
        (r.doc_id, r.score) for r in b
    ] and a


def test_phrase_must_not_and_filter(spark, corpus):
    from sparksearch.query.phrase import match_phrase_topk

    ph_docs = {r.doc_id for r in match_phrase_topk(corpus, _PH, 10_000).collect()}
    base = {r.doc_id: r.score
            for r in bool_topk(corpus, must=[_V[5]], k=10_000).collect()}
    ex = bool_topk(
        corpus, must=[_V[5]], must_not=[{"match_phrase": _PH}], k=10_000
    ).collect()
    assert {r.doc_id for r in ex} == set(base) - ph_docs
    assert all(r.score == base[r.doc_id] for r in ex)  # exclusion never scores
    ft = bool_topk(
        corpus, must=[_V[5]], filter=[{"match_phrase": _PH}], k=10_000
    ).collect()
    assert {r.doc_id for r in ft} == set(base) & ph_docs and ft
    assert all(r.score == base[r.doc_id] for r in ft)  # filter never scores


def test_phrase_should_adds_score(spark, corpus):
    from sparksearch.query.phrase import match_phrase_topk

    ph = {r.doc_id: r.score
          for r in match_phrase_topk(corpus, _PH, 10_000).collect()}
    base = {r.doc_id: r.score
            for r in bool_topk(corpus, must=[_V[5]], k=10_000).collect()}
    got = bool_topk(
        corpus, must=[_V[5]], should=[{"match_phrase": _PH}], k=10_000
    ).collect()
    assert {r.doc_id for r in got} == set(base)  # should never gates
    for r in got:
        want = base[r.doc_id] + ph.get(r.doc_id, 0.0)
        assert abs(r.score - want) < 2e-4, (r.doc_id, r.score, want)


def test_phrase_engine_and_sql_parity(spark, corpus, pos_built_index):
    import duckdb

    from sparksearch.query.boolq import bool_topk_sql

    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    cases = [
        dict(must=[_V[5]], should=[{"match_phrase": _PH}]),
        dict(must=[{"match_phrase": _PH}], must_not=[_V[11]]),
        dict(must=[_V[5]], filter=[{"match_phrase": _PH}]),
        dict(must=[_V[5]], must_not=[{"match_phrase": _PH}]),
        dict(should=[{"match_phrase": _PH}, {"match_phrase": "zzz_oov xq"}]),
        # request-shape dict body with slop, in scoring and filter slots
        dict(must=[{"match_phrase": {"query": _PH, "slop": 1}}]),
        dict(must=[_V[5]], filter=[{"match_phrase": {"query": _PH, "slop": 2}}]),
    ]
    for case in cases:
        ex = bool_topk(corpus, k=K, **case).collect()
        assert ex, case
        ix = bool_search(pos_built_index, k=K, **case).collect()
        assert [(r.doc_id, r.score) for r in ex] == [
            (r.doc_id, r.score) for r in ix
        ], case
        oq = con.execute(bool_topk_sql(k=K, **case)).fetchall()
        assert [(r.doc_id, round(r.score, 6)) for r in ex] == [
            (d, round(s, 6)) for d, s in oq
        ], case


def test_phrase_engine_requires_positions(spark, corpus, built_index):
    had = built_index.meta.pop("has_positions", None)
    try:
        with pytest.raises(ValueError, match="positions"):
            bool_search(
                built_index, must=[{"match_phrase": _PH}], k=K
            )
    finally:
        if had is not None:
            built_index.meta["has_positions"] = had


def test_phrase_slop_clause_widens_and_scores(spark, corpus, pos_built_index):
    """A ``{"match_phrase": {"query": ..., "slop": n}}`` clause uses the
    sloppy tf: the match set is a (weak) superset of the slop=0 clause's,
    a dict body with slop=0 is identical to the string body, and all
    three engines agree on the sloppy clause."""
    from sparksearch.query.boolq import bool_topk_sql

    exact = bool_topk(corpus, must=[{"match_phrase": _PH}], k=10_000).collect()
    as_dict = bool_topk(
        corpus, must=[{"match_phrase": {"query": _PH, "slop": 0}}], k=10_000
    ).collect()
    assert [(r.doc_id, r.score) for r in exact] == [
        (r.doc_id, r.score) for r in as_dict
    ]
    sloppy = bool_topk(
        corpus, must=[{"match_phrase": {"query": _PH, "slop": 2}}], k=10_000
    ).collect()
    assert {r.doc_id for r in exact} <= {r.doc_id for r in sloppy}

    import duckdb

    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    case = dict(must=[{"match_phrase": {"query": _PH, "slop": 2}}])
    ex = bool_topk(corpus, k=K, **case).collect()
    ix = bool_search(pos_built_index, k=K, **case).collect()
    assert ex and [(r.doc_id, r.score) for r in ex] == [
        (r.doc_id, r.score) for r in ix
    ]
    oq = con.execute(bool_topk_sql(k=K, **case)).fetchall()
    assert [(r.doc_id, round(r.score, 6)) for r in ex] == [
        (d, round(s, 6)) for d, s in oq
    ]
