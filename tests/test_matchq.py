"""match operator/minimum_should_match, _count, _explain, _analyze,
simple_query_string, regexp, boosting, dis_max tie_breaker.

Engine paths are pinned rank-identical to their exhaustive twins; the
membership/scoring rules are pinned against brute-force recomputation
over the tokenized corpus.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.index import lexicon as lx
from sparksearch.query import matchq, termq
from sparksearch.query.bm25 import bm25_scores_df
from sparksearch.query.rank import boosting_topk, boosting_search


@pytest.fixture(scope="module")
def lexed_index(spark, corpus, built_index):
    lx.build_lexicon(spark, corpus, built_index.index_dir)
    return built_index


@pytest.fixture(scope="module")
def toksets(corpus):
    """{doc_id: set(tokens)} brute-force ground truth."""
    return {
        r["doc_id"]: set(tokenize_str(r["text"]))
        for r in corpus.select("doc_id", "text").collect()
    }


@pytest.fixture(scope="module")
def probe_terms(toksets):
    """Three corpus terms guaranteed to co-occur in ≥1 doc."""
    for ts in toksets.values():
        if len(ts) >= 3:
            return sorted(ts)[:3]
    pytest.skip("no doc with 3 distinct terms")


def _rows(df):
    return [(r[0], r[1]) for r in df.collect()]


# -- operator / minimum_should_match ----------------------------------------
def test_and_requires_every_term(corpus, toksets, probe_terms):
    q = " ".join(probe_terms)
    hits = matchq.match_topk(corpus, q, k=1000, operator="and").collect()
    assert hits, "AND over co-occurring terms must match"
    for r in hits:
        assert set(probe_terms) <= toksets[r["doc_id"]]


def test_msm_membership_and_monotonicity(corpus, toksets, probe_terms):
    q = " ".join(probe_terms)
    ids_by_need = {}
    for need in (1, 2, 3):
        rows = matchq.match_topk(
            corpus, q, k=10_000, minimum_should_match=need
        ).collect()
        ids_by_need[need] = {r["doc_id"] for r in rows}
        for r in rows:
            assert len(set(probe_terms) & toksets[r["doc_id"]]) >= need
    assert ids_by_need[3] <= ids_by_need[2] <= ids_by_need[1]
    # brute-force membership at need=2
    want = {d for d, ts in toksets.items() if len(set(probe_terms) & ts) >= 2}
    assert ids_by_need[2] == want


def test_msm_above_term_count_matches_nothing(corpus, probe_terms):
    q = " ".join(probe_terms)
    out = matchq.match_topk(corpus, q, k=10, minimum_should_match=99)
    assert out.count() == 0


def test_and_with_msm_rejected(corpus):
    with pytest.raises(ValueError):
        matchq.match_topk(corpus, "a b", operator="and", minimum_should_match=2)


def test_match_search_equals_exhaustive(corpus, built_index, probe_terms):
    q = " ".join(probe_terms)
    for kw in (dict(operator="and"), dict(minimum_should_match=2), dict()):
        ex = _rows(matchq.match_topk(corpus, q, k=10, **kw))
        en = _rows(matchq.match_search(built_index, q, k=10, **kw))
        assert en == ex, kw


def test_match_scoring_unchanged_by_operator(corpus, probe_terms):
    """operator gates membership, never rescoring: AND hits keep their
    OR scores."""
    q = " ".join(probe_terms)
    or_scores = dict(_rows(matchq.match_topk(corpus, q, k=10_000)))
    for d, s in _rows(matchq.match_topk(corpus, q, k=10_000, operator="and")):
        assert or_scores[d] == s


# -- _count ------------------------------------------------------------------
def test_match_count(corpus, built_index, toksets, probe_terms):
    q = " ".join(probe_terms)
    want = sum(1 for ts in toksets.values() if set(probe_terms) & ts)
    assert matchq.match_count(corpus, q).collect()[0]["count"] == want
    assert (
        matchq.match_count_indexed(built_index, q).collect()[0]["count"] == want
    )


# -- _explain ----------------------------------------------------------------
def test_explain_contributions_sum_to_score(corpus, toksets, probe_terms):
    q = " ".join(probe_terms)
    doc = next(d for d, ts in toksets.items() if set(probe_terms) <= ts)
    rows = matchq.explain_score(corpus, q, doc).collect()
    assert [r["term"] for r in rows] == sorted(set(probe_terms) & toksets[doc])
    total = sum(r["contribution"] for r in rows)
    raw = (
        bm25_scores_df(corpus, q)
        .filter(F.col("doc_id") == doc)
        .collect()[0]["raw"]
    )
    assert abs(total - raw) < 1e-4  # EXPLAIN_ROUND accumulation


# -- _analyze ----------------------------------------------------------------
def test_analyze_positions(corpus):
    r0 = corpus.select("doc_id", "text").orderBy("doc_id").first()
    rows = matchq.analyze_doc(corpus, r0["doc_id"]).collect()
    want = tokenize_str(r0["text"])
    assert [r["token"] for r in rows] == want
    assert [r["position"] for r in rows] == list(range(len(want)))


# -- simple_query_string ------------------------------------------------------
def test_parse_simple_query():
    got = matchq.parse_simple_query("+a -b c d +e -")
    assert got == {"must": ["a", "e"], "should": ["c", "d"], "must_not": ["b"]}
    got = matchq.parse_simple_query("a b -c", default_operator="and")
    assert got == {"must": ["a", "b"], "should": [], "must_not": ["c"]}
    with pytest.raises(ValueError):
        matchq.parse_simple_query("a", default_operator="xor")


def test_sqs_engine_equals_exhaustive(corpus, built_index, probe_terms):
    a, b, c = probe_terms
    q = f"+{a} -{b} {c}"
    ex = _rows(matchq.simple_query_string_topk(corpus, q, k=10))
    en = _rows(matchq.simple_query_string_search(built_index, q, k=10))
    assert en == ex
    assert ex, "+required with co-occurring optional must match"


def test_sqs_prohibited_excluded(corpus, toksets, probe_terms):
    a, b = probe_terms[0], probe_terms[1]
    hits = matchq.simple_query_string_topk(
        corpus, f"+{a} -{b}", k=100_000
    ).collect()
    for r in hits:
        ts = toksets[r["doc_id"]]
        assert a in ts and b not in ts


# -- regexp -------------------------------------------------------------------
def test_regexp_subset_validation():
    with pytest.raises(ValueError):
        termq._check_regexp("a{2,3}")
    with pytest.raises(ValueError):
        termq._check_regexp("a\\d")
    with pytest.raises(ValueError):
        termq._check_regexp("a(b")
    assert termq._check_regexp("a(b|c)d*") == "^a(b|c)d*$"


def test_regexp_literal_head():
    assert termq._regexp_literal_head("scan") == "scan"
    assert termq._regexp_literal_head("sc.n") == "sc"
    assert termq._regexp_literal_head("sc*n") == "s"  # * binds the c
    assert termq._regexp_literal_head("sc?n") == "s"
    assert termq._regexp_literal_head("sc+n") == "s"
    assert termq._regexp_literal_head("ab|cd") == ""  # alternation voids
    # conservative: | ANYWHERE voids the head, even inside a group
    assert termq._regexp_literal_head("a(b|c)") == ""
    assert termq._regexp_literal_head("a(bc)d") == "a"
    assert termq._regexp_literal_head("[ab]c") == ""


def test_regexp_engine_equals_exhaustive(corpus, lexed_index, toksets):
    vocab = sorted({t for ts in toksets.values() for t in ts})
    head = vocab[0][0]
    for pat in (f"{head}.*", f"{vocab[0]}|{vocab[-1]}"):
        ex = _rows(termq.regexp_topk(corpus, pat, k=20))
        en = _rows(termq.regexp_search(lexed_index, pat, k=20))
        assert en == ex, pat
    assert ex, "head pattern must match something"


def test_regexp_alternation_complete(corpus, lexed_index, toksets):
    """``x|z`` docs holding ONLY the later alternative must survive the
    (disabled) literal-head pruning."""
    vocab = sorted({t for ts in toksets.values() for t in ts})
    a, z = vocab[0], vocab[-1]
    only_z = {d for d, ts in toksets.items() if z in ts and a not in ts}
    if not only_z:
        pytest.skip("no doc with only the z term")
    got = {
        r["doc_id"]
        for r in termq.regexp_search(lexed_index, f"{a}|{z}", k=100_000).collect()
    }
    assert only_z <= got


# -- boosting -----------------------------------------------------------------
def test_boosting_demotes_negative_matches(corpus, toksets, probe_terms):
    pos, neg = probe_terms[0], probe_terms[1]
    base = dict(_rows(bm25_scores_df(corpus, pos).select(
        "doc_id", F.round("raw", 4).alias("s"))))
    out = dict(_rows(boosting_topk(corpus, pos, neg, k=100_000,
                                   negative_boost=0.5)))
    assert set(out) == set(base)  # membership from the positive leg only
    for d, s in out.items():
        if neg in toksets[d]:
            assert abs(s - round(base[d] * 0.5, 4)) <= 1e-9 or \
                abs(s - round(base[d] / 2, 4)) <= 2e-4
        else:
            assert s == base[d]


def test_boosting_engine_equals_exhaustive(corpus, built_index, probe_terms):
    pos = " ".join(probe_terms[:2])
    neg = probe_terms[2]
    ex = _rows(boosting_topk(corpus, pos, neg, k=10))
    en = _rows(boosting_search(built_index, pos, neg, k=10))
    assert en == ex


# -- dis_max tie_breaker --------------------------------------------------------
def test_dismax_tiebreaker(spark, corpus, tmp_path_factory, probe_terms):
    from sparksearch.analyze import tokens_col
    from sparksearch.index.build import build_index
    from sparksearch.query.topk import InvertedIndex, best_fields_search

    title = F.concat_ws(" ", F.slice(tokens_col("text"), 1, 4))
    two = corpus.select("doc_id", title.alias("title"), "text")
    d = str(tmp_path_factory.mktemp("dmx") / "index")
    build_index(spark, two, d, fields=["title", "text"],
                n_segments=4, n_buckets=4, n_units=2)
    idx = InvertedIndex(spark, d)
    q = " ".join(probe_terms)
    tb = 0.3
    per = {
        f: dict(_rows(idx.score_all(q, field=f))) for f in ("title", "text")
    }
    want = {}
    for doc in set(per["title"]) | set(per["text"]):
        ss = [per[f].get(doc, None) for f in ("title", "text")]
        ss = [s for s in ss if s is not None]
        want[doc] = max(ss) + tb * (sum(ss) - max(ss))
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _rows(best_fields_search(idx, q, k=10, tie_breaker=tb))
    assert [(d, round(s, 6)) for d, s in got] == [
        (d, round(s, 6)) for d, s in top
    ]
    # tb=0 degenerates to the classic best_fields page
    got0 = _rows(best_fields_search(idx, q, k=10))
    want0 = sorted(
        ((d, max(s for s in (per["title"].get(d), per["text"].get(d))
                 if s is not None))
         for d in set(per["title"]) | set(per["text"])),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert [(d, round(s, 6)) for d, s in got0] == [
        (d, round(s, 6)) for d, s in want0
    ]


def test_match_bool_prefix_three_engines(spark, corpus, built_index):
    """Exhaustive == engine (score_all + lexicon rewrite) == DuckDB
    across: term+prefix, bare prefix, OOV leading term (bool should —
    the other clauses still match), dead prefix, empty."""
    import duckdb
    import os

    from sparksearch.index.lexicon import build_lexicon, lexicon_path
    from sparksearch.query.matchq import (
        match_bool_prefix_search,
        match_bool_prefix_sql,
        match_bool_prefix_topk,
    )
    from sparksearch.synth import make_vocab

    if not os.path.isdir(lexicon_path(built_index.index_dir)):
        build_lexicon(spark, corpus, built_index.index_dir)
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    v = make_vocab(100)
    cases = [
        v[0] + " " + v[1][:2],
        v[0][:2],
        "zzz_oov " + v[0][:2],
        v[0] + " zzzqq",
        "",
    ]
    for q in cases:
        a = [(r.doc_id, r.score) for r in match_bool_prefix_topk(corpus, q, 7).collect()]
        b = [
            (r.doc_id, r.score)
            for r in match_bool_prefix_search(built_index, q, 7).collect()
        ]
        assert a == b, (q, a[:3], b[:3])
        if q.strip():
            c = [tuple(x) for x in con.sql(match_bool_prefix_sql(q, 7)).fetchall()]
            assert a == c, (q, a[:3], c[:3])


# ---------------------------------------------------------------------------
# match with fuzziness
# ---------------------------------------------------------------------------

class TestMatchFuzzy:
    def test_union_or_bm25_semantics(self, spark, corpus):
        """match_fuzzy ≡ bm25 over the distinct union of the per-term
        exhaustive expansions (the module pin)."""
        from sparksearch.index.lexicon import auto_fuzziness
        from sparksearch.query.bm25 import bm25_topk_df
        from sparksearch.query.termq import _expand_fuzzy_exhaustive
        from sparksearch.synth import make_vocab

        v = make_vocab(100)
        q = f"{v[0]} {v[7]}"
        union = set()
        for t in sorted({v[0], v[7]}):
            union.update(_expand_fuzzy_exhaustive(
                corpus, t, auto_fuzziness(t), 50, "text", "ascii"))
        assert len(union) > 2, "expansions must be non-trivial"
        got = matchq.match_fuzzy_topk(corpus, q, 10).collect()
        want = bm25_topk_df(corpus, " ".join(sorted(union)), 10).collect()
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in want
        ]
        assert got

    def test_duckdb_parity(self, spark, corpus):
        import duckdb
        from sparksearch.synth import make_vocab

        v = make_vocab(100)
        con = duckdb.connect()
        con.register("documents", corpus.toPandas())
        for q, me in [(f"{v[0]} {v[7]}", None), (v[3], 1),
                      ("zzqqzzyy", None), ("", None)]:
            ex = matchq.match_fuzzy_topk(corpus, q, 10, max_edits=me).collect()
            oq = con.execute(
                matchq.match_fuzzy_sql(q, 10, max_edits=me)
            ).fetchall()
            assert [(r.doc_id, round(r.score, 6)) for r in ex] == [
                (d, round(s, 6)) for d, s in oq
            ], q

    def test_engine_parity(self, spark, corpus, lexed_index):
        from sparksearch.synth import make_vocab

        v = make_vocab(100)
        q = f"{v[0]} {v[7]}"
        ex = matchq.match_fuzzy_topk(corpus, q, 10).collect()
        ix = matchq.match_fuzzy_search(lexed_index, q, 10).collect()
        assert [(r.doc_id, r.score) for r in ex] == [
            (r.doc_id, r.score) for r in ix
        ]
        assert ex
        # all-OOV-with-no-expansions query -> canonical empty
        assert matchq.match_fuzzy_search(lexed_index, "zzqqzzyy", 10).count() == 0

    def test_zero_edits_is_plain_match(self, spark, corpus):
        """max_edits=0 expands each in-vocab term to itself only ⇒
        identical to the plain OR match (bm25_topk_df)."""
        from sparksearch.query.bm25 import bm25_topk_df
        from sparksearch.synth import make_vocab

        v = make_vocab(100)
        q = f"{v[0]} {v[7]}"
        got = matchq.match_fuzzy_topk(corpus, q, 10, max_edits=0).collect()
        want = bm25_topk_df(corpus, q, 10).collect()
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in want
        ]
