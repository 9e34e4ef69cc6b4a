"""span_near: anchored-window tf semantics, BM25 parity across the
exhaustive Spark path, the DuckDB twin, and the positional sidecar.
Reference behavior: Lucene span_near (ordered/unordered slop) that the
reference's OpenSearch `_search` bodies can express."""

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.index.positions import build_positions
from sparksearch.query.phrase import match_phrase_topk
from sparksearch.query.spans import (
    span_near_positional,
    span_near_sql,
    span_near_tf_col,
    span_near_topk,
)
from sparksearch.synth import make_vocab

_V = make_vocab(100)


@pytest.fixture(scope="module")
def pos_index(spark, corpus, built_index):
    build_positions(spark, corpus, built_index.index_dir)
    return built_index


def _stf(toks, terms, slop):
    """Driver-side model of the pinned unordered anchored-window tf."""
    m = len(terms)
    if len(toks) < m:
        return 0
    w = m + slop
    mult = Counter(terms)
    members = set(terms)
    hits = 0
    for i in range(len(toks)):
        if toks[i] not in members:
            continue
        win = toks[i : i + w]
        if all(win.count(u) >= c for u, c in mult.items()):
            hits += 1
    return hits


def test_span_tf_unordered_unit(spark):
    rows = [
        (1, "a b"),          # one forward-window anchor (i=0)
        (2, "b a"),          # unordered: 'b' anchors with 'a' in window
        (3, "a c b"),        # slop=0 window of 2 misses; slop=1 hits
        (4, "a a b"),        # duplicate clause needs multiplicity 2
        (5, "a b a"),        # two anchors at slop=0 for [a,b]
        (6, "a"),            # shorter than the clause count
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")

    def got(terms, slop):
        return {
            r["doc_id"]: r["tf"]
            for r in df.select(
                "doc_id",
                span_near_tf_col(toks, terms, slop).alias("tf"),
            ).collect()
        }

    for terms, slop in [(["a", "b"], 0), (["a", "b"], 1), (["a", "a"], 0),
                        (["a", "a"], 1), (["a", "b", "a"], 0)]:
        want = {
            d: _stf(t.split(" ") if t else [], terms, slop)
            for d, t in rows
        }
        assert got(terms, slop) == want, (terms, slop)
    # spot-pin the interesting cells against hand counts (anchors look
    # FORWARD only: "a b" has one [a,b] anchor, not two)
    assert got(["a", "b"], 0) == {1: 1, 2: 1, 3: 0, 4: 1, 5: 2, 6: 0, 7: 0}
    assert got(["a", "a"], 0)[4] == 1 and got(["a", "a"], 0)[5] == 0
    assert got(["a", "a"], 1)[5] == 1


def test_span_ordered_equals_sloppy_phrase(spark, corpus):
    """in_order=True is rank/score-identical to match_phrase with the
    same slop (the module pins this delegation)."""
    ph = [_V[0], _V[1]]
    for slop in (0, 2):
        a = span_near_topk(corpus, ph, 10, slop=slop, in_order=True).collect()
        b = match_phrase_topk(corpus, " ".join(ph), 10, slop=slop).collect()
        assert [(r.doc_id, r.score) for r in a] == [
            (r.doc_id, r.score) for r in b
        ]
        assert a, "case must be non-vacuous"


def test_span_unordered_matches_manual(spark, corpus):
    terms, slop = [_V[1], _V[0]], 3
    rows = [
        (r["doc_id"], tokenize_str(r["text"]))
        for r in corpus.select("doc_id", "text").collect()
    ]
    n_docs = len(rows)
    avgdl = sum(len(t) for _, t in rows) / n_docs
    tfs = {d: _stf(t, terms, slop) for d, t in rows}
    df_ = sum(1 for v in tfs.values() if v > 0)
    assert df_ > 0, "case must be non-vacuous"
    idf = math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
    want = sorted(
        (
            (d, idf * tf / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl)))
            for (d, t), tf in zip(rows, tfs.values())
            if tf > 0
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = span_near_topk(corpus, terms, 10, slop=slop).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (d, round(s, 4)) for d, s in want
    ]


def test_span_near_duckdb_parity(spark, corpus):
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    cases = [
        ([_V[0], _V[1]], 0, False),
        ([_V[1], _V[0]], 2, False),
        ([_V[0], _V[1]], 1, True),
        ([_V[3], _V[4], _V[5]], 4, False),
        ([_V[5], _V[5]], 3, False),          # duplicate clause
        (["zzzoov", _V[0]], 2, False),       # OOV conjunct -> empty
    ]
    for terms, slop, in_order in cases:
        ex = span_near_topk(
            corpus, terms, 10, slop=slop, in_order=in_order
        ).collect()
        oq = con.execute(
            span_near_sql(terms, 10, slop=slop, in_order=in_order)
        ).fetchall()
        assert [(r.doc_id, round(r.score, 6)) for r in ex] == [
            (d, round(s, 6)) for d, s in oq
        ], (terms, slop, in_order)
        if terms[0] != "zzzoov":
            assert ex, (terms, slop, in_order)


def test_span_near_positional_parity(spark, corpus, pos_index):
    cases = [
        ([_V[0], _V[1]], 0, False),
        ([_V[1], _V[0]], 2, False),
        ([_V[0], _V[1]], 2, True),
        ([_V[3], _V[4], _V[5]], 4, False),
        ([_V[5], _V[5]], 3, False),
        (["zzzoov", _V[0]], 2, False),
    ]
    for terms, slop, in_order in cases:
        ex = span_near_topk(
            corpus, terms, 10, slop=slop, in_order=in_order
        ).collect()
        ix = span_near_positional(
            pos_index, terms, 10, slop=slop, in_order=in_order
        ).collect()
        assert [(r.doc_id, r.score) for r in ex] == [
            (r.doc_id, r.score) for r in ix
        ], (terms, slop, in_order)


def test_span_near_positional_reads_no_text(spark, corpus, pos_index):
    plan = span_near_positional(
        pos_index, [_V[0], _V[1]], 5, slop=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "positions" in plan
    assert "text" not in plan


def test_span_slop_widens_match_set(spark, corpus):
    prev = None
    for slop in (0, 2, 5):
        got = {
            r.doc_id
            for r in span_near_topk(
                corpus, [_V[0], _V[1]], 10_000, slop=slop
            ).collect()
        }
        if prev is not None:
            assert prev <= got
        prev = got


def test_span_clause_validation(spark, corpus):
    with pytest.raises(ValueError, match=">= 2"):
        span_near_topk(corpus, [_V[0]], 5)
    with pytest.raises(ValueError, match="analyzer token"):
        span_near_topk(corpus, ["two words", _V[0]], 5)
    with pytest.raises(ValueError, match="analyzer token"):
        span_near_topk(corpus, ["UPPER", _V[0]], 5)


# ---------------------------------------------------------------------------
# span_first / span_or / span_not
# ---------------------------------------------------------------------------

from sparksearch.query.spans import (  # noqa: E402
    span_first_positional,
    span_first_sql,
    span_first_topk,
    span_not_positional,
    span_not_sql,
    span_not_topk,
    span_or_positional,
    span_or_sql,
    span_or_topk,
)


def _tiny(spark):
    rows = [
        (1, "a b c a"),     # a at 0-based 0,3; b at 1; c at 2
        (2, "b a a"),       # a at 1,2
        (3, "c c b"),       # no a
        (4, "a"),           # a at 0
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tf_map(res):
    return {r.doc_id: r.score for r in res.collect()}


def test_span_first_tf_unit(spark):
    df = _tiny(spark)
    # end=1: only position 0 counts -> docs 1 and 4 match
    got = {r.doc_id for r in span_first_topk(df, "a", 1, 10).collect()}
    assert got == {1, 4}
    # end=2: doc 2's a@1 now matches
    got = {r.doc_id for r in span_first_topk(df, "a", 2, 10).collect()}
    assert got == {1, 2, 4}
    # end=0: nothing
    assert span_first_topk(df, "a", 0, 10).count() == 0


def test_span_first_monotone_in_end(spark, corpus):
    prev = None
    for end in (1, 5, 20, 10_000):
        got = {r.doc_id for r in span_first_topk(corpus, _V[0], end, 10_000).collect()}
        if prev is not None:
            assert prev <= got
        prev = got
    assert prev, "case must be non-vacuous"


def test_span_or_tf_unit(spark):
    df = _tiny(spark)
    # [a, c]: doc1 tf=3 (a,a,c), doc2 tf=2, doc3 tf=2, doc4 tf=1
    got = {r.doc_id for r in span_or_topk(df, ["a", "c"], 10).collect()}
    assert got == {1, 2, 3, 4}
    with pytest.raises(ValueError, match="distinct"):
        span_or_topk(df, ["a", "a"], 10)


def test_span_not_tf_unit(spark):
    df = _tiny(spark)
    # include a, exclude b, post=1: a@0 in doc1 has b@1 within post -> cut;
    # a@3 survives; doc2 a@1 has b@0? pre=0 so only [p, p+1]: b@0 < p -> keep
    got = {r.doc_id for r in span_not_topk(df, "a", "b", 10, post=1).collect()}
    assert got == {1, 2, 4}
    # pre=1 too: doc2's a@1 now sees b@0 -> only a@2 survives there
    got2 = {r.doc_id for r in
            span_not_topk(df, "a", "b", 10, pre=1, post=1).collect()}
    assert got2 == {1, 2, 4}  # doc2 still matches via a@2
    # huge buffer: every include near some exclude in docs 1,2 -> only 4
    got3 = {r.doc_id for r in
            span_not_topk(df, "a", "b", 10, pre=99, post=99).collect()}
    assert got3 == {4}


def test_span_not_shrinks_with_buffer(spark, corpus):
    prev = None
    for buf in (0, 2, 50):
        got = {
            r.doc_id
            for r in span_not_topk(
                corpus, _V[0], _V[1], 10_000, pre=buf, post=buf
            ).collect()
        }
        if prev is not None:
            assert got <= prev
        prev = got


def test_span_family_duckdb_parity(spark, corpus):
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    cases = [
        (span_first_topk(corpus, _V[0], 15, 10), span_first_sql(_V[0], 15, 10)),
        (span_first_topk(corpus, _V[0], 0, 10), span_first_sql(_V[0], 0, 10)),
        (span_or_topk(corpus, [_V[0], _V[3]], 10), span_or_sql([_V[0], _V[3]], 10)),
        (span_or_topk(corpus, [_V[1], "zzzoov"], 10),
         span_or_sql([_V[1], "zzzoov"], 10)),
        (span_not_topk(corpus, _V[0], _V[1], 10, post=3),
         span_not_sql(_V[0], _V[1], 10, post=3)),
        (span_not_topk(corpus, _V[0], "zzzoov", 10, pre=2, post=2),
         span_not_sql(_V[0], "zzzoov", 10, pre=2, post=2)),
    ]
    for ex_df, sql in cases:
        ex = [(r.doc_id, round(r.score, 6)) for r in ex_df.collect()]
        oq = [(d, round(s, 6)) for d, s in con.execute(sql).fetchall()]
        assert ex == oq, sql[:120]


def test_span_family_positional_parity(spark, corpus, pos_index):
    cases = [
        (span_first_topk(corpus, _V[0], 15, 10),
         span_first_positional(pos_index, _V[0], 15, 10)),
        (span_first_topk(corpus, "zzzoov", 15, 10),
         span_first_positional(pos_index, "zzzoov", 15, 10)),
        (span_or_topk(corpus, [_V[0], _V[3]], 10),
         span_or_positional(pos_index, [_V[0], _V[3]], 10)),
        (span_or_topk(corpus, [_V[1], "zzzoov"], 10),
         span_or_positional(pos_index, [_V[1], "zzzoov"], 10)),
        (span_not_topk(corpus, _V[0], _V[1], 10, post=3),
         span_not_positional(pos_index, _V[0], _V[1], 10, post=3)),
        (span_not_topk(corpus, _V[0], "zzzoov", 10, pre=2, post=2),
         span_not_positional(pos_index, _V[0], "zzzoov", 10, pre=2, post=2)),
    ]
    for i, (ex_df, ix_df) in enumerate(cases):
        ex = [(r.doc_id, r.score) for r in ex_df.collect()]
        ix = [(r.doc_id, r.score) for r in ix_df.collect()]
        assert ex == ix, i


def test_span_not_positional_reads_no_text(spark, corpus, pos_index):
    plan = span_not_positional(
        pos_index, _V[0], _V[1], 5, post=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "positions" in plan
    assert "text" not in plan


class TestSpanComposition:
    """span_containing / span_within / span_multi (pinned anchored-
    window extents; see the spans.py composition docstring)."""

    _ROWS = [
        (1, "a x b c"),    # big [a,b] slop>=1 window covers c
        (2, "c a b"),      # c BEFORE the big window
        (3, "a b c"),      # adjacent big, c right after
        (4, "a c b"),      # c inside the sloppy window
        (5, "a b"),        # big matches, no little
        (6, "c"),          # little only
        (7, None),
    ]

    @pytest.fixture(scope="class")
    def tiny(self, spark):
        return spark.createDataFrame(self._ROWS, "doc_id long, text string")

    def test_containing_manual(self, tiny):
        from sparksearch.query.spans import span_containing_topk

        # slop=1, unordered: window length 3 from each valid anchor
        got = sorted(
            r.doc_id
            for r in span_containing_topk(
                tiny, ["a", "b"], "c", 10, slop=1
            ).collect()
        )
        # doc1: anchor a@1 window 'a x b' no c; anchor b@3 window 'b c'
        #   + needs a in window -> no. docs: 3 (b@2 window 'b c'? needs
        #   a -> no; a@1 window 'a b c' has both + c) and 4 (a@1 'a c b')
        assert got == [3, 4]

    def test_within_manual(self, tiny):
        from sparksearch.query.spans import span_within_topk

        got = sorted(
            r.doc_id
            for r in span_within_topk(
                tiny, "c", ["a", "b"], 10, slop=1
            ).collect()
        )
        # little c covered by a valid anchor window [p, p+2]:
        # doc3 c@3 covered by a@1; doc4 c@2 covered by a@1
        assert got == [3, 4]

    def test_composition_duckdb_parity(self, spark, corpus):
        import pandas as pd
        from sparksearch.query.spans import (
            span_containing_sql,
            span_containing_topk,
            span_within_sql,
            span_within_topk,
        )

        con = duckdb.connect()
        con.register("documents", corpus.select("doc_id", "text").toPandas())
        big, little = [_V[0], _V[3]], _V[7]
        for order in (False, True):
            a = span_containing_topk(
                corpus, big, little, 10, slop=3, in_order=order
            ).toPandas()
            b = con.sql(
                span_containing_sql(big, little, 10, slop=3, in_order=order)
            ).df()
            pd.testing.assert_frame_equal(
                a.reset_index(drop=True), b.reset_index(drop=True),
                check_dtype=False,
            )
            a = span_within_topk(
                corpus, little, big, 10, slop=3, in_order=order
            ).toPandas()
            b = con.sql(
                span_within_sql(little, big, 10, slop=3, in_order=order)
            ).df()
            pd.testing.assert_frame_equal(
                a.reset_index(drop=True), b.reset_index(drop=True),
                check_dtype=False,
            )

    def test_span_multi_matches_manual_expansion(self, spark, corpus):
        """span_multi(wildcard) ≡ intervals with the expanded slot."""
        from sparksearch.query.intervals import intervals_topk
        from sparksearch.query.spans import span_multi_near_topk
        from sparksearch.query.termq import _expand_wildcard_exhaustive

        pat, term = _V[0][:3] + "*", _V[3]
        exp = [
            t
            for t in _expand_wildcard_exhaustive(corpus, pat, 128, "text",
                                                 "ascii")
            if t != term
        ]
        assert exp, "pattern must expand"
        a = [
            (r.doc_id, r.score)
            for r in span_multi_near_topk(
                corpus, pat, term, 10, slop=2
            ).collect()
        ]
        b = [
            (r.doc_id, r.score)
            for r in intervals_topk(
                corpus, [exp, [term]], 10, max_gaps=2, ordered=False
            ).collect()
        ]
        assert a and a == b

    def test_span_multi_duckdb_parity(self, spark, corpus):
        import pandas as pd
        from sparksearch.query.spans import (
            span_multi_near_sql,
            span_multi_near_topk,
        )

        con = duckdb.connect()
        con.register("documents", corpus.select("doc_id", "text").toPandas())
        pat, term = _V[0][:3] + "*", _V[3]
        a = span_multi_near_topk(corpus, pat, term, 10, slop=2).toPandas()
        b = con.sql(span_multi_near_sql(pat, term, 10, slop=2)).df()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True),
            check_dtype=False,
        )

    def test_span_multi_engine_equals_exhaustive(
        self, spark, corpus, pos_index
    ):
        from sparksearch.index.lexicon import build_lexicon
        from sparksearch.query.spans import (
            span_multi_near_search,
            span_multi_near_topk,
        )

        build_lexicon(spark, corpus, pos_index.index_dir)
        pos_index._refresh_if_stale()
        pat, term = _V[0][:3] + "*", _V[3]
        a = [
            (r.doc_id, r.score)
            for r in span_multi_near_topk(
                corpus, pat, term, 10, slop=2
            ).collect()
        ]
        b = [
            (r.doc_id, r.score)
            for r in span_multi_near_search(
                pos_index, pat, term, 10, slop=2
            ).collect()
        ]
        assert a and a == b

    def test_span_multi_empty_expansion(self, spark, corpus):
        from sparksearch.query.spans import span_multi_near_topk

        out = span_multi_near_topk(corpus, "zzzqqq*", _V[3], 10)
        assert out.count() == 0
