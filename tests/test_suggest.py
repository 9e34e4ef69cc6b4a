"""Term suggester: AUTO distance, missing mode, tie chain, lexicon parity."""

import pytest

from sparksearch.analyze import tokenize_str
from sparksearch.index import lexicon as lx
from sparksearch.index.lexicon import auto_fuzziness
from sparksearch.query.suggest import term_suggest, term_suggest_indexed
from sparksearch.synth import make_vocab

_V = make_vocab(2000)


def _vocab_df(corpus):
    vocab: dict[str, int] = {}
    for r in corpus.select("text").collect():
        if r["text"] is None:
            continue
        for t in set(tokenize_str(r["text"])):
            vocab[t] = vocab.get(t, 0) + 1
    return vocab


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def _reference(corpus, qterm: str, size: int):
    vocab = _vocab_df(corpus)
    ed = auto_fuzziness(qterm)
    cand = [
        (t, _lev(t, qterm), df)
        for t, df in vocab.items()
        if t != qterm and _lev(t, qterm) <= ed
    ]
    cand.sort(key=lambda r: (r[1], -r[2], r[0]))
    return [(qterm, t, d, df) for t, d, df in cand[:size]]


def test_missing_mode_suggests_for_oov_only(spark, corpus):
    qterm = _V[0][:-1] + "zz"  # OOV near-miss of a vocab term? ensure OOV
    vocab = _vocab_df(corpus)
    assert qterm not in vocab
    got = term_suggest(corpus, f"{_V[0]} {qterm}", 5).collect()
    # V[0] is present → no suggestions for it
    assert all(r["qterm"] == qterm for r in got)


def test_matches_python_reference(spark, corpus):
    base = _V[50]
    qterm = base[:-1] + ("x" if base[-1] != "x" else "q")  # 1 edit away
    want = _reference(corpus, qterm, 5)
    got = [
        (r["qterm"], r["suggestion"], r["distance"], r["df"])
        for r in term_suggest(corpus, qterm, 5).collect()
    ]
    assert got == want and got


def test_always_mode_and_lexicon_parity(spark, corpus, built_index):
    lx.build_lexicon(spark, corpus, built_index.index_dir)
    q = f"{_V[50]} {_V[50][:-1]}x"
    ex = term_suggest(corpus, q, 5, mode="always").collect()
    ix = term_suggest_indexed(built_index, q, 5, mode="always").collect()
    assert [tuple(r) for r in ex] == [tuple(r) for r in ix] and ex


def test_empty_and_bad_mode(spark, corpus):
    assert term_suggest(corpus, "!!!", 5).count() == 0
    with pytest.raises(ValueError):
        term_suggest(corpus, _V[0], 5, mode="sometimes").count()


class TestCompletionSuggester:
    def test_prefix_and_order(self, spark):
        from sparksearch.query.suggest import completion_suggest

        rows = [(1, "apple apply ape"), (2, "apple banana"), (3, "apply")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = completion_suggest(df, "app", 5).collect()
        # df weights: apple 2, apply 2, (ape excluded: no 'app'? 'ape'
        # does not start with 'app'); tie -> suggestion asc
        assert [(r.suggestion, r.weight) for r in out] == [
            ("apple", 2), ("apply", 2)
        ]

    def test_empty_prefix_rejected(self, spark):
        from sparksearch.query.suggest import (
            completion_suggest_sql,
        )

        import pytest as _pt
        with _pt.raises(ValueError):
            completion_suggest_sql("")

    def test_indexed_equals_exhaustive(self, spark, corpus, built_index):
        from sparksearch.index.lexicon import build_lexicon
        from sparksearch.query.suggest import (
            completion_suggest,
            completion_suggest_indexed,
        )

        build_lexicon(spark, corpus, built_index.index_dir)
        pre = _V[0][:2]
        a = [
            (r.suggestion, r.weight)
            for r in completion_suggest(corpus, pre, 8).collect()
        ]
        b = [
            (r.suggestion, r.weight)
            for r in completion_suggest_indexed(
                built_index, pre, 8
            ).collect()
        ]
        assert a and a == b


class TestPhraseSuggester:
    def test_recovers_misspelling(self, spark, corpus):
        from sparksearch.query.suggest import phrase_suggest

        good = f"{_V[2]} {_V[9]}"
        bad = f"{_V[2][:-1]}x {_V[9][:-1]}x"
        out = phrase_suggest(corpus, bad, 5).collect()
        assert out, "must produce candidates"
        assert out[0].suggestion.split(" ")[0] in {
            t for t in [_V[2]]
        } or out[0].logp is not None
        # the true phrase must be among the candidates
        assert any(r.suggestion == good for r in out)

    def test_backoff_scores_match_model(self, spark):
        from sparksearch.query.suggest import (
            PHRASE_BACKOFF,
            phrase_suggest,
        )
        import math

        # tiny corpus with known counts: bigram "aa bb" occurs once
        rows = [(1, "aa bb"), (2, "aa cc"), (3, "bb")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.suggestion: r.logp
            for r in phrase_suggest(df, "aa bb", 10).collect()
        }
        T = 5.0  # aa aa bb bb cc
        # candidates for 'aa' (len 2 -> AUTO 0): just aa; same for bb
        p = (2 / T) * (1 / 2)  # P(aa) * P(bb|aa) = ttf(aa)/T * c(aa,bb)/ttf(aa)
        assert out == {"aa bb": round(math.log(p), 4)}
        # and a pair with NO bigram takes the backoff path
        out2 = {
            r.suggestion: r.logp
            for r in phrase_suggest(df, "cc bb", 10).collect()
        }
        p2 = (1 / T) * (PHRASE_BACKOFF * 2 / T)
        assert out2 == {"cc bb": round(math.log(p2), 4)}

    def test_duckdb_parity(self, spark, corpus):
        import duckdb
        import pandas as pd
        from sparksearch.query.suggest import (
            phrase_suggest,
            phrase_suggest_sql,
        )

        con = duckdb.connect()
        con.register(
            "documents", corpus.select("doc_id", "text").toPandas()
        )
        bad = f"{_V[2][:-1]}x {_V[9][:-1]}x"
        a = phrase_suggest(corpus, bad, 5).toPandas()
        b = con.sql(phrase_suggest_sql(bad, 5)).df()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True),
            check_dtype=False,
        )

    def test_term_cap(self, spark, corpus):
        import pytest as _pt
        from sparksearch.query.suggest import phrase_suggest_sql

        with _pt.raises(ValueError, match="caps"):
            phrase_suggest_sql("a b c d e")
