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
