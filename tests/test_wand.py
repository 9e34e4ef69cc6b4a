"""Block-max pruning never changes results (WAND exactness, SURVEY §5.2 item 3).

Format v3: the kernel scores in ordinal space and resolves (doc_id, dl)
through an OrdinalMap.  These tests use an identity map (ordinal ==
doc_id, per-doc dl) so the oracle comparison stays in doc_id terms.
"""

import numpy as np
import pandas as pd

from sparksearch.index.ordmap import OrdinalMap
from sparksearch.index.pack import pack_rows
from sparksearch.query.wand import make_segment_scorer


def _identity_map(docs: np.ndarray, dls: np.ndarray) -> OrdinalMap:
    return OrdinalMap(docs.astype(np.int64), docs.astype(np.int64), dls.astype(np.int64))


def _random_segment(rng, n_docs, n_terms):
    """Random packed postings for one segment + the flat truth table +
    the per-doc ordinal map."""
    frames, truth = [], {}
    docs_pool = np.unique(rng.integers(-(2**40), 2**40, n_docs * 2, dtype=np.int64))[:n_docs]
    n_docs = len(docs_pool)
    dls = rng.integers(5, 500, n_docs)
    for tid in range(n_terms):
        mask = rng.random(n_docs) < rng.uniform(0.05, 0.9)
        if not mask.any():
            mask[rng.integers(0, n_docs)] = True
        d = docs_pool[mask]
        tf = rng.integers(1, 30, len(d))
        dl = dls[mask]
        truth[tid] = (d, tf, dl)
        frames.append(
            pack_rows(
                np.full(len(d), tid, dtype=np.int64),
                np.zeros(len(d), dtype=np.int64),
                d,
                tf.astype(np.int64),
                dl.astype(np.int64),
            )
        )
    return pd.concat(frames, ignore_index=True), truth, _identity_map(docs_pool, dls)


def _brute(truth, idfs, k1, b, avgdl, k):
    acc = {}
    for tid, (d, tf, dl) in truth.items():
        if tid not in idfs:
            continue
        s = idfs[tid] * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        for doc, sc in zip(d, s):
            acc[int(doc)] = acc.get(int(doc), 0.0) + float(sc)
    ranked = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def test_pruned_equals_exhaustive_random_corpora():
    rng = np.random.default_rng(123)
    k1, b, avgdl = 1.2, 0.75, 100.0
    for trial in range(15):
        n_docs = int(rng.integers(50, 1500))
        n_terms = int(rng.integers(1, 5))
        blocks, truth, omap = _random_segment(rng, n_docs, n_terms)
        idfs = {tid: float(rng.uniform(0.2, 6.0)) for tid in truth}
        for k in (1, 5, 100):
            scorer = make_segment_scorer(idfs, k1, b, avgdl, k, omap)
            got = scorer(blocks)
            expected = _brute(truth, idfs, k1, b, avgdl, k)
            assert list(got["doc_id"]) == [e[0] for e in expected], (trial, k)
            np.testing.assert_allclose(
                got["score"].to_numpy(), [e[1] for e in expected], rtol=1e-12
            )


def test_multi_term_maxscore_prunes_head_term():
    """Zipf shape: rare selective term + head term covering every doc.

    MaxScore must (a) stay exact and (b) decode far fewer head-term
    blocks than an exhaustive pass — this is the scale-killer case from
    VERDICT r1 finding 1 ("the" in a multi-term query).
    """
    rng = np.random.default_rng(31)
    n = 40_000
    docs_pool = np.unique(rng.integers(-(2**50), 2**50, n + 2000, dtype=np.int64))[:n]
    n = len(docs_pool)
    dls = rng.integers(5, 500, n).astype(np.int64)
    k1, b, avgdl = 1.2, 0.75, 100.0
    # head term: every doc, tf 1-3 (→ ~300 blocks); rare term: 50 docs
    head_tf = rng.integers(1, 4, n).astype(np.int64)
    rare_mask = np.zeros(n, dtype=bool)
    rare_mask[rng.choice(n, 50, replace=False)] = True
    rare_d = docs_pool[rare_mask]
    rare_tf = rng.integers(1, 30, len(rare_d)).astype(np.int64)
    # segment by high bits of doc_id like the real index (4 segments)
    seg = ((docs_pool >> 62) + 2).astype(np.int64)
    frames = [
        pack_rows(np.zeros(n, np.int64), seg, docs_pool, head_tf, dls),
        pack_rows(
            np.ones(rare_mask.sum(), np.int64), seg[rare_mask], rare_d, rare_tf,
            dls[rare_mask],
        ),
    ]
    blocks = pd.concat(frames, ignore_index=True)
    idfs = {0: 0.05, 1: 6.0}  # head idf tiny, rare idf large
    truth = {0: (docs_pool, head_tf, dls), 1: (rare_d, rare_tf, dls[rare_mask])}
    from sparksearch.query.wand import make_exhaustive_scorer

    omap = _identity_map(docs_pool, dls)
    for k in (5, 20):
        counters = {}
        scorer = make_segment_scorer(idfs, k1, b, avgdl, k, omap, counters=counters)
        got = scorer(blocks)
        expected = _brute(truth, idfs, k1, b, avgdl, k)
        assert list(got["doc_id"]) == [e[0] for e in expected], k
        np.testing.assert_allclose(
            got["score"].to_numpy(), [e[1] for e in expected], rtol=1e-12
        )
        exh = make_exhaustive_scorer(idfs, k1, b, avgdl, k, omap)(blocks)
        assert list(exh["doc_id"]) == [e[0] for e in expected]
        # the head term's list must NOT be fully decoded
        assert counters["blocks_decoded"] < 0.25 * counters["blocks_total"], counters


def test_multi_term_tie_heavy_exact():
    """Exact float-score ties at the kth boundary resolve by doc_id asc
    identically to the brute-force oracle (ADVICE r1 medium)."""
    rng = np.random.default_rng(99)
    k1, b, avgdl = 1.2, 0.75, 100.0
    for trial in range(10):
        n = int(rng.integers(200, 2000))
        docs_pool = np.unique(rng.integers(0, 2**30, n * 2, dtype=np.int64))[:n]
        n = len(docs_pool)
        # few distinct (tf, dl) combos → massive exact-tie plateaus
        # (dl is a per-DOC property, resolved through the ordinal map)
        tf_choices = np.array([1, 2, 3])
        dl_doc = np.array([50, 100])[rng.integers(0, 2, n)].astype(np.int64)
        frames, truth = [], {}
        for tid in range(3):
            mask = rng.random(n) < 0.7
            if not mask.any():
                mask[0] = True
            d = docs_pool[mask]
            tf = tf_choices[rng.integers(0, 3, len(d))].astype(np.int64)
            dl = dl_doc[mask]
            truth[tid] = (d, tf, dl)
            frames.append(
                pack_rows(np.full(len(d), tid, np.int64), np.zeros(len(d), np.int64),
                          d, tf, dl)
            )
        blocks = pd.concat(frames, ignore_index=True)
        idfs = {0: 1.0, 1: 1.0, 2: 2.0}
        omap = _identity_map(docs_pool, dl_doc)
        for k in (1, 7, 50):
            got = make_segment_scorer(idfs, k1, b, avgdl, k, omap)(blocks)
            expected = _brute(truth, idfs, k1, b, avgdl, k)
            assert list(got["doc_id"]) == [e[0] for e in expected], (trial, k)


def test_single_term_tie_heavy_exact():
    rng = np.random.default_rng(5)
    k1, b, avgdl = 1.2, 0.75, 100.0
    n = 5000
    d = np.unique(rng.integers(0, 2**40, n * 2, dtype=np.int64))[:n]
    n = len(d)
    # all identical (tf, dl) → every score ties; top-k = k smallest doc_ids
    tf = np.full(n, 2, np.int64)
    dl = np.full(n, 100, np.int64)
    blocks = pack_rows(np.zeros(n, np.int64), np.zeros(n, np.int64), d, tf, dl)
    got = make_segment_scorer({0: 3.0}, k1, b, avgdl, 10, _identity_map(d, dl))(blocks)
    assert list(got["doc_id"]) == sorted(d.tolist())[:10]


def test_single_term_pruning_path_large():
    """Many blocks → the early-exit path actually engages and stays exact."""
    rng = np.random.default_rng(7)
    n = 50_000  # ~390 blocks
    d = np.unique(rng.integers(0, 2**50, n + 1000, dtype=np.int64))[:n]
    n = len(d)
    tf = rng.integers(1, 50, n).astype(np.int64)
    dl = rng.integers(5, 1000, n).astype(np.int64)
    blocks = pack_rows(
        np.zeros(n, np.int64), np.zeros(n, np.int64), d, tf, dl
    )
    scorer = make_segment_scorer({0: 3.0}, 1.2, 0.75, 200.0, 10, _identity_map(d, dl))
    got = scorer(blocks)
    expected = _brute({0: (d, tf, dl)}, {0: 3.0}, 1.2, 0.75, 200.0, 10)
    assert list(got["doc_id"]) == [e[0] for e in expected]
    np.testing.assert_allclose(got["score"].to_numpy(), [e[1] for e in expected], rtol=1e-12)
