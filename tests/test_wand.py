"""Block-max pruning never changes results (WAND exactness, SURVEY §5.2 item 3)."""

import numpy as np
import pandas as pd

from sparksearch.index.pack import pack_rows
from sparksearch.query.wand import make_segment_scorer


def _random_segment(rng, n_docs, n_terms):
    """Random packed postings for one segment + the flat truth table."""
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
                1.2,
                0.75,
                100.0,
            )
        )
    return pd.concat(frames, ignore_index=True), truth


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
        blocks, truth = _random_segment(rng, n_docs, n_terms)
        idfs = {tid: float(rng.uniform(0.2, 6.0)) for tid in truth}
        for k in (1, 5, 100):
            scorer = make_segment_scorer(idfs, k1, b, avgdl, k)
            got = scorer(blocks)
            expected = _brute(truth, idfs, k1, b, avgdl, k)
            assert list(got["doc_id"]) == [e[0] for e in expected], (trial, k)
            np.testing.assert_allclose(
                got["score"].to_numpy(), [e[1] for e in expected], rtol=1e-12
            )


def test_single_term_pruning_path_large():
    """Many blocks → the early-exit path actually engages and stays exact."""
    rng = np.random.default_rng(7)
    n = 50_000  # ~390 blocks
    d = np.unique(rng.integers(0, 2**50, n + 1000, dtype=np.int64))[:n]
    n = len(d)
    tf = rng.integers(1, 50, n).astype(np.int64)
    dl = rng.integers(5, 1000, n).astype(np.int64)
    blocks = pack_rows(
        np.zeros(n, np.int64), np.zeros(n, np.int64), d, tf, dl, 1.2, 0.75, 200.0
    )
    scorer = make_segment_scorer({0: 3.0}, 1.2, 0.75, 200.0, 10)
    got = scorer(blocks)
    expected = _brute({0: (d, tf, dl)}, {0: 3.0}, 1.2, 0.75, 200.0, 10)
    assert list(got["doc_id"]) == [e[0] for e in expected]
    np.testing.assert_allclose(got["score"].to_numpy(), [e[1] for e in expected], rtol=1e-12)
