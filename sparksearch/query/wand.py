"""Document-at-a-time BM25 scoring over packed posting blocks.

Runs inside ``applyInPandas`` grouped by ``segment_id``: each call gets
every posting block of the query's terms within one doc_id-range segment
and returns at most k candidates; the global winner set is a tiny
``orderBy(score desc, doc_id asc).limit(k)`` merge — the Spark
restatement of OpenSearch's per-shard top-k + coordinator merge
(SURVEY §3.3; reference query body ``test_keyword_search.py:29-36``).

Scoring formula (Lucene 9 / OpenSearch 2.x BM25, the reference's default
similarity — no (k1+1) factor):

    idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn  = tf / (tf + k1 · (1 - b + b · dl / avgdl))
    score(d) = Σ_{t ∈ q} idf_t · tfn(t, d)

Pruning: every block stores ``max_tfn`` (exact upper bound of tfn in the
block).  For single-term queries the kernel visits blocks in descending
``idf·max_tfn`` order and stops as soon as the next chunk's bound cannot
beat the current kth score (block-max pruning, exact).  Multi-term
queries currently use fully-vectorized exhaustive DAAT union scoring —
exact, and numpy-fast; MaxScore/BMW essential-list skipping is staged on
top of the same block metadata (see ``max_tfn`` + ``first_doc_id``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from sparksearch.index.codec import segmented_undelta, varint_decode

SCORE_SCHEMA = "doc_id long, score double"

# how many highest-bound blocks to decode per pruning round (vector width)
_PRUNE_CHUNK = 64


def lucene_idf(n_docs: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _decode_term(sub: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks of one term (within one segment) → docs, tfs, dls."""
    lens = sub["n_docs"].to_numpy(np.int64)
    firsts = sub["first_doc_id"].to_numpy(np.int64)
    gaps = varint_decode(b"".join(sub["doc_gaps"]), int(lens.sum() - len(lens)))
    docs = segmented_undelta(firsts, gaps, lens)
    tfs = varint_decode(b"".join(sub["tfs"]), int(lens.sum())).astype(np.float64)
    dls = varint_decode(b"".join(sub["dls"]), int(lens.sum())).astype(np.float64)
    return docs, tfs, dls


def _tfn(tfs: np.ndarray, dls: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    return tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))


def _topk(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    if len(docs) > k:
        part = np.argpartition(-scores, k - 1)[:k]
        docs, scores = docs[part], scores[part]
    order = np.lexsort((docs, -scores))
    return pd.DataFrame({"doc_id": docs[order], "score": scores[order]})


def make_segment_scorer(
    term_idf: dict[int, float], k1: float, b: float, avgdl: float, k: int
):
    """Build the per-segment ``applyInPandas`` scoring function."""
    term_ids = sorted(term_idf)  # fixed order ⇒ deterministic float sums

    def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)})
        if len(term_ids) == 1:
            return _score_single(pdf, term_idf[term_ids[0]])
        parts_d, parts_s = [], []
        for tid in term_ids:
            sub = pdf[pdf["term_id"] == tid]
            if len(sub) == 0:
                continue
            sub = sub.sort_values("block_id", kind="stable")
            docs, tfs, dls = _decode_term(sub)
            parts_d.append(docs)
            parts_s.append(term_idf[tid] * _tfn(tfs, dls, k1, b, avgdl))
        if not parts_d:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)})
        all_docs = np.concatenate(parts_d)
        all_scores = np.concatenate(parts_s)
        uniq, inv = np.unique(all_docs, return_inverse=True)
        agg = np.bincount(inv, weights=all_scores, minlength=len(uniq))
        return _topk(uniq, agg, k)

    def _score_single(pdf: pd.DataFrame, idf: float) -> pd.DataFrame:
        """Block-max pruned single-term top-k (exact)."""
        pdf = pdf.sort_values("max_tfn", ascending=False, kind="stable")
        ubs = idf * pdf["max_tfn"].to_numpy(np.float64)
        best_docs = np.zeros(0, np.int64)
        best_scores = np.zeros(0, np.float64)
        kth = -math.inf
        for start in range(0, len(pdf), _PRUNE_CHUNK):
            if len(best_docs) >= k and ubs[start] <= kth:
                break  # no remaining block can beat the current kth score
            chunk = pdf.iloc[start : start + _PRUNE_CHUNK].sort_values(
                "block_id", kind="stable"
            )
            docs, tfs, dls = _decode_term(chunk)
            scores = idf * _tfn(tfs, dls, k1, b, avgdl)
            best_docs = np.concatenate([best_docs, docs])
            best_scores = np.concatenate([best_scores, scores])
            if len(best_docs) > k:
                part = np.argpartition(-best_scores, k - 1)[:k]
                best_docs, best_scores = best_docs[part], best_scores[part]
            if len(best_docs) >= k:
                kth = best_scores.min()
        return _topk(best_docs, best_scores, k)

    return score_segment
