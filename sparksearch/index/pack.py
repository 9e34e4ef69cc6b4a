"""Posting-block packing — batch-vectorized kernels for ``mapInPandas``.

Capability twin of Lucene's per-shard segment writing (the reference
delegates this to OpenSearch via ``client.bulk``,
``keyword_search/functions/output_functions.py:141``).  Here the packer
consumes (term_id, segment_id, doc_id, tf, dl) rows that are *sorted
within each Spark partition* by (term_id, segment_id, doc_id) and emits
one row per ≤128-posting block:

    term_id, segment_id, block_id, first_doc_id, n_docs,
    doc_gaps (varint uint64 deltas), tfs (varint), dls (varint),
    max_tfn (block-max of the dl-dependent BM25 factor)

``max_tfn`` is the per-block upper bound of ``tf/(tf + k1(1-b+b·dl/avgdl))``;
a query multiplies it by the term's idf to get the block-max score used
for WAND-style pruning.  It is stored as float64 and is an exact upper
bound by construction (max over the block's true values).

Vectorization contract: cost is O(batch) numpy work + O(n_blocks) python
*slicing* only — no per-posting or per-term Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from sparksearch.index.codec import BLOCK_SIZE, varint_encode

PACK_SCHEMA = (
    "term_id long, segment_id int, block_id int, first_doc_id long, "
    "n_docs int, doc_gaps binary, tfs binary, dls binary, max_tfn double"
)

_IN_COLS = ["term_id", "segment_id", "doc_id", "tf", "dl"]


def bm25_tfn(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    """The document-dependent BM25 factor (idf-independent)."""
    tf = tf.astype(np.float64, copy=False)
    return tf / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def _slice_bytes(buf: bytes, counts: np.ndarray) -> list[bytes]:
    offs = np.concatenate(([0], np.cumsum(counts)))
    return [buf[offs[i] : offs[i + 1]] for i in range(len(counts))]


def pack_rows(
    t: np.ndarray,
    s: np.ndarray,
    d: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    k1: float,
    b: float,
    avgdl: float,
) -> pd.DataFrame:
    """Pack one sorted run of rows (may contain many (term, segment) groups)."""
    n = len(t)
    if n == 0:
        return pd.DataFrame(
            {
                "term_id": np.zeros(0, np.int64),
                "segment_id": np.zeros(0, np.int32),
                "block_id": np.zeros(0, np.int32),
                "first_doc_id": np.zeros(0, np.int64),
                "n_docs": np.zeros(0, np.int32),
                "doc_gaps": pd.Series([], dtype=object),
                "tfs": pd.Series([], dtype=object),
                "dls": pd.Series([], dtype=object),
                "max_tfn": np.zeros(0, np.float64),
            }
        )
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
    group_id = np.cumsum(new_group) - 1
    group_starts = np.flatnonzero(new_group)
    pos = np.arange(n, dtype=np.int64) - group_starts[group_id]
    new_block = new_group | (pos % BLOCK_SIZE == 0)
    block_starts = np.flatnonzero(new_block)
    block_idx = np.cumsum(new_block) - 1
    n_blocks = len(block_starts)
    block_lens = np.diff(np.append(block_starts, n))

    du = d.astype(np.int64, copy=False).view(np.uint64)
    gaps = np.zeros(n, dtype=np.uint64)
    gaps[1:] = du[1:] - du[:-1]
    in_block = ~new_block  # rows that contribute a gap (not first of block)

    gbuf, gnb = varint_encode(gaps[in_block])
    gcnt = np.bincount(block_idx[in_block], weights=gnb, minlength=n_blocks).astype(np.int64)
    tbuf, tnb = varint_encode(tf.astype(np.uint64, copy=False))
    tcnt = np.bincount(block_idx, weights=tnb, minlength=n_blocks).astype(np.int64)
    dbuf, dnb = varint_encode(dl.astype(np.uint64, copy=False))
    dcnt = np.bincount(block_idx, weights=dnb, minlength=n_blocks).astype(np.int64)

    tfn = bm25_tfn(tf, dl, k1, b, avgdl)
    return pd.DataFrame(
        {
            "term_id": t[block_starts],
            "segment_id": s[block_starts].astype(np.int32),
            "block_id": (pos[block_starts] // BLOCK_SIZE).astype(np.int32),
            "first_doc_id": d[block_starts],
            "n_docs": block_lens.astype(np.int32),
            "doc_gaps": pd.Series(_slice_bytes(gbuf, gcnt), dtype=object),
            "tfs": pd.Series(_slice_bytes(tbuf, tcnt), dtype=object),
            "dls": pd.Series(_slice_bytes(dbuf, dcnt), dtype=object),
            "max_tfn": np.maximum.reduceat(tfn, block_starts),
        }
    )


def make_pack_fn(k1: float, b: float, avgdl: float):
    """Build the ``mapInPandas`` function over sorted partitions.

    Carries the trailing (possibly incomplete) (term, segment) group of
    each Arrow batch into the next so block boundaries are independent of
    Arrow batch size — packing is deterministic at any parallelism.
    """

    def pack_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            t = pdf["term_id"].to_numpy(np.int64)
            s = pdf["segment_id"].to_numpy(np.int64)
            # last group start: hold back for the next batch
            same = np.ones(len(t), dtype=bool)
            same[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
            starts = np.flatnonzero(same)
            cut = int(starts[-1]) if len(starts) else 0
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(head):
                yield pack_rows(
                    head["term_id"].to_numpy(np.int64),
                    head["segment_id"].to_numpy(np.int64),
                    head["doc_id"].to_numpy(np.int64),
                    head["tf"].to_numpy(np.int64),
                    head["dl"].to_numpy(np.int64),
                    k1,
                    b,
                    avgdl,
                )
        if carry is not None and len(carry):
            yield pack_rows(
                carry["term_id"].to_numpy(np.int64),
                carry["segment_id"].to_numpy(np.int64),
                carry["doc_id"].to_numpy(np.int64),
                carry["tf"].to_numpy(np.int64),
                carry["dl"].to_numpy(np.int64),
                k1,
                b,
                avgdl,
            )

    return pack_stream
