"""Posting-block packing — batch-vectorized kernels for ``mapInArrow``.

Capability twin of Lucene's per-shard segment writing (the reference
delegates this to OpenSearch via ``client.bulk``,
``keyword_search/functions/output_functions.py:141``).  The packer
consumes (term_id, segment_id, doc_id, tf, dl) rows that are *sorted
within each Spark partition* by (term_id, segment_id, doc_id) and emits
one row per ≤128-posting block:

    term_id, segment_id, block_id, first_doc_id, n_docs,
    doc_gaps (varint uint64 deltas), tfs (varint), dls (varint),
    max_tf, min_dl (block-max metadata)

``(max_tf, min_dl)`` give the query kernel an avgdl-INDEPENDENT block
bound: ``tfn = tf/(tf + k1(1-b+b·dl/avgdl))`` is monotone increasing in
tf and decreasing in dl, so ``tfn(max_tf, min_dl)`` — computed at query
time with the CURRENT corpus avgdl — upper-bounds every posting in the
block.  Storing the raw integers instead of a pre-multiplied float keeps
blocks byte-stable under incremental upserts that shift avgdl (only the
blocks whose postings actually changed need repacking) and keeps the
pack kernel free of scoring parameters entirely.

Vectorization contract: the hot path is ``mapInArrow`` — int64 columns
come out of Arrow zero-copy as numpy views, the varint buffers go back
in as zero-copy ``BinaryArray.from_buffers`` (offsets = cumsum of
per-block byte counts).  Cost is O(batch) numpy passes; there is NO
per-posting and NO per-block Python (an earlier ``mapInPandas`` version
spent ~80 % of kernel time slicing one bytes object per block — the
Arrow offsets representation removes that loop entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from sparksearch.index.codec import BLOCK_SIZE, varint_encode

PACK_SCHEMA = (
    "term_id long, segment_id int, block_id int, first_doc_id long, "
    "n_docs int, doc_gaps binary, tfs binary, dls binary, "
    "max_tf int, min_dl int"
)

PACK_ARROW_SCHEMA = pa.schema(
    [
        ("term_id", pa.int64()),
        ("segment_id", pa.int32()),
        ("block_id", pa.int32()),
        ("first_doc_id", pa.int64()),
        ("n_docs", pa.int32()),
        ("doc_gaps", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
    ]
)


def pack_core(
    t: np.ndarray,
    s: np.ndarray,
    d: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
):
    """Pack one sorted run of rows (may span many (term, segment) groups).

    Returns ``(cols, (gbuf, gcnt), (tbuf, tcnt), (dbuf, dcnt))`` where
    ``cols`` is a dict of per-block numpy arrays and each ``(buf, cnt)``
    is a concatenated varint byte buffer plus per-block byte counts.
    """
    n = len(t)
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

    cols = {
        "term_id": t[block_starts],
        "segment_id": s[block_starts].astype(np.int32),
        "block_id": (pos[block_starts] // BLOCK_SIZE).astype(np.int32),
        "first_doc_id": d[block_starts],
        "n_docs": block_lens.astype(np.int32),
        "max_tf": (np.maximum.reduceat(tf, block_starts) if n else np.zeros(0)).astype(np.int32),
        "min_dl": (np.minimum.reduceat(dl, block_starts) if n else np.zeros(0)).astype(np.int32),
    }
    return cols, (gbuf, gcnt), (tbuf, tcnt), (dbuf, dcnt)


def _bin_array(buf: bytes, counts: np.ndarray) -> pa.Array:
    """Zero-copy Arrow binary array: one value per block, no Python loop."""
    total = int(counts.sum())
    if total >= 2**31:  # int32 offsets would wrap silently (ADVICE r1)
        raise ValueError(
            f"packed batch payload {total} B exceeds Arrow binary int32 "
            "offsets; lower spark.sql.execution.arrow.maxRecordsPerBatch"
        )
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.binary(), len(counts), [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)]
    )


def _empty_batch() -> pa.RecordBatch:
    return pa.RecordBatch.from_pydict(
        {f.name: [] for f in PACK_ARROW_SCHEMA}, schema=PACK_ARROW_SCHEMA
    )


def pack_batch(
    t: np.ndarray, s: np.ndarray, d: np.ndarray, tf: np.ndarray, dl: np.ndarray,
) -> pa.RecordBatch:
    if len(t) == 0:
        return _empty_batch()
    cols, g, tt, dd = pack_core(t, s, d, tf, dl)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(cols["term_id"], pa.int64()),
            pa.array(cols["segment_id"], pa.int32()),
            pa.array(cols["block_id"], pa.int32()),
            pa.array(cols["first_doc_id"], pa.int64()),
            pa.array(cols["n_docs"], pa.int32()),
            _bin_array(*g),
            _bin_array(*tt),
            _bin_array(*dd),
            pa.array(cols["max_tf"], pa.int32()),
            pa.array(cols["min_dl"], pa.int32()),
        ],
        schema=PACK_ARROW_SCHEMA,
    )


def pack_rows(
    t: np.ndarray, s: np.ndarray, d: np.ndarray, tf: np.ndarray, dl: np.ndarray,
) -> pd.DataFrame:
    """pandas-facing wrapper over :func:`pack_core` (tests / small runs)."""
    return pack_batch(t, s, d, tf, dl).to_pandas()


_IN = ["term_id", "segment_id", "doc_id", "tf", "dl"]


def make_pack_fn():
    """Build the ``mapInArrow`` function over sorted partitions.

    Carries the trailing (possibly incomplete) (term, segment) group of
    each Arrow batch into the next so block boundaries are independent of
    Arrow batch size — packing is deterministic at any parallelism.
    """

    def pack_stream(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        carry: dict[str, np.ndarray] | None = None
        for rb in batches:
            cols = {
                name: rb.column(i).to_numpy(zero_copy_only=False)
                for i, name in enumerate(rb.schema.names)
            }
            if carry is not None and len(carry["term_id"]):
                cols = {
                    k: np.concatenate([carry[k], cols[k]]) for k in _IN
                }
            t, s = cols["term_id"], cols["segment_id"]
            n = len(t)
            if n == 0:
                continue
            same = np.ones(n, dtype=bool)
            same[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1])
            starts = np.flatnonzero(same)
            cut = int(starts[-1]) if len(starts) else 0
            carry = {k: cols[k][cut:] for k in _IN}
            if cut:
                yield pack_batch(
                    t[:cut], s[:cut], cols["doc_id"][:cut],
                    cols["tf"][:cut], cols["dl"][:cut],
                )
        if carry is not None and len(carry["term_id"]):
            yield pack_batch(
                carry["term_id"], carry["segment_id"], carry["doc_id"],
                carry["tf"], carry["dl"],
            )

    return pack_stream
