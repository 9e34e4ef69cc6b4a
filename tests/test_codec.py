"""Property tests for the varint/delta posting codec (SURVEY §5.2 item 3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparksearch.index.codec import (
    delta_gaps,
    segmented_undelta,
    undelta,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    buf, nbytes = varint_encode(v)
    assert len(buf) == int(nbytes.sum())
    out = varint_decode(buf, len(v))
    assert (out == v).all()


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_full_int64_range(ids):
    a = np.sort(np.array(ids, dtype=np.int64))
    gaps = delta_gaps(a)
    assert (undelta(int(a[0]), gaps) == a).all()


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=400,
        unique=True,
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=100, deadline=None)
def test_segmented_undelta(ids, n_blocks):
    a = np.sort(np.array(ids, dtype=np.int64))
    # split into n_blocks contiguous runs (some possibly empty → drop)
    cuts = np.linspace(0, len(a), n_blocks + 1).astype(int)
    firsts, gaps, lens = [], [], []
    for i in range(n_blocks):
        blk = a[cuts[i] : cuts[i + 1]]
        if len(blk) == 0:
            continue
        firsts.append(blk[0])
        gaps.append(delta_gaps(blk))
        lens.append(len(blk))
    out = segmented_undelta(
        np.array(firsts, dtype=np.int64),
        np.concatenate(gaps) if gaps else np.zeros(0, np.uint64),
        np.array(lens, dtype=np.int64),
    )
    assert (out == a).all()


def test_varint_edge_values():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**64 - 1], dtype=np.uint64)
    buf, nb = varint_encode(v)
    assert list(nb) == [1, 1, 1, 2, 2, 3, 5, 10]
    assert (varint_decode(buf, len(v)) == v).all()
