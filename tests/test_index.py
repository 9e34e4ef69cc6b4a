"""Index structures: stats correctness, pack/decode round-trip, block-max bound."""

import numpy as np
import pandas as pd

from sparksearch.hashing import term_id_of
from sparksearch.index.build import segment_of
from sparksearch.index.codec import BLOCK_SIZE
from sparksearch.index.ordmap import load_map
from sparksearch.query.wand import _decode_term
from tests.oracle.bm25_oracle import Bm25Oracle, tokenize


def test_stats_match_oracle(spark, corpus, built_index):
    rows = corpus.collect()
    oracle = Bm25Oracle({r["doc_id"]: r["text"] for r in rows})
    meta = built_index.meta
    assert meta["n_docs"] == oracle.n_docs
    assert abs(meta["avgdl"] - oracle.avgdl) < 1e-9
    stats = (
        spark.read.parquet(built_index.stats_path)
        .select("term_id", "df", "cf")
        .toPandas()
        .set_index("term_id")
    )
    assert len(stats) == len(oracle.df)
    for term, df in oracle.df.items():
        assert stats.loc[term_id_of(term), "df"] == df, term
    # cf = total term frequency
    cf = {}
    for c in oracle.tf.values():
        for t, n in c.items():
            cf[t] = cf.get(t, 0) + n
    for term in list(cf)[:200]:
        assert stats.loc[term_id_of(term), "cf"] == cf[term], term


def test_postings_roundtrip_vs_oracle(spark, corpus, built_index):
    """Decode every posting block back and compare (doc, tf, dl) with oracle."""
    rows = corpus.collect()
    oracle = Bm25Oracle({r["doc_id"]: r["text"] for r in rows})
    post = spark.read.parquet(built_index.postings_path).toPandas()
    n_segments = built_index.meta["n_segments"]
    omap = load_map(built_index.index_dir)
    # pick a mix of head and tail terms
    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    sample = terms[:5] + terms[len(terms) // 2 : len(terms) // 2 + 5] + terms[-5:]
    for term in sample:
        tid = term_id_of(term)
        sub = post[post["term_id"] == tid]
        got = {}
        for seg, seg_blocks in sub.groupby("segment_id"):
            seg_blocks = seg_blocks.sort_values("block_id")
            ords, tfs = _decode_term(seg_blocks)
            assert (np.diff(ords) > 0).all()  # sorted, unique within segment
            docs, dls = omap.resolve(ords)
            for d, tf, dl in zip(docs, tfs, dls):
                assert segment_of(int(d), n_segments) == seg
                got[int(d)] = (int(tf), int(dl))
        expected = {
            doc_id: (cnt[term], oracle.dl[doc_id])
            for doc_id, cnt in oracle.tf.items()
            if term in cnt
        }
        assert got == expected, term


def test_block_invariants(spark, built_index):
    post = spark.read.parquet(built_index.postings_path).toPandas()
    assert (post["n_docs"] <= BLOCK_SIZE).all()
    assert (post["n_docs"] >= 1).all()
    omap = load_map(built_index.index_dir)
    # (max_tf, min_dl) are the exact block extremes, so the query-time
    # bound tfn(max_tf, min_dl) dominates every posting at ANY avgdl
    # (dl resolved per doc through the ordinal sidecar in v3)
    for _, row in post.sample(n=min(300, len(post)), random_state=0).iterrows():
        ords, tfs = _decode_term(pd.DataFrame([row]))
        dls = omap.dls_of(ords)
        assert int(tfs.max()) == int(row["max_tf"])
        assert int(dls.min()) == int(row["min_dl"])


def test_term_bucket_layout(spark, built_index):
    post = spark.read.parquet(built_index.postings_path)
    bad = post.filter(
        (post.term_id % built_index.meta["n_buckets"] + built_index.meta["n_buckets"])
        % built_index.meta["n_buckets"]
        != post.term_bucket
    )
    assert bad.count() == 0


def test_ordinal_sidecar_invariants(spark, built_index):
    """Fresh build: ordinals are exactly 0..n-1 in doc_id order, one per
    doc, segment-partitioned consistently with the doc_id range buckets."""
    dl = spark.read.parquet(f"{built_index.index_dir}/doclens").toPandas()
    n = built_index.meta["n_docs"]
    assert len(dl) == n
    assert built_index.meta["next_ordinal"] == n
    srt = dl.sort_values("doc_id").reset_index(drop=True)
    assert list(srt["ordinal"]) == list(range(n))
    n_segments = built_index.meta["n_segments"]
    assert all(
        segment_of(int(d), n_segments) == int(s)
        for d, s in zip(srt["doc_id"], srt["segment_id"])
    )


def test_auto_layout_scaling():
    """Layout derives from corpus size: floors at sandbox scale, the
    thousands-of-buckets regime at web scale, invariants always hold."""
    from sparksearch.index.build import (
        LAYOUT_FLOORS,
        SEG_DOCS_TARGET,
        auto_layout,
    )

    # sandbox-scale corpora keep the historical layout byte-for-byte
    for n in (0, 1, 500, 60_000, 490_000, 1_500_000):
        assert auto_layout(n) == LAYOUT_FLOORS, n
    prev_buckets = 0
    for n in (10_000_000, 100_000_000, 1_000_000_000, 10_000_000_000):
        segs, buckets, units = auto_layout(n)
        assert segs & (segs - 1) == 0  # power of two (segment_col)
        assert buckets % units == 0  # build_index invariant
        assert segs * SEG_DOCS_TARGET >= n  # segment target respected
        assert buckets >= prev_buckets  # monotone in corpus size
        prev_buckets = buckets
    # 1B docs of webtext lands in the thousands-of-buckets regime
    assert auto_layout(1_000_000_000)[1] >= 1000


def test_pack_sort_kernels_identical():
    """The fused-key quicksort kernel must order EXACTLY like the stable
    lexsort (legal because (term, seg, ord) rows are unique)."""
    import numpy as np

    from sparksearch.index import build as b

    rng = np.random.default_rng(7)
    n = 50_000
    vals = rng.integers(-2**62, 2**62, 500).astype(np.int64)
    term = vals[rng.integers(0, 500, n)]
    seg = rng.integers(0, 8, n).astype(np.int32)
    # unique (term, seg, ord): draw ordinals without replacement per pair
    ords = rng.permutation(n).astype(np.int64)
    fused = b._pack_sort_order(term, seg, ords)
    ref = np.lexsort((ords, seg, term))
    assert np.array_equal(
        np.stack([term[fused], seg[fused], ords[fused]]),
        np.stack([term[ref], seg[ref], ords[ref]]),
    )
    # force the lexsort fallback over the same rows: same order out
    old = b.PACK_FUSED_MAX_BITS
    try:
        b.PACK_FUSED_MAX_BITS = 0
        fallback = b._pack_sort_order(term, seg, ords)
    finally:
        b.PACK_FUSED_MAX_BITS = old
    assert np.array_equal(
        np.stack([term[fallback], seg[fallback], ords[fallback]]),
        np.stack([term[fused], seg[fused], ords[fused]]),
    )
    # high-cardinality terms (every row distinct) exercise rank_bits = max
    t2 = rng.permutation(n).astype(np.int64) - n // 2
    f2 = b._pack_sort_order(t2, seg, ords)
    r2 = np.lexsort((ords, seg, t2))
    assert np.array_equal(f2, r2)  # unique keys: orders identical
    assert len(b._pack_sort_order(term[:0], seg[:0], ords[:0])) == 0


def test_pack_sort_order_property():
    """Property: for ANY unique-(term,seg,ord) input — any term
    cardinality, any ordinal range (including ranges that force the
    fused key past 63 bits and into the lexsort fallback) — the kernel
    reproduces the stable 3-key lexsort order exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparksearch.index import build as b

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 3000),
        ndist=st.integers(1, 200),
        seed=st.integers(0, 2**31 - 1),
        ord_shift=st.sampled_from([0, 20, 45, 58]),  # 58 → fallback path
    )
    def run(n, ndist, seed, ord_shift):
        rng = np.random.default_rng(seed)
        vals = rng.integers(-2**62, 2**62, ndist).astype(np.int64)
        term = vals[rng.integers(0, ndist, n)]
        seg = rng.integers(0, 8, n).astype(np.int32)
        ords = (rng.permutation(n).astype(np.int64) << ord_shift) | rng.integers(
            0, max(1, 1 << min(ord_shift, 20)), n
        )
        # re-draw until unique (term, seg, ord) — permutation base makes
        # collisions impossible for shift 0; for shifted ords the low
        # bits could collide within a (term, seg) pair, so dedupe
        key = np.stack([term, seg.astype(np.int64), ords])
        _, idx = np.unique(key, axis=1, return_index=True)
        term, seg, ords = term[idx], seg[idx], ords[idx]
        got = b._pack_sort_order(term, seg, ords)
        ref = np.lexsort((ords, seg, term))
        assert np.array_equal(
            np.stack([term[got], seg[got], ords[got]]),
            np.stack([term[ref], seg[ref], ords[ref]]),
        )

    run()
