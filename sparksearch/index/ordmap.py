"""Ordinal sidecar (format v3) — dense per-corpus document ordinals.

Postings v3 store **ordinal** gaps instead of raw ``doc_id`` gaps: the
hash-spread int64 ``xxhash64(url)`` ids differ by ~2^60 between
neighbours (≈7 varint bytes per gap), while dense ordinals assigned by
doc_id rank differ by ~1 (1 varint byte).  Measured on the 490 k-doc
corpus, the doc-gap varint encode alone was half the pack kernel
(720 ms of 1.5 s per bucket task) and the dominant postings column on
disk; ordinals collapse both.  The dl (document length) column moves out
of the postings into this sidecar as well — one int per document instead
of one varint per posting.

The sidecar is the ``doclens`` table, hive-partitioned by ``segment_id``
with columns (doc_id, dl, ordinal):

* **Assignment** (build): ordinal = global rank of doc_id ascending —
  a doclens-sized sort (16 B/doc, NOT corpus-sized) + zipWithIndex.
  Deterministic at any parallelism.
* **Upsert**: replaced docs keep their ordinal (same doc_id → byte-stable
  blocks for unaffected buckets); NEW docs append ordinals from
  ``meta["next_ordinal"]`` in doc_id order; deletes retire ordinals
  (holes are fine — every lookup is a searchsorted over the stored
  ordinal column, never a positional index).  Like Lucene segment
  layouts, the posting BYTES therefore depend on update history while
  query results do not; ``compact_index`` (the force-merge twin)
  renumbers densely and restores canonical, rebuild-identical bytes.
* **Scale**: a segment's sidecar slice is what a query/pack task needs;
  partitioning by ``segment_id`` keeps that slice executor-sized at any
  corpus size (the driver-global load below is gated by ``n_docs``).

``OrdinalMap`` is the query/pack-side view: vectorized ordinal →
(doc_id, dl) resolution and doc_id → ordinal mapping.
"""

from __future__ import annotations

import os

import numpy as np

DOCLENS = "doclens"

# executor-process cache of per-segment maps, keyed by (dir, seg, gen) —
# a Python worker is reused across tasks, so repeated queries against the
# same index generation load each segment sidecar once
_CACHE: dict[tuple, "OrdinalMap"] = {}
_CACHE_MAX = 64


class OrdinalMap:
    """Vectorized ordinal↔doc_id/dl lookups over sidecar arrays.

    Multi-field sidecars carry an ``orig`` column (the ORIGINAL doc id
    behind each per-(doc, field) scoring row); ``docs_of`` then returns
    origs so query results always surface real doc ids, while the keyed
    ``doc_id`` column stays the scoring-row (sdoc) id the pack direction
    needs."""

    def __init__(self, ordinals: np.ndarray, doc_ids: np.ndarray, dls: np.ndarray,
                 origs: np.ndarray | None = None):
        o = np.argsort(ordinals, kind="stable")
        self.ordinals = np.ascontiguousarray(ordinals[o], dtype=np.int64)
        self.doc_ids = np.ascontiguousarray(doc_ids[o], dtype=np.int64)
        self.dls = np.ascontiguousarray(dls[o], dtype=np.int64)
        self.origs = (
            np.ascontiguousarray(origs[o], dtype=np.int64)
            if origs is not None else None
        )
        # doc_id-sorted view for the pack-side doc→ordinal direction
        self._by_doc: tuple[np.ndarray, np.ndarray] | None = None

    def __len__(self) -> int:
        return len(self.ordinals)

    def resolve(self, ords: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """ordinals → (display doc_ids int64, dls float64)."""
        idx = np.searchsorted(self.ordinals, ords)
        out_ids = self.origs if self.origs is not None else self.doc_ids
        return out_ids[idx], self.dls[idx].astype(np.float64)

    def dls_of(self, ords: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.ordinals, ords)
        return self.dls[idx].astype(np.float64)

    def docs_of(self, ords: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.ordinals, ords)
        out_ids = self.origs if self.origs is not None else self.doc_ids
        return out_ids[idx]

    def ordinals_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """doc_ids → ordinals (pack direction); every doc_id must exist."""
        if self._by_doc is None:
            o = np.argsort(self.doc_ids, kind="stable")
            self._by_doc = (self.doc_ids[o], self.ordinals[o])
        keys, vals = self._by_doc
        return vals[np.searchsorted(keys, doc_ids)]


def load_map(index_dir: str, segment_id: int | None = None) -> OrdinalMap:
    """Read the sidecar (one segment's partition, or all) with pyarrow."""
    import pyarrow.dataset as pds

    path = os.path.join(index_dir, DOCLENS)
    if segment_id is not None:
        path = os.path.join(path, f"segment_id={segment_id}")
    ds = pds.dataset(path, format="parquet")
    cols = ["ordinal", "doc_id", "dl"]
    has_orig = "orig" in ds.schema.names
    tbl = ds.to_table(columns=cols + (["orig"] if has_orig else []))
    return OrdinalMap(
        tbl.column("ordinal").to_numpy(zero_copy_only=False),
        tbl.column("doc_id").to_numpy(zero_copy_only=False),
        tbl.column("dl").to_numpy(zero_copy_only=False),
        tbl.column("orig").to_numpy(zero_copy_only=False) if has_orig else None,
    )


TOMBSTONES = "tombstones"
_TOMB_CACHE: dict[tuple, np.ndarray] = {}


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted int64 array of RETIRED ordinals (generational upserts:
    replaced/deleted docs' old ordinals — their postings in any
    generation are dead).  Empty when the index has no delta
    generations."""
    import pyarrow.dataset as pds

    path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.isdir(path):
        return np.zeros(0, dtype=np.int64)
    tbl = pds.dataset(path, format="parquet").to_table(columns=["ordinal"])
    return np.sort(tbl.column("ordinal").to_numpy(zero_copy_only=False).astype(np.int64))


def cached_tombstones(index_dir: str, gen: int) -> np.ndarray:
    key = (index_dir, int(gen))
    t = _TOMB_CACHE.get(key)
    if t is None:
        if len(_TOMB_CACHE) >= _CACHE_MAX:
            _TOMB_CACHE.clear()
        t = _TOMB_CACHE[key] = load_tombstones(index_dir)
    return t


def cached_map(index_dir: str, gen: int, segment_ids: list[int]) -> OrdinalMap:
    """Executor-side: per-segment cached loads, merged when a task spans
    several segments (rare — scoring is grouped by segment)."""
    maps = []
    for seg in segment_ids:
        key = (index_dir, int(seg), int(gen))
        m = _CACHE.get(key)
        if m is None:
            if len(_CACHE) >= _CACHE_MAX:
                _CACHE.clear()
            m = _CACHE[key] = load_map(index_dir, int(seg))
        maps.append(m)
    if len(maps) == 1:
        return maps[0]
    return OrdinalMap(
        np.concatenate([m.ordinals for m in maps]),
        np.concatenate([m.doc_ids for m in maps]),
        np.concatenate([m.dls for m in maps]),
        (
            np.concatenate([m.origs for m in maps])
            if all(m.origs is not None for m in maps) else None
        ),
    )
