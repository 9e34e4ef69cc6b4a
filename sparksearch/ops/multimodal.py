"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media as ``binary`` payload
columns with typed metadata structs, decodes/extracts features inside
Arrow-batched Python workers, and never ships media through the driver.
This module provides that plumbing — schema, partition-size-aware batch
iteration, vectorized UDF signatures — with the *codec* step stubbed:
the sandbox has no image/audio libraries, so decode raises
``NotImplementedError`` unless a real backend (PIL etc.) is importable,
and a deterministic fake decoder stands in for tests (same bytes in →
same features out, at any parallelism).

Scale notes
===========
* media rows are large → keep ``spark.sql.files.maxPartitionBytes`` low
  for media tables (128 MB default means only ~10 rows per task at 10 MB
  payloads — fine) and NEVER ``collect()`` payloads.
* feature extraction is ``mapInPandas`` so one output row per input row
  is not required (frame sampling explodes, filtering drops corrupt
  rows) and payload columns can be dropped from the output schema —
  column pruning means the expensive bytes never re-shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, "
    "mime string, width int, height int, sample_rate int, duration_ms int"
)

FEATURE_DIM = 64

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, ts_ms int, n_bytes long"

try:  # pragma: no cover - not present in this sandbox
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def decode_image(payload: bytes):  # pragma: no cover - backend-dependent
    """Decode an image payload to an array.  STUB: needs a codec library."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not installed in this sandbox); "
            "use fake_features for deterministic test plumbing"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))


def _fake_feature_matrix(payloads: pd.Series, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decode→embed step.

    Per-row seed = blake2b(payload) → seeded Generator → unit-norm float32
    vector.  Depends ONLY on the bytes, never on row order or partition,
    so results are identical at any parallelism (the same invariant a
    real decoder must satisfy).
    """
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        seed = int.from_bytes(hashlib.blake2b(p, digest_size=8).digest(), "big")
        v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
        out[i] = v / np.linalg.norm(v)
    return out


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature array<float>).

    Payload bytes are consumed inside the Arrow batch and dropped from
    the output — downstream stages shuffle 256 B features, not payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_feature_matrix(pdf["payload"], dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "feature": list(feats),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → one row per sampled frame timestamp (1→N explode).

    Frame *decode* is stubbed (no codec); the row expansion, timestamp
    arithmetic, and payload-dropping output schema are the real plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            ids, idxs, tss, sizes = [], [], [], []
            for mid, dur, payload in zip(
                vids["media_id"], vids["duration_ms"], vids["payload"]
            ):
                n = max(1, int((dur or 0) // every_ms))
                for j in range(n):
                    ids.append(mid)
                    idxs.append(j)
                    tss.append(j * every_ms)
                    sizes.append(0 if payload is None else len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.select("media_id", "kind", "duration_ms", "payload").mapInPandas(
        run, FRAMES_SCHEMA
    )


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload bytes derived from id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                f"https://media.example/{kind}/{i}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 8) * 16 if kind == "image" else None,
                48 + (i % 8) * 12 if kind == "image" else None,
                16000 if kind == "audio" else None,
                (1 + i % 10) * 1500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
