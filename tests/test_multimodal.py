"""Multimodal plumbing: schema, determinism under parallelism, explode."""

from __future__ import annotations

import numpy as np
import pytest

from sparksearch.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 90).cache()


def test_schema(media):
    assert set(media.columns) == {
        "media_id", "url", "kind", "payload", "mime",
        "width", "height", "sample_rate", "duration_ms",
    }


def test_features_shape_and_payload_dropped(media):
    out = mm.extract_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,feature:array<float>>"
    )
    rows = out.collect()
    assert len(rows) == 90
    for r in rows[:5]:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert abs(float(np.linalg.norm(r["feature"])) - 1.0) < 1e-5
        assert r["n_bytes"] > 0


def test_features_deterministic_across_parallelism(media):
    a = {r["media_id"]: tuple(r["feature"]) for r in
         mm.extract_features(media.repartition(1)).collect()}
    b = {r["media_id"]: tuple(r["feature"]) for r in
         mm.extract_features(media.repartition(13)).collect()}
    assert a == b


def test_frame_sampling_explodes_videos(media):
    frames = mm.sample_frames(media, every_ms=1000).collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.collect()
            if r["kind"] == "video"}
    by_id: dict[int, int] = {}
    for f in frames:
        by_id[f["media_id"]] = by_id.get(f["media_id"], 0) + 1
    assert set(by_id) == set(vids)
    for mid, n in by_id.items():
        assert n == max(1, vids[mid] // 1000)


def test_decode_stub_raises_without_backend():
    if mm._HAVE_PIL:
        pytest.skip("PIL present; stub not engaged")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")
