"""Multimodal plumbing tests — schemas, batching, deterministic stubs
(decoders themselves are stubbed: no codec libs in this container)."""

import pyspark.sql.functions as F

from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_metadata,
    sample_frames,
)


def _media(spark):
    rows = [
        {"media_id": 1, "kind": "image", "mime": "image/png", "payload": b"\x89PNG fake",
         "width": 1024, "height": 768, "duration_ms": None},
        {"media_id": 2, "kind": "video", "mime": "video/mp4", "payload": b"\x00mp4 fake" * 40,
         "width": 1920, "height": 1080, "duration_ms": 3500},
        {"media_id": 3, "kind": "audio", "mime": "audio/wav", "payload": b"RIFF fake",
         "width": None, "height": None, "duration_ms": 2000},
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark):
    m = _media(spark)
    a = {r["media_id"]: r["feature"] for r in extract_features(m).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(m).collect()}
    assert a == b
    assert len(a[1]) == 16
    assert all(r is not None for r in a.values())


def test_sample_frames(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    # only the video; 3500ms / 1000ms → 3 frames
    assert {r["media_id"] for r in frames} == {2}
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2]


def test_resize_metadata(spark):
    out = {r["media_id"]: (r["target_width"], r["target_height"])
           for r in resize_metadata(_media(spark), max_side=512).collect()}
    assert out[1] == (512, 384)
    assert out[2] == (512, 288)
    assert out[3] == (None, None)
