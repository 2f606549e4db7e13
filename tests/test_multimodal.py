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


def _ppm(w, h, fill):
    import numpy as np
    arr = np.full((h, w, 3), fill, dtype=np.uint8)
    arr[: h // 2, : w // 2] = 255 - fill  # structure, not a flat field
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def test_real_ppm_decode_and_features(spark):
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_images,
    )
    rows = [
        {"media_id": 10, "kind": "image", "mime": "image/x-portable-pixmap",
         "payload": _ppm(8, 6, 40), "width": 8, "height": 6, "duration_ms": None},
        {"media_id": 11, "kind": "image", "mime": "image/x-portable-pixmap",
         "payload": _ppm(8, 6, 200), "width": 8, "height": 6, "duration_ms": None},
        {"media_id": 12, "kind": "image", "mime": "image/png",
         "payload": b"\x89PNG not decodable here", "width": None, "height": None,
         "duration_ms": None},
    ]
    m = spark.createDataFrame(rows, MEDIA_SCHEMA)
    dec = {r["media_id"]: r for r in decode_images(m).collect()}
    assert dec[10]["decoder"] == "ppm" and (dec[10]["width"], dec[10]["height"]) == (8, 6)
    assert dec[12]["decoder"] is None and dec[12]["width"] is None

    feats = {r["media_id"]: r for r in extract_features(m).collect()}
    assert feats[10]["decoder"] == "ppm" and feats[11]["decoder"] == "ppm"
    assert feats[12]["decoder"] == "stub-sha256"
    # real content features: different images → different vectors
    assert feats[10]["feature"] != feats[11]["feature"]
    assert len(feats[10]["feature"]) == 16


def test_real_bmp_decode(spark):
    import numpy as np
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_bmp,
    )
    # hand-build a 2x2 24-bit bottom-up BMP: rows padded to 8 bytes
    w, h = 2, 2
    px_bgr = [
        [(255, 0, 0), (0, 255, 0)],   # bottom row: blue, green (BGR!)
        [(0, 0, 255), (10, 20, 30)],  # top row: red, misc
    ]
    rows = b""
    for r in px_bgr:
        line = b"".join(bytes(p) for p in r)
        rows += line + b"\x00" * ((4 - len(line) % 4) % 4)
    header = (b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little"))
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
           + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
           + len(rows).to_bytes(4, "little") + b"\x00" * 16)
    img = decode_bmp(header + dib + rows)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)   # top-left is RGB red
    assert tuple(img[1, 1]) == (0, 255, 0)   # bottom-right green
    assert isinstance(img, np.ndarray)


def test_real_resize_roundtrip(spark):
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_ppm, resize_images,
    )
    rows = [{"media_id": 20, "kind": "image", "mime": "image/x-portable-pixmap",
             "payload": _ppm(64, 32, 80), "width": 64, "height": 32,
             "duration_ms": None}]
    m = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(m, max_side=16).collect()[0]
    assert (out["width"], out["height"]) == (16, 8)
    img = decode_ppm(bytes(out["payload"]))
    assert img.shape == (8, 16, 3)
    # nearest-neighbor preserves the quadrant structure
    assert (img[0, 0] == 255 - 80).all() and (img[7, 15] == 80).all()


def test_ppm_stream_frame_sampling(spark):
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_ppm,
    )
    stream = b"".join(_ppm(4, 4, 10 * i) for i in range(5))
    rows = [{"media_id": 30, "kind": "video", "mime": "video/x-ppm-stream",
             "payload": stream, "width": 4, "height": 4, "duration_ms": 5000}]
    m = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(m, every_ms=1000).collect()
    assert len(frames) == 5
    for fr in frames:
        img = decode_ppm(bytes(fr["frame_payload"]))
        assert img is not None and img.shape == (4, 4, 3)
