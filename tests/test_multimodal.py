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


# ---------------------------------------------------------------------------
# r3: real PNG codec + real AVI demux (VERDICT r2 next-step #6)
# ---------------------------------------------------------------------------

def _rand_img(h, w, ch, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


def test_png_roundtrip_all_filters():
    """decode_png inverts encode_png exactly for every spec filter
    (0..4) and a mixed per-row schedule, on RGB/gray/RGBA."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rgb = _rand_img(13, 9, 3)
    for ft in (0, 1, 2, 3, 4):
        got = decode_png(encode_png(rgb, filter_type=ft))
        np.testing.assert_array_equal(got, rgb), ft
    mixed = [y % 5 for y in range(13)]
    np.testing.assert_array_equal(decode_png(encode_png(rgb, mixed)), rgb)

    gray = _rand_img(6, 5, 1)
    got = decode_png(encode_png(gray, filter_type=4))
    np.testing.assert_array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = _rand_img(4, 7, 4)
    got = decode_png(encode_png(rgba, filter_type=2))
    np.testing.assert_array_equal(got, rgba[:, :, :3])


def test_png_rejects_unsupported():
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_png,
    )

    assert decode_png(b"not a png") is None
    assert decode_png(b"") is None
    assert decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None


def test_decode_images_real_png(spark):
    """The distributed decode path reports real dims + channel means
    for PNG payloads ('png' decoder, not stub)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_images,
        encode_png,
        extract_features,
    )

    img = _rand_img(16, 12, 3, seed=3)
    rows = [
        {"media_id": 1, "kind": "image", "mime": "image/png",
         "payload": bytearray(encode_png(img, filter_type=4)),
         "width": None, "height": None, "duration_ms": None},
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_images(media).collect()[0]
    assert got["decoder"] == "png"
    assert (got["width"], got["height"]) == (12, 16)
    np.testing.assert_allclose(
        got["mean_rgb"], img.reshape(-1, 3).mean(axis=0), rtol=1e-5
    )
    feat = extract_features(media).collect()[0]
    assert feat["decoder"] == "png"
    assert len(feat["feature"]) == 16


def _build_avi(frames: list[bytes]) -> bytes:
    """Minimal valid-enough RIFF/AVI: one movi LIST of 00dc chunks."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    movi = chunk(b"LIST", movi_body)
    riff_body = b"AVI " + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def test_avi_demux_and_frame_decode(spark):
    """sample_frames demuxes a real RIFF/AVI container and the sampled
    frame payloads decode back to the original pixels (PNG-in-AVI)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        demux_avi,
        encode_png,
        sample_frames,
    )

    imgs = [_rand_img(8, 8, 3, seed=i) for i in range(6)]
    avi = _build_avi([encode_png(im) for im in imgs])
    assert len(demux_avi(avi)) == 6
    assert demux_avi(b"RIFF\x00\x00\x00\x00WAVE") is None  # not AVI

    rows = [{"media_id": 9, "kind": "video", "mime": "video/x-msvideo",
             "payload": bytearray(avi), "width": None, "height": None,
             "duration_ms": 6000}]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sorted(
        sample_frames(media, every_ms=1000).collect(), key=lambda r: r["frame_idx"]
    )
    assert len(frames) == 6
    for i, fr in enumerate(frames):
        np.testing.assert_array_equal(decode_png(bytes(fr["frame_payload"])), imgs[i])


def test_gif_roundtrip_and_multiframe():
    """encode_gif → decode_gif round-trips pixels exactly, single- and
    multi-frame (full-frame draws, disposal 0)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, size=(11, 3), dtype=np.uint8)
    imgs = [palette[rng.integers(0, 11, size=(9, 7))] for _ in range(3)]
    single = decode_gif(encode_gif(imgs[:1]))
    assert len(single) == 1
    np.testing.assert_array_equal(single[0], imgs[0])
    multi = decode_gif(encode_gif(imgs))
    assert len(multi) == 3
    for got, want in zip(multi, imgs):
        np.testing.assert_array_equal(got, want)
    assert decode_gif(b"GIF89a\x00") is None          # truncated
    assert decode_gif(b"\x89PNG not a gif") is None   # wrong magic


def test_gif_interlaced():
    """A frame stored with the 4-pass interlace row schedule decodes
    back to the original row order."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(6)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 4, size=(13, 5))]
    h = img.shape[0]
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    # store rows in interlace order, then flip the interlace bit in the
    # image descriptor (offset: 6+7 header + 3*table, +9 into 0x2C)
    raw = bytearray(encode_gif([img[order]]))
    n_bits = ((raw[10] & 7) + 1)
    desc = 13 + 3 * (1 << n_bits)
    assert raw[desc] == 0x2C
    raw[desc + 9] |= 0x40
    got = decode_gif(bytes(raw))
    np.testing.assert_array_equal(got[0], img)


def test_gif_image_dispatch_and_frame_sampling(spark):
    """decode_image picks the gif decoder; sample_frames walks an
    animated GIF into P6-decodable frames."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_gif,
        decode_image,
        decode_ppm,
        encode_gif,
        sample_frames,
    )

    rng = np.random.default_rng(7)
    palette = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    imgs = [palette[rng.integers(0, 6, size=(8, 8))] for _ in range(4)]
    gif = encode_gif(imgs)
    img, codec = decode_image(gif)
    assert codec == "gif"
    np.testing.assert_array_equal(img, imgs[0])

    rows = [{"media_id": 11, "kind": "video", "mime": "image/gif",
             "payload": bytearray(gif), "width": None, "height": None,
             "duration_ms": 4000}]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sorted(
        sample_frames(media, every_ms=1000).collect(), key=lambda r: r["frame_idx"]
    )
    assert len(frames) == 4
    for i, fr in enumerate(frames):
        np.testing.assert_array_equal(decode_ppm(bytes(fr["frame_payload"])), imgs[i])
    # sanity: the container itself decodes to the same frames
    for got, want in zip(decode_gif(gif), imgs):
        np.testing.assert_array_equal(got, want)


def test_jpeg_dct_orthonormal():
    """The shared DCT matrix is orthonormal — the transform pair can't
    be wrong-but-mutually-inverse in a way that breaks energy."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import _D

    np.testing.assert_allclose(_D @ _D.T, np.eye(8), atol=1e-12)
    # DC basis: IDCT of a pure-DC block is constant
    blk = np.zeros((8, 8))
    blk[0, 0] = 8.0
    sp = _D.T @ blk @ _D
    np.testing.assert_allclose(sp, np.full((8, 8), 1.0), atol=1e-12)


def _smooth_img(h, w, seed=3):
    """Low-frequency content: what JPEG is designed for (bounded loss)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = []
    for _ in range(3):
        a, b, c = rng.uniform(0.02, 0.2, 3)
        chans.append(
            128 + 100 * np.sin(a * xx + c) * np.cos(b * yy)
        )
    return np.clip(np.stack(chans, axis=2).round(), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_quality100_near_lossless():
    """quality=100 collapses the quant tables to 1s: encode→decode must
    round-trip within float-DCT rounding (±2) — pins FDCT/IDCT AND the
    Huffman coder from both sides (entropy coding is exact, so any
    mismatch there corrupts loudly, not by ±1)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth_img(24, 17)  # non-multiple-of-8 dims: edge padding
    got = decode_jpeg(encode_jpeg(img, quality=100))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_roundtrip_q90_and_420_and_restarts():
    """Lossy-regime round-trips stay close on smooth content across
    4:4:4, 4:2:0, and the DRI/RSTn restart path."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _smooth_img(40, 33, seed=9)
    for kwargs in (
        {"quality": 90},
        {"quality": 90, "subsampling": "420"},
        {"quality": 90, "restart_interval": 2},
        {"quality": 85, "subsampling": "420", "restart_interval": 3},
    ):
        got = decode_jpeg(encode_jpeg(img, **kwargs))
        assert got.shape == img.shape, kwargs
        err = np.abs(got.astype(int) - img.astype(int)).mean()
        assert err < 6.0, (kwargs, err)


def test_jpeg_rejects_garbage_and_dispatch(spark):
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        decode_images,
    )

    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None        # empty body
    assert decode_jpeg(b"not a jpeg") is None
    img = _smooth_img(16, 16, seed=4)
    jpg = encode_jpeg(img, quality=95)
    got, codec = decode_image(jpg)
    assert codec == "jpeg" and got.shape == img.shape

    rows = [{"media_id": 21, "kind": "image", "mime": "image/jpeg",
             "payload": bytearray(jpg), "width": 16, "height": 16,
             "duration_ms": None}]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_images(media).collect()
    assert len(out) == 1 and out[0]["decoder"] == "jpeg"


def test_mp4_demux_and_jpeg_frames(spark):
    """mux_mp4 → demux_mp4 round-trips sample payloads exactly, and a
    'jpeg'-coded MP4 track runs END-TO-END: demux in sample_frames,
    then the sampled frames decode with our own JPEG decoder."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        demux_mp4,
        mux_mp4,
        sample_frames,
    )

    imgs = [_smooth_img(16, 16, seed=i) for i in range(5)]
    jpgs = [encode_jpeg(im, quality=95) for im in imgs]
    mp4 = mux_mp4(jpgs, fourcc=b"jpeg", width=16, height=16)
    got = demux_mp4(mp4)
    assert got == jpgs
    assert demux_mp4(b"\x00\x00\x00\x08free" + b"x" * 64) is None  # no ftyp
    assert demux_mp4(b"RIFF\x00\x00\x00\x00AVI ") is None

    rows = [{"media_id": 31, "kind": "video", "mime": "video/mp4",
             "payload": bytearray(mp4), "width": 16, "height": 16,
             "duration_ms": 5000}]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sorted(
        sample_frames(media, every_ms=1000).collect(), key=lambda r: r["frame_idx"]
    )
    assert len(frames) == 5
    for i, fr in enumerate(frames):
        dec = decode_jpeg(bytes(fr["frame_payload"]))
        assert np.abs(dec.astype(int) - imgs[i].astype(int)).mean() < 6.0


def test_mkv_demux_and_frame_decode(spark):
    """mux_mkv → demux_mkv round-trips un-laced SimpleBlock payloads
    exactly; a PNG-coded Matroska runs end-to-end through
    sample_frames (EBML walk → frames → our PNG decoder)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        demux_mkv,
        encode_png,
        mux_mkv,
        sample_frames,
    )

    imgs = [_rand_img(7, 9, 3, seed=40 + i) for i in range(4)]
    pngs = [encode_png(im) for im in imgs]
    mkv = mux_mkv(pngs)
    assert demux_mkv(mkv) == pngs
    assert demux_mkv(b"\x1a\x45\xdf\xa3" + b"\x00") is None  # corrupt
    assert demux_mkv(b"RIFF....AVI ") is None                # not EBML

    rows = [{"media_id": 41, "kind": "video", "mime": "video/x-matroska",
             "payload": bytearray(mkv), "width": None, "height": None,
             "duration_ms": 4000}]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sorted(
        sample_frames(media, every_ms=1000).collect(), key=lambda r: r["frame_idx"]
    )
    assert len(frames) == 4
    for i, fr in enumerate(frames):
        np.testing.assert_array_equal(decode_png(bytes(fr["frame_payload"])), imgs[i])


def test_audio_track_demux_mp4_and_mkv(spark):
    """Audio tracks demux from both containers (handler 'soun' /
    track type 2) and a WAV-coded sample decodes end-to-end; asking
    for the video track of an audio-only file returns None."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_wav,
        demux_mkv,
        demux_mp4,
        encode_wav,
        mux_mkv,
        mux_mp4,
    )

    rng = np.random.default_rng(50)
    clips = [
        encode_wav((rng.uniform(-1, 1, 800) * 32000).astype(np.int16), 8000)
        for _ in range(3)
    ]
    mp4 = mux_mp4(clips, fourcc=b"sowt", handler=b"soun")
    assert demux_mp4(mp4, handler=b"soun") == clips
    assert demux_mp4(mp4) is None  # no video track in an audio-only file
    mkv = mux_mkv(clips, track_type=2)
    assert demux_mkv(mkv, track_type=2) == clips
    assert demux_mkv(mkv) is None

    got = decode_wav(demux_mp4(mp4, handler=b"soun")[0])
    assert got is not None and got[1] == 8000 and len(got[0]) == 800


def test_png_palette_decode():
    """Color-type-3 (PLTE) PNGs decode to the palette's RGB."""
    import struct
    import zlib

    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_png,
    )

    rng = np.random.default_rng(60)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, size=(6, 4), dtype=np.uint8)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", pal.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = decode_png(png)
    np.testing.assert_array_equal(got, pal[idx])
    # palette missing → reject rather than garbage
    broken = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
              + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert decode_png(broken) is None


def test_png_16bit_decode():
    """16-bit PNGs unfilter at byte granularity and downsample to the
    high byte (filters 0 and 1 exercised)."""
    import struct
    import zlib

    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_png,
    )

    rng = np.random.default_rng(61)
    img16 = rng.integers(0, 65536, size=(5, 4, 3), dtype=np.uint16)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    be = img16.byteswap().view(np.uint8).reshape(5, -1)  # big-endian rows
    rows = []
    for y in range(5):
        if y % 2 == 0:
            rows.append(b"\x00" + be[y].tobytes())
        else:  # Sub filter at byte level, bpp = 6 bytes/pixel
            raw = be[y].astype(np.int16)
            filt = raw.copy()
            filt[6:] = (raw[6:] - raw[:-6]) & 0xFF
            rows.append(b"\x01" + filt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 4, 5, 16, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    got = decode_png(png)
    np.testing.assert_array_equal(got, (img16 >> 8).astype(np.uint8))


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) decode — spectral-selection bands plus
    successive-approximation DC/AC refinement scans with EOB runs and
    correction bits — reconstructs the IDENTICAL pixels the baseline
    path produces for the same quantized coefficients, with no PIL."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    h, w = 41, 53  # odd dims: exercises the unpadded-block-grid rule
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (w + h))], axis=2
    ).astype(np.uint8)
    img = np.clip(
        img.astype(int) + rng.integers(-25, 25, img.shape), 0, 255
    ).astype(np.uint8)
    for sub in ("444", "420"):
        for q in (100, 75):
            prog = encode_jpeg_progressive(img, quality=q, subsampling=sub)
            assert b"\xff\xc2" in prog[:400]  # really SOF2
            out = decode_jpeg(prog)
            ref = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            assert out is not None
            assert np.array_equal(out, ref), (sub, q)
    # near-lossless at q100 vs the source
    out = decode_jpeg(encode_jpeg_progressive(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_progressive_through_decode_image():
    """multimodal.decode_image dispatches progressive JPEG through the
    in-repo codec (no PIL escape hatch needed anymore)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )
    from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
        decode_image,
    )

    img = (np.arange(24 * 32 * 3).reshape(24, 32, 3) % 251).astype(np.uint8)
    arr, decoder = decode_image(encode_jpeg_progressive(img, quality=100))
    assert decoder == "jpeg"
    assert arr is not None and arr.shape == (24, 32, 3)
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 2
