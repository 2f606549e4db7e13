"""Real audio path: RIFF/WAVE PCM decode + distributed signal
features (the audio leg of the multimodal mandate)."""

import numpy as np

from aisafetyintervention_literatureextraction_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_wav,
    encode_wav,
    extract_audio_features,
)


def _sine(freq=440.0, rate=8000, secs=0.5, ch=1):
    t = np.arange(int(rate * secs)) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.stack([x] * ch, axis=1), rate


def test_wav_roundtrip():
    x, rate = _sine(ch=2)
    dec = decode_wav(encode_wav(x, rate))
    assert dec is not None
    got, got_rate = dec
    assert got_rate == rate and got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=5e-5)  # 16-bit quantization


def test_wav_rejects_non_wav():
    assert decode_wav(b"") is None
    assert decode_wav(b"RIFF\x04\x00\x00\x00AVI ") is None
    assert decode_wav(b"not audio at all") is None


def test_audio_features_distributed(spark):
    x, rate = _sine(freq=440.0, rate=8000, secs=0.5)
    rows = [
        {"media_id": 1, "kind": "audio", "mime": "audio/wav",
         "payload": bytearray(encode_wav(x, rate)),
         "width": None, "height": None, "duration_ms": None},
        {"media_id": 2, "kind": "audio", "mime": "audio/mpeg",
         "payload": bytearray(b"\xff\xfbgarbage-mp3"),
         "width": None, "height": None, "duration_ms": None},
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_audio_features(media).collect()}

    ok = got[1]
    assert ok["decoder"] == "wav-pcm"
    assert ok["sample_rate"] == 8000 and ok["n_channels"] == 1
    assert ok["duration_ms"] == 500
    # sine RMS = amp/sqrt(2); ZCR ≈ 2·f/rate
    assert abs(ok["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(ok["zero_crossing_rate"] - 2 * 440 / 8000) < 5e-3

    bad = got[2]
    assert bad["decoder"] is None and bad["rms"] is None
