"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition sizing)
is real and tested; the *decoders* are stubbed behind
``_HAS_CODECS`` because no image/audio libraries exist in this
container — each stub is deterministic on the binary payload so
tests exercise the full distributed path. Swapping a stub for
PIL/librosa/ffmpeg changes ONE function body, not the pipeline.

Batch-shape contract: iterator[pd.DataFrame] → iterator[pd.DataFrame];
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds per-batch
memory (decoded frames are ~100-1000× the encoded bytes — size
batches for the DECODED footprint).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoders would be imported here; absent in this container
    import PIL.Image  # noqa: F401
    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),    # opaque encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("decoder", StringType(), True),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def _stub_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fake embedding from the payload digest — replaces
    a real decode+model forward pass. NOT a real feature; the point is
    the distributed plumbing around it."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """binary payload → feature vector via Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        decoder = "real" if _HAS_CODECS else "stub-sha256"
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if _HAS_CODECS:
                raise NotImplementedError(
                    "real decoder wiring: PIL decode → resize → model; "
                    "not available in this container"
                )
            # the digest is per-row by nature (so is a real image
            # decode — that's the correct batch shape for this stage);
            # the digest→feature expansion is one numpy op per batch
            digs = np.stack([
                np.frombuffer(hashlib.sha256(p).digest(), dtype=np.uint8)
                if p is not None else np.zeros(32, dtype=np.uint8)
                for p in pdf["payload"]
            ])
            feats = (digs[:, np.arange(dim) % 32] / 255.0) * 2.0 - 1.0
            feats[pdf["payload"].isna().to_numpy()] = 0.0  # _stub_feature None contract
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "feature": list(feats.astype(np.float32)),
                "decoder": decoder,
            })

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video → frame rows (one per sampled timestamp). Stub emits
    deterministic slices of the payload as fake frames; real impl =
    ffmpeg keyframe extraction per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if len(vids) == 0:
                continue
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload, dur in zip(
                vids["media_id"], vids["payload"], vids["duration_ms"]
            ):
                n = max(int((dur or 0) // every_ms), 1)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    sl = (payload or b"")[i::n][:64]  # deterministic fake frame
                    rows["frame_payload"].append(sl)
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload", "duration_ms").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def resize_metadata(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-metadata resize plan (no decode needed): target dims
    preserving aspect ratio — JVM-side arithmetic only."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return media.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))
