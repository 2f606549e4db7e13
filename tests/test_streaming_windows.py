"""Watermarked streaming aggregation tests: results equal the batch
equivalents once the stream drains (AvailableNow finalizes all
windows)."""

import os
from datetime import datetime, timedelta, timezone

import pyspark.sql.functions as F

from aisafetyintervention_literatureextraction_spark.schemas import TRANSCRIPTS
from aisafetyintervention_literatureextraction_spark.streaming.windows import (
    stream_session_windows,
    stream_turn_counts,
)

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _rows():
    rows = []
    # conv a: two bursts separated by 20 min → 2 sessions
    for i in range(4):
        rows.append(("a", i, "user", f"t{i}", None, T0 + timedelta(minutes=i)))
    for i in range(4, 7):
        rows.append(("a", i, "user", f"t{i}", None, T0 + timedelta(minutes=25 + i)))
    # conv b: one burst
    for i in range(3):
        rows.append(("b", i, "user", f"t{i}", None, T0 + timedelta(minutes=2 * i)))
    # watermark sentinel: a far-future turn advances event time past
    # every real window so append mode finalizes them (bounded-stream
    # testing idiom; in production the stream simply keeps flowing)
    rows.append(("__sentinel", 0, "user", "s", None, T0 + timedelta(days=2)))
    return rows


def test_stream_turn_counts_matches_batch(spark, warehouse):
    src = os.path.join(warehouse, "twsrc")
    sink = os.path.join(warehouse, "twsink")
    ck = os.path.join(warehouse, "twck")
    df = spark.createDataFrame(_rows(), TRANSCRIPTS)
    df.write.parquet(src)

    stream_turn_counts(spark, src, sink, ck, window="10 minutes")
    got = sorted(
        map(tuple,
            spark.read.parquet(sink)
            .filter(F.col("conv_id") != "__sentinel")
            .select("conv_id", "window_start", "n_turns").collect())
    )
    batch = (
        df.filter(F.col("conv_id") != "__sentinel")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select("conv_id", F.col("w.start").alias("window_start"), "n_turns")
    )
    assert got == sorted(map(tuple, batch.collect()))
    assert len(got) > 2


def test_stream_session_windows(spark, warehouse):
    src = os.path.join(warehouse, "sessrc")
    sink = os.path.join(warehouse, "sessink")
    ck = os.path.join(warehouse, "sesck")
    spark.createDataFrame(_rows(), TRANSCRIPTS).write.parquet(src)

    stream_session_windows(spark, src, sink, ck, gap="5 minutes")
    got = spark.read.parquet(sink).filter(F.col("conv_id") != "__sentinel")
    per_conv = {
        r["conv_id"]: r["n"]
        for r in got.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_conv == {"a": 2, "b": 1}  # 20-min gap splits conv a
    sizes = {
        (r["conv_id"], r["n_turns"]) for r in got.collect()
    }
    assert sizes == {("a", 4), ("a", 3), ("b", 3)}
