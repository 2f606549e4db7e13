"""Watermarked streaming aggregations (SURVEY.md §2.11 — beyond the
reference, which is batch-only; required engine capability for
continuous transcript feeds).

- ``stream_turn_counts``: tumbling-window per-conversation turn
  counts with a watermark bounding late-turn state.
- ``stream_session_windows``: ``session_window`` gap-based
  sessionization of the event/turn stream.

Both are source→sink wiring around standard Structured Streaming
operators — the built-in-operator half of the streaming surface. The
custom-state half (idle-timeout conversation assembly via
``applyInPandasWithState``) lives in streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRANSCRIPTS


def stream_turn_counts(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> None:
    """Tumbling-window turn counts per conversation; append mode (a
    window finalizes once the watermark passes it)."""
    src = spark.readStream.schema(TRANSCRIPTS).parquet(source_path)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id", "n_turns",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_session_windows(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
) -> None:
    """Gap-based session windows per conversation (session_window —
    the streaming analog of the batch sessionize query)."""
    src = spark.readStream.schema(TRANSCRIPTS).parquet(source_path)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id", "n_turns",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
