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


def test_stateful_reassembly_matches_batch(spark, tmp_path):
    """applyInPandasWithState idle-timeout assembler: conversations
    close when event time passes last-turn + gap; closed docs equal the
    batch reassemble output; gap/conflict convs land with quarantine
    reasons."""
    import os
    from datetime import timedelta

    from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
        reassemble,
    )
    from aisafetyintervention_literatureextraction_spark.streaming.stateful import (
        stream_reassemble_stateful,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    cols = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    rows_a = [("a", i, "user", f"a-turn-{i}", None, T0 + timedelta(seconds=i)) for i in range(4)]
    rows_b = [("b", i, "user", f"b-turn-{i}", None, T0 + timedelta(seconds=30 + i)) for i in range(3)]
    gap_conv = [("g", i, "user", f"g-{i}", None, T0 + timedelta(seconds=i)) for i in (0, 1, 3)]
    # file 1: the conversations; file 2: a late sentinel that pushes the
    # watermark past every idle gap so the convs close during the run
    spark.createDataFrame(rows_a + rows_b + gap_conv, cols).coalesce(1).write.parquet(
        src + "/f1", mode="overwrite")
    for f in os.listdir(src + "/f1"):
        if f.endswith(".parquet"):
            os.rename(src + f"/f1/{f}", src + f"/0_{f}")
    import shutil; shutil.rmtree(src + "/f1")
    sentinel = [("__sentinel", 0, "user", "s", None, T0 + timedelta(days=1))]
    spark.createDataFrame(sentinel, cols).coalesce(1).write.parquet(src + "/f2", mode="overwrite")
    for f in os.listdir(src + "/f2"):
        if f.endswith(".parquet"):
            os.rename(src + f"/f2/{f}", src + f"/1_{f}")
    shutil.rmtree(src + "/f2")

    sink, ckpt_dir = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream_reassemble_stateful(
        spark, src, sink, ckpt_dir, idle_gap_ms=5000, watermark="1 second"
    )
    got = {r["conv_id"]: r for r in spark.read.parquet(sink).collect()}
    assert {"a", "b", "g"}.issubset(set(got))

    batch = reassemble(
        spark.createDataFrame(rows_a + rows_b, cols)
    ).documents
    for r in batch.collect():
        s = got[r["conv_id"]]
        assert s["reason"] is None
        assert s["doc_text"] == r["doc_text"]
        assert s["n_turns"] == r["n_turns"]
    assert got["g"]["reason"] == "turn_index_gap"


def test_stateful_close_tolerates_null_payload():
    """ADVICE r2: a null-text or null-role turn must not crash the
    stream's close path (batch path tolerates nulls). Null text is
    skipped in doc_text, mirroring array_join's null-skip semantics."""
    from aisafetyintervention_literatureextraction_spark.streaming.stateful import (
        _close,
    )

    out = _close(
        ("c",),
        [0, 1, 2],
        ["hello", None, "world"],
        [None, "user", "assistant"],
        [None, None, "t"],
    )
    row = out.iloc[0]
    assert row["reason"] is None
    assert row["doc_text"] == "hello\nworld"
    assert row["n_turns"] == 3
