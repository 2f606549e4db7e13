"""Custom stateful streaming operator: idle-timeout conversation
assembly via ``applyInPandasWithState`` (task mandate §2.11 — "custom
stateful operators"; the windowed aggregations in windows.py cover the
built-in operator surface, this covers the arbitrary-state one).

Semantics — the streaming twin of batch Stage A
(operators/reassembly.reassemble):

- turns arrive in any order on a watermarked event-time stream;
- per ``conv_id``, state accumulates the turn payloads;
- when a conversation has been idle past ``idle_gap`` in EVENT time
  (watermark passes last_turn_ts + gap), the conversation closes:
  exact-duplicate turns collapse, order is the same
  (turn_idx, text, role, tool) struct order as the batch sort, and the
  row emits either the assembled document or a quarantine reason
  (conflicting_duplicate_turn / turn_index_gap) — byte-compatible with
  the batch path (tested for equivalence).

State is bounded: one entry per OPEN conversation, each holding only
its own turns (the same per-key bound the salted batch path enforces
with segments); closed conversations delete their state. At cluster
scale the state store shards by conv_id exactly like the batch
shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..schemas import TRANSCRIPTS

OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", IntegerType()),
    StructField("doc_text", StringType()),
    StructField("reason", StringType()),   # null = clean document
])

STATE_SCHEMA = StructType([
    StructField("idxs", ArrayType(IntegerType())),
    StructField("texts", ArrayType(StringType())),
    StructField("roles", ArrayType(StringType())),
    StructField("tools", ArrayType(StringType())),
    StructField("max_ts_ms", LongType()),
])

TURN_SEP = "\n"


def _close(key: tuple, idxs, texts, roles, tools) -> pd.DataFrame:
    """Assemble or quarantine a finished conversation — mirrors the
    batch checks (reassembly.py): dedupe identical turns, conflict =
    same idx with different payload, gap = indices not 0..n-1.
    (One deliberate difference from batch: the dedupe key here excludes
    ``ts``, so an identical turn re-sent with a new timestamp collapses
    instead of quarantining — re-delivery is normal on a stream.)"""
    turns = sorted(
        {
            (i, t, r, tl if tl is not None else "")
            for i, t, r, tl in zip(idxs, texts, roles, tools)
        },
        # null text/role turns must not crash the query (ADVICE r2);
        # None sorts first, matching Spark's ASC NULLS FIRST struct
        # ordering in the batch path's array_sort
        key=lambda x: (x[0], x[1] is not None, x[1] or "", x[2] is not None, x[2] or ""),
    )
    distinct_idx = sorted({t[0] for t in turns})
    n = len(distinct_idx)
    if len(turns) != n:
        reason = "conflicting_duplicate_turn"
    elif distinct_idx[0] != 0 or distinct_idx[-1] != n - 1:
        reason = "turn_index_gap"
    else:
        reason = None
    if reason:
        return pd.DataFrame({
            "conv_id": [key[0]], "n_turns": [n],
            "doc_text": [None], "reason": [reason],
        })
    return pd.DataFrame({
        "conv_id": [key[0]],
        "n_turns": [n],
        # skip null texts like the batch path's array_join does
        "doc_text": [TURN_SEP.join(t[1] for t in turns if t[1] is not None)],
        "reason": [None],
    })


def _assemble_fn(idle_gap_ms: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            idxs, texts, roles, tools, _ = state.get
            state.remove()
            yield _close(key, idxs, texts, roles, tools)
            return
        if state.exists:
            idxs, texts, roles, tools, max_ts = state.get
            idxs, texts, roles, tools = list(idxs), list(texts), list(roles), list(tools)
        else:
            idxs, texts, roles, tools, max_ts = [], [], [], [], 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idxs.extend(int(x) for x in pdf["turn_idx"])
            texts.extend(pdf["text"])
            roles.extend(pdf["role"])
            tools.extend(None if pd.isna(x) else x for x in pdf["tool"])
            ts_valid = pdf["ts"].dropna()
            if len(ts_valid):
                max_ts = max(max_ts, int(ts_valid.max().value // 1_000_000))
        state.update((idxs, texts, roles, tools, max_ts))
        # close when EVENT time (the watermark) passes last turn + gap
        state.setTimeoutTimestamp(max_ts + idle_gap_ms)
        return
        yield  # pragma: no cover — makes fn a generator on every path

    return fn


def stream_reassemble_stateful(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    idle_gap_ms: int = 10 * 60 * 1000,
    watermark: str = "1 minute",
    max_files_per_trigger: int = 1,
) -> None:
    """Run the stateful assembler over a parquet turn stream with
    Trigger.AvailableNow. ``max_files_per_trigger=1`` makes each file a
    micro-batch so the watermark advances between files and idle
    conversations close during the run (in production the stream is
    continuous and this is automatic)."""
    src = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    out = (
        src.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _assemble_fn(idle_gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
