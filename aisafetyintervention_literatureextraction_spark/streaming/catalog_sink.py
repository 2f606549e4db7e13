"""Exactly-once streaming sink into the warehouse catalog (§2.11).

``foreachBatch`` + a plain parquet append is at-least-once: a crash
between the data write and the streaming checkpoint's offset commit
replays the micro-batch and duplicates its rows. This sink closes that
window with the same manifest-level mechanism the batch pipeline uses
(checkpoint.reconcile semantics):

1. every micro-batch appends under a DETERMINISTIC run_id derived from
   (stream_id, batch_id) — Spark guarantees batch_id is stable across
   replays of the same data;
2. the commit point is a state-table row (mark_processed) written
   AFTER the append;
3. on replay, an already-committed batch is skipped outright, and a
   torn batch (data landed, state didn't) is healed by pruning its
   orphaned manifest entries before re-appending — O(manifest), no
   data IO.

Works with any trigger (AvailableNow or continuous micro-batches) and
against either catalog backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import checkpoint as ckpt
from ..operators.reassembly import reassemble
from ..schemas import TRANSCRIPTS


def exactly_once_append(
    catalog,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    stream_id: str = "stream",
) -> str:
    """Idempotently append one micro-batch. Returns 'appended' or
    'skipped' (batch already committed by a previous attempt)."""
    run_id = f"{stream_id}-b{batch_id}"
    committed = ckpt.committed_run_ids(catalog)
    if run_id in committed:
        return "skipped"
    # heal a torn prior attempt of THIS batch (data landed, commit
    # point didn't): drop its orphaned entries before re-appending
    catalog.prune_orphan_runs(table, committed)
    catalog.append(batch_df, table, run_id=run_id)
    ckpt.mark_processed(  # commit point
        catalog,
        f"stream_{table}",
        run_id,
        batch_df.sparkSession.createDataFrame(
            [(f"batch:{batch_id}",)], "conv_id string"
        ),
    )
    return "appended"


def stream_reassemble_to_catalog(
    spark: SparkSession,
    source_path: str,
    catalog,
    table: str = "documents",
    checkpoint_path: str | None = None,
    stream_id: str = "reassembly",
) -> None:
    """AvailableNow reassembly draining into a catalog table with
    exactly-once batch commits (the catalog twin of
    reassembly_stream.stream_reassemble_available_now)."""
    src = spark.readStream.schema(TRANSCRIPTS).parquet(source_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = reassemble(batch_df).documents
        exactly_once_append(catalog, table, docs, batch_id, stream_id=stream_id)

    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
