"""Incremental reassembly via Structured Streaming (SURVEY.md §2.11).

The reference is batch-only with file-level resume (reference
extract.py:68-71); the engine's equivalent incremental mode is a
``Trigger.AvailableNow`` stream over the transcripts table: each
trigger drains whatever is newly available, reassembles complete
conversations, and appends to the documents sink — checkpointed by
Spark's streaming offsets instead of our `_ckpt` anti-join (the two
resume mechanisms are alternatives; AvailableNow is the
latency-flexible one, `_ckpt` the replayable-batch one).

Semantics note: reassembly needs ALL turns of a conversation, so the
stream groups per micro-batch via ``foreachBatch`` + the batch
reassemble() — conversations split across micro-batches would be
partial; AvailableNow with a parquet source delivers every available
file in one run (maxFilesPerTrigger unset), so within one drain the
grouping is complete. For continuous tailing with watermarked
completion, feed closed conversations only (e.g. by session close
markers) — out of scope for the reference's capabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.reassembly import reassemble
from ..schemas import TRANSCRIPTS


def stream_reassemble_available_now(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
) -> None:
    """Drain all currently-available transcript parquet into the
    documents sink once (Trigger.AvailableNow), then stop."""
    src = (
        spark.readStream.schema(TRANSCRIPTS)
        .parquet(source_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = reassemble(batch_df).documents
        docs.write.mode("append").parquet(sink_path)

    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
