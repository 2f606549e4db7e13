"""S1 — transcripts source (SURVEY.md §2.1).

Production source is an Iceberg table partitioned by
``bucket(conv_id)`` (so the Stage-A groupBy shuffles co-located data);
here: parquet path or a pre-built DataFrame, schema-validated against
the BASELINE.json input_hint contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TRANSCRIPTS

REQUIRED = {f.name for f in TRANSCRIPTS.fields}


def _validated(df: DataFrame) -> DataFrame:
    missing = REQUIRED - set(df.columns)
    if missing:
        raise ValueError(f"transcripts source missing columns: {sorted(missing)}")
    return df.select(
        df.conv_id.cast("string").alias("conv_id"),
        df.turn_idx.cast("int").alias("turn_idx"),
        df.role.cast("string").alias("role"),
        df.text.cast("string").alias("text"),
        df.tool.cast("string").alias("tool"),
        df.ts.cast("timestamp").alias("ts"),
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return _validated(spark.read.parquet(path))


def write_transcripts_bucketed(
    df: DataFrame, table: str, n_buckets: int = 64, path: str | None = None
) -> None:
    """Write the corpus in the production layout: hash-bucketed on
    ``conv_id`` (the Spark-native twin of Iceberg's ``bucket(N,
    conv_id)`` partition transform), sorted within buckets by
    (conv_id, turn_idx).

    Why it matters at 100 TB: a bucketed scan reports
    ``HashPartitioning(conv_id, N)`` to the planner, which satisfies
    the ClusteredDistribution of EVERY conv_id-keyed operator in Stage
    A — both phases of the salted reassembly aggregate — so the
    pipeline's one wide shuffle (the dominant exchange in the
    BENCH/BASELINE.md plan audit) disappears entirely; reassembly
    becomes a map-only job over co-located turns. Plan-locked in
    tests/test_bucketed_input.py."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        # a stale managed-table location (metadata lost with a prior
        # in-memory catalog session) blocks CREATE — clear it
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
        loc = os.path.join(wh, table.lower()) if wh else None
        if loc and os.path.exists(loc):
            shutil.rmtree(loc)
    # one shuffle task per bucket BEFORE the bucketed write: without
    # this every writer task emits one file per bucket (tasks×buckets
    # small files — measured 8192 files / 15× slower scans at 64×128);
    # repartition uses the same Murmur3 hash as bucketBy, so each task
    # holds exactly one whole bucket → n_buckets files total
    df = df.repartition(n_buckets, "conv_id")
    w = (
        df.write.bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .mode("overwrite")
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_transcripts_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed corpus table; the scan carries its bucketing as
    output partitioning (requires spark.sql.sources.bucketing.enabled,
    on by default). NOTE: the schema-normalizing casts of
    ``read_transcripts`` are deliberately NOT applied over the bucket
    columns here — a cast on conv_id would erase the bucketing info
    (the table is written already-normalized instead)."""
    df = spark.table(table)
    missing = REQUIRED - set(df.columns)
    if missing:
        raise ValueError(f"transcripts table missing columns: {sorted(missing)}")
    return df
