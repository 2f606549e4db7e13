"""S1 — transcripts source (SURVEY.md §2.1).

Production source is an Iceberg table partitioned by
``bucket(conv_id)`` (so the Stage-A groupBy shuffles co-located data);
here: parquet path or a pre-built DataFrame, schema-validated against
the BASELINE.json input_hint contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TRANSCRIPTS

REQUIRED = {f.name for f in TRANSCRIPTS.fields}


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
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
