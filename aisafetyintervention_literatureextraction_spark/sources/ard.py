"""S6 — ARD corpus source (SURVEY.md §2.1, FIXTURES.md §2).

The reference ships 12 JSONL example corpora all sharing exactly six
keys (reference data/raw/ard_examples/arxiv.jsonl.example.json:1-10):
title, authors[], date_published, text, abstract, url. Explicit
schema (never inferSchema at scale — schema inference is a full
pre-scan), gzip transparent (S4: the reference's iter_jsonl handles
``.gz``; Spark's JSON reader does codec detection natively).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

ARD_SCHEMA = StructType([
    StructField("title", StringType(), True),
    StructField("authors", ArrayType(StringType()), True),
    StructField("date_published", StringType(), True),  # ISO-8601 string in source
    StructField("text", StringType(), True),
    StructField("abstract", StringType(), True),
    StructField("url", StringType(), True),
])


def read_ard(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → typed DataFrame; blank lines dropped by the reader (F4),
    date parsed to timestamp."""
    df = spark.read.schema(ARD_SCHEMA).json(path)
    return df.withColumn(
        "date_published", F.to_timestamp(F.col("date_published"))
    )


def _non_blank(col: Column) -> Column:
    """NULL when the string holds no non-whitespace character."""
    return F.when(
        F.length(F.regexp_replace(col, r"\s", "")) > 0, col
    )


def ard_as_documents(ard: DataFrame) -> DataFrame:
    """Map the ARD article shape onto the engine's document abstraction
    (D1/D2 unification, SURVEY.md §1.1): doc id = url (the stable key),
    doc_text = title + abstract + text."""
    return ard.select(
        # blank ids are as unkeyable as null ones: two url-less
        # articles with title "" must not collide on conv_id ""
        _non_blank(F.coalesce(F.col("url"), F.col("title"))).alias("conv_id"),
        F.lit(1).alias("n_turns"),
        # an all-empty article must read as NO text (null → quarantine
        # as undecodable), not as the two joiner newlines — note
        # Spark's trim strips only spaces, so test whitespace-only
        # explicitly
        _non_blank(F.concat_ws(
            "\n",
            F.coalesce(F.col("title"), F.lit("")),
            F.coalesce(F.col("abstract"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
        )).alias("doc_text"),
        F.array(F.lit("article")).alias("roles"),
        F.col("date_published").alias("ts_min"),
        F.col("date_published").alias("ts_max"),
        F.col("title"),
        # no authors (null OR empty list) → null, not an empty string
        _non_blank(F.array_join(F.col("authors"), ", ")).alias("author"),
    )
