"""Authoritative StructTypes for every stage boundary (SURVEY.md §1.5).

The reference validates shape with pydantic ``extra="forbid"`` models
(reference core.py:5-34); our engine carries an explicit StructType at
every table boundary and routes rows failing range/domain checks to
quarantine tables instead of raising (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input (BASELINE.json input_hint)
TRANSCRIPTS = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), True),
    StructField("text", StringType(), True),
    StructField("tool", StringType(), True),
    StructField("ts", TimestampType(), True),
])

DOCUMENTS = StructType([
    StructField("conv_id", StringType(), False),
    StructField("n_turns", IntegerType(), False),
    StructField("doc_text", StringType(), True),
    StructField("roles", ArrayType(StringType()), True),
    StructField("ts_min", TimestampType(), True),
    StructField("ts_max", TimestampType(), True),
    # document provenance (reference D2 article model: title/authors,
    # data/raw/ard_examples/arxiv.jsonl.example.json:1-10; PDF /Info
    # Title/Author) — null for transcript-born documents
    StructField("title", StringType(), True),
    StructField("author", StringType(), True),
])

MENTIONS = StructType([
    StructField("conv_id", StringType(), False),
    StructField("mention", StringType(), False),
    StructField("mtype", StringType(), True),
    StructField("span_start", IntegerType(), True),
    StructField("span_end", IntegerType(), True),
])

# Variant-A node schema (reference core.py:5-13) + conv provenance
NODES_RAW = StructType([
    StructField("conv_id", StringType(), False),
    StructField("name", StringType(), False),
    StructField("aliases", ArrayType(StringType()), True),
    StructField("type", StringType(), True),          # concept | intervention
    StructField("description", StringType(), True),
    StructField("concept_category", StringType(), True),
    StructField("intervention_lifecycle", IntegerType(), True),  # 1-6
    StructField("intervention_maturity", IntegerType(), True),   # 1-4
])

# Variant-A edge schema exploded from logical chains (core.py:16-28)
TRIPLES_RAW = StructType([
    StructField("conv_id", StringType(), False),
    StructField("chain_id", IntegerType(), True),
    StructField("chain_title", StringType(), True),
    StructField("edge_idx", IntegerType(), True),     # W2: intra-chain order
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("description", StringType(), True),
    StructField("edge_confidence", IntegerType(), True),  # 1-5
])

KG_NODES = StructType([
    StructField("node_id", LongType(), False),
    StructField("canonical_name", StringType(), False),
    StructField("type", StringType(), True),
    StructField("aliases", ArrayType(StringType()), True),
    StructField("description", StringType(), True),
    StructField("concept_category", StringType(), True),
    StructField("intervention_lifecycle", IntegerType(), True),
    StructField("intervention_maturity", IntegerType(), True),
    StructField("n_merged", IntegerType(), True),
    StructField("conv_ids", ArrayType(StringType()), True),
    # denormalized document provenance (reference PAPER-node analog):
    # sorted-distinct titles/authors of evidence docs, capped at 20
    StructField("source_titles", ArrayType(StringType()), True),
    StructField("source_authors", ArrayType(StringType()), True),
])

KG_EDGES = StructType([
    StructField("src", LongType(), False),
    StructField("dst", LongType(), False),
    StructField("pred", StringType(), False),
    StructField("description", StringType(), True),
    StructField("edge_confidence", IntegerType(), True),
    StructField("conv_ids", ArrayType(StringType()), True),
])

# checkpoint / lineage / metrics (north_star: per-partition lineage rows)
CKPT_STAGE_STATE = StructType([
    StructField("stage", StringType(), False),
    StructField("conv_id", StringType(), False),
    StructField("run_id", StringType(), True),
])

CKPT_LINEAGE = StructType([
    StructField("stage", StringType(), False),
    StructField("run_id", StringType(), False),
    StructField("partition_id", IntegerType(), True),
    StructField("conv_id_min", StringType(), True),
    StructField("conv_id_max", StringType(), True),
    StructField("n_rows", LongType(), True),
])

CKPT_METRICS = StructType([
    StructField("stage", StringType(), False),
    StructField("run_id", StringType(), False),
    StructField("metric", StringType(), False),
    StructField("value", StringType(), True),
])

EMBEDDINGS = StructType([
    StructField("vec_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
    StructField("label", IntegerType(), True),
])
