"""S3 — ingestion of per-paper extraction JSON (SURVEY.md §2.1, §3.2).

The reference ingests a directory of per-paper JSON files, skipping
``*_raw_response*`` audit files (reference db.py:57-58, F3), validates
with pydantic, and upserts per row (db.py:60-66). Two schema variants
exist (SURVEY.md §1.2):

- **Variant A** (core.py:5-34): ``{nodes: [...], logical_chains:
  [{title, edges: [...]}]}`` — the final extraction schema.
- **Variant B** (prompts.py:46-71): ``{new_node_types, new_edge_types,
  edges: [{type, rationale, confidence, target_node: {...}}]}`` —
  edges hang off the paper node implicitly.

Ours reads the whole directory as one DataFrame with an explicit
nested StructType (never inferSchema), filters audit files by
``input_file_name()``, and explodes into the canonical ``nodes_raw``
/ ``triples_raw`` tables. Validation failures (F9) are routed, not
raised: rows with out-of-range attributes land in a quarantine
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Variant A — mirrors reference core.py:5-34 field-for-field
_NODE_A = StructType([
    StructField("name", StringType()),
    StructField("aliases", ArrayType(StringType())),
    StructField("type", StringType()),
    StructField("description", StringType()),
    StructField("concept_category", StringType()),
    StructField("intervention_lifecycle", IntegerType()),
    StructField("intervention_maturity", IntegerType()),
])
_EDGE_A = StructType([
    StructField("type", StringType()),
    StructField("source_node", StringType()),
    StructField("target_node", StringType()),
    StructField("description", StringType()),
    StructField("edge_confidence", IntegerType()),
])
PAPER_SCHEMA_A = StructType([
    StructField("nodes", ArrayType(_NODE_A)),
    StructField("logical_chains", ArrayType(StructType([
        StructField("title", StringType()),
        StructField("edges", ArrayType(_EDGE_A)),
    ]))),
])

# Variant B — mirrors reference prompts.py:46-71
_NODE_B = StructType([
    StructField("type", StringType()),
    StructField("name", StringType()),
    StructField("canonical_name", StringType()),
    StructField("aliases", ArrayType(StringType())),
    StructField("confidence", DoubleType()),
    StructField("notes", StringType()),
])
_SUGGESTED = StructType([
    StructField("type", StringType()),
    StructField("definition", StringType()),
    StructField("example_instance", StringType()),
])
OUTPUT_SCHEMA_B = StructType([
    StructField("new_node_types", ArrayType(_SUGGESTED)),
    StructField("new_edge_types", ArrayType(_SUGGESTED)),
    StructField("edges", ArrayType(StructType([
        StructField("type", StringType()),
        StructField("rationale", StringType()),
        StructField("confidence", DoubleType()),
        StructField("target_node", _NODE_B),
    ]))),
])


def _doc_id() -> F.Column:
    """C2 — filename stem as paper/doc id (reference extract.py:68)."""
    return F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1).alias("conv_id")


def _drop_raw_responses(df: DataFrame) -> DataFrame:
    """F3 — exclude ``*_raw_response*`` audit files (db.py:58)."""
    return df.filter(~F.input_file_name().contains("raw_response"))


def read_paper_json_a(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Variant-A dir → (nodes_raw, triples_raw)."""
    raw = _drop_raw_responses(
        spark.read.schema(PAPER_SCHEMA_A).option("multiLine", "true").json(path)
    ).select(_doc_id(), "nodes", "logical_chains")

    nodes = raw.select("conv_id", F.explode("nodes").alias("n")).select(
        "conv_id",
        F.col("n.name").alias("name"),
        F.col("n.aliases").alias("aliases"),
        F.col("n.type").alias("type"),
        F.col("n.description").alias("description"),
        F.col("n.concept_category").alias("concept_category"),
        F.col("n.intervention_lifecycle").alias("intervention_lifecycle"),
        F.col("n.intervention_maturity").alias("intervention_maturity"),
    )
    triples = (
        raw.select("conv_id", F.posexplode("logical_chains").alias("chain_id", "c"))
        .select(
            "conv_id",
            F.col("chain_id").cast("int").alias("chain_id"),
            F.col("c.title").alias("chain_title"),
            F.posexplode(F.col("c.edges")).alias("edge_idx", "e"),  # W2 order
        )
        .select(
            "conv_id", "chain_id", "chain_title",
            F.col("edge_idx").cast("int").alias("edge_idx"),
            F.col("e.source_node").alias("subj"),
            F.col("e.type").alias("pred"),
            F.col("e.target_node").alias("obj"),
            F.col("e.description").alias("description"),
            F.col("e.edge_confidence").alias("edge_confidence"),
        )
    )
    return nodes, triples


def read_output_json_b(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Variant-B dir → (nodes_raw, triples_raw): the paper is the
    implicit edge source (reference db.py:51 pattern
    ``(p:PAPER)-[r]->(t)``); target nodes carry canonical_name which
    feeds alias-identity canonicalization."""
    raw = _drop_raw_responses(
        spark.read.schema(OUTPUT_SCHEMA_B).option("multiLine", "true").json(path)
    ).select(_doc_id(), "edges")

    exploded = raw.select(
        "conv_id", F.posexplode("edges").alias("edge_idx", "e")
    )
    nodes = exploded.select(
        "conv_id",
        F.col("e.target_node.name").alias("name"),
        F.array_union(
            F.coalesce(F.col("e.target_node.aliases"), F.array().cast("array<string>")),
            F.array(F.col("e.target_node.canonical_name")),
        ).alias("aliases"),
        F.lower(F.col("e.target_node.type")).alias("type"),
        F.col("e.target_node.notes").alias("description"),
        F.lit(None).cast("string").alias("concept_category"),
        F.lit(None).cast("int").alias("intervention_lifecycle"),
        F.lit(None).cast("int").alias("intervention_maturity"),
    ).filter(F.col("name").isNotNull())
    triples = exploded.select(
        "conv_id",
        F.lit(0).alias("chain_id"),
        F.lit(None).cast("string").alias("chain_title"),
        F.col("edge_idx").cast("int").alias("edge_idx"),
        F.col("conv_id").alias("subj"),           # paper node is the source
        F.col("e.type").alias("pred"),
        F.col("e.target_node.name").alias("obj"),
        F.col("e.rationale").alias("description"),
        # Variant-B confidence is float 0-1 (prompts.py:58); rescale to
        # the canonical 1-5 scale for the unioned table
        (F.ceil(F.col("e.confidence") * 5).cast("int")).alias("edge_confidence"),
    )
    return nodes, triples


def read_suggested_types(spark: SparkSession, path: str) -> DataFrame:
    """Variant-B dynamic ontology registration (VERDICT r1 missing #2):
    the reference's ``OutputSchema`` carries ``new_node_types`` /
    ``new_edge_types`` (``SuggestedType``, reference prompts.py:62-71)
    and instructs the model to register unknown types (prompts.py:88-89)
    — the "deliberately dynamic/extensible" ontology of SURVEY §1.4.
    This lands both arrays in one ``ontology_suggested``-shaped table:
    (conv_id, kind ∈ {node, edge}, type_name, definition,
    example_instance)."""
    raw = _drop_raw_responses(
        spark.read.schema(OUTPUT_SCHEMA_B).option("multiLine", "true").json(path)
    ).select(_doc_id(), "new_node_types", "new_edge_types")

    def flat(col: str, kind: str) -> DataFrame:
        return raw.select(
            "conv_id", F.lit(kind).alias("kind"), F.explode_outer(col).alias("s")
        ).select(
            "conv_id", "kind",
            F.col("s.type").alias("type_name"),
            F.col("s.definition").alias("definition"),
            F.col("s.example_instance").alias("example_instance"),
        )

    return (
        flat("new_node_types", "node")
        .unionByName(flat("new_edge_types", "edge"))
        .filter(F.col("type_name").isNotNull())
    )


def validate_triples(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F9 — range checks → (valid, quarantine)."""
    bad = (
        F.col("subj").isNull()
        | F.col("obj").isNull()
        | F.col("pred").isNull()
        | ~F.col("edge_confidence").between(1, 5)
    )
    return triples.filter(~bad), triples.filter(bad)


def validate_nodes(nodes: DataFrame) -> tuple[DataFrame, DataFrame]:
    bad = (
        F.col("name").isNull()
        | ~F.col("type").isin("concept", "intervention")
        | (
            F.col("intervention_lifecycle").isNotNull()
            & ~F.col("intervention_lifecycle").between(1, 6)
        )
        | (
            F.col("intervention_maturity").isNotNull()
            & ~F.col("intervention_maturity").between(1, 4)
        )
    )
    return nodes.filter(~bad), nodes.filter(bad)
