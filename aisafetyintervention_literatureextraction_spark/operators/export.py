"""Graph export sink: kg tables → Cypher MERGE script (C1 for real).

The reference ingests its graph by interpolating values into Cypher
``MERGE`` statements against FalkorDB (reference db.py:36-60, with
``lit()`` quoting at db.py:15-25).  Our engine materializes relational
``kg_nodes`` / ``kg_edges`` tables instead — but a user switching from
the reference still has FalkorDB/Neo4j consumers, so this sink emits
the equivalent idempotent Cypher script FROM the tables, Spark-first:

- statement text is built with pure column expressions
  (``format_string`` + ``regexp_replace`` escaping — WholeStageCodegen,
  no Python), so a billion-edge graph renders distributed and lands as
  partitioned text files via ``df.write.text``.
- quoting implements the reference's ``lit()`` contract (backslash
  then single-quote escaping; NULL for null; bare numbers) — and
  FIXES its injection hole: the reference interpolates ``edge.type``
  raw into the relationship type (db.py:51); here rel types and label
  identifiers are sanitized to ``[A-Za-z0-9_]`` (C1 + F9 semantics).
- nodes write under ``<out>/nodes/``, edges under ``<out>/edges/``;
  loading nodes before edges makes the edge ``MATCH … MERGE`` find
  every endpoint (dangling-safe by construction: kg_edges endpoints
  are kg_nodes ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph_analytics import PR_SCALE


def cypher_str(col: Column) -> Column:
    """The reference's ``lit()`` for strings as a column expression:
    backslashes doubled, single quotes escaped, wrapped in quotes;
    NULL for null (reference db.py:15-25).  Literal newlines and
    carriage returns become ``\\n`` / ``\\r`` escapes so one MERGE
    statement stays one line in the ``df.write.text`` output — the
    sink's stated contract for line-oriented loaders."""
    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col.cast("string"), r"\\", r"\\\\"),
                r"'", r"\\'"),
            "\n", r"\\n"),
        "\r", r"\\r")
    return F.when(col.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'"), escaped, F.lit("'"))
    )


def cypher_str_array(col: Column) -> Column:
    """``lit()`` for list values: ``['a', 'b']`` with per-element
    string quoting; NULL for null arrays."""
    body = F.array_join(F.transform(col, cypher_str), ", ")
    return F.when(col.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("["), F.coalesce(body, F.lit("")), F.lit("]"))
    )


def cypher_ident(col: Column, fallback: str = "RELATED_TO") -> Column:
    """Sanitized label / relationship-type identifier: non-word chars
    collapse to ``_`` and the result is upper-cased — the identifier
    position cannot be escaped by quoting, so it is restricted instead
    (the reference interpolates it raw: db.py:51)."""
    ident = F.upper(
        F.regexp_replace(F.trim(col.cast("string")), r"[^A-Za-z0-9_]+", "_")
    )
    ok = ident.rlike(r"^[A-Za-z_][A-Za-z0-9_]*$")
    return F.when(col.isNull() | ~ok, F.lit(fallback)).otherwise(ident)


def cypher_node_statements(nodes: DataFrame) -> DataFrame:
    """kg_nodes → one idempotent ``MERGE … SET`` statement per node
    (the reference's per-node upsert, db.py:41-47, set-oriented).
    When stage D attached document provenance (source_titles — the
    engine's normalized form of the reference's PAPER nodes,
    db.py:34-66), it is exported as a node property so the loaded
    graph keeps the paper linkage."""
    parts = [
        F.lit("MERGE (n:"),
        cypher_ident(F.col("type"), "CONCEPT"),
        F.lit(" {id: "),
        cypher_str(F.col("node_id").cast("string")),
        F.lit("}) SET n.name = "),
        cypher_str(F.col("canonical_name")),
        F.lit(", n.aliases = "),
        cypher_str_array(F.col("aliases")),
        F.lit(", n.description = "),
        cypher_str(F.col("description")),
        F.lit(", n.n_merged = "),
        F.coalesce(F.col("n_merged").cast("string"), F.lit("NULL")),
    ]
    if "source_titles" in nodes.columns:
        parts += [
            F.lit(", n.source_titles = "),
            cypher_str_array(F.col("source_titles")),
        ]
    if "pagerank_int" in nodes.columns:
        # stage-E metrics (joined in export_cypher when the table
        # exists): pagerank exported at its human scale (rank 1.0 ==
        # 10^9); the 9-decimal format_string is exact for the scaled
        # int, so loaders see a stable float literal
        pr = F.when(F.col("pagerank_int").isNull(), F.lit("NULL")).otherwise(
            F.format_string(
                "%d.%09d",
                F.expr(f"pagerank_int DIV {PR_SCALE}"),
                F.col("pagerank_int") % F.lit(PR_SCALE),
            )
        )
        parts += [
            F.lit(", n.pagerank = "), pr,
            F.lit(", n.degree = "),
            F.coalesce(F.col("degree").cast("string"), F.lit("NULL")),
            F.lit(", n.triangles = "),
            F.coalesce(F.col("triangles").cast("string"), F.lit("NULL")),
            F.lit(", n.clustering = "),
            F.when(F.col("clustering").isNull(), F.lit("NULL")).otherwise(
                # fixed 9-decimal render so the literal is stable
                # across JVM double-toString shortest-repr choices
                F.format_string("%.9f", F.col("clustering"))
            ),
        ]
        if "community" in nodes.columns:
            # community label is a node id — export as the same quoted
            # string form as n.id so loaders can join them
            parts += [
                F.lit(", n.community = "),
                F.when(F.col("community").isNull(), F.lit("NULL"))
                .otherwise(cypher_str(F.col("community").cast("string"))),
            ]
    return nodes.select(F.concat(*parts, F.lit(";")).alias("stmt"))


def cypher_edge_statements(edges: DataFrame) -> DataFrame:
    """kg_edges → ``MATCH endpoints, MERGE typed relationship, SET``
    statements (reference db.py:49-60).  When stage E's edge metrics
    rode along (a ``support`` column), each relationship carries
    ``r.support`` — its triangle-corroboration count — so loaders can
    filter to the 3-truss client-side."""
    parts = [
        F.lit("MATCH (a {id: "),
        cypher_str(F.col("src").cast("string")),
        F.lit("}), (b {id: "),
        cypher_str(F.col("dst").cast("string")),
        F.lit("}) MERGE (a)-[r:"),
        cypher_ident(F.col("pred")),
        F.lit("]->(b) SET r.description = "),
        cypher_str(F.col("description")),
        F.lit(", r.confidence = "),
        cypher_str(F.col("edge_confidence")),
    ]
    if "support" in edges.columns:
        parts += [
            F.lit(", r.support = "),
            F.coalesce(F.col("support").cast("string"), F.lit("NULL")),
        ]
    return edges.select(F.concat(*parts, F.lit(";")).alias("stmt"))


def export_cypher(catalog, out_dir: str) -> dict:
    """Write the warehouse graph as a distributed Cypher script:
    ``<out>/nodes/part-*.txt`` then ``<out>/edges/part-*.txt``
    (load nodes first). Returns statement counts, collected via
    ``Observation`` metrics on the write itself — no re-read jobs."""
    from pyspark.sql import Observation

    obs_n, obs_e = Observation("nodes"), Observation("edges")
    kg_nodes = catalog.read("kg_nodes")
    if catalog.exists("kg_node_metrics"):
        # stage-E centrality rides along as node properties (left join:
        # metrics are total over kg_nodes by construction, but a
        # warehouse mid-upgrade must not drop nodes)
        kg_nodes = kg_nodes.join(
            catalog.read("kg_node_metrics"), "node_id", "left"
        )
    nodes = cypher_node_statements(kg_nodes).observe(
        obs_n, F.count(F.lit(1)).alias("n")
    )
    kg_edges = catalog.read("kg_edges")
    if catalog.exists("kg_edge_metrics"):
        # stage-E edge support rides along, joined on the canonical
        # undirected pair (metrics are per-pair; kg_edges per-pred)
        em = catalog.read("kg_edge_metrics").withColumnsRenamed(
            {"a": "_ca", "b": "_cb"}
        )
        kg_edges = (
            kg_edges
            .withColumn("_ca", F.least("src", "dst"))
            .withColumn("_cb", F.greatest("src", "dst"))
            .join(em, ["_ca", "_cb"], "left")
            .drop("_ca", "_cb")
        )
    edges = cypher_edge_statements(kg_edges).observe(
        obs_e, F.count(F.lit(1)).alias("n")
    )
    nodes.write.mode("overwrite").text(f"{out_dir}/nodes")
    edges.write.mode("overwrite").text(f"{out_dir}/edges")
    return {
        "n_node_statements": obs_n.get["n"],
        "n_edge_statements": obs_e.get["n"],
    }
