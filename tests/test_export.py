"""Cypher export sink: the reference's FalkorDB ingestion statements
(db.py:36-60) regenerated FROM the kg tables, with its lit() quoting
contract (db.py:15-25) and a FIX for its raw-identifier injection."""

import pytest

from aisafetyintervention_literatureextraction_spark.operators.export import (
    cypher_edge_statements,
    cypher_node_statements,
    export_cypher,
)


def test_node_statement_quoting(spark):
    nodes = spark.createDataFrame(
        [
            ("n1", "Intervention", "O'Brien \\ test", ["a'b", "c\\d"], None, 2),
            ("n2", "weird type!", "plain", None, "desc", None),
        ],
        "node_id string, type string, canonical_name string, "
        "aliases array<string>, description string, n_merged int",
    )
    out = {r["stmt"] for r in cypher_node_statements(nodes).collect()}
    assert (
        "MERGE (n:INTERVENTION {id: 'n1'}) SET n.name = 'O\\'Brien \\\\ test', "
        "n.aliases = ['a\\'b', 'c\\\\d'], n.description = NULL, n.n_merged = 2;"
    ) in out
    # identifier position sanitized, not quoted (injection fix);
    # null numeric renders as NULL
    assert (
        "MERGE (n:WEIRD_TYPE_ {id: 'n2'}) SET n.name = 'plain', "
        "n.aliases = NULL, n.description = 'desc', n.n_merged = NULL;"
    ) in out


def test_edge_statement_and_identifier_injection(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", "mitigates", "why", "high"),
            ("a", "b", "]->(x) DETACH DELETE x //", "inj", None),
            ("a", "b", None, None, "low"),
        ],
        "src string, dst string, pred string, description string, "
        "edge_confidence string",
    )
    out = [r["stmt"] for r in cypher_edge_statements(edges).collect()]
    assert (
        "MATCH (a {id: 'a'}), (b {id: 'b'}) MERGE (a)-[r:MITIGATES]->(b) "
        "SET r.description = 'why', r.confidence = 'high';"
    ) in out
    # a hostile pred cannot break out of the identifier position
    assert any("[r:_X_DETACH_DELETE_X_" in s for s in out)
    assert not any("]->(x) DETACH" in s for s in out)
    # null pred falls back to the default relationship type
    assert any("[r:RELATED_TO]" in s for s in out)


def test_export_cypher_end_to_end(spark, corpus, warehouse, tmp_path):
    """Full pipeline → export: every kg node/edge becomes exactly one
    statement, nodes dir loads before edges dir."""
    from aisafetyintervention_literatureextraction_spark.catalog import Catalog
    from aisafetyintervention_literatureextraction_spark.plans.pipeline import (
        run_pipeline,
    )

    df, _ = corpus
    run_pipeline(spark, df, warehouse)
    cat = Catalog(spark, warehouse)
    counts = export_cypher(cat, str(tmp_path / "cypher"))
    assert counts["n_node_statements"] == cat.read("kg_nodes").count()
    assert counts["n_edge_statements"] == cat.read("kg_edges").count()
    stmts = [
        r["value"]
        for r in spark.read.text(str(tmp_path / "cypher") + "/nodes").collect()
    ]
    assert all(s.startswith("MERGE (n:") and s.endswith(";") for s in stmts)


def test_node_statement_metrics_properties(spark):
    """Stage-E metrics columns render as numeric node properties; the
    pagerank fixed-point int prints at human scale with 9 exact
    decimals, and a null-metrics row (warehouse mid-upgrade) degrades
    to NULL properties instead of a null statement."""
    nodes = spark.createDataFrame(
        [
            ("n1", "Concept", "x", None, None, 1, 24417345, 4, 2, 0.333333),
            ("n2", "Concept", "y", None, None, 1, None, None, None, None),
        ],
        "node_id string, type string, canonical_name string, "
        "aliases array<string>, description string, n_merged int, "
        "pagerank_int long, degree long, triangles long, clustering double",
    )
    out = {r["stmt"] for r in cypher_node_statements(nodes).collect()}
    assert any(
        "n.pagerank = 0.024417345, n.degree = 4, n.triangles = 2, "
        "n.clustering = 0.333333000;" in s
        for s in out
    ), out
    assert any(
        "n.pagerank = NULL, n.degree = NULL, n.triangles = NULL, "
        "n.clustering = NULL;" in s
        for s in out
    ), out


def test_export_cypher_includes_metrics_when_table_exists(spark, corpus,
                                                          warehouse, tmp_path):
    from aisafetyintervention_literatureextraction_spark.catalog import Catalog
    from aisafetyintervention_literatureextraction_spark.plans.pipeline import (
        run_pipeline,
    )

    df, _ = corpus
    run_pipeline(spark, df, warehouse, analytics=True)
    out = str(tmp_path / "cy")
    stats = export_cypher(Catalog(spark, warehouse), out)
    lines = [r["value"]
             for r in spark.read.text(f"{out}/nodes").collect()]
    assert stats["n_node_statements"] == len(lines)
    assert all("n.pagerank = " in ln for ln in lines)
    assert not any("n.pagerank = NULL" in ln for ln in lines)
    # community labels are node ids — quoted like n.id, never NULL
    assert all("n.community = '" in ln for ln in lines)
    # stage-E edge support rides on every relationship (kg_edge_metrics
    # covers every undirected kg pair, so no NULLs either)
    elines = [r["value"]
              for r in spark.read.text(f"{out}/edges").collect()]
    assert stats["n_edge_statements"] == len(elines)
    assert all("r.support = " in ln for ln in elines)
    assert not any("r.support = NULL" in ln for ln in elines)
