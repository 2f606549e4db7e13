"""Stage D tests — MERGE semantics (A2/A3), rewire (J3), implicit
nodes, idempotence, isolated-node detection (G4)."""

import pyspark.sql.functions as F

from aisafetyintervention_literatureextraction_spark.operators.canonicalize import (
    candidate_nodes,
)
from aisafetyintervention_literatureextraction_spark.operators.materialize import (
    Graph,
    isolated_nodes,
    materialize,
)

NODES_DDL = (
    "conv_id string, name string, aliases array<string>, type string,"
    "description string, concept_category string,"
    "intervention_lifecycle int, intervention_maturity int"
)
TRIPLES_DDL = (
    "conv_id string, chain_id int, chain_title string, edge_idx int,"
    "subj string, pred string, obj string, description string, edge_confidence int"
)
COMP_DDL = "node_id long, component_id long"


def _mk(spark, nodes_rows, triples_rows, comp_rows=None):
    nr = spark.createDataFrame(nodes_rows, NODES_DDL)
    tr = spark.createDataFrame(triples_rows, TRIPLES_DDL)
    cn = candidate_nodes(nr)
    if comp_rows is None:
        comp = cn.select("node_id", F.col("node_id").alias("component_id"))
    else:
        comp = spark.createDataFrame(comp_rows, COMP_DDL)
    return materialize(cn, tr, comp), cn


def test_edge_dedup_last_writer_wins(spark):
    """A3 — one edge per (src, pred, dst); later conv's props win;
    evidence conv_ids accumulated."""
    nodes = [
        ("c1", "a", [], "concept", "d", None, None, None),
        ("c1", "b", [], "concept", "d", None, None, None),
    ]
    triples = [
        ("c1", 0, "t", 0, "a", "leads_to", "b", "first", 2),
        ("c2", 0, "t", 0, "a", "leads_to", "b", "second", 4),
    ]
    g, _ = _mk(spark, nodes, triples)
    edges = g.edges.collect()
    assert len(edges) == 1
    e = edges[0]
    assert e["description"] == "second" and e["edge_confidence"] == 4
    assert sorted(e["conv_ids"]) == ["c1", "c2"]


def test_rewire_through_components(spark):
    """J3/G5 — edges of a merged node land on the component
    representative; duplicate post-rewire edges collapse (A7);
    self-loops from merged endpoints are dropped."""
    nodes = [
        ("c1", "rlhf", [], "concept", "d", None, None, None),
        ("c1", "rl from human feedback", [], "concept", "d", None, None, None),
        ("c1", "oversight", [], "concept", "d", None, None, None),
    ]
    cn_rows = candidate_nodes(
        spark.createDataFrame(nodes, NODES_DDL)
    ).select("node_id", "name").collect()
    ids = {r["name"]: r["node_id"] for r in cn_rows}
    keep = min(ids["rlhf"], ids["rl from human feedback"])
    comp = [
        (ids["rlhf"], keep),
        (ids["rl from human feedback"], keep),
        (ids["oversight"], ids["oversight"]),
    ]
    triples = [
        ("c1", 0, "t", 0, "rlhf", "enables", "oversight", "x", 3),
        ("c1", 0, "t", 1, "rl from human feedback", "enables", "oversight", "y", 3),
        ("c1", 0, "t", 2, "rlhf", "leads_to", "rl from human feedback", "self", 3),
    ]
    g, _ = _mk(spark, nodes, triples, comp)
    edges = [(e["src"], e["pred"], e["dst"]) for e in g.edges.collect()]
    assert len(edges) == 1  # duplicates collapsed, self-loop dropped
    assert edges[0] == (keep, "enables", ids["oversight"])
    merged_node = g.nodes.filter(F.col("node_id") == keep).collect()[0]
    assert merged_node["n_merged"] == 2
    assert "rlhf" in merged_node["aliases"]


def test_implicit_nodes_created(spark):
    """MERGE-creates-missing: an edge endpoint naming no declared node
    becomes an implicit concept node and lands in dangling."""
    nodes = [("c1", "a", [], "concept", "d", None, None, None)]
    triples = [("c1", 0, "t", 0, "a", "leads_to", "ghost node", "x", 1)]
    g, _ = _mk(spark, nodes, triples)
    names = {r["canonical_name"] for r in g.nodes.collect()}
    assert names == {"a", "ghost node"}
    assert g.edges.count() == 1
    assert g.dangling.count() == 1


def test_alias_resolution(spark):
    """Edge endpoints resolve through declared aliases (C9-normalized),
    names beating aliases on collision."""
    nodes = [
        ("c1", "rlhf", ["Reinforcement Learning From Human Feedback"], "concept",
         "d", None, None, None),
    ]
    triples = [
        ("c1", 0, "t", 0, "reinforcement learning from human feedback",
         "enables", "rlhf", "alias ref", 3),
    ]
    g, cn = _mk(spark, nodes, triples)
    # subj resolved via alias to the same node as obj → self-loop dropped
    assert g.edges.count() == 0
    assert g.nodes.count() == 1


def test_materialize_idempotent(spark):
    """Re-running materialization on the same inputs is a no-op
    (reference MERGE idempotence, db.py:36-54)."""
    nodes = [
        ("c1", "a", [], "concept", "d", None, None, None),
        ("c1", "b", [], "concept", "d", None, None, None),
    ]
    triples = [("c1", 0, "t", 0, "a", "causes", "b", "x", 3)]
    g1, _ = _mk(spark, nodes, triples)
    g2, _ = _mk(spark, nodes, triples)
    key = lambda g: (
        sorted(map(tuple, g.nodes.select("node_id", "canonical_name").collect())),
        sorted(map(tuple, g.edges.select("src", "pred", "dst").collect())),
    )
    assert key(g1) == key(g2)


def test_isolated_nodes(spark):
    nodes = [
        ("c1", "a", [], "concept", "d", None, None, None),
        ("c1", "b", [], "concept", "d", None, None, None),
        ("c1", "loner", [], "concept", "d", None, None, None),
    ]
    triples = [("c1", 0, "t", 0, "a", "causes", "b", "x", 3)]
    g, _ = _mk(spark, nodes, triples)
    iso = isolated_nodes(g.nodes, g.edges).collect()
    assert [r["canonical_name"] for r in iso] == ["loner"]
