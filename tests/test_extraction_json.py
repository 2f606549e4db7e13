"""S3 ingestion tests — Variant A (PaperSchema) and Variant B
(OutputSchema) JSON directories → canonical tables, with raw-response
exclusion (F3) and validation routing (F9)."""

import json
import os

from aisafetyintervention_literatureextraction_spark.datagen import (
    GOLDEN_NODES,
    GOLDEN_TRIPLES,
)
from aisafetyintervention_literatureextraction_spark.sources.extraction_json import (
    read_output_json_b,
    read_paper_json_a,
    validate_nodes,
    validate_triples,
)


def _write_variant_a(dirpath):
    """PaperSchema JSON built from the golden constants (same shape as
    reference output_sample.json)."""
    nodes = [
        {
            "name": name, "aliases": [f"{name} v"], "type": t,
            "description": f"d {name}", "concept_category": cat,
            "intervention_lifecycle": life, "intervention_maturity": mat,
        }
        for name, (t, cat, life, mat) in GOLDEN_NODES.items()
    ]
    chains = []
    for i in range(0, len(GOLDEN_TRIPLES), 2):
        chains.append({
            "title": f"chain {i // 2}",
            "edges": [
                {"type": p, "source_node": s, "target_node": o,
                 "description": "x", "edge_confidence": c}
                for s, p, o, c in GOLDEN_TRIPLES[i:i + 2]
            ],
        })
    with open(os.path.join(dirpath, "paper_one.json"), "w") as f:
        json.dump({"nodes": nodes, "logical_chains": chains}, f)
    # audit file that must be excluded (F3)
    with open(os.path.join(dirpath, "paper_one_raw_response.json"), "w") as f:
        json.dump({"nodes": [], "logical_chains": []}, f)


def test_variant_a_ingest(spark, warehouse):
    d = os.path.join(warehouse, "va")
    os.makedirs(d)
    _write_variant_a(d)
    nodes, triples = read_paper_json_a(spark, d)
    n = nodes.collect()
    assert {r["conv_id"] for r in n} == {"paper_one"}  # raw_response skipped
    assert {r["name"] for r in n} == set(GOLDEN_NODES)
    t = triples.collect()
    got = {(r["subj"], r["pred"], r["obj"], r["edge_confidence"]) for r in t}
    assert got == set(GOLDEN_TRIPLES)
    # W2: edge_idx within chain preserved
    assert {(r["chain_id"], r["edge_idx"]) for r in t} == {
        (c, e) for c in range(4) for e in range(2)
    }


def test_variant_b_ingest(spark, warehouse):
    d = os.path.join(warehouse, "vb")
    os.makedirs(d)
    doc = {
        "new_node_types": [], "new_edge_types": [],
        "edges": [
            {"type": "MITIGATES", "rationale": "because", "confidence": 0.8,
             "target_node": {"type": "CONCEPT", "name": "rlhf",
                             "canonical_name": "reinforcement learning from human feedback",
                             "aliases": ["rl-hf"], "confidence": 0.9,
                             "notes": "method node"}},
            {"type": "EVALUATES_ON", "rationale": "tested", "confidence": 0.3,
             "target_node": {"type": "BENCHMARK", "name": "truthfulqa",
                             "canonical_name": "truthfulqa", "aliases": [],
                             "confidence": 1.0, "notes": ""}},
        ],
    }
    with open(os.path.join(d, "paper_b.json"), "w") as f:
        json.dump(doc, f)
    nodes, triples = read_output_json_b(spark, d)
    n = {r["name"]: r for r in nodes.collect()}
    assert set(n) == {"rlhf", "truthfulqa"}
    assert "reinforcement learning from human feedback" in n["rlhf"]["aliases"]
    t = {(r["subj"], r["pred"], r["obj"]): r for r in triples.collect()}
    assert ("paper_b", "MITIGATES", "rlhf") in t
    assert t[("paper_b", "MITIGATES", "rlhf")]["edge_confidence"] == 4  # 0.8→4
    assert t[("paper_b", "EVALUATES_ON", "truthfulqa")]["edge_confidence"] == 2


def test_validation_routing(spark):
    triples = spark.createDataFrame(
        [
            ("c", 0, None, 0, "a", "causes", "b", "ok", 3),
            ("c", 0, None, 1, "a", "causes", None, "null obj", 3),
            ("c", 0, None, 2, "a", "causes", "b", "conf oob", 9),
        ],
        "conv_id string, chain_id int, chain_title string, edge_idx int,"
        "subj string, pred string, obj string, description string, edge_confidence int",
    )
    ok, bad = validate_triples(triples)
    assert ok.count() == 1 and bad.count() == 2

    nodes = spark.createDataFrame(
        [
            ("c", "n1", [], "concept", "d", None, None, None),
            ("c", "n2", [], "widget", "d", None, None, None),
            ("c", "n3", [], "intervention", "d", None, 7, 2),
        ],
        "conv_id string, name string, aliases array<string>, type string,"
        "description string, concept_category string,"
        "intervention_lifecycle int, intervention_maturity int",
    )
    ok_n, bad_n = validate_nodes(nodes)
    assert ok_n.count() == 1 and bad_n.count() == 2
