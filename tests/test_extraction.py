"""Stage B tests — golden-triple P/R ≥ 0.95 (the BASELINE.json
correctness gate), engine agreement, attribute semantics."""

import pyspark.sql.functions as F
import pytest

from aisafetyintervention_literatureextraction_spark.datagen import (
    GOLDEN_NODES,
    GOLDEN_TRIPLES,
)
from aisafetyintervention_literatureextraction_spark.operators.extraction import (
    extract_mentions,
    extract_nodes,
    extract_triples,
)
from aisafetyintervention_literatureextraction_spark.operators.reassembly import reassemble


@pytest.fixture(scope="module")
def documents(spark, corpus):
    df, _ = corpus
    docs = reassemble(df).documents.persist()
    docs.count()
    return docs


def _triple_set(df):
    return set(
        map(tuple, df.select("conv_id", "subj", "pred", "obj", "edge_confidence").collect())
    )


def test_golden_precision_recall(documents, corpus):
    _, expected = corpus
    got = _triple_set(extract_triples(documents))
    exp = set(
        (t["conv_id"], t["subj"], t["pred"], t["obj"], t["edge_confidence"])
        for t in expected.triples
    )
    tp = len(got & exp)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(exp), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_golden_paper_exact(documents):
    """The reference golden sample (output_sample.json, 8 edges) is
    reproduced exactly, confidence included."""
    got = extract_triples(documents).filter(F.col("conv_id") == "conv_golden")
    got_set = set(
        (r["subj"], r["pred"], r["obj"], r["edge_confidence"]) for r in got.collect()
    )
    assert got_set == set(GOLDEN_TRIPLES)


def test_golden_nodes_attributes(documents):
    nodes = extract_nodes(documents).filter(F.col("conv_id") == "conv_golden")
    by_name = {r["name"]: r for r in nodes.collect()}
    assert set(by_name) == set(GOLDEN_NODES)
    for name, (ntype, cat, life, mat) in GOLDEN_NODES.items():
        r = by_name[name]
        assert r["type"] == ntype
        assert r["concept_category"] == cat
        assert r["intervention_lifecycle"] == life
        assert r["intervention_maturity"] == mat
        assert len(r["aliases"]) == 2


def test_engines_agree(documents):
    cols_t = ["conv_id", "chain_id", "chain_title", "edge_idx", "subj", "pred", "obj",
              "description", "edge_confidence"]
    a = sorted(map(tuple, extract_triples(documents, engine="arrow").select(cols_t).collect()))
    s = sorted(map(tuple, extract_triples(documents, engine="sql").select(cols_t).collect()))
    assert a == s
    cols_n = ["conv_id", "name", "type", "description", "concept_category",
              "intervention_lifecycle", "intervention_maturity"]
    an = sorted(map(tuple, extract_nodes(documents, engine="arrow").select(cols_n).collect()))
    sn = sorted(map(tuple, extract_nodes(documents, engine="sql").select(cols_n).collect()))
    assert an == sn


def test_chain_order_preserved(documents):
    """W2 — edge_idx reflects intra-chain textual order."""
    t = extract_triples(documents).filter(F.col("conv_id") == "conv_golden")
    chains = {}
    for r in t.collect():
        chains.setdefault(r["chain_id"], []).append((r["edge_idx"], r["subj"], r["pred"]))
    assert len(chains) == 4
    for edges in chains.values():
        idxs = sorted(e[0] for e in edges)
        assert idxs == list(range(len(edges)))


def test_validation_ranges(documents):
    """F9 — every emitted attribute is inside its pydantic-equivalent
    range (core.py:8,11,12,21)."""
    t = extract_triples(documents)
    assert t.filter(~F.col("edge_confidence").between(1, 5)).count() == 0
    n = extract_nodes(documents)
    assert n.filter(~F.col("type").isin("concept", "intervention")).count() == 0
    assert n.filter(
        F.col("intervention_lifecycle").isNotNull()
        & ~F.col("intervention_lifecycle").between(1, 6)
    ).count() == 0
    assert n.filter(
        F.col("intervention_maturity").isNotNull()
        & ~F.col("intervention_maturity").between(1, 4)
    ).count() == 0


def test_mentions(documents):
    m = extract_mentions(documents)
    golden = m.filter(F.col("conv_id") == "conv_golden")
    names = {r["mention"] for r in golden.collect()}
    # every golden node name is mentioned (declaration + edge refs)
    assert set(GOLDEN_NODES).issubset(names)


def test_mention_spans_exact(spark):
    """span_start/span_end are real character offsets: the doc slice at
    [span_start, span_end) reproduces each mention byte-for-byte, at
    exact positions (mentions-table contract, SURVEY.md:169)."""
    doc = "x[alpha] mid [beta]y [no-close"
    df = spark.createDataFrame([("c", doc)], "conv_id string, doc_text string")
    rows = sorted(
        extract_mentions(df).collect(), key=lambda r: r["span_start"]
    )
    assert [(r["mention"], r["span_start"], r["span_end"]) for r in rows] == [
        ("alpha", 2, 7), ("beta", 14, 18),
    ]
    for r in rows:
        assert doc[r["span_start"]:r["span_end"]] == r["mention"]


def test_mention_spans_on_corpus(documents):
    """Every extracted span reconstructs its mention on the full test
    corpus (all docs, all mentions)."""
    m = extract_mentions(documents)
    joined = m.join(documents, "conv_id").withColumn(
        "ok",
        F.expr("substring(doc_text, span_start + 1, span_end - span_start)")
        == F.col("mention"),
    )
    assert joined.filter(~F.col("ok")).count() == 0
    assert m.filter(F.col("span_start").isNull()).count() == 0
