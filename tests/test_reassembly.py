"""Stage A tests — per-turn text equality under stable ordering
(BASELINE.json input_hint invariant), quarantine routing, salting."""

import pyspark.sql.functions as F

from aisafetyintervention_literatureextraction_spark.datagen import generate_corpus
from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
    TURN_SEP,
    reassemble,
)
from aisafetyintervention_literatureextraction_spark.schemas import TRANSCRIPTS


def _expected_doc_texts(rows):
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    out = {}
    for conv, rs in by_conv.items():
        rs = sorted(rs, key=lambda r: r["turn_idx"])
        out[conv] = TURN_SEP.join(r["text"] for r in rs)
    return out


def test_per_turn_text_equality(spark, corpus):
    """Reassembled doc == turn texts joined in turn_idx order, for every
    clean conversation, even though input rows arrive shuffled."""
    df, _ = corpus
    rows = [r.asDict() for r in df.collect()]
    expected = _expected_doc_texts(rows)
    res = reassemble(df)
    got = {r["conv_id"]: r["doc_text"] for r in res.documents.collect()}
    quarantined = {r["conv_id"] for r in res.quarantine.collect()}
    assert quarantined == {"conv_dup", "conv_gap"}
    for conv, text in got.items():
        assert text == expected[conv], f"text mismatch for {conv}"
    assert set(got) == set(expected) - quarantined


def test_salted_equals_unsalted(spark, corpus):
    df, _ = corpus
    a = reassemble(df, salted=True, salt_segment=16).documents
    b = reassemble(df, salted=False).documents
    cols = ["conv_id", "n_turns", "doc_text"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_hot_conversation_reassembles(spark, corpus):
    df, _ = corpus
    res = reassemble(df, salt_segment=64)
    hot = res.documents.filter(F.col("conv_id") == "conv_hot").collect()
    assert len(hot) == 1
    assert hot[0]["n_turns"] == 302  # 300 filler + chain marker + edge


def test_identical_duplicate_collapses(spark):
    rows = [
        {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a", "tool": None, "ts": None},
        {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a", "tool": None, "ts": None},
        {"conv_id": "c", "turn_idx": 1, "role": "user", "text": "b", "tool": None, "ts": None},
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    res = reassemble(df)
    docs = res.documents.collect()
    assert res.quarantine.count() == 0
    assert len(docs) == 1 and docs[0]["doc_text"] == "a" + TURN_SEP + "b"


def test_order_permutation_invariance(spark, corpus):
    """W1 analog: input row order never changes outputs."""
    df, _ = corpus
    shuffled = df.orderBy(F.xxhash64("text", "ts"))
    a = reassemble(df).documents.select("conv_id", "doc_text")
    b = reassemble(shuffled).documents.select("conv_id", "doc_text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_allow_gaps_mode(spark):
    """Sparse-but-valid turn indices (deleted turns) assemble in order
    under allow_gaps=True; the default still quarantines them, and
    conflicting duplicates quarantine in BOTH modes."""
    from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
        reassemble,
    )
    rows = [
        ("sparse", 0, "user", "t0", None, None),
        ("sparse", 2, "user", "t2", None, None),   # index 1 deleted
        ("sparse", 5, "user", "t5", None, None),
        ("dup", 0, "user", "a", None, None),
        ("dup", 0, "user", "b", None, None),       # conflicting duplicate
    ]
    cols = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    df = spark.createDataFrame(rows, cols)

    strict = reassemble(df)
    assert {r["conv_id"]: r["reason"] for r in strict.quarantine.collect()} == {
        "sparse": "turn_index_gap", "dup": "conflicting_duplicate_turn",
    }

    lax = reassemble(df, allow_gaps=True)
    docs = {r["conv_id"]: r for r in lax.documents.collect()}
    assert docs["sparse"]["doc_text"] == "t0\nt2\nt5"
    assert docs["sparse"]["n_turns"] == 3
    assert {r["conv_id"] for r in lax.quarantine.collect()} == {"dup"}
