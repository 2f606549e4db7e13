"""Text-analysis operator tests."""

import pyspark.sql.functions as F

from aisafetyintervention_literatureextraction_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_features,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], "text string")
    got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    assert got == [3, 0, 1]


def test_quality_features_ranges(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 5),
         (1, "!!! ??? ... 12345 67890"),
         (2, "")],
        "doc_id long, text string",
    )
    q = quality_features(df).collect()
    for r in q:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    by_id = {r["doc_id"]: r for r in q}
    assert by_id[0]["quality_score"] > by_id[1]["quality_score"]


def test_language_id(spark):
    df = spark.createDataFrame(
        [(0, "the cat is in the house and that is fine"),
         (1, "der hund ist nicht mit der katze und das ist gut"),
         (2, "le chat est dans la maison et les chiens"),
         (3, "xyzzy plugh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(0, "some document body with words"),
         (1, "some document body with words"),
         (2, "entirely different content")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
