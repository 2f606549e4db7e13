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


def test_winnow_fingerprints(spark):
    from aisafetyintervention_literatureextraction_spark.operators.textstats import (
        winnow_fingerprints,
    )

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        # shares "the quick brown fox " (20 chars >= k+w-1 = 11) with a
        ("b", "xx the quick brown fox leaps over a lazy cat"),
        ("c", "short"),       # len < k: no grams
        ("d", "abcdefgh"),    # len == k: exactly one gram
        ("e", None),          # null text: empty, not a crash
        ("f", "abcdefghij"),  # 3 grams < w: whole-doc window
        ("g", "zzzzzzzzzzzz"),  # all-identical grams collapse to one fp
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["fingerprints"] for r in winnow_fingerprints(df).collect()}
    assert out["c"] == [] and out["e"] == []
    assert len(out["d"]) == 1 and len(out["f"]) == 1
    assert len(out["g"]) == 1
    # winnowing guarantee: shared substring >= k+w-1 chars → shared fp
    assert set(out["a"]) & set(out["b"])
    assert out["a"] == sorted(set(out["a"]))  # sorted distinct contract
    # case-insensitive (lowercased before hashing)
    up = {
        r["doc_id"]: r["fingerprints"]
        for r in winnow_fingerprints(
            df.withColumn("text", F.upper("text"))
        ).collect()
    }
    assert up["a"] == out["a"]
    # hot path stays JVM-side: no Python eval in the plan
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
