"""Similarity-search tests: exact brute-force vs LSH recall on the
driver embeddings table."""

import pyspark.sql.functions as F
import pytest

from aisafetyintervention_literatureextraction_spark.operators.similarity import (
    cosine,
    cosine_pairs,
    cosine_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    e.count()
    yield e
    e.unpersist()


def test_cosine_expr(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    got = [round(r[0], 6) for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got == [1.0, 0.0, 1.0]


def test_cosine_topk_self_first(emb):
    """Every vector's nearest neighbor (rank 1) is itself."""
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk(emb, queries, k=3)
    r1 = {r["query_id"]: r["vec_id"] for r in top.filter(F.col("rank") == 1).collect()}
    assert all(q == v for q, v in r1.items())


def test_lsh_topk_recall(emb):
    """LSH top-10 recalls ≥ 0.6 of exact top-10 on the labeled
    clustered embeddings (it's approximate; brute-force is the
    correctness baseline)."""
    queries = emb.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, bands=24, bits=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_cosine_pairs_threshold(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.05, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0]),
    ]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_pairs(v, threshold=0.95, bands=16, bits=2, dim=3).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(0, 1)}


def test_ivf_topk_recall_and_exhaustive_exact(emb):
    """IVF ANN: probing a fraction of cells recalls most of the exact
    top-k; probing ALL cells is exactly brute force."""
    from aisafetyintervention_literatureextraction_spark.operators.similarity import (
        ivf_topk, train_ivf_centroids,
    )

    queries = emb.limit(6).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}

    C = train_ivf_centroids(emb, n_cells=16, seed=7)
    approx = ivf_topk(emb, queries, k=10, n_probe=6, centroids=C)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.6, len(e & a) / len(e)

    exhaustive = ivf_topk(emb, queries, k=10, n_probe=16, centroids=C)
    x = {(r["query_id"], r["rank"], r["vec_id"]) for r in exhaustive.collect()}
    ex = {(r["query_id"], r["rank"], r["vec_id"]) for r in exact.collect()}
    assert x == ex  # full probe == brute force, rank for rank
