"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness
  baseline. JVM-side dot product via zip_with/aggregate; the query
  set is broadcast (small side), so it's one scan of the corpus, no
  shuffle of the big side, TakeOrderedAndProject per query.
- ``lsh_topk``: random-hyperplane (sign) LSH bucketing — the scale
  path: candidates share ≥1 band; exact cosine re-rank on candidates
  only. Sub-linear candidate sets at 100 TB corpus scale.
- ``cosine_pairs``: all-pairs above a threshold via the same LSH
  blocking (embedding near-dup dedup).

Deterministic hyperplanes: components derived from xxhash64(seed,
band, dim) → uniform in [-1, 1] — reproducible across runs/executors
with no RNG state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> F.Column:
    """Pure column-expression cosine: exact, element-order-
    deterministic double arithmetic (use where bit-reproducibility
    matters). Spark evaluates array lambdas interpreted per element —
    for bulk scoring use :func:`cosine_fast` (Arrow/numpy, ~40×)."""
    return _dot(a, b) / (
        F.greatest(_norm(a), F.lit(1e-12)) * F.greatest(_norm(b), F.lit(1e-12))
    )


def _cosine_batch_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    dot = np.einsum("ij,ij->i", A, B)
    na = np.linalg.norm(A, axis=1)
    nb = np.linalg.norm(B, axis=1)
    return pd.Series(dot / np.maximum(na * nb, 1e-12))


def cosine_fast(a, b) -> F.Column:
    """Arrow-batched numpy cosine (X2-style vectorized UDF): the bulk
    scoring path — einsum over the whole batch, no per-element Python
    or interpreted lambdas. (UDF registered lazily: pandas_udf parses
    its DDL against the active session.)"""
    return pandas_udf(_cosine_batch_fn, "double")(a, b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the queries, one
    pass over the corpus, rank per query. Returns (query_id, vec_id,
    cosine_sim, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "vec_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _sign_bands(vec, bands: int, bits: int, dim: int):
    """Random-hyperplane signature per band: bit b of band i = sign of
    <vec, h(i,b)> where h components come from a hash — deterministic,
    no stored hyperplane matrix."""
    def plane_dot(band: int, bit: int):
        # hash-derived pseudo-random hyperplane component per dimension
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: (
                    x
                    * (
                        (
                            F.pmod(
                                F.xxhash64(F.lit(band * 7919 + bit), d), F.lit(2000001)
                            )
                            - F.lit(1000000)
                        )
                        / F.lit(1000000.0)
                    )
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.aggregate(
                F.array(*[
                    F.when(plane_dot(i, b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
                    for b in range(bits)
                ]),
                F.lit(0),
                lambda acc, v: acc.bitwiseOR(v),
            ).alias("bucket"),
        )
        for i in range(bands)
    ])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bands: int = 8,
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join then exact re-rank of
    candidates. Recall grows with bands; cost with bits⁻¹."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cb = c.select(
        "vec_id", "c_vec", F.explode(_sign_bands(F.col("c_vec"), bands, bits, dim)).alias("bb")
    ).select("vec_id", "c_vec", "bb.band", "bb.bucket")
    qb = q.select(
        "query_id", "q_vec", F.explode(_sign_bands(F.col("q_vec"), bands, bits, dim)).alias("bb")
    ).select("query_id", "q_vec", "bb.band", "bb.bucket")
    cand = (
        qb.join(cb, ["band", "bucket"])
        .dropDuplicates(["query_id", "vec_id"])
        .select(
            "query_id", "vec_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold (LSH-blocked
    self-join + exact re-rank)."""
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    vb = v.select(
        "vec_id", "vec", F.explode(_sign_bands(F.col("vec"), bands, bits, dim)).alias("bb")
    ).select("vec_id", "vec", "bb.band", "bb.bucket")
    left = vb.select("band", "bucket", F.col("vec_id").alias("a_id"), F.col("vec").alias("a_vec"))
    right = vb.select("band", "bucket", F.col("vec_id").alias("b_id"), F.col("vec").alias("b_vec"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("cosine_sim", cosine(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("a_id", "b_id", "cosine_sim")
    )
