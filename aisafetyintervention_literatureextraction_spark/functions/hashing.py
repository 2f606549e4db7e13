"""Deterministic hashing: surrogate ids, MinHash signatures, SimHash.

All JVM-side column expressions (xxhash64 + array combinators) — no
Python UDFs, no nondeterminism. Surrogate ids replace the reference's
connection-state-dependent FalkorDB ``ID(n)`` (reference db.py:71,
merge.py:109 — SURVEY.md §4.3 flags that as a weakness, not a behavior
to copy): ``node_id = xxhash64(type, name)`` is stable across runs,
which is what makes checkpoint/resume replayable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_node_id(ntype: Column | str, name: Column | str) -> Column:
    t = F.col(ntype) if isinstance(ntype, str) else ntype
    n = F.col(name) if isinstance(name, str) else name
    return F.xxhash64(F.coalesce(t, F.lit("")), n)


def minhash_signature(tokens: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed s, min over tokens of
    xxhash64(s, token). Pure column expr — one pass over the token
    array per seed, all inside codegen."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(F.transform(tokens, lambda t: F.xxhash64(s, t))),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH bucketing: hash each band slice →
    array of (band_idx, bucket_hash) structs, later exploded and
    joined on (band_idx, bucket)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket"),
        ),
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array (near-dup fingerprint).

    Per token: xxhash64 → 64 sign contributions (+1 / -1 per bit);
    sum per bit over tokens; sign → bit. Folded into one BIGINT.
    """
    # bit positions are compile-time constants (shiftright needs int)
    counts = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[
                F.when(
                    F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)).cast("long")
                for b in range(64)
            ]),
            lambda a, c: a + c,
        ),
    )
    bit_vals = [1 << b for b in range(63)] + [-(1 << 63)]  # bit 63 = sign bit
    return F.aggregate(
        F.zip_with(
            counts,
            F.array(*[F.lit(v).cast("long") for v in bit_vals]),
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
