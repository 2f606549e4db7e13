"""Dedup operator tests on the driver-provided documents table +
hand-built near-dup fixtures."""

import pyspark.sql.functions as F
import pytest

from aisafetyintervention_literatureextraction_spark.operators.dedup import (
    dedup_keep_first,
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
    simhash_near_duplicates,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    d.count()
    yield d
    # unpersist: Spark's cache manager substitutes InMemoryRelation for
    # ANY later plan over this parquet, breaking plan-shape tests
    d.unpersist()


@pytest.fixture(scope="module")
def neardup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base.replace("lazy", "sleepy")),          # near dup
        (3, "completely unrelated text about spark catalyst optimizer internals"),
        (4, base.replace("quick", "swift").replace("dog", "hound")),  # near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(neardup_docs):
    groups = exact_duplicates(neardup_docs).collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == [0, 1]
    assert groups[0]["keep_id"] == 0


def test_minhash_near_duplicates(neardup_docs):
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_near_duplicates(neardup_docs, threshold=0.6).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_near_duplicates(neardup_docs):
    pairs = {
        (r["a_id"], r["b_id"])
        for r in simhash_near_duplicates(neardup_docs, max_hamming=8).collect()
    }
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard(neardup_docs):
    pairs = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_duplicates(neardup_docs, n=2, threshold=0.5).collect()
    }
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_dedup_keep_first(neardup_docs):
    pairs = minhash_near_duplicates(neardup_docs, threshold=0.6)
    kept = dedup_keep_first(neardup_docs, pairs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # component {0,1,2,4 maybe} keeps 0; 3 isolated stays
    assert 0 in ids and 3 in ids and 1 not in ids and 2 not in ids


def test_exact_dedup_on_testdata(docs):
    """Cross-check groupBy-hash against groupBy-text on real data."""
    via_hash = exact_duplicates(docs, "doc_id", "text").agg(
        F.sum(F.col("n_dups") - 1)
    ).collect()[0][0] or 0
    via_text = (
        docs.groupBy("text").count().filter(F.col("count") > 1)
        .agg(F.sum(F.col("count") - 1)).collect()[0][0] or 0
    )
    assert via_hash == via_text


def test_dedup_keep_first_string_ids(spark):
    """String doc ids must not silently cast to NULL vertices (ADVICE
    r1): they are xxhash64-mapped consistently on both sides, so each
    dup component keeps exactly one member and uniques survive."""
    rows = [
        ("url_a", "same text"),
        ("url_b", "same text"),
        ("url_c", "different text entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = spark.createDataFrame([("url_a", "url_b")], "a_id string, b_id string")
    kept = dedup_keep_first(docs, pairs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert "url_c" in ids
    assert len(ids) == 2  # one survivor of {a,b} + the unique doc
    assert len(ids & {"url_a", "url_b"}) == 1


def test_pack_shingles_segment_isolation():
    """ADVICE r2 (medium): a sub-k-length document's shingle codes must
    not depend on its batch neighbors — windows never cross segment
    boundaries (k-1 NUL sentinels between docs)."""
    import numpy as np

    from aisafetyintervention_literatureextraction_spark.functions.hashing import (
        _pack_shingles,
    )

    k = 5
    alone, s0 = _pack_shingles(["ab"], k)
    paired, s1 = _pack_shingles(["ab", "zzzzzzzzzz"], k)
    assert list(s1[:2]) == [0, 1]
    assert alone[0] == paired[0]  # short doc's single window is neighbor-free
    # and long-doc windows are unaffected by a short predecessor
    solo_long, _ = _pack_shingles(["zzzzzzzzzz"], k)
    np.testing.assert_array_equal(solo_long, paired[1:])
    # empty docs hash identically wherever they appear
    e1, _ = _pack_shingles([""], k)
    e2, st = _pack_shingles(["abcdefgh", ""], k)
    assert e1[0] == e2[st[1]]


def test_operator_caches_released(spark, neardup_docs):
    """ADVICE r2: operator-persisted intermediates are tracked and
    reclaimable — release_caches() after materialization leaves no
    cached plans behind for a long-lived driver to leak."""
    from aisafetyintervention_literatureextraction_spark.functions.caching import (
        release_caches,
    )

    def cached_ids():
        # ids, not counts: Spark's async ContextCleaner may reap OTHER
        # tests' stale caches between readings — counts are racy
        return {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    release_caches()  # drain anything earlier tests tracked
    before = cached_ids()
    minhash_near_duplicates(neardup_docs, threshold=0.8).count()
    new = cached_ids() - before
    assert len(new) >= 2  # the operator cached its fan-out plans (sig + buckets)
    n = release_caches()
    assert n >= 2
    assert not (cached_ids() & new)  # ...and released ALL of them


def test_winnow_duplicate_pairs(spark):
    """Passage-copy detection: a long copied paragraph pairs two
    otherwise-different docs; unrelated docs don't pair; the
    hot-bucket cap suppresses boilerplate shared by everything."""
    from aisafetyintervention_literatureextraction_spark.operators.dedup import (
        winnow_duplicate_pairs,
    )

    passage = "the quick brown fox jumps over the lazy dog repeatedly today"
    rows = [
        ("a", "intro alpha. " + passage + " outro one."),
        ("b", "different beginning text! " + passage + " and another end."),
        ("c", "completely unrelated content about spark catalyst plans."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["a_id"], r["b_id"]): r["n_shared"]
        for r in winnow_duplicate_pairs(
            df, min_shared=2, max_bucket_size=None
        ).collect()
    }
    assert ("a", "b") in got and got[("a", "b")] >= 2
    assert not any("c" in p for p in got)

    # every doc shares the same boilerplate: cap 2 (< 3 docs) kills it
    boiler = [(f"d{i}", f"doc {i} unique bit. " + passage) for i in range(5)]
    bdf = spark.createDataFrame(boiler, "doc_id string, text string")
    assert (
        winnow_duplicate_pairs(bdf, min_shared=2, max_bucket_size=2).count() == 0
    )


def test_verify_modes_agree(spark, monkeypatch):
    """r6: the adaptive exact-Jaccard verify core must be
    representation-independent — strings, sparse int dictionary, and
    dense bitset modes return byte-identical (a_id, b_id, jaccard)
    rows on a mixed corpus (unicode text, short docs, empty-ish doc,
    candidate pairs both above and below the threshold)."""
    from pyspark.sql import functions as F

    from aisafetyintervention_literatureextraction_spark.functions.text import (
        char_shingles,
    )
    from aisafetyintervention_literatureextraction_spark.operators import dedup

    base = "möglichst ähnliche dokumente für die prüfung der mengen"
    rows = [
        (0, base),
        (1, base + "!"),
        (2, base.replace("ähnliche", "gleiche")),
        (3, "short"),
        (4, "sh"),
        (5, "a totally different english sentence with other words"),
        (6, base),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feat = docs.select(
        "doc_id", char_shingles(F.col("text"), 4).alias("toks"))
    cand = (
        docs.select(F.col("doc_id").alias("a_id"))
        .crossJoin(docs.select(F.col("doc_id").alias("b_id")))
        .filter(F.col("a_id") < F.col("b_id"))
    )

    def run(mode):
        out = dedup._verify_exact_jaccard(cand, feat, 0.6, mode=mode)
        return sorted(map(tuple, out.collect()))

    got_strings = run("strings")
    got_bitset = run("dict")  # tiny vocab -> bitset path
    monkeypatch.setattr(dedup, "_BITSET_MAX_VOCAB", 1)
    got_sparse = run("dict")  # vocab over the gate -> sparse int path
    monkeypatch.setattr(dedup, "_DICT_MIN_CANDIDATES", 1)
    got_auto = run("auto")    # auto -> dict (candidates >= gate)
    assert got_strings == got_bitset == got_sparse == got_auto
    assert got_strings, "fixture must produce at least one verified pair"
    assert all(j >= 0.6 for _, _, j in got_strings)
