"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps SURVEY.md §2 operator ids onto the driver-provided
neutral tables (region nation customer supplier part orders lineitem
events documents embeddings); each has a DuckDB ``oracle_sql()`` twin
with IDENTICAL column names/types. Float-valued outputs are either
integer-derived (exact in both engines) or rounded after identical
element-order arithmetic; similarity queries emit rank/ids only.

Every query has an oracle (40/40 as of r4; 34/34 since r2): LSH-blocked dedup/ANN
queries emit their exact-verified FINAL predicate (Jaccard / quantized
cosine rank), which the oracle computes over all pairs — only the
candidate generation is engine-specific, and its recall is complete on
this data's measured margins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aisafetyintervention_literatureextraction_spark.functions.text import (
    node_text,
    snake_case,
)
from aisafetyintervention_literatureextraction_spark.operators.components import (
    connected_components,
)
from aisafetyintervention_literatureextraction_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from aisafetyintervention_literatureextraction_spark.operators.extraction import (
    extract_mentions,
)
from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
    reassemble,
)
from aisafetyintervention_literatureextraction_spark.operators.similarity import (
    cosine,
    cosine_pairs_exact,
    cosine_with_norms,
    ivf_topk,
    lsh_topk,
)
from aisafetyintervention_literatureextraction_spark.sources.raw_files import (
    read_raw_files,
)
from aisafetyintervention_literatureextraction_spark.operators.graph_analytics import (
    bfs_khop,
    kcore,
    ktruss,
    label_propagation,
    modularity,
    summarize_graph,
    link_prediction,
    personalized_pagerank,
    pagerank_int,
    sssp_weighted,
    triangle_counts,
)
from aisafetyintervention_literatureextraction_spark.operators.textstats import (
    language_id,
    quality_features,
    winnow_fingerprints,
)

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

TOK_RE = r"[^a-z0-9_\-\.]+"
VOCAB = ["spark", "table", "query", "join", "window", "stream"]
_VOCAB_SQL = ", ".join(f"'{v}'" for v in VOCAB)


def _shingle_sql(k: int) -> str:
    """DuckDB twin of functions/text.char_shingles: identical offsets,
    lowercasing, and short-string truncation."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length(lower(text))-{k - 1},1)+1), "
        f"i -> substr(lower(text), i, {k})))"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically derive a transcripts-shaped table from the
    neutral `events` table: one conversation per user, turns ordered
    by (ts, event_id) — lets the oracle check the W3 reassembly
    operator on driver data."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("event_type").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_w3_reassembly(spark, sf_dir):
    """W3 — salted sort-within-group document reassembly (Stage A)."""
    tr = _events_as_transcripts(spark, sf_dir)
    docs = reassemble(tr, salt_segment=64).documents
    return docs.select("conv_id", "n_turns", "doc_text")


def q_f1_resume_antijoin(spark, sf_dir):
    """F1/J4 — resume anti-join: orders from customers outside a set."""
    orders = _t(spark, sf_dir, "orders")
    done = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("o_custkey"))
    return orders.join(done, "o_custkey", "left_anti").select("o_orderkey")


def q_f2_head_limit(spark, sf_dir):
    """F2/O1/O3 — deterministic ordered head-N."""
    return (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(10)
        .select("doc_id", "n_chars")
    )


def q_f9_validation_quarantine(spark, sf_dir):
    """F9 — range/domain checks route violations to quarantine."""
    li = _t(spark, sf_dir, "lineitem")
    checks = [
        ("quantity_range", ~F.col("l_quantity").between(1, 50)),
        ("discount_range", ~F.col("l_discount").between(0.0, 0.1)),
        ("flag_domain", ~F.col("l_returnflag").isin("A", "N", "R")),
    ]
    dfs = [
        li.filter(cond).select(F.lit(name).alias("violation"), "l_orderkey", "l_linenumber")
        for name, cond in checks
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.groupBy("violation").agg(F.count("*").alias("n_bad"))


def q_a2_dedup_lww(spark, sf_dir):
    """A2 — dedup by key, last-writer-wins props (MERGE SET semantics)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts", "event_id")).alias("last_type"),
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
        F.count("*").alias("n_events"),
    )


def q_a3_group_evidence(spark, sf_dir):
    """A3 — edge-identity grouping with evidence accumulation."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_a6_node_text(spark, sf_dir):
    """A6/C3/C4 — reference node-text serialization (db.py:81-95
    semantics: k=v parts joined '; ', empty values dropped)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        node_text(
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.array(F.col("c_name")),
            F.concat(F.lit("bal "), F.col("c_acctbal").cast("int").cast("string")),
            F.lit(None).cast("string"),
            F.lit(None).cast("int"),
            F.lit(None).cast("int"),
        ).alias("text"),
    )


def q_c9_snake_case(spark, sf_dir):
    """C9 — node-name normalization."""
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", snake_case(F.col("p_name")).alias("norm_name"))


def q_u1_union_distinct(spark, sf_dir):
    """U1 — UNION (distinct) of two predicate branches."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 50).select("event_type")
    b = ev.filter(F.col("user_id") < 10).select("event_type")
    return a.union(b).distinct()


def q_o2_global_topk(spark, sf_dir):
    """O2 — global top-k (TakeOrderedAndProject), deterministic ties."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    return (
        li.select("l_orderkey", "l_linenumber", rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey", "l_linenumber")
        .limit(30)
    )


def q_w4_topk_per_group(spark, sf_dir):
    """W4 — top-k per group via window row_number."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    )


def q_j2_multi_join_agg(spark, sf_dir):
    """J2 — multi-way equi-join (broadcast dims) + aggregation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_j3_rewire_coalesce(spark, sf_dir):
    """J3 — edge-rewire outer join: map old key → new key, coalesce."""
    s = _t(spark, sf_dir, "supplier")
    remap = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 12)
        .select(
            F.col("n_nationkey").alias("s_nationkey"),
            (F.col("n_regionkey") + 100).alias("new_key"),
        )
    )
    return s.join(F.broadcast(remap), "s_nationkey", "left").select(
        "s_suppkey",
        F.coalesce("new_key", "s_nationkey").cast("int").alias("effective_key"),
    )


def q_g4_isolated_nodes(spark, sf_dir):
    """G4 — nodes with no incident edges (anti-join), per segment."""
    c = _t(spark, sf_dir, "customer")
    endpoints = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    return (
        c.join(endpoints, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_isolated"))
    )


def q_g5_connected_components(spark, sf_dir):
    """G5 — iterative hash-join connected components on a bipartite
    vec↔label graph whose closed-form answer the oracle states."""
    e = _t(spark, sf_dir, "embeddings")
    verts = e.select(F.col("vec_id").alias("node_id")).union(
        e.select((F.col("label").cast("long") + 1000000).alias("node_id"))
    ).distinct()
    edges = e.select(
        F.col("vec_id").alias("a_id"),
        (F.col("label").cast("long") + 1000000).alias("b_id"),
    )
    return connected_components(verts, edges)


def q_tpch_q1(spark, sf_dir):
    """A — partial+final aggregation (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup — hash-groupBy duplicate groups."""
    d = _t(spark, sf_dir, "documents")
    groups = exact_duplicates(d, "doc_id", "text")
    # output engine-neutral columns (no xxhash values)
    return groups.select("keep_id", "n_dups")


def q_dedup_token_jaccard(spark, sf_dir):
    """N-gram/token Jaccard near-dup pairs — integer-derived score."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col("text")), TOK_RE), lambda x: F.length(x) > 0)
    )
    f = d.select("doc_id", toks.alias("toks"))
    a = f.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    b = f.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    inter = F.size(F.array_intersect(F.col("a_toks"), F.col("b_toks")))
    union = F.size(F.array_union(F.col("a_toks"), F.col("b_toks")))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (ids only; threshold margin
    ≫ cross-engine float error — measured gap around 0.45 is ~5e-4).
    EXACT answer via distributed block-pair cogroup GEMM
    (cosine_pairs_exact): no cartesian row join, no driver collect,
    no corpus broadcast — at cos 0.45 sign-LSH has no blocking margin,
    so brute-force-with-BLAS is the honest exact path;
    operators/similarity.cosine_pairs is the scale path for high
    thresholds."""
    e = _t(spark, sf_dir, "embeddings")
    return cosine_pairs_exact(e, threshold=0.45).select("a_id", "b_id")


def q_sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (rank/ids only; scores quantized for
    cross-engine rank stability)."""
    from aisafetyintervention_literatureextraction_spark.operators.similarity import (
        cosine_with_norms,
        norm_expr,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"),
        norm_expr(F.col("embedding")).alias("q_norm"),
    )
    # per-row precomputed clamped norms (r6): identical double chain
    # to cosine() — the norm was re-evaluated per (query, corpus) pair
    scored = F.broadcast(q).crossJoin(
        e.select(F.col("vec_id"), F.col("embedding").alias("c_vec"),
                 norm_expr(F.col("embedding")).alias("c_norm"))
    ).select(
        "query_id", "vec_id",
        F.round(cosine_with_norms(F.col("q_vec"), F.col("c_vec"),
                                  F.col("q_norm"), F.col("c_norm")),
                3).alias("sim3"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim3"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "vec_id")
    )


def q_text_token_stats(spark, sf_dir):
    """Token counting — whitespace tokens, distinct ratio, mean length
    (integer-derived doubles)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), TOK_RE), lambda x: F.length(x) > 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("mean_tok_len"),
    )


def q_text_quality(spark, sf_dir):
    """Quality scoring — ratio features (integer-derived)."""
    d = _t(spark, sf_dir, "documents")
    out = quality_features(d, "text")
    return out.select(
        "doc_id", "n_chars", "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("distinct_token_ratio", 6).alias("distinct_ratio"),
    )


def q_text_lang_id(spark, sf_dir):
    """Heuristic language ID via stopword-marker hits."""
    d = _t(spark, sf_dir, "documents")
    return language_id(d, "text").select("doc_id", "lang_pred")


def q_sessionize(spark, sf_dir):
    """W — sessionization: lag(ts) + running sum over gap>30min
    (pyspark_guide 'Sessionization' pattern); per-user session count
    and mean session length in events."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds (TIMESTAMP_NTZ; session TZ pinned UTC)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    sess = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    ).withColumn("session_id", F.sum("new_sess").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n").alias("max_session_len"),
        )
    )


def q_approx_aggs(spark, sf_dir):
    """Approximate aggregates surface (approx_count_distinct /
    percentile_approx). Oracle compares EXACT equivalents, so the
    query returns exact counterparts + approx bounds sanity:
    here — exact distinct + exact median for oracle parity."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.round(F.median("l_quantity"), 2).alias("median_qty"),
    )


def q_asof_join(spark, sf_dir):
    """As-of join (Spark lacks a native one; pyspark_guide pattern):
    for each order, the latest event of user (o_custkey % 50) with
    ts <= o_orderdate — implemented as union + per-key ordered
    last-non-null carry-forward (one window, no range explosion)."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("uid"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        F.col("event_type"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 50).alias("uid"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
    )
    unioned = ev.select(
        "uid", "t", F.lit(0).alias("kind"), "event_id", "event_type",
        F.lit(None).cast("long").alias("o_orderkey"),
    ).unionByName(
        orders.select(
            "uid", "t", F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            "o_orderkey",
        )
    )
    # order by (t, kind, event_id): events sort before orders at equal
    # ts (<= semantics); among equal-ts events the max event_id wins
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_event_type", F.last("event_type", ignorenulls=True).over(w)
    ).withColumn("last_event_id", F.last("event_id", ignorenulls=True).over(w))
    return carried.filter(F.col("kind") == 1).select(
        "o_orderkey", "last_event_id", "last_event_type"
    )


def q_pivot_event_types(spark, sf_dir):
    """Pivot — per-user event counts spread into columns."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
        .na.fill(0, ["click", "view", "purchase", "error"])
    )


def q_rollup_revenue(spark, sf_dir):
    """Rollup — hierarchical totals (region → nation → total) with
    grouping-set markers."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    base = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "n_custs", "total_bal",
        )
    )


def q_kg_mentions(spark, sf_dir):
    """X1 (mention-detection half) — controlled-vocabulary mention
    rows per document."""
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col("text")), TOK_RE),
            lambda x: x.isin(*VOCAB),
        )
    )
    return d.select("doc_id", F.explode(toks).alias("mention"))


def q_kg_cooccurrence(spark, sf_dir):
    """X1+A3 — co-occurring mention pairs per document → weighted
    edges (subj < obj canonical form O4).  The mention relation feeds
    BOTH join sides, so it is pinned (r6) — otherwise the regex
    tokenize/explode over every document runs twice."""
    from aisafetyintervention_literatureextraction_spark.functions.caching import (
        track,
    )

    m = track(q_kg_mentions(spark, sf_dir))
    a = m.select(F.col("doc_id"), F.col("mention").alias("subj"))
    b = m.select(F.col("doc_id"), F.col("mention").alias("obj"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("subj") < F.col("obj"))
        .groupBy("subj", "obj")
        .agg(F.count("*").alias("n_docs"))
    )


# ---- LSH-blocked queries: engine-specific CANDIDATE generation, but the
# ---- final predicate (exact Jaccard / exact cosine rank) is oracle-
# ---- checkable — the oracle computes the same predicate over ALL pairs,
# ---- and the blocking's recall is complete on this data (measured
# ---- margin: true near-dup pairs ≥ 0.93 Jaccard, next pair ≤ 0.70).

def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH blocked near-dups, exact char-5-shingle Jaccard
    verified — oracle computes the identical predicate all-pairs.
    (Input repartitioned: the sf dirs are single parquet files, which
    would pin the Arrow signature stage to one core; at real scale the
    scan arrives pre-split.)"""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    out = minhash_near_duplicates(d, "doc_id", "text", threshold=0.8)
    return out.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark, sf_dir):
    """SimHash-banded blocking (8×8-bit pigeonhole bands), exact
    char-4-shingle Jaccard ≥ 0.9 verify."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    out = simhash_near_duplicates(
        d, "doc_id", "text", max_hamming=7, verify="jaccard", jaccard_threshold=0.9
    )
    return out.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


def q_sim_lsh_topk(spark, sf_dir):
    """Sign-LSH blocked top-5 with quantized exact re-rank; with
    bands=32/bits=2 candidate recall covers the exact top-5 on this
    data, so the oracle is the exact ranking itself."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(
        e, q, k=5, bands=32, bits=2,
        score_with_norms=lambda a, b, na, nb: F.round(
            cosine_with_norms(a, b, na, nb), 3),
    )
    return out.select("query_id", "rank", "vec_id")


def q_text_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing, k=8/w=4):
    base-31 polynomial k-gram hashes are exact int64 arithmetic, so
    DuckDB replays the identical algorithm bit-for-bit — compared via
    per-doc fingerprint count and extremal fingerprint values."""
    d = _t(spark, sf_dir, "documents")
    out = winnow_fingerprints(d, text_col="text", k=8, w=4)
    return out.select(
        "doc_id",
        F.size("fingerprints").alias("n_fp"),
        F.element_at("fingerprints", 1).alias("fp_min"),
        F.element_at("fingerprints", -1).alias("fp_max"),
    )


def q_dedup_winnow(spark, sf_dir):
    """MOSS-style passage-copy detection: pairs sharing >= 20 winnowing
    fingerprints after the hot-bucket cap (<= 64 docs per fingerprint —
    deterministic, mirrored exactly in the oracle). Fingerprint equality
    is exact substring evidence, so the whole pipeline is
    integer-exact — no sketch predicate to re-verify."""
    from aisafetyintervention_literatureextraction_spark.operators.dedup import (
        winnow_duplicate_pairs,
    )

    # repartition for the same reason as q_dedup_minhash_lsh: the sf
    # dirs are single parquet files, which pin the CPU-bound rolling-
    # hash fingerprint stage to ~2 input splits (measured 37 s on 2
    # cores vs 2.6 s spread across the cluster at sf1.0); at real
    # scale the scan arrives pre-split
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return winnow_duplicate_pairs(
        d, k=8, w=4, min_shared=20, max_bucket_size=64
    )


def q_sim_ivf_topk(spark, sf_dir):
    """IVF ANN top-5 at n_probe == n_cells — exhaustive probing is
    exactly brute force, so the DuckDB oracle is the exact ranking
    while the query still exercises the full IVF machinery (KMeans
    codebook training, cell assignment, probe join, exact re-rank).
    The approximate regime (n_probe < n_cells) is recall-tested in
    tests/test_similarity.py. Scores quantized for cross-engine rank
    stability."""
    from aisafetyintervention_literatureextraction_spark.operators.similarity import (
        train_ivf_centroids,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # exhaustive probing makes the result codebook-independent, so the
    # contract query trains on a small deterministic slice (cell quality
    # only shapes intermediate partitioning here; full-corpus training
    # is the recall-tested production path)
    cb = train_ivf_centroids(e.orderBy("vec_id").limit(512), n_cells=8)
    out = ivf_topk(
        e, q, k=5, n_cells=8, n_probe=8, centroids=cb,
        score_with_norms=lambda a, b, na, nb: F.round(
            cosine_with_norms(a, b, na, nb), 3),
    )
    return out.select("query_id", "rank", "vec_id")


def q_kg_pipeline_triples(spark, sf_dir):
    """Flagship: W3 reassembly → mention detection → co-occurrence
    triples over events-derived transcripts (full Stage A+B shape on
    neutral data). Oracle: string_agg reassembly + token self-join."""
    from aisafetyintervention_literatureextraction_spark.functions.caching import (
        track,
    )

    tr = _events_as_transcripts(spark, sf_dir)
    docs = reassemble(tr, salt_segment=64).documents
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col("doc_text")), TOK_RE),
            lambda x: F.length(x) > 0,
        )
    )
    # the mention relation feeds BOTH join sides (r6): pin it so the
    # reassembly window + tokenize/explode pipeline runs once
    m = track(docs.select("conv_id", F.explode(toks).alias("mention")))
    a = m.select("conv_id", F.col("mention").alias("subj"))
    b = m.select("conv_id", F.col("mention").alias("obj"))
    return (
        a.join(b, "conv_id")
        .filter(F.col("subj") < F.col("obj"))
        .groupBy("subj", "obj")
        .agg(F.count("*").alias("n_convs"))
    )


def q_kg_mention_spans(spark, sf_dir):
    """X1 mention spans: bracket-wrap controlled-vocab tokens (a
    deterministic transform both engines apply identically), then
    extract each mention with its exact character span via the
    running-offset aggregate (extract_mentions) — the oracle replays
    the same split-offset algorithm in SQL window functions."""
    d = _t(spark, sf_dir, "documents")
    pat = r"\b(spark|table|query|join|window|stream)\b"
    marked = d.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.regexp_replace(F.lower(F.col("text")), pat, r"[$1]").alias("doc_text"),
    )
    m = extract_mentions(marked)
    return m.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        "mention", "span_start", "span_end",
    )


_PROV_VOCAB = ("spark", "table", "query", "join", "window", "stream")


def q_kg_node_provenance(spark, sf_dir):
    """Stage-D document provenance (operators/materialize.py
    source_titles): KG nodes denormalize the metadata of their
    evidence documents — explode evidence, equi-join doc metadata,
    sorted-distinct collect capped at 20 (the hub-node bound; the cap
    expression is mirrored verbatim in the oracle).  Here the node set
    is a controlled mention vocabulary over ``documents.text`` and the
    metadata column is ``source`` (the testdata stand-in for PDF /Info
    title); provenance is emitted pipe-joined so the hash compare is
    representation-stable."""
    d = _t(spark, sf_dir, "documents")
    m = (
        d.select(
            "doc_id", "source",
            F.explode(F.split(F.lower(F.col("text")), TOK_RE)).alias("mention"),
        )
        .filter(F.col("mention").isin(*_PROV_VOCAB))
        .distinct()
    )
    return m.groupBy("mention").agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_set("source")), 1, 20), "|"
        ).alias("source_titles"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ---- graph-analytics kernels over a co-purchase graph (parts that share
# ---- an order, support >= 2 orders) — integer-exact PageRank, degree-
# ---- oriented triangles, frontier BFS; oracles replay the same math in
# ---- SQL (PageRank unrolled per-iteration, BFS as a recursive CTE).

def _copurchase_edges(spark, sf_dir, weighted=False):
    """Undirected (a, b) part pairs co-occurring in >= 2 orders —
    deterministic market-basket graph over neutral TPC-H data.  With
    ``weighted`` the co-occurrence count rides along as ``w`` (the
    analog of the KG's per-edge evidence count).

    r6 shape (guide §2.3/§2.4, result-identical to the original
    ``li JOIN li ON l_orderkey`` self-join): ONE shuffle groups each
    order's distinct parts into a sorted array (collect_set dedups, so
    the separate ``.distinct()`` pass is gone), and the a<b pair
    fan-out happens map-side via array HOFs instead of a second
    join-shuffle of the whole lineitem projection.  The per-order pair
    multiset is identical, so the (a, b, n_orders) aggregate is too.
    The result is pinned (track → release_caches in the bench loop)
    because every graph kernel consumes it 1-2×  per query — the
    pagerank/LPA kernels materialize it once for the edge structure,
    and the ppr/sssp/khop/modularity queries a second time for the
    seed/label derivations; before r6 each materialization re-ran the
    lineitem self-join from the parquet scan up."""
    from aisafetyintervention_literatureextraction_spark.functions.caching import (
        track,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set(F.col("l_partkey").cast("long"))).alias("ps")
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    e = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    if weighted:
        return track(e.select("a", "b", F.col("n_orders").alias("w")))
    return track(e.select("a", "b"))


def q_graph_pagerank(spark, sf_dir):
    """Integer-scaled deterministic PageRank (5 iterations, d=0.85,
    rank × 10^9, floor division throughout) on the undirected
    co-purchase graph — bit-exact on any engine/partitioning, so the
    oracle unrolls the identical recurrence in SQL."""
    return pagerank_int(_copurchase_edges(spark, sf_dir), iterations=5)


def q_graph_pagerank_weighted(spark, sf_dir):
    """Evidence-weighted PageRank: each co-purchase edge carries its
    co-occurrence count, so an edge seen in 5 orders moves 5x the
    rank mass of a once-seen edge — the weighted recurrence stays
    integer-exact (w/W_out shares, floor division), so the oracle
    unrolls it in BIGINT SQL like the unweighted query."""
    return pagerank_int(
        _copurchase_edges(spark, sf_dir, weighted=True),
        iterations=5, weight="w",
    )


def q_graph_triangles(spark, sf_dir):
    """Per-vertex triangle counts + local clustering coefficient via
    the degree-oriented wedge join (oriented out-degree bounded by
    O(sqrt m) — celebrity-vertex-safe)."""
    return triangle_counts(_copurchase_edges(spark, sf_dir))


def q_graph_summary(spark, sf_dir):
    """One-row global structure summary of the co-purchase graph:
    exact-int64 vertex/edge/wedge/triangle counts, max/mean degree,
    and transitivity (3·T/W as a 6-dp division of exact ints) — the
    "describe this graph" query; oracle aggregates the same
    triangle-enumeration SQL as graph_triangles."""
    return summarize_graph(_copurchase_edges(spark, sf_dir))


def q_graph_kcore(spark, sf_dir):
    """3-core of the co-purchase graph by synchronous peeling, capped
    at 16 rounds — above the measured peel depth of every test SF
    (4 at sf0.001, 12 at sf0.01; at sf0.1 the 3-core is empty by
    round 4), so the capped result IS the 3-core on these graphs and
    the oracle can unroll the identical 16 rounds in SQL.  Returns
    surviving nodes with their in-core degree."""
    return kcore(_copurchase_edges(spark, sf_dir), k=3, max_rounds=16)


def q_graph_ktruss(spark, sf_dir):
    """3-truss of the co-purchase graph (every surviving relation
    corroborated by a triangle closure WITHIN the surviving set) by
    synchronous edge peeling — the edge-cohesion analog of
    graph_kcore's vertex peel — capped at 8 rounds, above the
    measured peel depth of every test SF (2 at sf0.001 / 2244 edges
    survive; 2 at sf0.01 / 181 survive — k=3 keeps the result
    non-empty at the driver's gate SF where the 4-truss is empty),
    so the capped result IS the 3-truss there and the oracle unrolls
    the identical rounds in SQL.  Returns surviving canonical edges
    with their in-truss triangle support."""
    return ktruss(_copurchase_edges(spark, sf_dir), k=3, max_rounds=8)


def q_graph_communities(spark, sf_dir):
    """Synchronous label-propagation communities (4 rounds,
    smallest-label tie-break) on the co-purchase graph — the
    deterministic LPA variant, so the oracle unrolls the identical
    4 vote/adopt rounds in SQL (ROW_NUMBER ORDER BY c DESC, label)."""
    return label_propagation(_copurchase_edges(spark, sf_dir), rounds=4)


def q_graph_modularity(spark, sf_dir):
    """Newman modularity Q of the 4-round LPA partition on the
    co-purchase graph — one row (m2, e_in, dd_sum, modularity), every
    term an exact int64 aggregate and the final Q a single 6-dp float
    division of exact ints (the clustering/jaccard contract), so the
    oracle replays the LPA unroll and the closed form verbatim."""
    e = _copurchase_edges(spark, sf_dir)
    return modularity(e, label_propagation(e, rounds=4))


def q_graph_modularity_weighted(spark, sf_dir):
    """Evidence-weighted modularity: the SAME unweighted-LPA partition
    scored against co-occurrence-count edge weights (W = total
    directed weight, community strength in place of degree) — the
    weighted-Q analog of graph_pagerank_weighted; oracle = LPA unroll
    + the weighted closed form."""
    e = _copurchase_edges(spark, sf_dir, weighted=True)
    labels = label_propagation(e.select("a", "b"), rounds=4)
    return modularity(e, labels, weight="w")


def q_graph_ppr(spark, sf_dir):
    """Personalized PageRank from the deterministic seed set
    {node % 17 == 3} (same rule as graph_khop): teleport returns only
    to seeds, rank == proximity — integer-exact, oracle unrolls the
    seeded recurrence in BIGINT SQL."""
    e = _copurchase_edges(spark, sf_dir)
    # seed set {node % 17 == 3}: filter BEFORE the distinct (r6) — the
    # union-distinct over the full endpoint multiset only to keep 1/17
    # of it was pure shuffle waste; the resulting node SET is identical
    seeds = (
        e.select(F.col("a").alias("node")).filter(F.col("node") % 17 == 3)
        .union(e.select(F.col("b").alias("node")).filter(F.col("node") % 17 == 3))
        .distinct()
    )
    return personalized_pagerank(e, seeds, iterations=5)


def q_graph_sssp(spark, sf_dir):
    """Weighted shortest paths (synchronous Bellman-Ford, 6 rounds)
    from the deterministic seed set {node % 17 == 3} over the
    evidence-weighted co-purchase graph — edge cost = co-occurrence
    count, min-combined across parallel edges.  Integer-exact min-plus
    recurrence; oracle unrolls full relaxation round-for-round."""
    e = _copurchase_edges(spark, sf_dir, weighted=True)
    # seed filter before the distinct — same rationale as q_graph_ppr
    seeds = (
        e.select(F.col("a").alias("node")).filter(F.col("node") % 17 == 3)
        .union(e.select(F.col("b").alias("node")).filter(F.col("node") % 17 == 3))
        .distinct()
    )
    return sssp_weighted(e, seeds, max_rounds=6, weight="w")


def q_graph_link_prediction(spark, sf_dir):
    """Common-neighbors link prediction (KG completion): non-adjacent
    co-purchase pairs with ≥2 shared neighbors, hub centers (degree
    > 64) suppressed, scored by common count + Jaccard — the oracle
    repeats the wedge join, the anti-join against existing edges, and
    the capped-center rule in SQL."""
    return link_prediction(
        _copurchase_edges(spark, sf_dir), min_common=2, max_center_degree=64
    )


def q_graph_khop(spark, sf_dir):
    """Frontier BFS: min-hop distance (cap 3) from the deterministic
    seed set {node % 17 == 3}; oracle is a recursive CTE."""
    e = _copurchase_edges(spark, sf_dir)
    # seed filter before the distinct — same rationale as q_graph_ppr
    seeds = (
        e.select(F.col("a").alias("node")).filter(F.col("node") % 17 == 3)
        .union(e.select(F.col("b").alias("node")).filter(F.col("node") % 17 == 3))
        .distinct()
    )
    return bfs_khop(e, seeds, max_hops=3).select(
        "node", F.col("dist").cast("int").alias("dist")
    )


# shared DuckDB CTE prefix for the graph oracles (mirrors
# _copurchase_edges + _symmetrize exactly; BIGINT keys both sides)
_GRAPH_ED_SQL = """
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ed AS (
      SELECT CAST(x.l_partkey AS BIGINT) AS a, CAST(y.l_partkey AS BIGINT) AS b
      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT a AS src, b AS dst FROM ed UNION SELECT b, a FROM ed),
    v AS (SELECT DISTINCT src AS node FROM sym)
"""


def _pagerank_oracle_sql(iterations: int = 5) -> str:
    """Unrolled integer-PageRank recurrence — one contribution + rank
    CTE pair per iteration, every op in BIGINT floor division (//),
    matching operators/graph_analytics.pagerank_int exactly."""
    scale = "1000000000::BIGINT"
    parts = [
        "WITH " + _GRAPH_ED_SQL + ",",
        "nn AS (SELECT COUNT(*) AS n FROM v),",
        "od AS (SELECT src AS node, COUNT(*) AS outdeg FROM sym GROUP BY 1),",
        f"r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS rank_int FROM v),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT s.dst AS node,"
            f" SUM((85::BIGINT * r.rank_int) // (100::BIGINT * o.outdeg)) AS m"
            f" FROM sym s JOIN r{i - 1} r ON r.node = s.src"
            f" JOIN od o ON o.node = s.src GROUP BY s.dst),"
        )
        parts.append(
            f"r{i} AS (SELECT v.node,"
            f" (15::BIGINT * {scale}) // (100::BIGINT * (SELECT n FROM nn))"
            f" + COALESCE(c.m, 0::BIGINT) AS rank_int"
            f" FROM v LEFT JOIN c{i} c ON c.node = v.node),"
        )
    # trailing comma on the last CTE: close the list with a no-op
    parts.append("fin AS (SELECT 1)")
    # final cast: DuckDB promotes SUM(BIGINT) to HUGEINT, which its
    # pandas fetch renders float64 — the driver's representation hash
    # then sees 15957446.0 vs Spark's 15957446 (CORRECTNESS_r05
    # hash_match:false with bit-identical values; VERDICT r5 #1)
    parts.append(
        f"SELECT node, CAST(rank_int AS BIGINT) AS rank_int FROM r{iterations}")
    return "\n".join(parts)


def _kcore_oracle_sql(k: int = 3, rounds: int = 16) -> str:
    """Unrolled synchronous k-core peel: each round recomputes degrees
    over the surviving edge set and keeps both-endpoint-surviving
    edges — mirroring operators/graph_analytics.kcore exactly."""
    # every live{i} is referenced twice (degree CTE + edge filter), so
    # it MUST be materialized: plain CTE inlining doubles the base-scan
    # expansion per round — 2^rounds copies of the parquet scan
    parts = [
        "WITH " + _GRAPH_ED_SQL + ",",
        "live0 AS MATERIALIZED (SELECT src, dst FROM sym),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS (SELECT src AS node, COUNT(*) AS deg"
            f" FROM live{i - 1} GROUP BY 1),"
        )
        parts.append(f"kk{i} AS (SELECT node FROM d{i} WHERE deg >= {k}),")
        parts.append(
            f"live{i} AS MATERIALIZED (SELECT l.src, l.dst FROM live{i - 1} l"
            f" JOIN kk{i} a ON a.node = l.src"
            f" JOIN kk{i} b ON b.node = l.dst),"
        )
    parts.append("fin AS (SELECT 1)")
    parts.append(
        f"SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree"
        f" FROM live{rounds} GROUP BY 1"
    )
    return "\n".join(parts)


def _ktruss_oracle_sql(k: int = 4, rounds: int = 8) -> str:
    """Unrolled synchronous k-truss edge peel: each round counts every
    edge's triangle support as |N(a) ∩ N(b)| over the surviving edge
    set and keeps edges with support >= k-2; the final SELECT measures
    support on the last edge set — mirroring
    operators/graph_analytics.ktruss exactly (rounds past the fixpoint
    are no-ops on both sides, so Spark's early break and the SQL's
    fixed unroll agree).  e{i}/sy{i} are referenced multiple times per
    round, so they MUST be materialized (same 2^rounds base-scan
    argument as the kcore oracle)."""
    parts = [
        "WITH " + _GRAPH_ED_SQL + ",",
        "e0 AS MATERIALIZED (SELECT a, b FROM ed),",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"sy{i} AS MATERIALIZED (SELECT a AS s, b AS t FROM e{p}"
            f" UNION ALL SELECT b, a FROM e{p}),"
        )
        parts.append(
            f"sup{i} AS (SELECT e.a, e.b, COUNT(*) AS c"
            f" FROM e{p} e"
            f" JOIN sy{i} x ON x.s = e.a"
            f" JOIN sy{i} y ON y.s = e.b AND y.t = x.t"
            f" GROUP BY e.a, e.b),"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{p} e"
            f" LEFT JOIN sup{i} s ON s.a = e.a AND s.b = e.b"
            f" WHERE COALESCE(s.c, 0) >= {k - 2}),"
        )
    parts.append(
        f"syf AS MATERIALIZED (SELECT a AS s, b AS t FROM e{rounds}"
        f" UNION ALL SELECT b, a FROM e{rounds}),"
    )
    parts.append(
        f"supf AS (SELECT e.a, e.b, COUNT(*) AS c FROM e{rounds} e"
        f" JOIN syf x ON x.s = e.a JOIN syf y ON y.s = e.b AND y.t = x.t"
        f" GROUP BY e.a, e.b)"
    )
    parts.append(
        f"SELECT e.a, e.b, CAST(COALESCE(s.c, 0) AS BIGINT) AS support"
        f" FROM e{rounds} e LEFT JOIN supf s ON s.a = e.a AND s.b = e.b"
    )
    return "\n".join(parts)


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Unrolled synchronous label propagation: per round, count each
    node's neighbor labels and keep the (max count, min label) row via
    ROW_NUMBER — mirroring operators/graph_analytics.label_propagation
    (max_by over struct(c, -label)) exactly."""
    parts = [
        "WITH " + _GRAPH_ED_SQL + ",",
        "l0 AS (SELECT node, node AS label FROM v),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"vt{i} AS (SELECT s.src AS node, l.label, COUNT(*) AS c"
            f" FROM sym s JOIN l{i - 1} l ON l.node = s.dst"
            f" GROUP BY 1, 2),"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT node, label FROM ("
            f" SELECT node, label, ROW_NUMBER() OVER"
            f" (PARTITION BY node ORDER BY c DESC, label ASC) AS rn"
            f" FROM vt{i}) WHERE rn = 1),"
        )
    parts.append("fin AS (SELECT 1)")
    parts.append(f"SELECT node, label FROM l{rounds}")
    return "\n".join(parts)


def _modularity_oracle_sql(rounds: int = 4, weighted: bool = False) -> str:
    """LPA unroll (same as _lpa_oracle_sql) + the closed-form Newman
    modularity of the final partition: Q = (E_in·W − Σ_c S_c²)/W²
    — mirrors operators/graph_analytics.modularity exactly (int64
    aggregates, one 6-dp double division).  ``weighted`` scores the
    SAME unweighted-LPA partition against co-occurrence-count edge
    weights (W = total directed weight, S_c = community strength),
    mirroring modularity(weight='w')."""
    parts = [
        "WITH " + _GRAPH_ED_SQL + ",",
        "l0 AS (SELECT node, node AS label FROM v),",
    ]
    if weighted:
        parts.insert(1, """
    edw AS (
      SELECT CAST(x.l_partkey AS BIGINT) AS a, CAST(y.l_partkey AS BIGINT) AS b,
             COUNT(*) AS w
      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    symw AS (SELECT a AS src, b AS dst, w FROM edw
             UNION ALL SELECT b, a, w FROM edw),""")
    for i in range(1, rounds + 1):
        parts.append(
            f"vt{i} AS (SELECT s.src AS node, l.label, COUNT(*) AS c"
            f" FROM sym s JOIN l{i - 1} l ON l.node = s.dst"
            f" GROUP BY 1, 2),"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT node, label FROM ("
            f" SELECT node, label, ROW_NUMBER() OVER"
            f" (PARTITION BY node ORDER BY c DESC, label ASC) AS rn"
            f" FROM vt{i}) WHERE rn = 1),"
        )
    esrc = "symw" if weighted else "sym"
    wexpr = "s.w" if weighted else "1"
    wsum = "SUM(w)" if weighted else "COUNT(*)"
    parts.append(f"mm AS (SELECT {wsum} AS m2 FROM {esrc}),")
    parts.append(
        f"ei AS (SELECT SUM(CASE WHEN x.label = y.label THEN {wexpr}"
        f" ELSE 0 END) AS e_in FROM {esrc} s"
        f" JOIN l{rounds} x ON x.node = s.src"
        f" JOIN l{rounds} y ON y.node = s.dst),"
    )
    parts.append(
        f"dg AS (SELECT src AS node, {wsum} AS d FROM {esrc} GROUP BY 1),")
    parts.append(
        f"dc AS (SELECT l.label, SUM(dg.d) AS dcv FROM dg"
        f" JOIN l{rounds} l ON l.node = dg.node GROUP BY 1),"
    )
    parts.append("dd AS (SELECT SUM(dcv * dcv) AS dd_sum FROM dc)")
    parts.append(
        "SELECT CAST(mm.m2 AS BIGINT) AS m2,"
        " CAST(ei.e_in AS BIGINT) AS e_in,"
        " CAST(dd.dd_sum AS BIGINT) AS dd_sum,"
        " ROUND(CAST(ei.e_in * mm.m2 - dd.dd_sum AS DOUBLE)"
        " / (CAST(mm.m2 AS DOUBLE) * CAST(mm.m2 AS DOUBLE)), 6)"
        " AS modularity"
        " FROM mm, ei, dd"
    )
    return "\n".join(parts)


def _ppr_oracle_sql(iterations: int = 5) -> str:
    """Unrolled seeded-PageRank recurrence (teleport to seeds only,
    BIGINT floor division) — mirrors
    operators/graph_analytics.personalized_pagerank exactly."""
    scale = "1000000000::BIGINT"
    parts = [
        "WITH " + _GRAPH_ED_SQL + ",",
        "seeds AS (SELECT node FROM v WHERE node % 17 = 3),",
        "ss AS (SELECT COUNT(*) AS s FROM seeds),",
        "od AS (SELECT src AS node, COUNT(*) AS outdeg FROM sym GROUP BY 1),",
        f"r0 AS (SELECT v.node, CASE WHEN sd.node IS NOT NULL"
        f" THEN {scale} // (SELECT s FROM ss) ELSE 0::BIGINT END AS rank_int"
        f" FROM v LEFT JOIN seeds sd ON sd.node = v.node),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT s.dst AS node,"
            f" SUM((85::BIGINT * r.rank_int) // (100::BIGINT * o.outdeg)) AS m"
            f" FROM sym s JOIN r{i - 1} r ON r.node = s.src AND r.rank_int > 0"
            f" JOIN od o ON o.node = s.src GROUP BY s.dst),"
        )
        parts.append(
            f"r{i} AS (SELECT v.node,"
            f" CASE WHEN sd.node IS NOT NULL THEN"
            f" (15::BIGINT * {scale}) // (100::BIGINT * (SELECT s FROM ss))"
            f" ELSE 0::BIGINT END"
            f" + COALESCE(c.m, 0::BIGINT) AS rank_int"
            f" FROM v LEFT JOIN seeds sd ON sd.node = v.node"
            f" LEFT JOIN c{i} c ON c.node = v.node),"
        )
    parts.append("fin AS (SELECT 1)")
    # same HUGEINT→float64 cast as _pagerank_oracle_sql (VERDICT r5 #1:
    # this oracle carries the identical latent promotion)
    parts.append(
        f"SELECT node, CAST(rank_int AS BIGINT) AS rank_int FROM r{iterations}")
    return "\n".join(parts)


_LINKPRED_ORACLE_SQL = (
    "WITH " + _GRAPH_ED_SQL + """,
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
    ctr AS (SELECT node FROM deg WHERE deg <= 64),
    nb AS (SELECT s.src AS c, s.dst AS n, d.deg AS cdeg
           FROM sym s JOIN ctr ON ctr.node = s.src
                      JOIN deg d ON d.node = s.src),
    cn AS (
      SELECT l.n AS a, r.n AS b, COUNT(*) AS common,
             SUM(1000000000::BIGINT // l.cdeg) AS ra_int
      FROM nb l JOIN nb r ON l.c = r.c AND l.n < r.n
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    miss AS (
      SELECT cn.a, cn.b, cn.common, cn.ra_int
      FROM cn LEFT JOIN ed ON ed.a = cn.a AND ed.b = cn.b
      WHERE ed.a IS NULL
    )
    SELECT m.a, m.b, CAST(m.common AS BIGINT) AS common,
           ROUND(m.common / (da.deg + db.deg - m.common), 6) AS jaccard,
           CAST(m.ra_int AS BIGINT) AS ra_int
    FROM miss m
    JOIN deg da ON da.node = m.a
    JOIN deg db ON db.node = m.b
""")


def _pagerank_weighted_oracle_sql(iterations: int = 5) -> str:
    """Weighted unrolled recurrence: the ed CTE's co-occurrence count
    becomes the edge weight (clamped at 10^8 like
    graph_analytics.WEIGHT_CAP), W_out replaces outdeg, and each
    contribution is (85·rank·w) // (100·W_out) — all BIGINT."""
    scale = "1000000000::BIGINT"
    parts = [
        """WITH
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edw AS (
      SELECT CAST(x.l_partkey AS BIGINT) AS a, CAST(y.l_partkey AS BIGINT) AS b,
             LEAST(COUNT(*), 100000000)::BIGINT AS w
      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT a AS src, b AS dst, w FROM edw
            UNION ALL SELECT b, a, w FROM edw),
    v AS (SELECT DISTINCT src AS node FROM sym),""",
        "nn AS (SELECT COUNT(*) AS n FROM v),",
        "od AS (SELECT src AS node, SUM(w) AS outdeg FROM sym GROUP BY 1),",
        f"r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS rank_int FROM v),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT s.dst AS node,"
            f" SUM((85::BIGINT * r.rank_int * s.w)"
            f" // (100::BIGINT * o.outdeg)) AS m"
            f" FROM sym s JOIN r{i - 1} r ON r.node = s.src"
            f" JOIN od o ON o.node = s.src GROUP BY s.dst),"
        )
        parts.append(
            f"r{i} AS (SELECT v.node,"
            f" (15::BIGINT * {scale}) // (100::BIGINT * (SELECT n FROM nn))"
            f" + COALESCE(c.m, 0::BIGINT) AS rank_int"
            f" FROM v LEFT JOIN c{i} c ON c.node = v.node),"
        )
    parts.append("fin AS (SELECT 1)")
    # same HUGEINT→float64 cast as _pagerank_oracle_sql (VERDICT r5 #1)
    parts.append(
        f"SELECT node, CAST(rank_int AS BIGINT) AS rank_int FROM r{iterations}")
    return "\n".join(parts)


def _sssp_oracle_sql(rounds: int = 6) -> str:
    """Unrolled Bellman-Ford full relaxation over the weighted
    co-purchase graph — mirrors operators/graph_analytics.sssp_weighted
    (frontier relaxation computes the identical round-i invariant:
    cheapest ≤ i-edge path from the seed set).  Each d{i} is
    referenced twice (next round's relax + its own union), so it is
    MATERIALIZED like the kcore peel."""
    parts = [
        """WITH
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edw AS (
      SELECT CAST(x.l_partkey AS BIGINT) AS a, CAST(y.l_partkey AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    symw AS (SELECT src, dst, MIN(w) AS w FROM (
        SELECT a AS src, b AS dst, w FROM edw
        UNION ALL SELECT b, a, w FROM edw) GROUP BY 1, 2),
    v AS (SELECT DISTINCT src AS node FROM symw),""",
        "d0 AS MATERIALIZED (SELECT node, 0::BIGINT AS dist"
        " FROM v WHERE node % 17 = 3),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"c{i} AS (SELECT s.dst AS node, MIN(d.dist + s.w) AS nd"
            f" FROM symw s JOIN d{i - 1} d ON d.node = s.src GROUP BY 1),"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM ("
            f" SELECT node, dist FROM d{i - 1}"
            f" UNION ALL SELECT node, nd FROM c{i}) GROUP BY 1),"
        )
    parts.append("fin AS (SELECT 1)")
    parts.append(f"SELECT node, dist FROM d{rounds}")
    return "\n".join(parts)


_RAW_FIXTURE = "/tmp/kg_raw_fixture_v1"


def _ensure_raw_fixture() -> str:
    """Deterministic raw-document directory shared by the Spark query
    and the DuckDB oracle (content is a pure function of the index, so
    both engines see identical bytes at every SF)."""
    import pathlib

    d = pathlib.Path(_RAW_FIXTURE)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(24):
        p = d / f"doc_{i:03d}.txt"
        body = f"raw document {i}\n" + ("lorem ipsum " * (i + 1)).strip()
        if not p.exists() or p.read_text(encoding="utf-8") != body:
            p.write_text(body, encoding="utf-8")
    binp = d / "ignore.bin"  # must be excluded by the glob pushdown
    if not binp.exists():
        binp.write_bytes(b"\x00\x01")
    return str(d)


_ARD_FIXTURE = "/tmp/kg_ard_fixture_v1"


def _ensure_ard_fixture() -> str:
    """Deterministic ARD JSONL corpus (the reference's D2 article
    shape, arxiv.jsonl.example.json) shared by the Spark reader and
    the DuckDB oracle — includes a gzip member, a null-abstract
    article, an url-less article (conv id falls back to title), and a
    whitespace-only article (must read as NO text)."""
    import gzip
    import json
    import pathlib

    d = pathlib.Path(_ARD_FIXTURE)
    d.mkdir(parents=True, exist_ok=True)

    def rows(lo, hi):
        out = []
        for i in range(lo, hi):
            out.append({
                "title": f"ARD article {i}",
                "authors": [f"Author {j}" for j in range(i % 3)] or None,
                "date_published": f"2024-0{i % 9 + 1}-01T00:00:00Z",
                "text": f"body text {i} " * (i % 4 + 1),
                "abstract": None if i % 5 == 0 else f"abstract {i}",
                "url": None if i % 7 == 3 else f"https://ard.example/{i}",
            })
        return out

    plain = d / "part0.jsonl"
    body = "\n".join(json.dumps(r) for r in rows(0, 12)) + "\n" + \
        json.dumps({"title": " \t ", "authors": [], "date_published": None,
                    "text": "  ", "abstract": "\n", "url": "https://ard.example/blank"}) + "\n"
    if not plain.exists() or plain.read_text() != body:
        plain.write_text(body)
    gz = d / "part1.jsonl.gz"
    gz_body = "\n".join(json.dumps(r) for r in rows(12, 20)) + "\n"
    want = gzip.compress(gz_body.encode(), mtime=0)
    if not gz.exists() or gz.read_bytes() != want:
        gz.write_bytes(want)
    return str(d)


def q_s6_ard_docs(spark, sf_dir):
    """S6 ARD corpus source (sources/ard.py): JSONL/gzip articles →
    the document abstraction — doc id = url (falling back to title),
    doc_text = title+abstract+text with the whitespace-only-is-null
    rule, authors joined as provenance. Oracle: DuckDB read_json over
    the same files with the identical expressions."""
    from aisafetyintervention_literatureextraction_spark.sources.ard import (
        ard_as_documents,
        read_ard,
    )

    d = _ensure_ard_fixture()
    docs = ard_as_documents(read_ard(spark, d))
    return docs.select(
        "conv_id",
        "doc_text",
        F.length("doc_text").cast("int").alias("n_chars"),
        "title",
        "author",
    )


_PDF_FIXTURE = "/tmp/kg_pdf_fixture_v1"


def q_s1_pdf_docs(spark, sf_dir):
    """S1 PDF half (operators/pdf.py): the reference's actual input
    format (extract.py:65 ``glob("*.pdf")``) — binaryFile scan of a
    PDF directory, stdlib xref/ObjStm walk + FlateDecode + Tj/TJ text
    assembly via Arrow-batched mapInPandas. Oracle: DuckDB read_blob
    over the writer's pre-extracted sidecar text (the PDF reader must
    reconstruct the source text byte-for-byte to hash-match)."""
    from aisafetyintervention_literatureextraction_spark.operators.pdf import (
        decode_pdf_text,
    )
    from aisafetyintervention_literatureextraction_spark.pdfgen import (
        ensure_pdf_fixture,
    )

    d = ensure_pdf_fixture(_PDF_FIXTURE)
    docs = decode_pdf_text(read_raw_files(spark, d, glob="*.pdf"))
    return docs.select(
        F.col("conv_id").alias("doc_id"),
        "doc_text",
        F.length("doc_text").cast("int").alias("n_chars"),
        # /Info provenance — the oracle reconstructs the writer's
        # deterministic Title/Author from the filename stem, so a
        # parser that drops or mis-decodes the trailer /Info dict
        # hash-mismatches
        "title",
        "author",
    )


def q_s1_pdf_images(spark, sf_dir):
    """Embedded PDF images → multimodal columns (operators/pdf.py
    extract_pdf_images): Image XObjects come out of the same binaryFile
    scan as typed metadata + bytes — /DCTDecode passes through as JFIF,
    everything else defilters to raw samples; encrypted docs (doc 2 is
    RC4 + DCTDecode) must decrypt the image stream too.  Oracle: DuckDB
    read_blob over the writer's expected_images sidecars, with every
    metadata column re-derived in SQL from the deterministic
    ``pdfgen.doc_image`` index formulas; bytes graded as md5(hex)."""
    from aisafetyintervention_literatureextraction_spark.operators.pdf import (
        extract_pdf_images,
    )
    from aisafetyintervention_literatureextraction_spark.pdfgen import (
        ensure_pdf_fixture,
    )

    d = ensure_pdf_fixture(_PDF_FIXTURE)
    ims = extract_pdf_images(read_raw_files(spark, d, glob="*.pdf"))
    return ims.select(
        F.col("conv_id").alias("doc_id"),
        "page_idx",
        "name",
        "width",
        "height",
        "bits",
        "color_space",
        "fmt",
        F.md5(F.hex("content")).alias("content_md5"),
        F.length("content").cast("int").alias("n_bytes"),
    )


def q_s1_raw_files(spark, sf_dir):
    """S1 raw-file half (sources/raw_files.py): binaryFile directory
    scan with glob pushdown and stem ids (C2) — the reference's PDF-dir
    input shape (reference extract.py:62-79). Oracle: DuckDB read_blob
    over the same fixture dir."""
    d = _ensure_raw_fixture()
    f = read_raw_files(spark, d, glob="*.txt")
    return f.select(
        "doc_id",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        F.substring(F.decode("content", "UTF-8"), 1, 20).alias("head"),
    )


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events → reassembled
    conversation documents → mention co-occurrence triples."""
    return q_kg_pipeline_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "w3_reassembly": q_w3_reassembly,
        "f1_resume_antijoin": q_f1_resume_antijoin,
        "f2_head_limit": q_f2_head_limit,
        "f9_validation_quarantine": q_f9_validation_quarantine,
        "a2_dedup_lww": q_a2_dedup_lww,
        "a3_group_evidence": q_a3_group_evidence,
        "a6_node_text": q_a6_node_text,
        "c9_snake_case": q_c9_snake_case,
        "u1_union_distinct": q_u1_union_distinct,
        "o2_global_topk": q_o2_global_topk,
        "w4_topk_per_group": q_w4_topk_per_group,
        "j2_multi_join_agg": q_j2_multi_join_agg,
        "j3_rewire_coalesce": q_j3_rewire_coalesce,
        "g4_isolated_nodes": q_g4_isolated_nodes,
        "g5_connected_components": q_g5_connected_components,
        "tpch_q1": q_tpch_q1,
        "dedup_exact": q_dedup_exact,
        "dedup_token_jaccard": q_dedup_token_jaccard,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "sim_cosine_topk": q_sim_cosine_topk,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "sessionize": q_sessionize,
        "approx_aggs": q_approx_aggs,
        "asof_join": q_asof_join,
        "pivot_event_types": q_pivot_event_types,
        "rollup_revenue": q_rollup_revenue,
        "kg_mentions": q_kg_mentions,
        "kg_cooccurrence": q_kg_cooccurrence,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "sim_lsh_topk": q_sim_lsh_topk,
        "sim_ivf_topk": q_sim_ivf_topk,
        "text_winnow_fingerprint": q_text_winnow_fingerprint,
        "dedup_winnow": q_dedup_winnow,
        "kg_pipeline_triples": q_kg_pipeline_triples,
        "kg_mention_spans": q_kg_mention_spans,
        "kg_node_provenance": q_kg_node_provenance,
        "s1_raw_files": q_s1_raw_files,
        "s6_ard_docs": q_s6_ard_docs,
        "s1_pdf_docs": q_s1_pdf_docs,
        "s1_pdf_images": q_s1_pdf_images,
        "graph_pagerank": q_graph_pagerank,
        "graph_pagerank_weighted": q_graph_pagerank_weighted,
        "graph_triangles": q_graph_triangles,
        "graph_khop": q_graph_khop,
        "graph_kcore": q_graph_kcore,
        "graph_ktruss": q_graph_ktruss,
        "graph_summary": q_graph_summary,
        "graph_modularity": q_graph_modularity,
        "graph_modularity_weighted": q_graph_modularity_weighted,
        "graph_communities": q_graph_communities,
        "graph_link_prediction": q_graph_link_prediction,
        "graph_ppr": q_graph_ppr,
        "graph_sssp": q_graph_sssp,
    }


def oracle_sql() -> dict[str, str]:
    tok_split = f"list_filter(string_split_regex(lower({{col}}), '{TOK_RE}'), x -> length(x) > 0)"
    toks_text = tok_split.format(col="text")
    return {
        "w3_reassembly": f"""
            SELECT CAST(user_id AS VARCHAR) AS conv_id,
                   CAST(COUNT(*) AS INTEGER) AS n_turns,
                   STRING_AGG(event_type, chr(10) ORDER BY ts, event_id) AS doc_text
            FROM events GROUP BY user_id
        """,
        "f1_resume_antijoin": """
            SELECT o_orderkey FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
        """,
        "f2_head_limit": """
            SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 10
        """,
        "f9_validation_quarantine": """
            SELECT violation, COUNT(*) AS n_bad FROM (
              SELECT 'quantity_range' AS violation FROM lineitem
                WHERE l_quantity NOT BETWEEN 1 AND 50
              UNION ALL
              SELECT 'discount_range' FROM lineitem
                WHERE l_discount NOT BETWEEN 0.0 AND 0.1
              UNION ALL
              SELECT 'flag_domain' FROM lineitem
                WHERE l_returnflag NOT IN ('A','N','R')
            ) GROUP BY violation
        """,
        "a2_dedup_lww": """
            SELECT user_id, last_type, last_value, n_events FROM (
              SELECT user_id, event_type AS last_type, value AS last_value,
                     COUNT(*) OVER (PARTITION BY user_id) AS n_events,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "a3_group_evidence": """
            SELECT user_id, event_type, COUNT(*) AS n,
                   MIN(ts) AS ts_min, MAX(ts) AS ts_max,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY user_id, event_type
        """,
        "a6_node_text": """
            SELECT c_custkey,
                   'name=' || c_name
                   || '; aliases=' || c_name
                   || '; type=' || c_mktsegment
                   || '; description=bal ' || CAST(CAST(TRUNC(c_acctbal) AS INTEGER) AS VARCHAR)
                   AS text
            FROM customer
        """,
        "c9_snake_case": """
            SELECT p_partkey,
                   regexp_replace(
                     regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '_', 'g'),
                     '^_+|_+$', '', 'g') AS norm_name
            FROM part
        """,
        "u1_union_distinct": """
            SELECT event_type FROM events WHERE value > 50
            UNION
            SELECT event_type FROM events WHERE user_id < 10
        """,
        "o2_global_topk": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
            FROM lineitem
            ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 30
        """,
        "w4_topk_per_group": """
            SELECT o_orderpriority, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice
            FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rank
              FROM orders)
            WHERE rank <= 3
        """,
        "j2_multi_join_agg": """
            SELECT r_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name
        """,
        "j3_rewire_coalesce": """
            SELECT s_suppkey,
                   CAST(COALESCE(n.n_regionkey + 100, s.s_nationkey) AS INTEGER)
                     AS effective_key
            FROM supplier s
            LEFT JOIN nation n
              ON n.n_nationkey = s.s_nationkey AND n.n_nationkey < 12
        """,
        "g4_isolated_nodes": """
            SELECT c_mktsegment, COUNT(*) AS n_isolated
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment
        """,
        "g5_connected_components": """
            SELECT vec_id AS node_id,
                   MIN(vec_id) OVER (PARTITION BY label) AS component_id
            FROM embeddings
            UNION ALL
            SELECT CAST(label AS BIGINT) + 1000000 AS node_id,
                   MIN(vec_id) AS component_id
            FROM embeddings GROUP BY label
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
            FROM documents GROUP BY text HAVING COUNT(*) > 1
        """,
        "dedup_token_jaccard": f"""
            WITH f AS (
              SELECT doc_id, list_distinct({toks_text}) AS toks
              FROM documents WHERE doc_id < 120)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   ROUND(
                     CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS DOUBLE)
                     / GREATEST(len(list_distinct(list_concat(a.toks, b.toks))), 1),
                     6) AS jaccard
            FROM f a JOIN f b ON a.doc_id < b.doc_id
            WHERE ROUND(
                     CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS DOUBLE)
                     / GREATEST(len(list_distinct(list_concat(a.toks, b.toks))), 1),
                     6) >= 0.8
        """,
        "dedup_embedding_cosine": """
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.45
        """,
        "sim_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 4),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(q.qv, e.embedding), 3) AS sim3
              FROM q CROSS JOIN embeddings e),
            ranked AS (
              SELECT query_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY sim3 DESC, vec_id) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id
            FROM ranked WHERE rank <= 5
        """,
        "text_token_stats": f"""
            SELECT doc_id,
                   CAST(len({toks_text}) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct({toks_text})) AS INTEGER) AS n_distinct,
                   ROUND(CAST(list_sum(list_transform({toks_text}, x -> length(x))) AS DOUBLE)
                         / GREATEST(len({toks_text}), 1), 4) AS mean_tok_len
            FROM documents
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CAST(length(text) AS INTEGER) AS n_chars,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> length(x) > 0)) AS INTEGER) AS n_tokens,
                   ROUND(CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
                         / GREATEST(length(text), 1), 6) AS punct_ratio,
                   ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                         / GREATEST(length(text), 1), 6) AS digit_ratio,
                   ROUND(CAST(len(list_distinct({toks_text})) AS DOUBLE)
                         / GREATEST(len({toks_text}), 1), 6) AS distinct_ratio
            FROM documents
        """,
        "text_lang_id": f"""
            WITH h AS (
              SELECT doc_id,
                len(list_filter({toks_text}, x -> x IN ('der','die','das','und','ist','nicht','mit','ein'))) AS h_de,
                len(list_filter({toks_text}, x -> x IN ('the','and','of','to','is','in','that','for'))) AS h_en,
                len(list_filter({toks_text}, x -> x IN ('el','la','los','que','es','una','para','con'))) AS h_es,
                len(list_filter({toks_text}, x -> x IN ('le','la','les','et','est','une','dans','pour'))) AS h_fr
              FROM documents)
            SELECT doc_id,
              CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                   WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
                   WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
                   WHEN h_en >= h_de THEN 'en'
                   ELSE 'de' END AS lang_pred
            FROM h
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id,
                     SUM(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS session_id
              FROM g),
            per AS (
              SELECT user_id, session_id, COUNT(*) AS n
              FROM s GROUP BY user_id, session_id)
            SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_len
            FROM per GROUP BY user_id
        """,
        "approx_aggs": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_orderkey) AS n_orders,
                   ROUND(MEDIAN(l_quantity), 2) AS median_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "asof_join": """
            SELECT o.o_orderkey,
                   e.event_id AS last_event_id,
                   e.event_type AS last_event_type
            FROM (SELECT o_orderkey, o_custkey % 50 AS uid, o_orderdate
                  FROM orders) o
            LEFT JOIN LATERAL (
              SELECT event_id, event_type
              FROM events ev
              WHERE ev.user_id % 50 = o.uid AND ev.ts <= o.o_orderdate
              ORDER BY ev.ts DESC, ev.event_id DESC LIMIT 1
            ) e ON TRUE
        """,
        "pivot_event_types": """
            SELECT user_id,
                   COUNT(*) FILTER (WHERE event_type = 'click') AS click,
                   COUNT(*) FILTER (WHERE event_type = 'view') AS "view",
                   COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                   COUNT(*) FILTER (WHERE event_type = 'error') AS "error"
            FROM events GROUP BY user_id
        """,
        "rollup_revenue": """
            SELECT COALESCE(r_name, 'ALL') AS r_name,
                   COALESCE(n_name, 'ALL') AS n_name,
                   COUNT(*) AS n_custs,
                   ROUND(SUM(c_acctbal), 2) AS total_bal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "kg_mentions": f"""
            SELECT doc_id,
                   unnest(list_distinct(list_filter({toks_text},
                          x -> x IN ({_VOCAB_SQL})))) AS mention
            FROM documents
        """,
        "kg_cooccurrence": f"""
            WITH m AS (
              SELECT doc_id,
                     unnest(list_distinct(list_filter({toks_text},
                            x -> x IN ({_VOCAB_SQL})))) AS mention
              FROM documents)
            SELECT a.mention AS subj, b.mention AS obj, COUNT(*) AS n_docs
            FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.mention < b.mention
            GROUP BY a.mention, b.mention
        """,
        # LSH-blocked dedup: oracle computes the identical exact predicate
        # over ALL pairs (blocking recall is complete on this data; the
        # measured margin is jaccard >= 0.93 for true pairs, <= 0.70 else)
        "dedup_minhash_lsh": f"""
            WITH f AS (SELECT doc_id, {_shingle_sql(5)} AS sh FROM documents)
            SELECT a_id, b_id, ROUND(j, 6) AS jaccard FROM (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                     / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS j
              FROM f a JOIN f b ON a.doc_id < b.doc_id)
            WHERE j >= 0.8
        """,
        "dedup_simhash": f"""
            WITH f AS (SELECT doc_id, {_shingle_sql(4)} AS sh FROM documents)
            SELECT a_id, b_id, ROUND(j, 6) AS jaccard FROM (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                     / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS j
              FROM f a JOIN f b ON a.doc_id < b.doc_id)
            WHERE j >= 0.9
        """,
        "sim_lsh_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 4),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(q.qv, e.embedding), 3) AS sim3
              FROM q CROSS JOIN embeddings e),
            ranked AS (
              SELECT query_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY sim3 DESC, vec_id) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id
            FROM ranked WHERE rank <= 5
        """,
        "dedup_winnow": """
            WITH d AS (SELECT doc_id, lower(coalesce(text, '')) AS t
                       FROM documents),
            h AS (
              SELECT doc_id,
                     list_transform(generate_series(1, len(t) - 8 + 1),
                       i -> CAST(list_sum(list_transform(generate_series(0, 7),
                              j -> ascii(substr(t, i + j, 1))
                                   * CAST(pow(31, 7 - j) AS BIGINT))) AS BIGINT)) AS hs
              FROM d WHERE len(t) >= 8),
            wn AS (
              SELECT doc_id,
                     CASE WHEN len(hs) - 4 + 1 >= 1 THEN
                       list_transform(generate_series(1, len(hs) - 4 + 1),
                         i -> list_min(hs[i : i + 3]))
                     ELSE [list_min(hs)] END AS wm
              FROM h),
            f AS (SELECT doc_id, unnest(list_distinct(wm)) AS fp FROM wn),
            small AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 64),
            fs AS (SELECT f.* FROM f JOIN small USING (fp))
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   COUNT(*) AS n_shared
            FROM fs a JOIN fs b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING COUNT(*) >= 20
        """,
        "text_winnow_fingerprint": """
            WITH d AS (SELECT doc_id, lower(coalesce(text, '')) AS t
                       FROM documents),
            h AS (
              SELECT doc_id,
                     CASE WHEN len(t) - 8 + 1 >= 1 THEN
                       list_transform(generate_series(1, len(t) - 8 + 1),
                         i -> CAST(list_sum(list_transform(generate_series(0, 7),
                                j -> ascii(substr(t, i + j, 1))
                                     * CAST(pow(31, 7 - j) AS BIGINT))) AS BIGINT))
                     ELSE CAST([] AS BIGINT[]) END AS hs
              FROM d),
            wn AS (
              SELECT doc_id,
                     CASE WHEN len(hs) - 4 + 1 >= 1 THEN
                       list_transform(generate_series(1, len(hs) - 4 + 1),
                         i -> list_min(hs[i : i + 3]))
                     WHEN len(hs) >= 1 THEN [list_min(hs)]
                     ELSE CAST([] AS BIGINT[]) END AS wm
              FROM h),
            f AS (SELECT doc_id, list_sort(list_distinct(wm)) AS fps FROM wn)
            SELECT doc_id,
                   CAST(len(fps) AS INTEGER) AS n_fp,
                   fps[1] AS fp_min,
                   fps[-1] AS fp_max
            FROM f
        """,
        "sim_ivf_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 4),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(q.qv, e.embedding), 3) AS sim3
              FROM q CROSS JOIN embeddings e),
            ranked AS (
              SELECT query_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY sim3 DESC, vec_id) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id
            FROM ranked WHERE rank <= 5
        """,
        "kg_pipeline_triples": f"""
            WITH docs AS (
              SELECT user_id,
                     STRING_AGG(event_type, chr(10) ORDER BY ts, event_id) AS doc_text
              FROM events GROUP BY user_id),
            m AS (
              SELECT user_id,
                     unnest(list_distinct({tok_split.format(col="doc_text")})) AS mention
              FROM docs)
            SELECT a.mention AS subj, b.mention AS obj, COUNT(*) AS n_convs
            FROM m a JOIN m b ON a.user_id = b.user_id AND a.mention < b.mention
            GROUP BY a.mention, b.mention
        """,
        "kg_mention_spans": r"""
            WITH marked AS (
              SELECT doc_id,
                     regexp_replace(lower(text),
                       '\b(spark|table|query|join|window|stream)\b',
                       '[\1]', 'g') AS t
              FROM documents),
            parts AS (SELECT doc_id, string_split(t, '[') AS ps FROM marked),
            exploded AS (
              SELECT doc_id, i, ps[i] AS p
              FROM parts, UNNEST(generate_series(1, len(ps))) AS u(i)),
            offs AS (
              SELECT doc_id, i, p,
                     CAST(COALESCE(SUM(length(p)) OVER (
                            PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          + (i - 1) AS INTEGER) AS off
              FROM exploded)
            SELECT doc_id,
                   substr(p, 1, strpos(p, ']') - 1) AS mention,
                   off AS span_start,
                   CAST(off + strpos(p, ']') - 1 AS INTEGER) AS span_end
            FROM offs WHERE i > 1 AND strpos(p, ']') > 0
        """,
        "kg_node_provenance": f"""
            WITH m AS (
              SELECT DISTINCT unnest({toks_text}) AS mention,
                     source, doc_id
              FROM documents)
            SELECT mention,
                   array_to_string(
                     list_slice(list_sort(list(DISTINCT source)), 1, 20),
                     '|') AS source_titles,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM m
            WHERE mention IN ('spark','table','query','join','window','stream')
            GROUP BY mention
        """,
        "s6_ard_docs": f"""
            WITH raw AS (
              SELECT * FROM read_json(
                '{_ARD_FIXTURE}/part*',
                format='newline_delimited',
                columns={{title: 'VARCHAR', authors: 'VARCHAR[]',
                          date_published: 'VARCHAR', text: 'VARCHAR',
                          abstract: 'VARCHAR', url: 'VARCHAR'}})
            ), joined AS (
              SELECT CASE WHEN regexp_replace(
                       COALESCE(url, title, ''), '\\s', '', 'g') <> ''
                     THEN COALESCE(url, title) END AS conv_id,
                     concat_ws(chr(10), COALESCE(title, ''),
                               COALESCE(abstract, ''),
                               COALESCE(text, '')) AS j,
                     title,
                     CASE WHEN regexp_replace(
                            COALESCE(array_to_string(authors, ', '), ''),
                            '\\s', '', 'g') <> ''
                          THEN array_to_string(authors, ', ')
                     END AS author
              FROM raw)
            SELECT conv_id,
                   CASE WHEN regexp_replace(j, '\\s', '', 'g') <> ''
                        THEN j END AS doc_text,
                   CAST(CASE WHEN regexp_replace(j, '\\s', '', 'g') <> ''
                        THEN length(j) END AS INTEGER) AS n_chars,
                   title, author
            FROM joined
        """,
        "s1_raw_files": f"""
            SELECT parse_filename(filename, true) AS doc_id,
                   CAST(octet_length(content) AS INTEGER) AS n_bytes,
                   substr(decode(content), 1, 20) AS head
            FROM read_blob('{_RAW_FIXTURE}/*.txt')
        """,
        "s1_pdf_docs": f"""
            SELECT parse_filename(filename, true) AS doc_id,
                   decode(content) AS doc_text,
                   CAST(length(decode(content)) AS INTEGER) AS n_chars,
                   'Paper ' || i || ': safety interventions' AS title,
                   'Author ' || (i % 5) || ' (lab''' || i || ')' AS author
            FROM (
              SELECT *, CAST(substring(parse_filename(filename, true), 5)
                             AS INTEGER) AS i
              FROM read_blob('{_PDF_FIXTURE}/expected/*.txt')
            )
        """,
        # every metadata column is the same pure function of the doc
        # index that pdfgen.doc_image computes; the bytes themselves are
        # the expected_images sidecars (md5-of-hex because DuckDB's md5
        # only takes VARCHAR; hex() is uppercase in both engines)
        "s1_pdf_images": f"""
            SELECT substring(stem, 1, 7) AS doc_id,
                   CAST(0 AS INTEGER) AS page_idx,
                   'Im0' AS name,
                   CAST(8 + (i % 5) * 4 AS INTEGER) AS width,
                   CAST(6 + (i % 3) * 4 AS INTEGER) AS height,
                   CAST(8 AS INTEGER) AS bits,
                   CASE WHEN i % 4 <> 2 AND i % 3 = 0 THEN 'DeviceGray'
                        ELSE 'DeviceRGB' END AS color_space,
                   CASE WHEN i % 4 = 2 THEN 'jpeg' ELSE 'raw' END AS fmt,
                   md5(hex(content)) AS content_md5,
                   CAST(octet_length(content) AS INTEGER) AS n_bytes
            FROM (
              SELECT parse_filename(filename, true) AS stem,
                     CAST(substring(parse_filename(filename, true), 5, 3)
                          AS INTEGER) AS i,
                     content
              FROM read_blob('{_PDF_FIXTURE}/expected_images/*.bin')
            )
        """,
        # integer-exact PageRank: the oracle unrolls the identical
        # scaled-int64 recurrence, one CTE pair per iteration
        "graph_pagerank": _pagerank_oracle_sql(5),
        "graph_pagerank_weighted": _pagerank_weighted_oracle_sql(5),
        "graph_kcore": _kcore_oracle_sql(3, 16),
        "graph_ktruss": _ktruss_oracle_sql(3, 8),
        "graph_modularity": _modularity_oracle_sql(4),
        "graph_modularity_weighted": _modularity_oracle_sql(4, weighted=True),
        "graph_communities": _lpa_oracle_sql(4),
        "graph_link_prediction": _LINKPRED_ORACLE_SQL,
        "graph_ppr": _ppr_oracle_sql(5),
        "graph_sssp": _sssp_oracle_sql(6),
        "graph_triangles": f"""
            WITH {_GRAPH_ED_SQL},
            deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY 1),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM ed e1
              JOIN ed e2 ON e2.a = e1.b
              JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            pn AS (
              SELECT node, COUNT(*) AS triangles FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
              ) GROUP BY node
            )
            SELECT d.node, d.degree,
                   COALESCE(p.triangles, 0::BIGINT) AS triangles,
                   CASE WHEN d.degree < 2 THEN 0.0
                        ELSE ROUND(2.0 * COALESCE(p.triangles, 0)
                                   / (d.degree * (d.degree - 1)), 6)
                   END AS clustering
            FROM deg d LEFT JOIN pn p ON p.node = d.node
        """,
        "graph_summary": f"""
            WITH {_GRAPH_ED_SQL},
            deg AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY 1),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM ed e1
              JOIN ed e2 ON e2.a = e1.b
              JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            pn AS (
              SELECT node, COUNT(*) AS triangles FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
              ) GROUP BY node
            ),
            pernode AS (
              SELECT d.node, d.degree,
                     COALESCE(p.triangles, 0::BIGINT) AS tri
              FROM deg d LEFT JOIN pn p ON p.node = d.node
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
                   CAST(SUM(degree) // 2 AS BIGINT) AS m_edges,
                   CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS wedges,
                   CAST(SUM(tri) // 3 AS BIGINT) AS n_triangles,
                   CAST(MAX(degree) AS BIGINT) AS max_degree,
                   ROUND(CAST(SUM(degree) AS DOUBLE) / COUNT(*), 6)
                     AS avg_degree,
                   CASE WHEN SUM(degree * (degree - 1) // 2) = 0 THEN 0.0
                        ELSE ROUND(CAST(SUM(tri) AS DOUBLE)
                                   / SUM(degree * (degree - 1) // 2), 6)
                   END AS transitivity
            FROM pernode
        """,
        "graph_khop": f"""
            WITH RECURSIVE {_GRAPH_ED_SQL},
            seeds AS (SELECT node FROM v WHERE node % 17 = 3),
            walk(node, dist) AS (
              SELECT node, 0 FROM seeds
              UNION
              SELECT s.dst, w.dist + 1
              FROM walk w JOIN sym s ON s.src = w.node
              WHERE w.dist < 3
            )
            SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
            FROM walk GROUP BY node
        """,
    }
