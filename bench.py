"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "triples_per_sec_e2e", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., ...}

- headline queries: every oracle-checked entry in __spark_entry__
  at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
  local[$SPARK_GRAFT_CPUS].
- primary metric (BASELINE.json): triples/sec end-to-end
  triple-extraction throughput — transcripts → reassembly →
  extraction → triples_raw, on a deterministic synthetic transcript
  corpus sized by the scale factor.
- ``--scaling`` mode: same corpus at local[N] and local[4N] →
  throughput at both + scaling efficiency (north rule evidence; the
  two-cluster-size criterion run as two parallelism levels in this
  sandbox).
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# hypervisor steal above this fraction of CPU time invalidates a
# measurement (r3 lost a day to a silent host-degradation window;
# the 2-3x wall inflation observed there came with steal >> 5%)
STEAL_THRESHOLD_PCT = float(os.environ.get("SPARK_GRAFT_MAX_STEAL_PCT", "5"))
MAX_BENCH_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))


def _host_sample() -> dict:
    """One /proc/stat + loadavg reading (cheap, driver-side)."""
    out = {"ts": time.time()}
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        out["cpu_total"] = sum(vals)
        out["cpu_steal"] = vals[7] if len(vals) > 7 else 0
    except OSError:
        out["cpu_total"] = out["cpu_steal"] = 0
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        out["load1"] = None
    return out


def _host_delta(before: dict, after: dict) -> dict:
    """steal%/load telemetry for the window between two samples —
    embedded per measurement so a graded number carries its own
    host-weather evidence (r3 VERDICT next-step #5)."""
    dt = max(after["cpu_total"] - before["cpu_total"], 1)
    steal_pct = 100.0 * (after["cpu_steal"] - before["cpu_steal"]) / dt
    return {
        "steal_pct": round(steal_pct, 3),
        "load1_before": before["load1"],
        "load1_after": after["load1"],
        "degraded": steal_pct > STEAL_THRESHOLD_PCT,
    }

# transcript corpus size by sf (conversations; ~8 turns + 2.1 triples each)
_CORPUS_BY_SF = {"0.001": 200, "0.01": 2000, "0.1": 20000}


def _sf_of(sf_dir: str) -> str:
    for k in sorted(_CORPUS_BY_SF, key=len, reverse=True):
        if f"sf{k}" in sf_dir:
            return k
    return "0.1"


def _corpus_path(n_convs: int, seed: int = 7) -> str:
    return f"/tmp/kgbench_transcripts_n{n_convs}_s{seed}.parquet"


def ensure_corpus(spark, n_convs: int, replicate: int = 1) -> str:
    """Deterministic transcript corpus; ``replicate`` fans the base
    corpus out K× DISTRIBUTED (distinct conv_ids per copy) so the
    scaling run is compute-dominated — generation happens once, the
    measured job reads identical parquet at both parallelism levels."""
    path = _corpus_path(n_convs)
    if not os.path.exists(path):
        from aisafetyintervention_literatureextraction_spark.datagen import corpus_df

        df, _ = corpus_df(spark, n_convs=n_convs, hot_conv_turns=2000)
        df.repartition(64).write.mode("overwrite").parquet(path)
    if replicate <= 1:
        return path
    rpath = path.replace(".parquet", f"_x{replicate}.parquet")
    if not os.path.exists(rpath):
        from pyspark.sql import functions as F

        base = spark.read.parquet(path)
        rep = (
            base.crossJoin(spark.range(replicate).select(F.col("id").alias("__copy")))
            .withColumn("conv_id", F.concat_ws("_", "conv_id", "__copy"))
            .drop("__copy")
        )
        rep.repartition(128).write.mode("overwrite").parquet(rpath)
    return rpath


def bench_extraction(spark, path: str) -> dict:
    """transcripts parquet → triples count; returns wall + triples/sec.
    This is the primary-metric path (stage A + B, engine=sql: the
    all-JVM plan; see BENCH notes for the arrow-engine comparison)."""
    from aisafetyintervention_literatureextraction_spark.operators.extraction import (
        extract_triples,
    )
    from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
        reassemble,
    )

    def once():
        t0 = time.time()
        tr = spark.read.parquet(path)
        docs = reassemble(tr, salt_segment=4096).documents
        # with AQE coalescing off, extraction fuses into the 64-wide
        # post-shuffle stage — no extra repartition needed
        n = extract_triples(docs, engine="sql").count()
        return time.time() - t0, n

    # first run JIT-compiles the generated code; report steady state
    walls = []
    n_triples = 0
    for _ in range(2):
        w, n_triples = once()
        walls.append(w)
    wall = min(walls)
    return {"wall_s": wall, "n_triples": n_triples,
            "triples_per_sec": n_triples / wall,
            "wall_cold_s": walls[0]}


def bench_bucketed(spark, path: str) -> dict:
    """Storage-partitioned input evidence (VERDICT r2 next-step #4):
    time Stage A reassembly over the plain parquet corpus vs the same
    corpus written bucketed on conv_id — the bucketed plan has ZERO
    exchanges (plan-locked in tests/test_bucketed_input.py), so the
    delta is the cost of the pipeline's one wide shuffle."""
    from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
        reassemble,
    )
    from aisafetyintervention_literatureextraction_spark.sources.transcripts import (
        read_transcripts_bucketed,
        write_transcripts_bucketed,
    )

    table = "kg_bench_transcripts_bucketed"
    if not spark.catalog.tableExists(table):
        write_transcripts_bucketed(spark.read.parquet(path), table, n_buckets=64)

    def time_reassembly(df):
        walls = []
        for _ in range(2):
            t0 = time.time()
            reassemble(df).documents.count()
            walls.append(time.time() - t0)
        return min(walls)

    plain = time_reassembly(spark.read.parquet(path))
    bucketed = time_reassembly(read_transcripts_bucketed(spark, table))
    return {
        "plain_reassembly_s": round(plain, 3),
        "bucketed_reassembly_s": round(bucketed, 3),
        "shuffle_elision_speedup": round(plain / max(bucketed, 1e-9), 3),
    }


def bench_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as em

    from aisafetyintervention_literatureextraction_spark.functions.caching import release_caches

    out = {}
    qs = em.queries()
    for name in sorted(em.oracle_sql()):
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        release_caches()  # operator-persisted intermediates die with the query
    return out


def bench_ann_recall(spark, sf_dir: str, k: int = 10, n_queries: int = 32) -> dict:
    """Recall@k of the APPROXIMATE ANN regimes vs exact brute force at
    the bench SF (r3 VERDICT next-step #6: the oracle rows pin the
    exact regimes; this logs what the approximate settings actually
    recall at scale — no silent caps)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aisafetyintervention_literatureextraction_spark.operators import (
        similarity as ivf_mod,
    )
    from aisafetyintervention_literatureextraction_spark.operators.similarity import (
        cosine,
        ivf_topk,
        lsh_topk,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def topk_ids(df):
        rows = df.select("query_id", "vec_id").collect()  # k·n_queries ids
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    scored = F.broadcast(
        q.select("query_id", F.col("embedding").alias("q_vec"))
    ).crossJoin(e.select("vec_id", F.col("embedding").alias("c_vec"))).select(
        "query_id", "vec_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("s")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("vec_id"))
    exact = topk_ids(
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )

    def recall(approx):
        covered = sum(len(approx.get(qid, set()) & ids) for qid, ids in exact.items())
        return round(covered / max(sum(len(v) for v in exact.values()), 1), 3)

    # recall/cost sweep: candidate volume grows with bands (LSH) and
    # n_probe (IVF); the sweep shows where the curve saturates instead
    # of reporting one arbitrary operating point
    lsh = {
        f"bands={b},bits={bits}": recall(topk_ids(lsh_topk(e, q, k=k, bands=b, bits=bits)))
        for b, bits in [(8, 8), (16, 4), (32, 2)]
    }
    # IVF sweep: n_probe grows the probed-cell set, n_assign (SPANN-
    # style redundant corpus assignment) grows each vector's reach.
    # Candidate cost per query ≈ corpus · n_assign·n_probe/n_cells —
    # reported as cand_frac so high-recall settings can't hide their
    # volume (on this quasi-isotropic synthetic corpus the ≥0.9-recall
    # settings approach brute-force volume; clustered real embeddings
    # keep the same recall at a fraction of it).
    n_corpus = e.count()
    # one codebook for the whole sweep — (corpus, n_cells, seed) are
    # identical across settings, so refitting per point is pure waste
    cb = ivf_mod.train_ivf_centroids(e, n_cells=64)
    ivf = {}
    for p, r in ((4, 1), (8, 1), (16, 1), (8, 4), (16, 2), (16, 4)):
        approx = topk_ids(ivf_topk(e, q, k=k, n_cells=64, n_probe=p,
                                   n_assign=r, centroids=cb))
        ivf[f"n_cells=64,n_probe={p},n_assign={r}"] = {
            "recall": recall(approx),
            "cand_frac": round(min(1.0, r * p / 64), 3),
        }
    return {"k": k, "n_queries": len(exact), "lsh_recall": lsh, "ivf_recall": ivf,
            "n_corpus": n_corpus}


def bench_pdf_decode(spark, n_docs: int = 3000, runs: int = 3) -> dict:
    """Decode-BOUND PDF throughput (r4 VERDICT next-step #3): a
    ~110 MB corpus of 3000 multi-page Flate-dominated PDFs
    (pdfgen.ensure_heavy_pdf_fixture) where per-file stdlib decode
    (~30 ms) dwarfs listing, so docs/s measures the decoder.  Reports
    every wall plus the max/min spread — the small-corpus pdf_ingest
    row's 9× run spread was listing noise; this row is only meaningful
    if spread < 2."""
    from aisafetyintervention_literatureextraction_spark.operators.pdf import (
        decode_pdf_text,
    )
    from aisafetyintervention_literatureextraction_spark.pdfgen import (
        ensure_heavy_pdf_fixture,
    )
    from aisafetyintervention_literatureextraction_spark.sources.raw_files import (
        read_raw_files,
    )

    d = f"/tmp/kgbench_pdfs_heavy_n{n_docs}"
    ensure_heavy_pdf_fixture(d, n_docs=n_docs)
    total_bytes = sum(
        f.stat().st_size for f in __import__("pathlib").Path(d).glob("*.pdf")
    )
    walls = []
    n = 0
    for _ in range(runs):
        t0 = time.time()
        n = decode_pdf_text(read_raw_files(spark, d, glob="*.pdf")).filter(
            "doc_text IS NOT NULL"
        ).count()
        walls.append(round(time.time() - t0, 2))
    wall = min(walls)
    return {
        "n_docs": n,
        "total_mb": round(total_bytes / 1e6, 2),
        "walls_s": walls,
        "spread": round(max(walls) / max(min(walls), 1e-9), 2),
        "docs_per_sec": round(n / wall, 1),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 2),
    }


def ensure_graph_corpus(spark, n_nodes: int = 4_000_000,
                        n_random: int = 16_000_000) -> str:
    """Deterministic large undirected graph for the kernel-scaling
    bench: an n-node double ring (i—i+1, i—i+2: one triangle per
    vertex, so the wedge join does real work everywhere) plus
    hash-random long-range edges (cross-partition shuffle realism,
    no locality for the joins to exploit).  Written once; both
    parallelism levels read identical parquet bytes."""
    path = f"/tmp/kgbench_graph_n{n_nodes}_r{n_random}.parquet"
    if not os.path.exists(path):
        from pyspark.sql import functions as F

        ring = spark.range(n_nodes).selectExpr(
            "id AS a", f"(id + 1) % {n_nodes}L AS b"
        ).union(spark.range(n_nodes).selectExpr(
            "id AS a", f"(id + 2) % {n_nodes}L AS b"
        ))
        rnd = spark.range(n_random).select(
            (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes).alias("a"),
            (F.abs(F.xxhash64("id", F.lit(2))) % n_nodes).alias("b"),
        ).filter("a <> b")
        ring.union(rnd).repartition(64).write.mode("overwrite").parquet(path)
    return path


GRAPH_KERNELS = ("pagerank", "triangles", "bfs", "lpa", "sssp", "ppr")


def bench_graph_kernels(spark, path: str, only: tuple = ()) -> dict:
    """Walls for the graph-analytics kernel family on the synthetic
    graph corpus — the action for each is a full count() of the
    result relation (no collect of data rows).  ``only`` restricts to
    a subset of GRAPH_KERNELS (re-measuring one kernel after a fix
    without paying for the family)."""
    from aisafetyintervention_literatureextraction_spark.operators.graph_analytics import (
        bfs_khop, ktruss, label_propagation, pagerank_int,
        personalized_pagerank, sssp_weighted, triangle_counts,
    )
    from pyspark.sql import functions as F

    edges = spark.read.parquet(path)
    n_edges = edges.count()  # warms the scan; corpus is deterministic
    out = {"n_edges": n_edges}
    seeds = (
        edges.select(F.col("a").alias("node")).distinct()
        .filter(F.col("node") % 4096 == 7)
    ).localCheckpoint(eager=True)
    runs = {
        "pagerank": lambda: pagerank_int(edges, iterations=5),
        "triangles": lambda: triangle_counts(edges),
        "bfs": lambda: bfs_khop(edges, seeds, max_hops=3),
        # 2 LPA rounds: one round ≈ one pagerank round + a vote
        # groupBy, so 2 rounds keeps the family's total wall bounded
        # while still exercising the iterative join shape
        "lpa": lambda: label_propagation(edges, rounds=2),
        "sssp": lambda: sssp_weighted(edges, seeds, max_rounds=6),
        "ppr": lambda: personalized_pagerank(edges, seeds, iterations=5),
        # NOT in the default family (each peel round costs a full
        # triangle enumeration ≈ one `triangles` wall, so the total
        # would be round-count-dependent); reachable via --graph-only
        "ktruss": lambda: ktruss(edges, k=3, max_rounds=3),
    }
    sel = tuple(only) or GRAPH_KERNELS
    for name in sel:
        t0 = time.time()
        out[f"{name}_rows"] = runs[name]().count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
    out["total_wall_s"] = round(
        sum(out[f"{k}_wall_s"] for k in sel), 2
    )
    return out


def _ui_get(url):
    import json as _json
    import urllib.request

    return _json.load(urllib.request.urlopen(url, timeout=10))


def _stage_ids(spark) -> set:
    base = spark.sparkContext.uiWebUrl
    if not base:  # spark.ui.enabled=false → no task telemetry
        return set()
    try:  # telemetry must never kill a finished measurement
        apps = _ui_get(f"{base}/api/v1/applications")
        app_id = apps[0]["id"]
        stages = _ui_get(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete")
    except Exception:
        return set()
    return {(s["stageId"], s["attemptId"], app_id,
             s.get("executorRunTime", 0)) for s in stages}


def _task_spread(spark, new_stages) -> dict:
    """max/median task-duration ratio of the DOMINANT stage (largest
    total executorRunTime) among ``new_stages`` — straggler evidence
    for the soak: a hot LSH bucket or a skewed CC reducer shows up as
    a big max while the median stays flat. Picking by total runtime
    (not by biggest single task) keeps a trivial setup stage with one
    slow task from hijacking the skew signal."""
    base = spark.sparkContext.uiWebUrl
    if not base or not new_stages:
        return {"max_task_ms": None, "median_task_ms": None, "spread": None}
    sid, att, app_id, _rt = max(new_stages, key=lambda t: t[3])
    try:
        s = _ui_get(
            f"{base}/api/v1/applications/{app_id}/stages/{sid}/{att}"
            f"/taskSummary?quantiles=0.0,0.5,1.0")
        dur = s.get("duration") or []
    except Exception:
        dur = []
    if len(dur) != 3:
        return {"max_task_ms": None, "median_task_ms": None, "spread": None}
    med = max(dur[1], 1.0)
    return {
        "max_task_ms": round(dur[2], 1),
        "median_task_ms": round(dur[1], 1),
        "spread": round(dur[2] / med, 2),
    }


def ensure_soak_dir(spark, sf_dir: str, factor: int = 10) -> str:
    """sf1-class soak input: the sf0.1 documents/embeddings tables
    fanned out ``factor``× with distinct ids. Document copies carry a
    per-copy suffix so they are NEAR-duplicates (Jaccard ≈ 1 but not
    byte-equal — the realistic dup-cluster shape, and a hot-bucket
    stress: every base doc becomes a 10-member cluster). Embedding
    copies keep their labels, so the bipartite CC graph gains 10× the
    vec nodes on the SAME label hubs — the giant-component regime."""
    out = f"/tmp/kgbench_soak_x{factor}"
    from pyspark.sql import functions as F

    if not os.path.exists(os.path.join(out, "documents.parquet")):
        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        rep = (
            d.crossJoin(spark.range(factor).select(F.col("id").alias("__c")))
            .select(
                (F.col("doc_id") + F.col("__c") * 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" c"),
                         F.col("__c").cast("string")).alias("text"),
                "lang", "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            )
        )
        rep.repartition(64).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet"))
    if not os.path.exists(os.path.join(out, "embeddings.parquet")):
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        rep = (
            e.crossJoin(spark.range(factor).select(F.col("id").alias("__c")))
            .select(
                (F.col("vec_id") + F.col("__c") * 10_000_000).alias("vec_id"),
                "embedding", "label",
            )
        )
        rep.repartition(64).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet"))
    return out


def bench_soak(spark, sf_dir: str, factor: int = 10) -> dict:
    """sf1-class soak (r4 VERDICT next-step #8): the three heaviest
    operators at 10× the bench document/vector count, each reporting
    wall + the dominant stage's max/median task-time spread — the
    hot-bucket caps and the CC stats fix are only proven where the
    skew actually bites."""
    import __spark_entry__ as em

    from aisafetyintervention_literatureextraction_spark.functions.caching import (
        release_caches,
    )

    from aisafetyintervention_literatureextraction_spark.operators.dedup import (
        winnow_duplicate_pairs,
    )

    soak_dir = ensure_soak_dir(spark, sf_dir, factor)
    qs = em.queries()

    def winnow_scaled(spark, d):
        # mirrored-cap semantics: the hot-fingerprint cap bounds the
        # bucket join in DOCS per fingerprint; a factor× corpus with
        # the same absolute cap would (correctly, by contract) drop
        # every fingerprint of a factor×-replicated cluster — scale
        # the cap with the corpus so per-base-doc behavior compares
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        return winnow_duplicate_pairs(
            docs, k=8, w=4, min_shared=20, max_bucket_size=64 * factor
        )

    jobs = {
        "dedup_minhash_lsh": lambda: qs["dedup_minhash_lsh"](spark, soak_dir),
        "dedup_winnow_capx%d" % factor: lambda: winnow_scaled(spark, soak_dir),
        "g5_connected_components": lambda:
            qs["g5_connected_components"](spark, soak_dir),
    }
    out = {"factor": factor}
    for name, job in jobs.items():
        before = _stage_ids(spark)
        t0 = time.time()
        n = job().count()
        wall = round(time.time() - t0, 2)
        release_caches()
        spread = _task_spread(spark, _stage_ids(spark) - before)
        out[name] = {"wall_s": wall, "n_rows": n, **spread}
    return out


def bench_cc_skew(spark, n_nodes: int = 200_000) -> dict:
    """Connected-components under a SINGLE GIANT COMPONENT (r3 VERDICT
    next-step #4): the jump join keys on ``component_id``, which is hot
    by construction once one component dominates. Three graphs at the
    same node scale:

    - ``star``: 50% of nodes attached to one hub → maximal key skew
      (every giant-component row carries the same label from iter 1)
    - ``chain``: 50% of nodes in one path → maximal diameter (stresses
      the O(log D) pointer jumping, skew arrives as labels coalesce)
    - ``uniform``: all 2-node components → balanced baseline

    Mitigation on the hot key is AQE skew-join splitting (pinned on in
    session.get_spark, locked by tests/test_components.py): the jump
    join's build side is unique-keyed, so splitting the probe side is
    always safe. The bench row reports walls + the skew factor (max /
    median component size) so a regression shows up as giant-vs-uniform
    wall divergence, not just absolute time."""
    from pyspark.sql import functions as F

    from aisafetyintervention_literatureextraction_spark.operators.components import (
        connected_components,
    )

    half = n_nodes // 2
    verts = spark.range(n_nodes).select(F.col("id").alias("node_id"))
    star = spark.range(1, half).select(
        F.lit(0).cast("long").alias("a_id"), F.col("id").alias("b_id")
    )
    chain = spark.range(half - 1).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    pair_tail = spark.range(half, n_nodes - 1, 2).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    uniform = spark.range(0, n_nodes - 1, 2).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    out = {"n_nodes": n_nodes}
    for name, edges in [
        ("star", star.union(pair_tail)),
        ("chain", chain.union(pair_tail)),
        ("uniform", uniform),
    ]:
        h0 = _host_sample()
        t0 = time.time()
        labels = connected_components(verts, edges, max_iter=60)
        sizes = labels.groupBy("component_id").count()
        stats = sizes.agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("med"),
            F.count("*").alias("n_comps"),
        ).collect()[0]
        wall = time.time() - t0
        out[name] = {
            "wall_s": round(wall, 2),
            "giant_size": int(stats["mx"]),
            "skew_factor": round(stats["mx"] / max(stats["med"], 1), 1),
            "n_components": int(stats["n_comps"]),
            "host": _host_delta(h0, _host_sample()),
        }
    out["star_vs_uniform_wall_ratio"] = round(
        out["star"]["wall_s"] / max(out["uniform"]["wall_s"], 1e-9), 2
    )
    out["chain_vs_uniform_wall_ratio"] = round(
        out["chain"]["wall_s"] / max(out["uniform"]["wall_s"], 1e-9), 2
    )
    out["skew_join_conf"] = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.adaptive.skewJoin.enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    return out


def run_once(cpus: int, sf_dir: str, skip_queries: bool = False,
             replicate: int = 1) -> dict:
    from aisafetyintervention_literatureextraction_spark.session import get_spark

    # Bench-session tuning (each choice measured, see BENCH/BASELINE.md):
    # - shuffle partitioning CONSTANT across parallelism levels: the
    #   N-vs-4N comparison varies executor threads only, like varying
    #   executor count on a real cluster with fixed shuffle.partitions
    #   (otherwise the low level is penalized by spill, not fewer cores)
    # - maxPartitionBytes lowered so the ~120 MB corpus scans with ≥30
    #   input splits (at 128 MB the scan gets ~5 splits → cores idle)
    # - AQE partition coalescing OFF for this job: it shrank the fused
    #   reassembly→extraction stage to ~advisory size, starving the
    #   regex-heavy extraction of parallelism AND forcing an extra
    #   repartition shuffle to undo it
    # - shuffle spill on tmpfs when available: removes the constant
    #   disk-I/O term that otherwise caps measured scaling (Amdahl)
    extra = {
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=64,
                      extra_conf=extra)
    try:
        n_convs = _CORPUS_BY_SF[_sf_of(sf_dir)]
        path = ensure_corpus(spark, n_convs, replicate=replicate)
        # warm the JVM/code paths once so the measurement isn't startup
        spark.read.parquet(path).limit(10).count()
        h0 = _host_sample()
        ext = bench_extraction(spark, path)
        ext["host"] = _host_delta(h0, _host_sample())
        queries = {} if skip_queries else bench_queries(spark, sf_dir)
        bucketed = {} if skip_queries else bench_bucketed(spark, path)
        ann = {} if skip_queries else bench_ann_recall(spark, sf_dir)
        pdf = {} if skip_queries else bench_pdf_decode(spark, n_docs=1500, runs=2)
        return {"extraction": ext, "queries": queries,
                "bucketed_input": bucketed, "ann_recall": ann,
                "pdf_ingest": pdf,
                "n_convs": n_convs,
                "host": _host_delta(h0, _host_sample())}
    finally:
        spark.stop()


def bench_pipeline(cpus: int, replicate: int = 10, increment_pct: int = 2) -> dict:
    """Full warehouse build (stages A-D incl. catalog commits) followed
    by an INCREMENTAL run over the same warehouse with +increment_pct%
    new conversations — the delta-catalog / delta-stage-C evidence:
    the second wall must track the increment, not the corpus."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aisafetyintervention_literatureextraction_spark.plans.pipeline import (
        run_pipeline,
    )
    from aisafetyintervention_literatureextraction_spark.session import get_spark

    spark = get_spark(f"bench-pipeline-{cpus}", cpus=cpus, shuffle_partitions=64)
    wh = tempfile.mkdtemp(prefix="kgbench_wh_")
    try:
        path = ensure_corpus(spark, _CORPUS_BY_SF[_sf_of(SF_DIR)], replicate=replicate)
        tr = spark.read.parquet(path)
        initial = tr.filter(F.crc32(F.col("conv_id")) % 100 >= increment_pct)
        t0 = time.time()
        stats_full = run_pipeline(spark, initial, wh)
        w_initial = time.time() - t0
        t0 = time.time()
        stats_incr = run_pipeline(spark, tr, wh)  # resume: only the increment pending
        w_incr = time.time() - t0
        return {
            "initial_wall_s": round(w_initial, 1),
            "incremental_wall_s": round(w_incr, 1),
            "speedup": round(w_initial / max(w_incr, 1e-9), 2),
            "n_triples_initial": stats_full["n_triples"],
            "n_triples_final": stats_incr["n_triples"],
            "increment_pct": increment_pct,
            "n_turns": tr.count(),
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run at N and 4N cores, report efficiency")
    ap.add_argument("--pipeline", action="store_true",
                    help="full warehouse build + incremental re-run walls")
    ap.add_argument("--cc-skew", action="store_true",
                    help="connected-components giant-component skew bench")
    ap.add_argument("--pdf-scale", action="store_true",
                    help="decode-bound PDF corpus (~110 MB) at 4 and 16 "
                         "cores: docs/s + MB/s + scaling efficiency")
    ap.add_argument("--graph-scale", action="store_true",
                    help="graph-analytics kernel family (PageRank/"
                         "triangles/BFS/LPA/SSSP/PPR) on a synthetic "
                         "graph at 4 and 16 cores: walls + per-kernel "
                         "efficiency")
    ap.add_argument("--graph-nodes", type=int, default=4_000_000,
                    help="graph-scale corpus: ring vertices (edges = "
                         "2x this + --graph-random)")
    ap.add_argument("--graph-random", type=int, default=16_000_000,
                    help="graph-scale corpus: hash-random long edges")
    ap.add_argument("--graph-only", type=str, default="",
                    help="comma list restricting --graph-scale to a "
                         "kernel subset (e.g. ppr,sssp)")
    ap.add_argument("--soak", action="store_true",
                    help="sf1-class soak: heavy dedup/CC queries at 10x "
                         "docs with task-time spread telemetry")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--repeats", type=int, default=3,
                    help="alternating (low, high) measurement pairs for --scaling")
    ap.add_argument("--replicate", type=int, default=20,
                    help="corpus fan-out for --scaling (bigger = less noise)")
    ap.add_argument("--scale-high", type=int, default=16,
                    help="4N level for --scaling (N = high/4). Default 16 "
                         "(4 vs 16): this box has 32 LOGICAL cpus over ~16 "
                         "physical cores (SMT), so 16 is the largest level "
                         "with near-linear hardware headroom — measured "
                         "pure-CPU multiprocessing scales ~1.96x per "
                         "doubling up to 16 workers, then ~1.45x to 32. "
                         "Needs an idle host; see BENCH/BASELINE.md.")
    args = ap.parse_args()

    sf = _sf_of(SF_DIR)
    if args.soak:
        from aisafetyintervention_literatureextraction_spark.session import get_spark

        spark = get_spark(f"bench-soak-{args.cpus}", cpus=args.cpus,
                          shuffle_partitions=64,
                          # task-spread telemetry reads the UI REST API
                          extra_conf={"spark.ui.enabled": "true"})
        try:
            h0 = _host_sample()
            res = bench_soak(spark, SF_DIR)
            host = _host_delta(h0, _host_sample())
        finally:
            spark.stop()
        print(json.dumps({
            "metric": "soak_10x",
            "value": max(v["wall_s"] for k, v in res.items()
                         if isinstance(v, dict)),
            "unit": "sec",
            "valid": not host["degraded"],
            "host": host,
            **res,
            "sf": sf,
        }))
        return
    if args.pdf_scale:
        from aisafetyintervention_literatureextraction_spark.session import get_spark

        # binaryFile packing: openCostInBytes defaults to 4 MB, which
        # would put ONE 37 KB file per partition (3000 tasks); 64 KB
        # cost + 2 MB target packs ~20 files/split → ~150 splits, so
        # both levels are parallelism-bound on decode, not scheduling
        extra = {
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        }
        levels = {}
        degraded = False
        for cpus in (4, 16):
            spark = get_spark(f"bench-pdf-{cpus}", cpus=cpus,
                              shuffle_partitions=64, extra_conf=extra)
            try:
                h0 = _host_sample()
                levels[cpus] = bench_pdf_decode(spark)
                levels[cpus]["host"] = _host_delta(h0, _host_sample())
                degraded = degraded or levels[cpus]["host"]["degraded"]
            finally:
                spark.stop()
        eff = (levels[16]["docs_per_sec"] / levels[4]["docs_per_sec"]) / 4
        print(json.dumps({
            "metric": "pdf_decode_scaling",
            "value": round(eff, 3),
            "unit": "ratio",
            "valid": not degraded,
            "cores": {str(k): v for k, v in levels.items()},
            "sf": sf,
        }))
        if degraded:
            raise SystemExit(3)
        return
    if args.graph_scale:
        from aisafetyintervention_literatureextraction_spark.session import get_spark

        levels = {}
        degraded = False
        for cpus in (4, 16):
            # localCheckpoint blocks (edge structure + per-iteration
            # ranks) live in the local-mode driver heap; iterative
            # checkpoint blocks persist until ContextCleaner GC, so
            # size generously (8g default OOMs at 12M edges)
            spark = get_spark(f"bench-graph-{cpus}", cpus=cpus,
                              shuffle_partitions=64,
                              extra_conf={"spark.driver.memory": "48g"})
            try:
                path = ensure_graph_corpus(
                    spark, n_nodes=args.graph_nodes,
                    n_random=args.graph_random)
                h0 = _host_sample()
                only = tuple(
                    k for k in args.graph_only.split(",") if k)
                levels[cpus] = bench_graph_kernels(spark, path, only=only)
                levels[cpus]["host"] = _host_delta(h0, _host_sample())
                degraded = degraded or levels[cpus]["host"]["degraded"]
            finally:
                spark.stop()
        eff = {
            k: round((levels[4][f"{k}_wall_s"]
                      / max(levels[16][f"{k}_wall_s"], 1e-9)) / 4, 3)
            for k in GRAPH_KERNELS + ("ktruss", "total")
            if f"{k}_wall_s" in levels[4]
        }
        print(json.dumps({
            "metric": "graph_kernel_scaling",
            "value": eff["total"],
            "unit": "ratio",
            "valid": not degraded,
            "efficiency": eff,
            "cores": {str(k): v for k, v in levels.items()},
            "sf": sf,
        }))
        if degraded:
            raise SystemExit(3)
        return
    if args.cc_skew:
        from aisafetyintervention_literatureextraction_spark.session import get_spark

        spark = get_spark(f"bench-ccskew-{args.cpus}", cpus=args.cpus,
                          shuffle_partitions=64)
        try:
            res = bench_cc_skew(spark)
        finally:
            spark.stop()
        print(json.dumps({
            "metric": "cc_skew_star_vs_uniform_wall_ratio",
            "value": res["star_vs_uniform_wall_ratio"],
            "unit": "ratio",
            **res,
            "sf": sf,
        }))
        return
    if args.pipeline:
        res = bench_pipeline(args.cpus, replicate=args.replicate)
        print(json.dumps({
            "metric": "pipeline_incremental_speedup",
            "value": res["speedup"],
            "unit": "ratio",
            **res,
            "sf": sf,
        }))
        return
    if args.scaling:
        high = args.scale_high
        n = max(high // 4, 1)
        # alternate levels and keep the best of each: the sandbox host
        # has minutes-scale background-load drift, so a single pair
        # under/over-states whichever level hit the noisy window.
        tp_n, tp_4n = 0.0, 0.0
        n_discarded = 0
        hosts = []
        for _ in range(args.repeats):
            lo = run_once(n, SF_DIR, skip_queries=True, replicate=args.replicate)
            hi = run_once(high, SF_DIR, skip_queries=True, replicate=args.replicate)
            hosts.append({"low": lo["host"], "high": hi["host"]})
            # a measurement taken under hypervisor steal is not graded
            # (r3's degradation window inflated walls 2-3x uniformly)
            if lo["host"]["degraded"] or hi["host"]["degraded"]:
                n_discarded += 1
                continue
            tp_n = max(tp_n, lo["extraction"]["triples_per_sec"])
            tp_4n = max(tp_4n, hi["extraction"]["triples_per_sec"])
        if tp_n == 0.0:
            print(json.dumps({
                "metric": "scaling_efficiency", "value": None,
                "unit": "ratio", "valid": False,
                "reason": f"all {args.repeats} pairs exceeded "
                          f"{STEAL_THRESHOLD_PCT}% host steal",
                "host_samples": hosts, "sf": sf,
            }))
            raise SystemExit(3)
        eff = (tp_4n / tp_n) / (high / n)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "cores_low": n, "cores_high": high,
            "triples_per_sec_low": round(tp_n, 1),
            "triples_per_sec_high": round(tp_4n, 1),
            "pairs_discarded_for_steal": n_discarded,
            "host_samples": hosts,
            "sf": sf,
        }))
        return

    # retry until a clean host window (r4 VERDICT observation #1: the
    # artifact of record should itself be a valid run, not a degraded
    # one footnoted in prose) — bounded: after MAX_BENCH_ATTEMPTS
    # degraded windows the last result is emitted with valid:false
    attempts = []
    for attempt in range(MAX_BENCH_ATTEMPTS):
        res = run_once(args.cpus, SF_DIR)
        attempts.append(res["host"])
        if not res["host"]["degraded"]:
            break
        if attempt < MAX_BENCH_ATTEMPTS - 1:
            time.sleep(30)  # let the steal window pass before retrying
    print(json.dumps({
        "metric": "triples_per_sec_e2e",
        "value": round(res["extraction"]["triples_per_sec"], 1),
        "unit": "sec",
        "queries": res["queries"],
        "sf": sf,
        "n_triples": res["extraction"]["n_triples"],
        "extraction_wall_s": round(res["extraction"]["wall_s"], 2),
        "bucketed_input": res["bucketed_input"],
        "ann_recall": res["ann_recall"],
        "pdf_ingest": res["pdf_ingest"],
        "host": res["host"],
        "valid": not res["host"]["degraded"],
        "attempts_degraded": sum(1 for h in attempts if h["degraded"]),
        "cpus": args.cpus,
    }))


if __name__ == "__main__":
    main()
