"""Physical-plan regression tests — the scale contract, not just the
results: column pruning reaches the scan, small dims broadcast,
global top-k lowers to TakeOrderedAndProject, resume anti-join stays
a broadcast anti-join with pushed filters."""

import contextlib
import io

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = em.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_column_pruning_reaches_scan(spark):
    p = _plan(spark, "f2_head_limit")
    read = [l for l in p.splitlines() if "ReadSchema" in l]
    assert read and "doc_id" in read[0] and "n_chars" in read[0]
    assert "text" not in read[0]  # the wide column must NOT be read


def test_dim_joins_broadcast(spark):
    p = _plan(spark, "j2_multi_join_agg")
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_global_topk_is_take_ordered(spark):
    p = _plan(spark, "o2_global_topk")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p  # no global sort


def test_anti_join_with_pushdown(spark):
    p = _plan(spark, "f1_resume_antijoin")
    assert "LeftAnti" in p
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # filter pushed to scan


def test_q1_partial_aggregation(spark):
    p = _plan(spark, "tpch_q1")
    # partial (map-side) + final HashAggregate pair
    assert p.count("HashAggregate") >= 2


def test_embedding_exact_pairs_distributed(spark):
    """The exact near-dup scan is block-pair grouped GEMM (VERDICT r2
    'What's wrong #2' fix): ONE corpus scan exploded to (block-pair,
    role) rows, one shuffle, no cartesian/BNLJ, no broadcast of the
    corpus, no driver collect — the heavy math lives in
    FlatMapGroupsInPandas tasks."""
    import inspect

    from aisafetyintervention_literatureextraction_spark.operators import similarity

    p = _plan(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapGroupsInPandas" in p
    # single corpus scan, single exchange (count tree nodes, not the
    # details section that repeats each node name)
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") == 1
    # corpus side reaches the cogroup via hash/shuffle, never broadcast:
    # every BroadcastExchange subtree must be the tiny LocalTableScan
    # fanout, not a file scan of embeddings
    tree = p.split("\n\n")[0].splitlines()

    def depth(line: str) -> int:
        for i, ch in enumerate(line):
            if ch.isalnum() or ch == "*":
                return i
        return len(line)

    for i, line in enumerate(tree):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        j = i + 1
        while j < len(tree) and depth(tree[j]) > d:
            assert "parquet" not in tree[j].lower(), tree[j]
            j += 1
    # and the operator itself never collects
    src = inspect.getsource(similarity.cosine_pairs_exact)
    assert "toPandas" not in src and ".collect(" not in src


def test_minhash_no_cartesian(spark):
    """LSH dedup joins only on (band, bucket)/ids — never a cartesian
    or broadcast nested loop over documents."""
    p = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_lsh_topk_no_cartesian(spark):
    p = _plan(spark, "sim_lsh_topk")
    assert "CartesianProduct" not in p
