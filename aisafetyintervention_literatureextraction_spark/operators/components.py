"""G5 — connected components by iterative hash-join label propagation.

The reference merges duplicate pairs *sequentially* with Cypher
rewiring per pair (reference db.py:106-155, driver loop
merge.py:107-109 — which iterates over node ids captured before any
merge, a latent staleness bug SURVEY.md §2.9 documents). Connected
components is the order-independent closure of the same intent and is
what the north rule prescribes ("GraphFrames-style iterative hash-join
label propagation").

Algorithm: min-label propagation to fixpoint —
    comp(v) ← min(comp(v), min over neighbors u of comp(u))
Each iteration is one shuffle (edges ⋈ labels, groupBy-min); lineage
is truncated per iteration with ``localCheckpoint`` so the plan does
not grow unboundedly (SURVEY.md §4.2); convergence = zero changed
labels (an aggregate, not a collect of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,  # node_id long
    edges: DataFrame,     # a_id, b_id
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Returns (node_id, component_id) — component_id = min node_id in
    the component. Deterministic and resume-stable because node ids
    are content hashes (functions/hashing.stable_node_id)."""
    sym = (
        edges.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .union(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col("node_id"), F.col("node_id").alias("component_id")
    ).localCheckpoint(eager=True)

    for i in range(max_iter):
        # messages: every edge forwards the source's current label
        msgs = (
            sym.join(labels, sym.src == labels.node_id)
            .select(F.col("dst").alias("node_id"), F.col("component_id"))
            .groupBy("node_id")
            .agg(F.min("component_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("nbr_min"), F.col("component_id"))
                ).alias("component_id"),
                (F.coalesce(F.col("nbr_min"), F.col("component_id")) < F.col("component_id"))
                .alias("changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels
