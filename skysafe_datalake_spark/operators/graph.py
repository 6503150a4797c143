"""Distributed graph operators: connected components.

The missing piece between *pair* dedup (MinHash-LSH / n-gram Jaccard /
embedding cosine emit near-dup PAIRS) and *actionable* dedup (every
document assigned to exactly one duplicate CLUSTER, one canonical kept):
transitive closure of the pair graph. Training-data pipelines (C4-style
corpus curation) need this as a first-class operator.

Algorithm: iterative min-label propagation, entirely in DataFrame ops —
each round every node takes ``min(own label, neighbours' labels)``;
fixpoint = each component labelled by its minimum node id. Rounds needed
equal the graph diameter; near-dup clusters have tiny diameters (dups of
a dup are dups), so convergence is a handful of rounds. For adversarial
long-chain graphs at 100 TB, swap the loop body for the large-star /
small-star transform (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14), which converges in O(log²n) rounds —
same fixpoint, same caller contract, so the swap is local to this
function.

Per round: one shuffle for the neighbour-min aggregation and one for
the label join, both keyed on node id, so AQE can coalesce/skew-split
them. Labels are materialized with ``localCheckpoint`` every round —
in an iterative dataflow the lineage otherwise nests one full
join-plan per round, and by round ~15 plan optimization/codegen cost
(and eventual recompute on eviction) dominates the actual data work;
checkpointing keeps every round's plan constant-size. Convergence is
detected from ``sum(label)``: labels only ever decrease, so the sum
is strictly monotone until fixpoint — one cheap aggregate instead of
a changed-rows join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    Parameters
    ----------
    edges : DataFrame with columns ``src``, ``dst`` (undirected; each
        pair needs to appear in one direction only). Node ids must be
        numeric (hash/dense-rank string keys to ids first).
    nodes : optional DataFrame of all node ids (column ``node_col``) —
        include it so isolated nodes (no edges) still get labelled as
        their own singleton cluster.

    Returns DataFrame[node, cluster_id].
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .cache()
    )
    if nodes is None:
        node_ids = sym.select(F.col("a").alias("node")).distinct()
    else:
        node_ids = nodes.select(F.col(node_col).alias("node")).distinct()

    labels = node_ids.select(
        "node", F.col("node").alias("cluster_id")
    ).localCheckpoint()
    total = labels.agg(F.sum("cluster_id")).first()[0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        new_total = labels.agg(F.sum("cluster_id")).first()[0]
        if new_total == total:
            break
        total = new_total
    sym.unpersist()
    return labels


def dedup_cluster_assign(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Near-dup pairs → cluster assignment with canonical selection.

    Returns DataFrame[<id_col>, cluster_id, cluster_size, is_canonical]
    — the keep/drop decision table of a dedup stage: keep rows where
    ``is_canonical`` (the minimum id of each cluster), drop the rest.
    Singletons (no near-dup) form size-1 clusters of themselves.
    """
    comp = connected_components(
        pairs, src=a_col, dst=b_col, nodes=all_ids, node_col=id_col
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "cluster_id")
        .select(
            F.col("node").alias(id_col),
            "cluster_id",
            "cluster_size",
            (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
        )
    )
