"""Distributed graph operators: connected components.

The missing piece between *pair* dedup (MinHash-LSH / n-gram Jaccard /
embedding cosine emit near-dup PAIRS) and *actionable* dedup (every
document assigned to exactly one duplicate CLUSTER, one canonical kept):
transitive closure of the pair graph. Training-data pipelines (C4-style
corpus curation) need this as a first-class operator.

Two algorithms, same contract and fixpoint (min node id per component):

- :func:`connected_components` — iterative min-label propagation; each
  round every node takes ``min(own label, neighbours' labels)``.
  Rounds = graph diameter; near-dup clusters have tiny diameters
  (dups of a dup are dups), so this is the cheap default.
- :func:`connected_components_star` — alternating large-star /
  small-star contraction (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14), O(log²n) rounds on ANY shape; use
  it when component diameters are unbounded (web graphs, chains).

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
    _require_numeric_ids(edges, [src, dst], "connected_components")
    if nodes is not None:
        _require_numeric_ids(nodes, [node_col], "connected_components")
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

    converged = False
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
            converged = True
            break
        total = new_total
    sym.unpersist()
    if not converged:
        # Silently returning would hand downstream dedup WRONG cluster
        # labels with nothing pointing at non-convergence. Components
        # with diameter > max_iter need a larger budget or the
        # O(log²n) star variant.
        raise RuntimeError(
            f"connected_components did not reach its fixpoint within "
            f"max_iter={max_iter} rounds; raise max_iter or use "
            f"connected_components_star for high-diameter graphs"
        )
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


def cooccurrence_pairs(
    df: DataFrame, group: str, item: str
) -> DataFrame:
    """All unordered item pairs ``(u < v)`` co-occurring within a
    group, one output row per (group, pair) — the edge-generation
    primitive behind the co-occurrence graphs (parts or suppliers
    sharing an order). Aggregate per pair for weights
    (``groupBy(u, v).count()`` = number of co-occurring groups) or
    ``.distinct()`` for the unweighted edge set.

    Shape: ONE shuffle (the groupBy(group) collect_set, with map-side
    partial aggregation), then pairs are generated array-natively
    inside the JVM. This replaces the previous formulation at every
    call site — ``pairs.distinct()`` + self-join on the group key +
    re-aggregation — which cost a distinct exchange on (group, item),
    a second exchange pair for the self-join, and a sort-merge join
    whose output multiplies rows BEFORE the pair aggregation could
    shrink them. Valid because per-group item sets are small (TPC-H
    orders hold ≤7 lineitems; any bounded-basket domain): the
    collect_set array is a few elements, and C(n,2) pair fan-out per
    group stays trivially bounded, so nothing here is a collect-large-
    group trap. ``array_sort`` makes the emitted order deterministic
    (collect_set order is not), and sorting also enforces u < v.

    Caveat: ``collect_set`` drops NULL items, whereas a distinct+
    self-join would have kept NULL = NULL pairs out anyway (the
    equi-join never matches NULL) — identical pair sets as long as
    item is non-null, which every call site's key column guarantees.
    """
    sets = df.groupBy(F.col(group).alias("grp")).agg(
        F.array_sort(F.collect_set(F.col(item))).alias("items")
    )
    return pairs_from_item_sets(sets, "items")


def pairs_from_item_sets(sets: DataFrame, items_col: str) -> DataFrame:
    """Explode a sorted-array column into its C(n,2) unordered pairs
    ``(u < v)`` — the second half of :func:`cooccurrence_pairs`,
    exposed separately for callers that also need the item sets
    themselves (per-item supports, basket counts) so one
    collect_set aggregation feeds every consumer."""
    a = items_col
    return sets.select(
        F.explode(
            F.expr(
                f"flatten(transform({a}, (x, i) -> "
                f"transform(slice({a}, i + 2, size({a}) - i - 1), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("_p")
    ).select("_p.u", "_p.v")


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.unionAll(
        edges.select(F.col("a").alias("b"), F.col("b").alias("a")).select("a", "b")
    )


def _require_numeric_ids(df: DataFrame, cols, op: str) -> None:
    """Both components variants converge on SUM-based fingerprints of
    the ids (a valid Lyapunov function only because min-propagation
    monotonically decreases numeric labels). A string id column makes
    every sum NULL, None == None declares convergence after one round,
    and the caller gets silently WRONG labels — so the documented
    numeric-ids precondition is enforced, loudly, at entry."""
    from pyspark.sql.types import NumericType

    for c in cols:
        t = df.schema[c].dataType
        if not isinstance(t, NumericType):
            raise TypeError(
                f"{op} requires numeric node ids; column {c!r} is "
                f"{t.simpleString()}. Map keys to ids first "
                "(e.g. F.xxhash64(col) or a dense_rank lookup)."
            )


def _edge_checksum(edges: DataFrame) -> tuple:
    """Order-insensitive edge-set fingerprint for convergence checks:
    count + two independent mixes. One aggregate job, no sort."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.lit(2654435761) + F.col("b")).alias("s1"),
        F.sum(F.col("a") + F.col("b") * F.lit(40503)).alias("s2"),
    ).first()
    return (row["n"], row["s1"], row["s2"])


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — O(log² n) rounds on ANY graph shape,
    where plain min-label propagation needs diameter rounds (a
    1M-node chain = 1M rounds). Same contract and fixpoint as
    :func:`connected_components`; use this variant when cluster
    diameters are unbounded (web graphs, citation chains).

    large-star(u): hang every neighbour v > u onto m = min(Γ(u)∪{u});
    small-star(u): hang every neighbour v <= u (and u) onto that min.
    Each round is two groupBy-min aggregations plus an equi-join,
    all keyed on node id; edges are localCheckpoint'ed per round so
    plan depth stays constant.
    """
    _require_numeric_ids(edges, [src, dst], "connected_components_star")
    if nodes is not None:
        _require_numeric_ids(nodes, [node_col], "connected_components_star")
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        if cur.isEmpty():
            converged = True
            break
        # ── large-star ──
        sym = _symmetrize(cur)
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("_mn"))
            .select("a", F.least(F.col("a"), F.col("_mn")).alias("m"))
        )
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # ── small-star ──
        sym2 = _symmetrize(large)
        smaller = sym2.where(F.col("b") <= F.col("a"))
        mins2 = (
            smaller.groupBy("a")
            .agg(F.min("b").alias("_mn"))
            .select("a", F.least(F.col("a"), F.col("_mn")).alias("m"))
        )
        hang = smaller.join(mins2, "a")
        small = (
            hang.select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionAll(hang.select(F.col("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        cur = small
        cs = _edge_checksum(cur)
        if cs == prev_sum:
            converged = True
            break
        prev_sum = cs
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not reach its fixpoint "
            f"within max_iter={max_iter} rounds (checksum still "
            f"moving); raise max_iter"
        )

    # At fixpoint every edge points node -> component root (min id).
    root = (
        _symmetrize(cur)
        .groupBy("a")
        .agg(F.min("b").alias("_mn"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("_mn")).alias("cluster_id"),
        )
    )
    if nodes is None:
        return root
    node_ids = nodes.select(F.col(node_col).alias("node")).distinct()
    return node_ids.join(root, "node", "left").select(
        "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
    )
