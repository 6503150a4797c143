"""Distributed global ranking (total order without a 1-partition window).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into ONE window partition — the canonical 100 TB
anti-pattern (Spark even logs a warning). The scalable construction is
two-phase, and this module packages it:

1. range-partition the data on the ordering key (one shuffle; the
   range exchange is what a global ``orderBy`` uses anyway), sort
   within partitions;
2. number rows within each partition, then add per-partition offsets
   (the cumulative count of all earlier partitions).

The per-partition counts are a ``#partitions``-row aggregate — the only
driver-side piece, bounded by cluster parallelism, not data size.
Ranks depend only on the total order, not on where the sampled range
boundaries land, so the result is deterministic on any layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    *,
    rank_name: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based dense global row number under a TOTAL order.

    ``order_by`` must be a total order (include a unique tie-breaker
    column) — otherwise ranks of ties are partition-placement-
    dependent, which this operator exists to avoid.
    """
    # Materialize the range shuffle once (localCheckpoint, the
    # dedup.py idiom — under AQE it runs the range exchange at THIS
    # call, which is load-bearing here, not a wart: the counts
    # collect below needs it anyway): the counts collect AND the
    # caller's action both consume it — unmaterialized, the dominant
    # range exchange would run twice, and _gr_pid assignments would
    # depend on two separate executions of a sampled partitioner.
    ranged = (
        (
            df.repartitionByRange(num_partitions, *order_by)
            if num_partitions
            else df.repartitionByRange(*order_by)
        )
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    w = Window.partitionBy("_gr_pid").orderBy(*order_by)
    numbered = ranged.withColumn("_gr_intra", F.row_number().over(w))

    # #partitions rows to the driver — bounded by parallelism.
    counts = {
        r["_gr_pid"]: r["n"]
        for r in numbered.groupBy("_gr_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if any(offsets.values()):
        offset_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        rank = F.coalesce(offset_map[F.col("_gr_pid")], F.lit(0)) + F.col(
            "_gr_intra"
        )
    else:
        # Empty input or everything in the first partition: all
        # offsets are zero (an empty create_map() is VOID-typed and
        # unusable as a lookup — skip it entirely).
        rank = F.col("_gr_intra")
    return numbered.withColumn(rank_name, rank.cast("bigint")).drop(
        "_gr_pid", "_gr_intra"
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D Pareto skyline: rows not dominated by any other row, where
    q dominates p iff q is ≤ on the minimized column, ≥ on the
    maximized column, and strictly better on at least one. Exact
    duplicates do not dominate each other (both survive).

    The naive formulation is a NOT EXISTS self-join — quadratic, the
    oracle's spec form. The scalable construction exploits the 2-D
    structure: p survives iff no cheaper row reaches its ``maximize``
    value, i.e. two running prefix-maxima over the ``minimize`` order
    decide every row. Like ``global_rank``, the prefix is computed in
    two phases so no single-partition window ever exists:
    range-partition on ``minimize`` (equal keys land in ONE partition
    — the range partitioner splits only between distinct values,
    which is what keeps the strict/non-strict prefixes separable),
    take per-partition prefix maxima over the distinct-value groups,
    then stitch partitions with a ≤#partitions-row offset map.

    Survive iff  max{maximize : minimize <  p} <  p.maximize   (no
    strictly-cheaper dominator) AND max{maximize : minimize ≤ p} ==
    p.maximize (no equal-cost dominator). Both prefixes depend only
    on the total order of ``minimize``, so the result is layout-
    independent."""
    # Same materialize-once rationale as global_rank: the pid_max
    # collect, the prefix windows, and the final join all consume the
    # ranged frame.
    ranged = (
        (
            df.repartitionByRange(num_partitions, F.col(minimize))
            if num_partitions
            else df.repartitionByRange(F.col(minimize))
        )
        .withColumn("_sk_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    groups = ranged.groupBy("_sk_pid", minimize).agg(
        F.max(maximize).alias("_sk_gmax")
    )
    w = Window.partitionBy("_sk_pid").orderBy(minimize)
    cum = groups.select(
        "_sk_pid",
        minimize,
        F.max("_sk_gmax")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_sk_le"),
        F.max("_sk_gmax")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_sk_lt"),
    )

    # ≤ #partitions rows to the driver — bounded by parallelism.
    pid_max = {
        r["_sk_pid"]: r["m"]
        for r in groups.groupBy("_sk_pid")
        .agg(F.max("_sk_gmax").alias("m"))
        .collect()
    }
    prev, acc = {}, None
    for pid in sorted(pid_max):
        prev[pid] = acc
        acc = pid_max[pid] if acc is None else max(acc, pid_max[pid])
    entries = [(k, v) for k, v in prev.items() if v is not None]
    if entries:
        prev_map = F.create_map(
            *[F.lit(x) for kv in entries for x in kv]
        )
        prev_col = prev_map[F.col("_sk_pid")]
        le = F.greatest(F.col("_sk_le"), prev_col)
        lt = F.greatest(F.col("_sk_lt"), prev_col)
    else:
        le, lt = F.col("_sk_le"), F.col("_sk_lt")
    bounds = cum.select(
        "_sk_pid", minimize, le.alias("_sk_LE"), lt.alias("_sk_LT")
    )

    out = ranged.join(bounds, ["_sk_pid", minimize]).where(
        (F.col("_sk_LT").isNull() | (F.col(maximize) > F.col("_sk_LT")))
        & (F.col(maximize) == F.col("_sk_LE"))
    )
    return out.drop("_sk_pid", "_sk_LE", "_sk_LT")
