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
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    ).withColumn("_gr_pid", F.spark_partition_id())

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
