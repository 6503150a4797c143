"""Nearest-neighbor (top-k by distance) join — the reference's
signature operator (``/root/reference/src/combine_spark.py:104-122``:
crossJoin + Haversine + row_number per key, keep rank 1).

Spark-first re-expression with two physical strategies:

``argmin`` (default for k=1)
    broadcast cross join → per-row distance → ``groupBy(keys).agg(
    min(struct(order, payload)))``. Hash aggregation with MAP-SIDE
    PARTIAL COMBINE: each task reduces its |right| candidates per key
    to 1 *before* the shuffle, so the exchange carries exactly one row
    per left row regardless of |right|. No sort, no window. This is
    the plan that survives 100 TB: shuffle volume == |left|.

``window`` (generic k ≥ 1)
    broadcast cross join → ``row_number() OVER (PARTITION BY keys
    ORDER BY dist)`` → ``rank <= k``. Shuffles |left|·|right| rows;
    use only for small inputs or k > 1.

For a right side too large to broadcast, pre-bucket both sides with
:func:`skysafe_datalake_spark.functions.geo.grid_cell` and equi-join
on candidate cells before applying this operator per cell.

Determinism: ties on distance are broken by ``tie_breakers`` (total
order), so results are reproducible across engines and runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nearest_neighbor_join(
    left: DataFrame,
    right: DataFrame,
    partition_by: Sequence[str],
    distance: Column,
    *,
    k: int = 1,
    distance_name: str = "dist_km",
    order_by: Column | None = None,
    tie_breakers: Sequence[str] = (),
    broadcast_right: bool = True,
    strategy: str = "auto",
    rank_name: str | None = None,
) -> DataFrame:
    """Join each left row to its k nearest right rows.

    Parameters
    ----------
    partition_by : left-side key columns identifying a left row.
    distance : Column expression over columns of both sides.
    order_by : optional expression to rank by (defaults to the raw
        distance). Pass e.g. ``F.round(col, 6)`` to make ranking
        robust to sub-microscale FP divergence across engines.
    tie_breakers : right-side columns appended to the ordering for a
        total (deterministic) order.
    rank_name : if set, keep the 1-based neighbour rank under this
        column name. On the k=1 argmin path the rank is trivially 1
        and is emitted as a literal so downstream projections work
        identically under either strategy.
    """
    right_in = F.broadcast(right) if broadcast_right else right
    joined = left.crossJoin(right_in).withColumn(distance_name, distance)
    rank_on = order_by if order_by is not None else F.col(distance_name)

    if strategy == "auto":
        strategy = "argmin" if k == 1 else "window"

    if strategy == "argmin":
        if k != 1:
            raise ValueError("argmin strategy supports only k=1")
        payload = [c for c in joined.columns if c not in partition_by]
        ordered = joined.select(
            *partition_by,
            F.struct(
                rank_on.alias("_ord"),
                *[F.col(c).alias(f"_t{i}") for i, c in enumerate(tie_breakers)],
                F.struct(*payload).alias("_row"),
            ).alias("_s"),
        )
        best = ordered.groupBy(*partition_by).agg(F.min("_s").alias("_m"))
        out = best.select(
            *partition_by, *[F.col(f"_m._row.{c}").alias(c) for c in payload]
        )
        if rank_name is not None:
            out = out.withColumn(rank_name, F.lit(1).cast("int"))
        return out

    w = Window.partitionBy(*partition_by).orderBy(
        rank_on.asc(), *[F.col(c).asc() for c in tie_breakers]
    )
    ranked = joined.withColumn("_nn_rank", F.row_number().over(w)).filter(
        F.col("_nn_rank") <= k
    )
    if rank_name is None:
        return ranked.drop("_nn_rank")
    return ranked.withColumnRenamed("_nn_rank", rank_name)
