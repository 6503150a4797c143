"""Temporal operators Spark lacks as built-ins: as-of join and
gap-based sessionization.

The reference has no temporal joins (SURVEY.md §2.3 — cross join +
window rank is its only join); these extend the engine's surface the
way a time-series workload needs (trades×quotes, event attribution).
Both are pure compositions of DataFrame ops — no UDFs, no collect.

``asof_join`` deliberately avoids the naive range-join (equi-join on
key then filter+argmax: |left|·|matches-per-key| intermediate rows).
Instead it unions both sides and runs ONE window pass per key ordered
by time, forward-filling the most recent right-side payload onto each
left row ("last observation carried forward"). Shuffle volume is
|left| + |right| rows — the plan that survives 100 TB. Skew note: the
window partitions by the join key; a hot key serializes into one task,
so extremely skewed keys should be pre-split by a coarse time bucket
(bucket boundaries then need a per-bucket seed row, not done here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    payload: Sequence[str],
    tie_breaker: str | None = None,
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the right
    row with the greatest ``right_on`` <= ``left_on`` within the same
    ``by`` key (backward as-of, DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` semantics). Left rows with no prior right row keep
    NULL payloads (left-outer).

    When several right rows share the max timestamp, the one with the
    greatest ``tie_breaker`` wins (pass one for determinism).
    """
    by = list(by)
    order_keys = [tie_breaker] if tie_breaker else []
    l_tag = left.select(
        *by,
        F.col(left_on).alias("_asof_ts"),
        F.lit(1).alias("_asof_src"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.struct(*[c for c in left.columns if c not in by]).alias("_l"),
    )
    r_tag = right.select(
        *by,
        F.col(right_on).alias("_asof_ts"),
        F.lit(0).alias("_asof_src"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
    )
    # Right rows sort before left rows at equal timestamps
    # (_asof_src 0 < 1), so an exactly-simultaneous right row is
    # visible to the left row — the <= in "right_on <= left_on".
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("_asof_ts").asc(),
            F.col("_asof_src").asc(),
            *[F.col(f"_p_{k}").asc_nulls_first() for k in order_keys],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *by,
        "_asof_ts",
        "_asof_src",
        "_l",
        *[F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_p_{c}") for c in payload],
    )
    out_left = [c for c in left.columns if c not in by]
    return filled.filter(F.col("_asof_src") == 1).select(
        *by,
        *[F.col(f"_l.{c}").alias(c) for c in out_left],
        *[F.col(f"_p_{c}").alias(c) for c in payload],
    )


def sessionize(
    events: DataFrame,
    *,
    by: Sequence[str],
    ts: str = "ts",
    gap: Column | None = None,
    gap_seconds: int = 1800,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``.

    One window pass (lag + running sum of session-start flags) over
    data shuffled once by key — the batch twin of Structured
    Streaming's ``session_window``. Gap comparison uses integer
    microseconds (``unix_micros``), exact and engine-portable.
    """
    by = list(by)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in tie_breakers]
    w = Window.partitionBy(*by).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    micros = F.unix_micros(F.col(ts))
    prev = F.lag(micros).over(w)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_new = F.when(prev.isNull() | ((micros - prev) > gap_us), 1).otherwise(0)
    return events.withColumn("session_idx", F.sum(is_new).over(wsum).cast("int"))
