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

from pyspark.sql import DataFrame, Window
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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the right
    row with the greatest ``right_on`` <= ``left_on`` within the same
    ``by`` key (``direction="backward"``, DuckDB ``ASOF JOIN`` /
    pandas ``merge_asof`` semantics), or the SMALLEST ``right_on`` >=
    ``left_on`` (``direction="forward"`` — next-event attribution,
    time-to-convert). Left rows with no matching right row keep NULL
    payloads (left-outer).

    ``tolerance`` (an INTERVAL string, e.g. ``"2 hours"``) bounds the
    match's staleness/lookahead: a match farther than the tolerance
    is nulled out, exactly like ``merge_asof(tolerance=...)`` — the
    guard a feature-attachment pipeline needs so a reading from last
    week never silently fills today's row. The bound is applied as a
    post-pass on the carried match timestamp, so the plan is
    unchanged: still one union + one window pass, shuffle volume
    |left| + |right|.

    When several right rows share the matched timestamp, the one with
    the greatest ``tie_breaker`` wins (pass one for determinism; it
    must be one of the ``payload`` columns, since the ordering reads
    it from the carried match).

    The match is carried as ONE struct — (matched timestamp, all
    payload fields) filled together — so every payload value comes
    from the single as-of row, and a matched row whose payload is
    legitimately NULL yields NULL (merge_asof semantics) instead of
    leaking a staler row's value through an independent
    ignorenulls fill.
    """
    from pyspark.sql.types import StructField, StructType

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    by = list(by)
    payload = list(payload)
    if tie_breaker is not None and tie_breaker not in payload:
        raise ValueError(
            f"tie_breaker {tie_breaker!r} must be one of the payload "
            f"columns {payload} (the ordering reads it from the "
            "carried match)"
        )
    match_type = StructType(
        [StructField("_mts", right.schema[right_on].dataType)]
        + [StructField(f"_p_{c}", right.schema[c].dataType) for c in payload]
    )
    l_tag = left.select(
        *by,
        F.col(left_on).alias("_asof_ts"),
        F.lit(1).alias("_asof_src"),
        F.lit(None).cast(match_type).alias("_asof_match"),
        F.struct(*[c for c in left.columns if c not in by]).alias("_l"),
    )
    r_tag = right.select(
        *by,
        F.col(right_on).alias("_asof_ts"),
        F.lit(0).alias("_asof_src"),
        F.struct(
            F.col(right_on).alias("_mts"),
            *[F.col(c).alias(f"_p_{c}") for c in payload],
        ).alias("_asof_match"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
    )
    # Right rows sort before left rows at equal timestamps
    # (_asof_src 0 < 1), so an exactly-simultaneous right row is
    # visible to the left row — the <= / >= is inclusive. For
    # "forward" the scan order is simply reversed: the most recent
    # right row seen walking BACKWARD through time is the nearest
    # following one.
    ts_order = (
        F.col("_asof_ts").asc()
        if direction == "backward"
        else F.col("_asof_ts").desc()
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(
            ts_order,
            F.col("_asof_src").asc(),
            *(
                [F.col(f"_asof_match._p_{tie_breaker}").asc_nulls_first()]
                if tie_breaker
                else []
            ),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *by,
        "_asof_ts",
        "_asof_src",
        "_l",
        F.last("_asof_match", ignorenulls=True).over(w).alias("_asof_match"),
    )
    if tolerance is not None:
        in_tol = (
            F.col("_asof_match._mts")
            >= F.col("_asof_ts") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("_asof_match._mts")
            <= F.col("_asof_ts") + F.expr(f"INTERVAL {tolerance}")
        )
        pick = [
            F.when(in_tol, F.col(f"_asof_match._p_{c}")).alias(c)
            for c in payload
        ]
    else:
        pick = [F.col(f"_asof_match._p_{c}").alias(c) for c in payload]
    out_left = [c for c in left.columns if c not in by]
    return filled.filter(F.col("_asof_src") == 1).select(
        *by,
        *[F.col(f"_l.{c}").alias(c) for c in out_left],
        *pick,
    )


def sessionize(
    events: DataFrame,
    *,
    by: Sequence[str],
    ts: str = "ts",
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


def scd2_build(
    changes: DataFrame,
    *,
    key: str,
    value: str,
    ts: str,
    seq: str,
) -> DataFrame:
    """Change stream → SCD Type-2 dimension history.

    Each per-key change becomes a validity interval [valid_from,
    valid_to) via ``lead`` over the (ts, seq)-ordered change sequence;
    the open interval is flagged ``is_current`` and versions number
    from 1. ``seq`` totally orders same-timestamp changes so the build
    is deterministic (and re-runnable). One shuffle keyed on ``key``.

    The ``seq`` column is kept in the output — it is what makes
    :func:`scd2_merge` able to reconstruct the exact change order when
    folding new batches in.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts, seq)
    return changes.select(
        F.col(key),
        F.col(value).alias("attr_value"),
        F.col(ts).alias("valid_from"),
        F.col(seq).alias("change_seq"),
        F.lead(ts).over(w).alias("valid_to"),
        F.lead(ts).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    )


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    value: str,
    ts: str,
    seq: str,
) -> DataFrame:
    """MERGE a change batch into an existing SCD2 history — the
    incremental twin of :func:`scd2_build`, with the associativity
    guarantee ``merge(build(A), B) == build(A ∪ B)``.

    Scale shape mirrors the bucketed keyed upsert: keys untouched by
    the batch pass through without being read beyond the anti-join
    probe; only the touched keys' interval chains are reconstructed
    (their history rows reduced back to change events, unioned with
    the batch, re-sequenced). Work is O(touched history + batch), not
    O(history) — with the history table partitioned by key-bucket the
    anti/semi joins prune to touched buckets exactly like
    ``plans.usage.upsert_partitioned``.
    """
    affected = changes.select(F.col(key)).distinct()
    untouched = history.join(F.broadcast(affected), key, "left_anti")
    touched = history.join(F.broadcast(affected), key, "left_semi")
    replay = touched.select(
        F.col(key),
        F.col("attr_value").alias(value),
        F.col("valid_from").alias(ts),
        F.col("change_seq").alias(seq),
    ).unionByName(changes.select(key, value, ts, seq))
    rebuilt = scd2_build(replay, key=key, value=value, ts=ts, seq=seq)
    return untouched.unionByName(rebuilt)
