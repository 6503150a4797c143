"""Temporal / reshaping queries: as-of join, sessionization, pivot,
exact percentiles — the time-series surface beyond the reference
(SURVEY.md §2.3 notes the reference has no temporal joins at all).
Oracles: DuckDB ASOF JOIN for the as-of query; plain window/CASE SQL
for the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skysafe_datalake_spark.operators.temporal import asof_join, sessionize
from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.relational import dsum, dsum_sql
from skysafe_datalake_spark.workload.tables import EVENTS_SQL, load, pround, pround_sql

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "asof_join_attrib",
    f"""
WITH e AS ({EVENTS_SQL}),
p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM e WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM e WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.click_ts) AS us_since_click
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
""",
)
def asof_join_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase ← the user's most recent
    click at-or-before it (backward as-of, left-outer). Implemented as
    the union + single-window forward-fill plan (operators/temporal.py)
    — shuffle volume |purchases| + |clicks|, never the range-join
    blowup; the oracle is DuckDB's native ASOF JOIN, a genuinely
    independent implementation of the same semantics."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="click_ts",
        payload=["click_id", "click_ts"],
        tie_breaker="click_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "click_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))).alias(
            "us_since_click"
        ),
    )


@register(
    "sessionize_events",
    f"""
WITH e AS ({EVENTS_SQL}),
g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, ts, value,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx
  FROM g
)
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       {dsum_sql('value')} AS sum_value
FROM s
GROUP BY user_id, session_idx
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) + per-session
    stats — the batch twin of Structured Streaming session_window.
    One shuffle for the per-user window; the session aggregation keys
    (user_id, session_idx) are a refinement of the window partitioning."""
    e = load(spark, sf_dir, "events")
    s = sessionize(e, by=["user_id"], ts="ts", gap_seconds=1800, tie_breakers=["event_id"])
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "pivot_wide",
    f"""
WITH e AS ({EVENTS_SQL})
SELECT user_id,
       {', '.join(dsum_sql(f"CASE WHEN event_type = '{t}' THEN value END") + f" AS {t}_sum" for t in EVENT_TYPES)}
FROM e
GROUP BY user_id
""",
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user value totals by event type.
    Explicit pivot values keep it a single-pass hash aggregation (no
    distinct-values pre-query); conditional-aggregation oracle."""
    e = load(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(dsum(F.col("value")))
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"{t}_sum") for t in EVENT_TYPES]
    )


@register(
    "percentile_stats",
    f"""
WITH e AS ({EVENTS_SQL}),
q AS (
  SELECT event_type,
         COUNT(*) AS n,
         quantile_cont(value, [0.25, 0.5, 0.9]) AS qs,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM e GROUP BY event_type
)
SELECT event_type, n,
       {pround_sql('qs[1]', 6)} AS p25,
       {pround_sql('qs[2]', 6)} AS p50,
       {pround_sql('qs[3]', 6)} AS p90,
       min_value, max_value
FROM q
""",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`, both linear interpolation; outputs
    quantized to 6 decimals since the engines' interpolation FP
    expression trees differ by ~1 ulp)."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, array(0.25D, 0.5D, 0.9D))").alias("qs"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return agg.select(
        "event_type",
        "n",
        pround(F.col("qs")[0], 6).alias("p25"),
        pround(F.col("qs")[1], 6).alias("p50"),
        pround(F.col("qs")[2], 6).alias("p90"),
        "min_value",
        "max_value",
    )


@register(
    "gap_detect",
    """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
),
d AS (
  SELECT user_id, ts AS gap_start,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_end
  FROM e
)
SELECT user_id, gap_start, gap_end,
       CAST(date_diff('second', gap_start, gap_end) AS BIGINT) AS gap_seconds
FROM d
WHERE gap_end IS NOT NULL
  AND date_diff('second', gap_start, gap_end) > 21600
""",
)
def gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-data detection: per-key gaps longer than 6 hours
    between consecutive events (the monitoring query behind 'did the
    feed stop?'). One window pass per key — same single-shuffle shape
    as sessionization; at scale the events table is already
    partitioned by key-bucket so the window sorts locally."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    gap_s = (F.unix_timestamp(nxt) - F.unix_timestamp(F.col("ts")))
    return (
        e.select(
            "user_id",
            F.col("ts").alias("gap_start"),
            nxt.alias("gap_end"),
            gap_s.alias("gap_seconds"),
        )
        .where(F.col("gap_end").isNotNull() & (F.col("gap_seconds") > 21600))
    )


# ─────────────────── OHLC time-series bars ───────────────────────

_OHLC_SQL = """
WITH e AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value
  FROM events
),
seq AS (
  SELECT event_type,
         date_trunc('hour', ts) AS bar,
         value,
         row_number() OVER w_asc AS rn_a,
         row_number() OVER w_desc AS rn_d
  FROM e
  WINDOW w_asc AS (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id),
         w_desc AS (PARTITION BY event_type, date_trunc('hour', ts)
                    ORDER BY ts DESC, event_id DESC)
)
SELECT event_type, bar,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM seq
GROUP BY event_type, bar
"""


@register("ohlc_bars", _OHLC_SQL)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation (the canonical time-series serving
    query): per (series, hour) the opening and closing tick plus
    high/low/volume. Open/close are first/last UNDER A TOTAL ORDER
    (ts with event_id tie-break) — Spark's first()/last() aggregates
    are partition-order-dependent and unusable here, so both are
    row_number picks folded into the same hash aggregation; high/low
    are plain MIN/MAX and volume an integer-cents sum.

    Scale shape: one corpus scan; the (series, bar) exchange is
    shared by both window passes (the second pass only re-sorts
    within unchanged partitions) before the final aggregation;
    nothing touches the driver.
    At stream time the same query runs per micro-batch with the
    incremental merge trick (open keeps the min-ts image, close the
    max) — the distributive shape incremental_agg_merge pins."""
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    bar = F.date_trunc("hour", F.col("ts"))
    w_asc = Window.partitionBy("event_type", bar).orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", bar).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = e.select(
        "event_type",
        bar.alias("bar"),
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return seq.groupBy("event_type", "bar").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").cast("bigint").alias("n_ticks"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


# ───────────── forward as-of join with tolerance ─────────────────

_ASOF_FWD_SQL = """
WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                  event_type FROM events),
v AS (SELECT event_id AS view_id, user_id, ts FROM e
      WHERE event_type = 'view'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM e
      WHERE event_type = 'purchase'),
matched AS (
  SELECT v.view_id, v.user_id, v.ts,
         (SELECT MIN(p.p_ts) FROM p
          WHERE p.user_id = v.user_id AND p.p_ts >= v.ts) AS mts
  FROM v
)
SELECT view_id, user_id,
       CASE WHEN mts <= ts + INTERVAL 2 HOUR
            THEN (SELECT MAX(p.purchase_id) FROM p
                  WHERE p.user_id = matched.user_id AND p.p_ts = mts)
            END AS purchase_id,
       CASE WHEN mts <= ts + INTERVAL 2 HOUR
            THEN CAST(date_diff('second', ts, mts) AS BIGINT)
            END AS secs_to_convert
FROM matched
"""


@register("asof_join_forward_tol", _ASOF_FWD_SQL)
def asof_join_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with a staleness bound: each view event
    attaches the NEXT purchase by the same user, but only if it lands
    within 2 hours — time-to-convert attribution, the mirror image of
    asof_join_attrib's backward last-touch. Same single union +
    window-pass plan (shuffle = |views| + |purchases| slim rows, no
    range join); the tolerance is a null-out post-pass on the carried
    match timestamp, not a plan change. Ties (several purchases at
    the matched second) resolve to the greatest purchase_id in both
    engines. The oracle states the spec as correlated MIN/MAX
    subqueries, which Catalyst-style decorrelation would turn into
    exactly the aggregation this operator hand-builds."""
    from skysafe_datalake_spark.operators.temporal import asof_join

    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    out = asof_join(
        views,
        purchases,
        by=["user_id"],
        left_on="ts",
        right_on="p_ts",
        payload=["purchase_id", "p_ts"],
        tie_breaker="purchase_id",
        direction="forward",
        tolerance="2 hours",
    )
    return out.select(
        "view_id",
        "user_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("secs_to_convert"),
    )


# ───────────── multi-touch (linear) attribution ──────────────────

_MTA_SQL = """
WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                  event_type, value FROM events),
c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM e
      WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM e WHERE event_type = 'purchase'),
touches AS (
  SELECT p.purchase_id, p.cents, c.click_id, c.c_ts,
         CAST(COUNT(*) OVER (PARTITION BY p.purchase_id) AS BIGINT)
           AS n_touch,
         CAST(row_number() OVER (
           PARTITION BY p.purchase_id ORDER BY c.c_ts, c.click_id
         ) AS BIGINT) AS touch_rank
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.c_ts <= p.p_ts
   AND c.c_ts >= p.p_ts - INTERVAL 24 HOUR
),
credits AS (
  SELECT click_id,
         cents // n_touch
           + CASE WHEN touch_rank <= cents % n_touch THEN 1 ELSE 0 END
           AS credit_cents
  FROM touches
)
SELECT click_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(credit_cents) AS BIGINT) AS credit_cents
FROM credits
GROUP BY click_id
"""


@register("multitouch_attribution", _MTA_SQL)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits its
    value equally across the user's clicks in the prior 24 h. The
    split is EXACT integer bookkeeping — each touch gets
    cents div n, and the earliest (cents mod n) touches get the
    leftover cent — so total credited cents equals total purchase
    cents to the cent (a float 1/n split leaks pennies that audits
    then chase; the conservation invariant is pinned by a test).
    Plan: one bounded interval join keyed on user (same shape as
    streaming_interval_join — at stream time the same query runs
    with watermark state), two windows partitioned by purchase
    (bounded fan-in), one final hash agg by click."""
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    touches = purchases.join(
        clicks,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
    )
    wp = Window.partitionBy("purchase_id")
    touches = touches.select(
        "purchase_id",
        "cents",
        "click_id",
        F.count("*").over(wp).cast("bigint").alias("n_touch"),
        F.row_number()
        .over(wp.orderBy("c_ts", "click_id"))
        .cast("bigint")
        .alias("touch_rank"),
    )
    credits = touches.select(
        "click_id",
        (
            F.expr("cents DIV n_touch")
            + F.when(
                F.col("touch_rank") <= F.col("cents") % F.col("n_touch"), 1
            ).otherwise(0)
        ).alias("credit_cents"),
    )
    return credits.groupBy("click_id").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum("credit_cents").cast("bigint").alias("credit_cents"),
    )
