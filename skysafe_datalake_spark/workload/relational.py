"""Relational core operators (SURVEY.md §2.2–2.8) over the driver's
TPC-H-ish tables.

The reference implements only a narrow slice of these (P1-P7, A1-A4,
W1, J1-J2); a complete engine exposes the full relational surface, so
each family gets an oracle-checked query here.

Cross-engine float determinism: every fractional aggregate routes
through DECIMAL sums (exact, order-insensitive), one double division,
and a final round — see workload/__init__ docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skysafe_datalake_spark.plans.materialize import materialize_bounded
from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.tables import EVENTS_SQL, load, pround, pround_sql


def dsum(col: F.Column, scale: int = 2) -> F.Column:
    """Exact sum: DECIMAL(18,s) partial+final aggregation, surfaced as
    double. Decimal addition is associative, so the result does not
    depend on partitioning/merge order — the property that makes
    value-hash parity possible at any cluster size."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


# ───────────────────────── projections / filters (P1-P7) ─────────


@register(
    "filter_project",
    """
SELECT l_orderkey AS orderkey,
       l_linenumber AS linenumber,
       l_quantity AS qty,
       floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) / 10000.0 AS net_price,
       l_returnflag AS returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_discount > 0.02
  AND l_quantity < 25
""",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection + rename (P1/P4/P7); predicates and the
    2-column read schema push down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") > 0.02)
        & (F.col("l_quantity") < 25)
    ).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("qty"),
        pround(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        F.col("l_returnflag").alias("returnflag"),
    )


# ───────────────────────── aggregations (A1-A3) ──────────────────


@register(
    "pricing_summary",
    f"""
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS sum_disc_price,
       floor(({dsum_sql('l_quantity')} / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
       floor(({dsum_sql('l_extendedprice')} / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (A1): hash agg with
    map-side partial combine; AQE coalesces the tiny shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            pround(dsum(F.col("l_quantity")) / F.count(F.lit(1)), 4).alias("avg_qty"),
            pround(dsum(F.col("l_extendedprice")) / F.count(F.lit(1)), 4).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "global_stats",
    f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_quantity * l_quantity', 4)} AS sxx
  FROM lineitem
)
SELECT floor((sx / n) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
       floor(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) * 10000.0 + 0.5) / 10000.0 AS stddev_qty,
       CAST(n AS BIGINT) AS n_rows
FROM s
""",
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global grand-total aggregation (A2) — the reference's μ/σ
    pattern for dynamic anomaly thresholds, computed with exact
    decimal sums so the sample stddev is reproducible bit-for-bit
    on any partitioning (Spark's stddev_samp is merge-order
    sensitive; this formulation is not)."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("sx"),
        dsum(q * q, 4).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    return s.select(
        pround(sx / n, 4).alias("avg_qty"),
        pround(F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))), 4).alias(
            "stddev_qty"
        ),
        n.cast("bigint").alias("n_rows"),
    )


@register(
    "count_distinct",
    """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderpriority
""",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (beyond the reference — §2.4 'not
    implemented' row): expand-based distinct agg under AQE."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "grouping_rollup",
    """
SELECT n_name AS nation,
       c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       floor((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""",
)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-level aggregation (engine capability beyond the
    reference's flat groupBy)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return joined.rollup(
        F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        pround(dsum(F.col("c_acctbal")) / F.count(F.lit(1)), 4).alias("avg_acctbal"),
    )


# ───────────────────────── windows / top-k (W1, §2.6) ────────────


@register(
    "window_topk_per_group",
    """
SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) t
WHERE rnk <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (W1) + rank filter (P2): the reference's
    top-1-per-key pattern generalized to top-3, with a unique
    tie-breaker for determinism."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rnk",
        )
    )


@register(
    "window_running_sum",
    """
SELECT user_id,
       event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window (rowsBetween — beyond the reference's only
    window W1): exact decimal running sum per user."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    )


@register(
    "topk_global",
    """
SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (§2.6): TakeOrderedAndProject — per-partition
    heaps, only k rows cross the wire to the driver-side merge."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# ───────────────────────── joins (J1-J2 + full surface) ──────────


@register(
    "join_multiway",
    f"""
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS n_customers,
       {dsum_sql('c_acctbal')} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join + agg: both dims broadcast (no shuffle for
    the joins; the only exchange is the final tiny agg)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


@register(
    "join_left_outer",
    f"""
SELECT c_custkey AS custkey,
       COUNT(o_orderkey) AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders; COUNT of
    a nullable column + decimal SUM over nulls (→ NULL) must agree
    with the oracle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_spent"),
        )
    )


@register(
    "join_semi_anti",
    """
SELECT c.c_custkey AS custkey, c.c_name AS name,
       (CASE WHEN o.o_custkey IS NOT NULL THEN TRUE ELSE FALSE END) AS has_urgent_order
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON c.c_custkey = o.o_custkey
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join surface: exists-flag per customer. Spark side
    uses a real LEFT SEMI + LEFT ANTI union to exercise both
    physical operators (results equal the exists-flag formulation)."""
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cond = c.c_custkey == urgent.o_custkey
    with_o = c.join(urgent, cond, "left_semi").withColumn(
        "has_urgent_order", F.lit(True)
    )
    without_o = c.join(urgent, cond, "left_anti").withColumn(
        "has_urgent_order", F.lit(False)
    )
    return with_o.unionByName(without_o).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        "has_urgent_order",
    )


@register(
    "join_theta_range",
    """
SELECT s_suppkey AS suppkey, COUNT(*) AS n_parts
FROM supplier JOIN part
  ON p_retailprice BETWEEN s_acctbal - 100.0 AND s_acctbal + 100.0
GROUP BY s_suppkey
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join — not in the reference (§2.3 'not
    implemented'); broadcast nested-loop with the small side hinted."""
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part")
    cond = (F.col("p_retailprice") >= F.col("s_acctbal") - 100.0) & (
        F.col("p_retailprice") <= F.col("s_acctbal") + 100.0
    )
    return (
        p.join(F.broadcast(s), cond)
        .groupBy(F.col("s_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ───────────────────────── set operations (§2.7) ─────────────────


@register(
    "set_operations",
    """
WITH c_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT 'both' AS side, nationkey FROM (
    SELECT nationkey FROM c_nations INTERSECT SELECT nationkey FROM s_nations)
UNION ALL
SELECT 'customer_only' AS side, nationkey FROM (
    SELECT nationkey FROM c_nations EXCEPT SELECT nationkey FROM s_nations)
UNION ALL
SELECT 'supplier_only' AS side, nationkey FROM (
    SELECT nationkey FROM s_nations EXCEPT SELECT nationkey FROM c_nations)
""",
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT in one result (§2.7 — absent
    from the reference)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    # Materialize each distinct key set ONCE (lazy persist; ≤ |nation|
    # = 25 rows each — see plans/materialize.py for the
    # localCheckpoint-vs-persist tradeoff). Three consumers per side
    # (INTERSECT + two EXCEPTs) each re-ran the full customer/supplier
    # scan + distinct without this cut.
    c = materialize_bounded(c)
    s = materialize_bounded(s)
    both = c.intersect(s).select(F.lit("both").alias("side"), "nationkey")
    c_only = c.exceptAll(s).select(F.lit("customer_only").alias("side"), "nationkey")
    s_only = s.exceptAll(c).select(F.lit("supplier_only").alias("side"), "nationkey")
    return both.unionByName(c_only).unionByName(s_only)


# ───────────────────────── scalar functions (F2-F6) ──────────────


@register(
    "conditional_decode",
    """
SELECT o_orderkey AS orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 0
            WHEN o_orderpriority = '2-HIGH' THEN 1
            WHEN o_orderpriority = '3-MEDIUM' THEN 2
            WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 3
            WHEN o_orderpriority = '5-LOW' THEN 4
            ELSE NULL END AS priority_id,
       CASE WHEN o_orderstatus = 'F' THEN 'FINISHED'
            WHEN o_orderstatus = 'O' THEN 'OPEN'
            ELSE 'PENDING' END AS status_label
FROM orders
""",
)
def conditional_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN decode maps (F2) — the reference's position-source
    and phase-id decode pattern (src/format_flights.py:155-162)."""
    o = load(spark, sf_dir, "orders")
    priority_id = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 0)
        .when(F.col("o_orderpriority") == "2-HIGH", 1)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 2)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 3)
        .when(F.col("o_orderpriority") == "5-LOW", 4)
        .otherwise(F.lit(None).cast("int"))
    )
    status_label = (
        F.when(F.col("o_orderstatus") == "F", "FINISHED")
        .when(F.col("o_orderstatus") == "O", "OPEN")
        .otherwise("PENDING")
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        priority_id.alias("priority_id"),
        status_label.alias("status_label"),
    )


@register(
    "datetime_bucketing",
    f"""
WITH e AS ({EVENTS_SQL})
SELECT date_trunc('hour', ts) AS hour_bucket,
       event_type,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM e
GROUP BY date_trunc('hour', ts), event_type
""",
)
def datetime_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation (F5 + §2.10 batch
    equivalent): date_trunc bucket per hour x type."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "string_cleaning",
    """
SELECT p_partkey AS partkey,
       nullif(trim(upper(p_name)), '') AS name_clean,
       coalesce(p_size, 0) AS size_filled,
       substr(p_type, 1, 6) AS type_prefix,
       length(p_name) AS name_len
FROM part
""",
)
def string_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String cleaning in-engine (F6: trim-to-null, lenient casts,
    coalesce imputation — reference does this driver-side)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.nullif(F.trim(F.upper(F.col("p_name"))), F.lit("")).alias("name_clean"),
        F.coalesce(F.col("p_size"), F.lit(0)).alias("size_filled"),
        F.substring(F.col("p_type"), 1, 6).alias("type_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
    )


@register(
    "json_extraction",
    """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
FROM events
""",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON field extraction from the raw
    props column (the reference flattens raw JSON driver-side;
    in-engine extraction is the scalable equivalent)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_value"),
    )


# ───────────────────────── anomaly threshold (M7, relational) ────


@register(
    "anomaly_threshold",
    f"""
WITH stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('value')} AS sx,
         {dsum_sql('value * value', 4)} AS sxx
  FROM events
),
thr AS (
  SELECT (sx / n) + 2.0 * sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) AS threshold
  FROM stats
)
SELECT event_id, value, (value > threshold) AS is_anomaly
FROM events CROSS JOIN thr
""",
)
def anomaly_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's two-pass μ+2σ dynamic threshold (M7,
    src/combine_spark.py:366-384) as a pure relational pattern:
    global stats (exact decimal sums) broadcast back over the rows."""
    e = load(spark, sf_dir, "events")
    v = F.col("value")
    stats = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(v).alias("sx"),
        dsum(v * v, 4).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    thr = stats.select(
        (
            (sx / n)
            + F.lit(2.0) * F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0))))
        ).alias("threshold")
    )
    return e.crossJoin(F.broadcast(thr)).select(
        "event_id", "value", (v > F.col("threshold")).alias("is_anomaly")
    )


# ───────────────────────── nested JSON + corrupt tolerance ───────


@register(
    "json_nested_flatten",
    """
WITH raw AS (
  SELECT event_id,
         '{"meta":{"k":' || CAST(event_id % 100 AS VARCHAR)
           || ',"tags":["t' || CAST(event_id % 3 AS VARCHAR)
           || '","u"]},"vals":[' || CAST(event_id % 7 AS VARCHAR)
           || ',' || CAST((event_id % 7) * 2 AS VARCHAR) || ']}' AS full_js
  FROM events
),
js AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0
              THEN substr(full_js, 1, len(full_js) - 3)
              ELSE full_js END AS doc
  FROM raw
)
SELECT event_id,
       json_valid(doc) AS is_valid,
       CASE WHEN json_valid(doc)
            THEN CAST(json_extract_string(doc, '$.meta.k') AS BIGINT) END AS k,
       CASE WHEN json_valid(doc)
            THEN json_extract_string(doc, '$.meta.tags[0]') END AS tag0,
       CASE WHEN json_valid(doc)
            THEN CAST(json_array_length(doc, '$.vals') AS BIGINT) END AS n_vals,
       CASE WHEN json_valid(doc)
            THEN CAST(json_extract_string(doc, '$.vals[0]') AS BIGINT) END AS val0
FROM js
""",
)
def json_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested semi-structured parsing with corrupt-record tolerance:
    a two-level JSON document (struct inside struct, two arrays) is
    parsed by from_json under PERMISSIVE semantics — malformed rows
    (every 10th doc is truncated) yield NULL rather than failing the
    job, the engine-side analog of the reference's per-point
    HTTP-error tolerance (/root/reference/src/extract_weather.py:92:
    skip the bad record, keep the batch). Fields, array elements, and
    array lengths flatten to typed columns in one codegen projection;
    the oracle replays the same docs through DuckDB's JSON path
    functions guarded by json_valid.

    Scale shape: parsing is per-row JVM code (Jackson inside
    whole-stage codegen) — no shuffle, no Python; schema is explicit
    so Catalyst prunes unread JSON fields (Spark pushes required-only
    field parsing into from_json)."""
    e = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    full_js = F.concat(
        F.lit('{"meta":{"k":'),
        (eid % 100).cast("string"),
        F.lit(',"tags":["t'),
        (eid % 3).cast("string"),
        F.lit('","u"]},"vals":['),
        (eid % 7).cast("string"),
        F.lit(","),
        ((eid % 7) * 2).cast("string"),
        F.lit("]}"),
    )
    doc = F.when(
        eid % 10 == 0, F.expr("substr(full_js, 1, length(full_js) - 3)")
    ).otherwise(F.col("full_js"))
    schema = "struct<meta:struct<k:bigint,tags:array<string>>,vals:array<bigint>>"
    parsed = (
        e.select("event_id", full_js.alias("full_js"))
        .select("event_id", doc.alias("doc"))
        .select("event_id", F.from_json("doc", schema).alias("j"))
    )
    ok = F.col("j").isNotNull() & F.col("j.meta").isNotNull()
    return parsed.select(
        "event_id",
        ok.alias("is_valid"),
        F.when(ok, F.col("j.meta.k")).alias("k"),
        F.when(ok, F.col("j.meta.tags")[0]).alias("tag0"),
        F.when(ok, F.size("j.vals").cast("bigint")).alias("n_vals"),
        F.when(ok, F.col("j.vals")[0]).alias("val0"),
    )


# ───────────────────────── distributed global ranking ────────────


@register(
    "global_rank_ranged",
    """
SELECT c_custkey AS custkey,
       CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents,
       CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
            AS BIGINT) AS rank
FROM customer
""",
)
def global_rank_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row numbering under a total order WITHOUT the
    1-partition window (operators/ranking.global_rank): range
    partition on the ordering key, number within partitions, add
    per-partition offsets — the offsets are a #partitions-row
    aggregate, the only driver-touching piece, bounded by
    parallelism rather than data size. The oracle is the naive
    row_number() OVER (ORDER BY ...), so the two-phase construction
    must reproduce the exact total order (acctbal DESC with custkey
    tie-break makes it total)."""
    from skysafe_datalake_spark.operators.ranking import global_rank

    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("bigint").alias("cents"),
        "c_acctbal",
    )
    ranked = global_rank(
        c,
        [F.col("c_acctbal").desc(), F.col("custkey")],
        rank_name="rank",
    )
    return ranked.select("custkey", "cents", "rank")
