"""Statistical + serving-style analytics operators.

The reference's serving layer (Kibana dashboard,
/root/reference/src/dashboard/kibana_dashboard_config.ndjson line 2;
SURVEY.md §2.12) issues terms-agg/histogram read queries against the
usage layer — here they are first-class engine queries. Plus the
statistics a quality/monitoring pipeline needs beyond avg/stddev
(correlation, regression slope), a forward-fill gap filler for
sensor-style time series, full-outer join coverage, and TF-IDF term
scoring over the documents corpus. All DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skysafe_datalake_spark.operators.graph import (
    cooccurrence_pairs,
    pairs_from_item_sets,
)
from skysafe_datalake_spark.plans.materialize import materialize_bounded, persist_hot
from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.relational import dsum, dsum_sql
from skysafe_datalake_spark.workload.tables import EVENTS_SQL, load, pround


@register(
    "stats_correlation",
    f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity * l_extendedprice', 4)} AS sxy,
         {dsum_sql('l_quantity * l_quantity', 4)} AS sxx,
         {dsum_sql('l_extendedprice * l_extendedprice', 4)} AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       floor(((sxy - sx * sy / n) / (n - 1.0)) * 10000.0 + 0.5) / 10000.0 AS covar_qty_price,
       floor(((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) * 1000000.0 + 0.5) / 1000000.0 AS corr_qty_price,
       floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000.0 + 0.5) / 1000000.0 AS slope_price_per_qty
FROM s
""",
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped second-moment statistics — sample covariance, Pearson
    correlation, and OLS slope — from one pass of exact decimal sums
    (n, Σx, Σy, Σxy, Σx², Σy²). Spark's builtin corr/covar_samp are
    merge-order sensitive (float partials), so at 1000 executors two
    runs can differ in the last bits; sufficient-statistics over
    DECIMAL are associative, making the result partitioning-invariant
    — and the six sums cost one map-side-combined shuffle, same as a
    single avg."""
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("sx"),
        dsum(p).alias("sy"),
        dsum(q * p, 4).alias("sxy"),
        dsum(q * q, 4).alias("sxx"),
        dsum(p * p, 4).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        pround((sxy - sx * sy / n) / (n - F.lit(1.0)), 4).alias("covar_qty_price"),
        pround(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        pround((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias(
            "slope_price_per_qty"
        ),
    )


@register(
    "histogram_fixed_width",
    """
SELECT CAST(floor(o_totalprice / 25000.0) AS INTEGER) AS bucket,
       floor(o_totalprice / 25000.0) * 25000.0 AS bucket_lo,
       (floor(o_totalprice / 25000.0) + 1.0) * 25000.0 AS bucket_hi,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1, 2, 3
""",
)
def histogram_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — the dashboard's range-bucketed anomaly
    table (SURVEY.md §2.12) as an engine query. Bucketing is a pure
    projection (floor of a division), so the whole query is one
    map-side-combined hash aggregate on the bucket id: ~40 groups
    regardless of input size, no second shuffle, trivially
    broadcastable to a serving store."""
    o = load(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / F.lit(25000.0))
    return (
        o.select(
            b.cast("int").alias("bucket"),
            (b * F.lit(25000.0)).alias("bucket_lo"),
            ((b + F.lit(1.0)) * F.lit(25000.0)).alias("bucket_hi"),
            "o_totalprice",
        )
        .groupBy("bucket", "bucket_lo", "bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "terms_agg_topn",
    f"""
WITH e AS ({EVENTS_SQL})
SELECT event_type, COUNT(*) AS n_events
FROM e
GROUP BY event_type
ORDER BY n_events DESC, event_type
LIMIT 3
""",
)
def terms_agg_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms aggregation + top-N — the Kibana donut panel (top-3
    flight_phase by count, SURVEY.md §2.12) generalized. Hash agg
    with partial combine, then TakeOrderedAndProject: only the
    per-partition top-3 of the (tiny) agg output travels to the
    driver, never a global sort. Tie-broken on the term so the cut
    is deterministic."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), "event_type")
        .limit(3)
    )


@register(
    "gap_fill_forward",
    f"""
WITH e AS ({EVENTS_SQL})
SELECT event_id, user_id,
       CASE WHEN event_type = 'error' THEN NULL ELSE value END AS raw_value,
       last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM e
""",
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF) gap filling for sensor-style series:
    ``last(value, ignorenulls=True)`` over a running row frame
    carries the most recent valid reading across gaps (here: 'error'
    events masked to NULL). One shuffle by key; the running frame is
    computed in a single ordered pass per partition — the standard
    time-series imputation primitive the reference's minute-cadence
    weather feed would need at scale."""
    e = load(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        masked.alias("raw_value"),
        F.last(masked, ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "join_full_outer",
    """
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       c.n_customers,
       s.n_suppliers
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
      FROM customer WHERE c_mktsegment = 'BUILDING'
      GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey) s
ON c.nk = s.nk
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (completes the join-type matrix with
    join_left_outer / join_semi_anti / join_theta_range): aggregate
    first, join after — both sides shrink to ≤25 rows before the
    join, so the shuffle moves group counts, not base rows. Full
    outer forces a real shuffle join (broadcast cannot preserve
    unmatched right rows), which is exactly what AQE picks."""
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c["nk"] == s["nk"], "full_outer").select(
        F.coalesce(c["nk"], s["nk"]).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@register(
    "tfidf_top_terms",
    """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf_cnt FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df_cnt FROM tf GROUP BY term
),
n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
),
scored AS (
  SELECT tf.doc_id, tf.term,
         floor((CAST(tf.tf_cnt AS DOUBLE) * ln(n.n_docs / CAST(df.df_cnt AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tfidf FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic relevance /
    keyword-extraction primitive over the corpus, UDF-free:
    tokenize with the same regexp as token_count, count (doc, term)
    pairs, broadcast the (small) document-frequency table back onto
    them, score, window-rank per doc. At 100 TB the df table is
    bounded by vocabulary size (≪ corpus), so the scoring join stays
    a broadcast; the only big shuffles are the two hash aggregations
    on (doc_id, term) and the rank by doc_id. Scores are rounded to
    1e-6 before ranking so a sub-ulp ln() divergence between libm
    implementations can never flip the cut."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf_cnt"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_cnt"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            pround(
                F.col("tf_cnt").cast("double")
                * F.log(F.col("n_docs") / F.col("df_cnt").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .drop("_rn")
    )


@register(
    "rollup_hierarchy",
    f"""
WITH e AS ({EVENTS_SQL}),
minute_agg AS (
  SELECT date_trunc('minute', ts) AS minute_ts,
         COUNT(*) AS n_events,
         {dsum_sql('value')} AS sum_value
  FROM e GROUP BY date_trunc('minute', ts)
)
SELECT date_trunc('hour', minute_ts) AS hour_ts,
       COUNT(*) AS n_minutes,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       {dsum_sql('sum_value')} AS sum_value
FROM minute_agg
GROUP BY date_trunc('hour', minute_ts)
""",
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (hypertable continuous-aggregate
    pattern): the hour level is computed FROM the minute pre-aggregate,
    not from raw rows — at 100 TB the minute table is ~1e4× smaller
    than the events it summarizes, so every coarser grain (hour, day,
    month) costs a shuffle of pre-aggregated rows only. Decimal sums
    keep re-aggregation exact: sum-of-minute-sums equals the direct
    hour sum bit-for-bit on any partitioning."""
    e = load(spark, sf_dir, "events")
    minute = e.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_ts")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )
    return minute.groupBy(
        F.date_trunc("hour", F.col("minute_ts")).alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum("n_events").alias("n_events"),
        dsum(F.col("sum_value")).alias("sum_value"),
    )


@register(
    "fuzzy_levenshtein_match",
    """
WITH p AS (SELECT p_partkey, p_name, p_brand FROM part WHERE p_partkey < 300)
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       a.p_name AS a_name, b.p_name AS b_name,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
)
def fuzzy_levenshtein_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: equi-join on a blocking key (brand)
    first, THEN the quadratic edit-distance check only within blocks
    — the record-linkage shape that survives scale (never
    all-pairs levenshtein; the blocking join keeps candidate pairs
    linear-ish and shuffle-partitioned by block). Bounded to
    p_partkey < 300 for the gate; at scale the block key would be a
    coarser sort-key prefix or phonetic code."""
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_partkey") < 300)
        .select("p_partkey", "p_name", "p_brand")
    )
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
        F.col("p_brand").alias("brand"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        F.col("p_brand").alias("brand"),
    )
    return (
        a.join(b, "brand")
        .where(F.col("a_key") < F.col("b_key"))
        .select(
            "a_key",
            "b_key",
            "a_name",
            "b_name",
            F.levenshtein("a_name", "b_name").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 4)
    )


@register(
    "collect_ordered",
    """
SELECT c_nationkey AS nationkey,
       COUNT(*) AS n_customers,
       string_agg(c_name, ',' ORDER BY c_name) AS members
FROM customer
WHERE c_custkey < 500
GROUP BY c_nationkey
""",
)
def collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect_list order is
    partition-arrival order (nondeterministic on a cluster), so the
    engine contract is collect → sort_array → join — identical output
    on any partitioning, matching the oracle's ORDER BY'd string_agg.
    Bounded input (c_custkey < 500): unbounded per-group collects are
    an anti-pattern at scale — cap, window-rank, or sketch instead."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias("members"),
    )


@register(
    "window_range_frame",
    f"""
WITH e AS ({EVENTS_SQL})
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame — 'events in the trailing hour
    per user', the sliding-window primitive ROWS frames can't express
    (frame width follows event-time density, not row count). Ordered
    on epoch micros so both engines draw identical frame boundaries;
    the frame sum goes through DECIMAL so trailing-window results are
    identical on any partitioning. One shuffle by user; at 100 TB
    pair with partition pruning on the time column so the frame only
    scans the relevant span."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
    )


@register(
    "tpch_q3_like",
    f"""
SELECT l_orderkey,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dimension filter
    → 3-way join → grouped revenue → global top-10. The plan story at
    scale: both join filters push into the scans, the filtered
    customer side hash-joins orders, revenue aggregates with map-side
    partials keyed on l_orderkey, and the ORDER BY+LIMIT becomes
    TakeOrderedAndProject (per-partition top-10, never a global
    sort). Revenue through decimal sums; ties broken on l_orderkey so
    the top-10 cut is deterministic."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("tpch_q5_like_sql", _Q5_SQL)
def tpch_q5_like_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface itself: the engine registers its tables as temp
    views and executes a raw ANSI string through spark.sql — the SAME
    string the DuckDB oracle runs (SURVEY.md §3: one IR means df-API
    and SQL come for free). Q5 shape: 6-way join with a selective
    region filter — Catalyst gets to reorder joins, push both filters
    into the scans, and broadcast the three dimension tables; decimal
    revenue sums keep the aggregate partitioning-invariant."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5_SQL)


# ─────────────────── iterative graph analytics ───────────────────

_PR_ITERS = 8
_PR_TOTAL = 10**12  # fixed-point mass: 1.0 == 10^12 'ppb' units

_PR_GRAPH_SQL = """
pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000000 AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
base AS (SELECT CAST({total} AS BIGINT) // COUNT(*) AS b FROM nodes),
r0 AS (SELECT node, (SELECT b FROM base) AS r FROM nodes)
""".replace("{total}", str(_PR_TOTAL))


def _pr_iter_cte(i: int) -> str:
    return f"""
r{i} AS (
  SELECT nd.node,
         CAST((15 * (SELECT b FROM base)
          + 85 * COALESCE(s.sum_in, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS r
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.r // d.outdeg) AS BIGINT) AS sum_in
    FROM edges e
    JOIN r{i - 1} p ON p.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst
  ) s ON s.node = nd.node
)"""


_PR_SQL = (
    "WITH "
    + _PR_GRAPH_SQL
    + ","
    + ",".join(_pr_iter_cte(i) for i in range(1, _PR_ITERS + 1))
    + f"\nSELECT node, r AS rank_ppb FROM r{_PR_ITERS}"
)


# Last pagerank_integer storage-level decision (same diagnostic
# pattern as plans/pipeline.LAST_STAGE_SECONDS): scale_smoke logs and
# tests read it to PROVE the adaptive DISK_ONLY branch fires at the
# scale it exists for, instead of trusting the threshold by eye.
LAST_PAGERANK_CHECKPOINT: dict[str, object] = {}


@register("pagerank_integer", _PR_SQL)
def pagerank_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier bipartite graph (edges =
    who traded with whom via orders×lineitem), 8 synchronous
    iterations, damping 0.85 — in EXACT FIXED-POINT INTEGER
    arithmetic: ranks are parts-per-10^12 bigints, per-edge
    contributions use integer division, and the damping step is
    (15·base + 85·Σ) // 100. Why: float PageRank sums incoming mass
    in partition order and can't hash-match across engines; integer
    sums are associative, so the result is bit-identical on any
    cluster layout AND against the oracle's unrolled-CTE twin.

    Scale shape (r14): per iteration one equi-join (edges ⋈ ranks) and
    one map-side-combined SUM by dst — and NOTHING else. Three
    algebraic cuts over the r13 loop, each valid because the edge
    table is the SYMMETRIC union of both pair directions (every node
    appears as src AND as dst of at least one edge):
    - the per-iteration ``nodes LEFT JOIN sums`` re-attachment is
      gone: sums' key set is exactly the node set (every node has an
      in-edge), so the join was 1:1 and COALESCE never fired — the
      damping projection runs directly on sums (8 SortMergeJoins +
      their 16 per-iteration sorts of the corpus-scale edge table
      removed from the fused plan);
    - iteration 1 is constant-folded: r0 assigns the same ``base`` to
      every node and every edge's src is a node, so edges ⋈ r0
      reduces to a projection of the edge table (one more join gone);
    - the outdeg fold is a COUNT window over src instead of a groupBy
      + self-join: one exchange (whose output IS the loop's required
      hash-partitioning on src) replaces two, and the separate
      ``nodes`` cache disappears — n_nodes is a distinct count that
      rides the edges cache's partitioning exchange-free.
    Interleaved A/B at sf0.1 (min-of-5, same session): r13 shape
    6.72 s -> 3.59 s (1.87x), result md5-identical on every pass. A
    SHUFFLE_HASH hint on the loop join was measured SLOWER (4.46 s
    min) — AQE's coalesced SMJ wins at this partition geometry — and
    rejected. The previous per-3-rounds localCheckpoint cuts stay
    gone (r13: 2.1x slower than the fused plan). _PR_ITERS is a fixed
    8, so the unrolled plan is bounded by construction; if the
    iteration count ever becomes data-dependent, reintroduce a
    persist_hot cut every ~10 rounds to bound analysis cost.

    Session hygiene (r13 full-sweep lesson): the result is
    materialized eagerly HERE and the three hot caches are
    unpersisted before returning. The first r13 version returned the
    lazy 8-iteration plan and left pairs/nodes/edges persisted;
    rebuilding the query in a long-lived session (a bench sweep, a
    repeated service call) then interacted with the previous build's
    stale entries — measured walls GREW monotonically per rebuild
    (8.2 -> 14.5 -> 18.4 s across three rebuilds in one polluted
    session, identical executed plans, vs 3.7 s isolated; the r13
    sweep recorded passes [22.9, 57.4, 42.0] where r12's
    checkpointed shape read a stable 5.1 s). Eager-materialize +
    unpersist makes every build self-contained: compute once in the
    builder off the live caches, free them, hand consumers the
    bounded |nodes|-row result. The checkpoint holds only RESULT
    rows; the expensive intermediates keep lineage while live
    (ADVICE-r12 recovery note)."""
    from pyspark.storagelevel import StorageLevel

    from skysafe_datalake_spark.plans.materialize import persist_hot

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("s"),
        )
        .distinct()
    )
    # Cache level is sized to the data (the same adaptive pattern as
    # LSH auto-salting and stateful shuffle sizing). DataFrame persist
    # stores compressed columnar batches — far smaller than the
    # deserialized row objects the old RDD checkpoints held (those
    # OOMed the 64x smoke's 16 GB JVM at 75M edges) — but above ~5M
    # lineitem rows the caches still go DISK_ONLY: zero storage heap,
    # blocks ride the OS page cache locally, and lineage is kept so a
    # lost block recomputes. The deciding count() is metadata-fast on
    # parquet.
    n_li = li.count()
    big_graph = n_li > 5_000_000
    # Decision record + stderr note: the branch only triggers above
    # bench scale (sf0.1 is ~600k lineitem rows), so the 64x scale
    # smoke's log is the evidence it actually fires — without a
    # visible marker a silent mis-sizing (threshold typo, count on
    # the wrong table) would look identical to the branch working.
    LAST_PAGERANK_CHECKPOINT["lineitem_rows"] = n_li
    LAST_PAGERANK_CHECKPOINT["level"] = (
        "DISK_ONLY" if big_graph else "default"
    )
    if big_graph:
        import sys

        print(
            f"# pagerank_integer: {n_li:,} lineitem rows > 5,000,000 — "
            "DISK_ONLY cache level engaged",
            file=sys.stderr,
        )
    lvl = StorageLevel.DISK_ONLY if big_graph else StorageLevel.MEMORY_AND_DISK
    # The slim PAIRS table (2 cols, half the edge rows) is cut first so
    # the union's two branches compute it once.
    pairs = persist_hot(pairs, lvl)
    edges = None
    try:
        raw_edges = pairs.select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        ).unionAll(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        # outdeg is loop-invariant: fold it into the edge table ONCE as
        # a COUNT window over src — the window's single exchange leaves
        # the cache hash-partitioned on src, exactly the in-loop join
        # requirement, where the r13 groupBy+join fold paid a second
        # corpus-scale exchange for the same partitioning (guide §2.4:
        # two operations keyed the same way share one exchange). The
        # window's per-partition sort is local work on already-placed
        # rows — cheaper than the exchange it replaces.
        w = Window.partitionBy("src")
        edges = persist_hot(
            raw_edges.select(
                "src", "dst", F.count(F.lit(1)).over(w).alias("outdeg")
            ),
            lvl,
        )

        # Distinct node count rides the edges cache's partitioning
        # (partial + final agg, no exchange); the separate nodes cache
        # is gone — nothing else needed it (see docstring cuts).
        n_nodes = (
            edges.select(F.col("src").alias("node")).distinct().count()
        )
        base = _PR_TOTAL // n_nodes

        def _damp(sums: DataFrame) -> DataFrame:
            # sums' key set == node set (symmetric edges), so the
            # damping projection applies directly; COALESCE kept for
            # textual parity with the SQL twin (it can never fire).
            return sums.select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(15 * cast({base} as bigint)"
                    " + 85 * coalesce(sum_in, cast(0 as bigint))) div 100"
                ).alias("r"),
            )

        # Iteration 1 constant-folded: r0 is `base` for every node and
        # every edge src is a node, so edges ⋈ r0 is a projection.
        ranks = _damp(
            edges.select(
                "dst",
                F.expr(f"cast({base} as bigint) div outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("sum_in"))
        )
        for _i in range(2, _PR_ITERS + 1):
            contrib = (
                edges.join(ranks, edges["src"] == ranks["node"])
                .select(
                    F.col("dst"),
                    F.expr("r div outdeg").alias("c"),
                )
            )
            ranks = _damp(
                contrib.groupBy("dst").agg(F.sum("c").alias("sum_in"))
            )

        # Eager cut: compute the bounded |nodes|-row result off the
        # live caches NOW, so the finally can free them (see docstring
        # "Session hygiene").
        return ranks.select(
            "node", F.col("r").alias("rank_ppb")
        ).localCheckpoint(eager=True)
    finally:
        # Free the hot caches: every build is self-contained; nothing
        # canonical-matches a later rebuild.
        for cached in (edges, pairs):
            if cached is not None:
                cached.unpersist()


# ─────────────────── triangle counting (degree-oriented) ─────────

_TRI_BACKBONE = 5000

_TRI_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
),
raw_edges AS (
  SELECT a.s AS u, b.s AS v
  FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
  ORDER BY COUNT(*) DESC, a.s, b.s
  LIMIT 5000
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM raw_edges
    UNION ALL
    SELECT v AS node FROM raw_edges
  ) ends GROUP BY node
),
oriented AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS a,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS b
  FROM raw_edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
)
SELECT e1.a AS pivot_node, CAST(COUNT(*) AS BIGINT) AS n_tri
FROM oriented e1
JOIN oriented e2 ON e2.a = e1.a AND e1.b < e2.b
JOIN raw_edges e3 ON e3.u = e1.b AND e3.v = e2.b
GROUP BY e1.a
ORDER BY n_tri DESC, pivot_node
LIMIT 20
"""


@register("graph_triangles", _TRI_SQL)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-occurrence graph (edge =
    two suppliers fill the same order), via the degree-oriented
    node-iterator algorithm: orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, enumerate wedges
    only from each edge's SOURCE, and close them against the
    canonical (u<v) edge list. Each triangle is then counted exactly
    once — at its unique pivot (the node whose two edges both point
    outward). The graph is the TOP-5000-weight backbone of the
    co-occurrence relation (pairs ranked by shared-order count,
    deterministic (count, u, v) cut): raw co-occurrence densifies
    toward a complete graph as data grows — |pairs| is quadratic in
    suppliers-per-order — so an unthresholded triangle count is a
    quadratic-blowup trap at scale; the fixed-size strongest-edge
    backbone is how production graph pipelines keep it bounded (the
    top-K is a TakeOrderedAndProject, never a global sort). Output:
    the 20 busiest pivots with their triangle counts (deterministic
    tie-break on node id).

    Why this shape at scale: naive wedge enumeration is Σ deg², which
    a single celebrity node turns into a quadratic blowup; orienting
    by degree caps per-node fan-out at O(√|E|), the classic bound —
    the orientation costs two broadcast-sized joins against the
    degree table, and wedge closure is an equi-join on (b1, b2), all
    shuffle-partitionable, no driver state. Pure integer/equi-join
    plan, so the oracle's unrolled twin is bit-identical."""
    li = load(spark, sf_dir, "lineitem")
    # Edge generation via operators.graph.cooccurrence_pairs: ONE
    # groupBy(orderkey) collect_set + array-native pair explode
    # replaces the old distinct + self-join-on-orderkey + re-agg
    # (3 corpus-scale exchanges and a sort-merge join whose output
    # multiplied rows before aggregation could shrink them). Valid
    # because orders hold ≤7 lineitems — see the operator docstring.
    co = cooccurrence_pairs(
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")),
        "ok",
        "s",
    )
    raw_edges = (
        co.groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .orderBy(F.desc("w"), "u", "v")
        .limit(_TRI_BACKBONE)
        .select("u", "v")
    )
    # Materialize the backbone ONCE (lazy persist — see
    # plans/materialize.py for why not localCheckpoint: under AQE the
    # checkpoint ran the backbone at query-BUILD time and dropped
    # lineage). The edge list feeds five plan branches (both degree
    # ends, the orientation scan, and the wedge join's e1/e2/e3
    # sides), and Spark's exchange reuse does NOT collapse them — the
    # executed plan re-ran the full pairs-self-join + top-K backbone
    # cut per branch (22 lineitem scans / 12 TakeOrdereds before this
    # line). At 100 TB the backbone cut IS the query's cost;
    # everything after it is joins over a ≤5000-row table, so caching
    # here turns ~6 backbone recomputations into one bounded cache.
    raw_edges = materialize_bounded(raw_edges)
    ends = raw_edges.select(F.col("u").alias("node")).unionAll(
        raw_edges.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count("*").cast("bigint").alias("d"))
    e = raw_edges.alias("e")
    du, dv = deg.alias("du"), deg.alias("dv")
    lower_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("e.u") < F.col("e.v"))
    )
    oriented = (
        e.join(F.broadcast(du), F.col("du.node") == F.col("e.u"))
        .join(F.broadcast(dv), F.col("dv.node") == F.col("e.v"))
        .select(
            F.when(lower_first, F.col("e.u")).otherwise(F.col("e.v")).alias("a"),
            F.when(lower_first, F.col("e.v")).otherwise(F.col("e.u")).alias("b"),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    e3 = raw_edges.alias("e3")
    return (
        e1.join(
            e2,
            (F.col("e2.a") == F.col("e1.a")) & (F.col("e1.b") < F.col("e2.b")),
        )
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.b")) & (F.col("e3.v") == F.col("e2.b")),
        )
        .groupBy(F.col("e1.a").alias("pivot_node"))
        .agg(F.count("*").cast("bigint").alias("n_tri"))
        .orderBy(F.desc("n_tri"), "pivot_node")
        .limit(20)
    )


# ─────────────────── z-order layout (data skipping) ──────────────

def _z_interleave_sql(x: str, y: str, bits: int, intdiv: str) -> str:
    """Morton interleave of two bucketized ints as portable SQL;
    ``intdiv`` is the dialect's integer-division operator ('div' for
    Spark, '//' for DuckDB) — the only token the dialects disagree
    on."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _ztile_sql(intdiv: str) -> str:
    z = _z_interleave_sql("x", "y", 8, intdiv)
    return f"""
WITH dims AS (
  SELECT CAST(MAX(l_partkey) + 1 AS BIGINT) AS np,
         CAST(MAX(l_suppkey) + 1 AS BIGINT) AS ns
  FROM lineitem
),
pts AS (
  SELECT (l_partkey * 256) {intdiv} np AS x,
         (l_suppkey * 256) {intdiv} ns AS y
  FROM lineitem, dims
),
z AS (SELECT x, y, {z} AS zval FROM pts)
SELECT zval {intdiv} 256 AS ztile,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
       CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
FROM z
GROUP BY zval {intdiv} 256
"""


@register("zorder_tile_stats", _ztile_sql("//"))
def zorder_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order clustering layout, verified end to end: bucketize
    (l_partkey, l_suppkey) to an 8-bit grid, Morton-interleave the
    bits (operators/zorder.zorder_key's curve), and report per
    256-key tile the row count and the min/max span of BOTH
    dimensions. The output is the data-skipping proof itself: every
    tile's span is ≤ 16 in x AND y (a 16×16 tile of the curve), so a
    writer that range-partitions files on this key gives every file
    parquet footer stats tight in both columns — predicates on either
    prune files. The oracle recomputes the identical curve, so the
    bit math is cross-engine exact.

    Scale shape: the key is pure shift/mask codegen; the tile stats
    are one hash aggregation; the real write path
    (zorder.zorder_write) adds one range shuffle. The 1-row dims
    aggregate broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    dims = li.agg(
        (F.max("l_partkey") + 1).cast("bigint").alias("np"),
        (F.max("l_suppkey") + 1).cast("bigint").alias("ns"),
    )
    pts = li.crossJoin(F.broadcast(dims)).select(
        F.expr("(l_partkey * 256) div np").alias("x"),
        F.expr("(l_suppkey * 256) div ns").alias("y"),
    )
    z = pts.withColumn("zval", F.expr(_z_interleave_sql("x", "y", 8, "div")))
    return (
        z.groupBy(F.expr("zval div 256").alias("ztile"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )


# ─────────────────── BM25 retrieval ranking ──────────────────────

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("table", "spark", "window")

_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl
  FROM dl
),
qterms AS (SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}) t(term)),
df AS (
  SELECT t.tok AS term, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS df
  FROM toks t JOIN qterms q ON q.term = t.tok
  GROUP BY t.tok
),
tf AS (
  SELECT t.doc_id, t.tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN qterms q ON q.term = t.tok
  GROUP BY t.doc_id, t.tok
),
scored AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
              / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(tf.tf AS DOUBLE)
              + {_BM25_K1} * (1.0 - {_BM25_B}
                 + {_BM25_B} * CAST(dl.dl AS DOUBLE)
                   * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))
           * 1000000.0 + 0.5) AS BIGINT) AS term_score_e6
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
       CAST(SUM(term_score_e6) AS BIGINT) AS score_e6
FROM scored
GROUP BY doc_id
ORDER BY score_e6 DESC, doc_id
LIMIT 50
"""


@register("bm25_topk", _BM25_SQL)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-50 retrieval for a fixed 3-term query
    (k1=1.2, b=0.75) — the serving-side ranking read a corpus engine
    must answer. Cross-engine exactness uses the micro-nat trick
    (cf. unigram_logprob_score): each (doc, term) partial score is a
    fixed IEEE expression tree — ln/idf, tf saturation, the
    length-normalized denominator with avgdl folded in as
    dl·N/Σdl — quantized ONCE to integer micro-units; the
    per-document reduction is then an associative integer SUM, and
    the top-50 cut is TakeOrderedAndProject with doc_id tie-break.

    Scale shape: the inverted-index pieces (df, tf) are hash
    aggregations over the token stream FILTERED to the query terms —
    the term filter is a broadcast semi-join, so the big stream never
    shuffles on anything wider than (doc_id, term); doc lengths and
    corpus stats are one aggregation each, stats a 1-row broadcast."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("tok"),
    )
    qterms = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    hits = toks.join(
        F.broadcast(qterms), toks["tok"] == qterms["term"]
    ).select("doc_id", "term")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    # The postings table feeds BOTH df and the scorer; localCheckpoint
    # materializes it once (at this call, under AQE) so the token
    # stream is aggregated a single time — plan reuse alone would
    # re-scan the corpus for each branch; corpus-sized, so GC-freed
    # checkpoint blocks beat a session-lifetime cache entry.
    tf = tf.localCheckpoint(eager=False)
    # df re-aggregates the (tiny) postings table — skew-safe map-side
    # count per term, broadcast back.
    df_t = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    k1, b = _BM25_K1, _BM25_B
    idf = F.log(
        (
            F.col("n_docs").cast("double")
            - F.col("df").cast("double")
            + F.lit(0.5)
        )
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b)
        * F.col("dl").cast("double")
        * F.col("n_docs").cast("double")
        / F.col("sum_dl").cast("double")
    )
    term_score = F.floor(
        idf
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / denom
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score_e6"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hit_terms"),
            F.sum("term_score_e6").cast("bigint").alias("score_e6"),
        )
        .orderBy(F.desc("score_e6"), "doc_id")
        .limit(50)
    )


# ─────────────────── funnel analysis ─────────────────────────────

_FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM e WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT v.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) AS funnel_stage,
       v.v_ts, c.c_ts, p.p_ts
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
"""


@register("funnel_conversion", _FUNNEL_SQL)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): a user
    advances a stage only with an event STRICTLY AFTER the previous
    stage's earliest completion — the greedy-earliest chain, which is
    the standard funnel semantics (an unordered 'did all three' count
    over-states conversion). Three per-user MIN aggregations chained
    by inequality joins, then two left joins assemble the per-user
    stage + stage timestamps.

    Scale shape: every aggregation and join keys on user_id — under
    AQE this is one shuffle lineage re-used across stages (or zero
    exchanges with the events table bucketed by user_id); per-stage
    state is one timestamp per user, never a per-user event array on
    the driver or in RAM. Timestamps compare exactly (microsecond
    integers), so stage assignment is deterministic."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # Each stage table is |users|-sized and feeds BOTH the next
    # stage and the final assembly — localCheckpoint materializes
    # each once (at this call, under AQE) so the event stream isn't
    # re-scanned per branch; |users| is unbounded at 100 TB, so
    # GC-freed blocks beat a session-lifetime cache entry.
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
        .localCheckpoint(eager=False)
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
        .localCheckpoint(eager=False)
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
        .localCheckpoint(eager=False)
    )
    stage = (
        F.when(F.col("p_ts").isNotNull(), 3)
        .when(F.col("c_ts").isNotNull(), 2)
        .otherwise(1)
        .cast("bigint")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", stage.alias("funnel_stage"), "v_ts", "c_ts", "p_ts")
    )


# ─────────────────── retention cohorts ───────────────────────────

_RETENTION_SQL = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week FROM e
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_diff('day', f.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) // 7
           AS week_offset
  FROM e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
"""


@register("retention_cohorts", _RETENTION_SQL)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week
    (the cohort), then counted once per (cohort, week-offset) they
    were active in — the classic retention triangle a product
    dashboard reads. Week arithmetic is integer day-difference // 7
    on week-truncated timestamps (both engines truncate to Monday),
    so cell membership is exact.

    Scale shape: one per-user MIN (map-side combined), a user-keyed
    join to tag each event with its cohort, a DISTINCT on
    (user, cohort, offset) — all shuffling on user_id — then the
    final tiny (cohorts × offsets) aggregation. No window over the
    raw stream, no driver state."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "datediff(to_date(date_trunc('week', ts)), cohort_week) div 7"
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        "cohort_week", F.col("week_offset").cast("bigint").alias("week_offset")
    ).agg(F.count("*").cast("bigint").alias("n_active_users"))


# ─────────────────── frequent item pairs (market basket) ─────────

_MB_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey % 50 AS item FROM lineitem
),
item_support AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS s_item FROM baskets GROUP BY item
),
n_baskets AS (
  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM baskets
),
pair_all AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS s_pair
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.item < b.item
  GROUP BY a.item, b.item
),
pair_stats AS (
  SELECT CAST(SUM(s_pair) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pair_all
),
pair_support AS (
  SELECT p.item_a, p.item_b, p.s_pair
  FROM pair_all p CROSS JOIN pair_stats ps
  WHERE p.s_pair * ps.n_pairs >= ps.total
)
SELECT p.item_a, p.item_b, p.s_pair,
       sa.s_item AS s_a, sb.s_item AS s_b,
       floor(CAST(p.s_pair AS DOUBLE) / CAST(sa.s_item AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS confidence_a_to_b,
       floor(CAST(p.s_pair AS DOUBLE) * CAST(nb.n AS DOUBLE)
             / (CAST(sa.s_item AS DOUBLE) * CAST(sb.s_item AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS lift
FROM pair_support p
JOIN item_support sa ON sa.item = p.item_a
JOIN item_support sb ON sb.item = p.item_b
CROSS JOIN n_baskets nb
"""


@register("frequent_itempairs", _MB_SQL)
def frequent_itempairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining at the pair level (the 2-item
    case of A-Priori): support-filtered co-occurring item pairs per
    order with confidence and lift — the query behind 'frequently
    bought together'. Items are partkeys folded to a 50-item
    catalog so baskets genuinely overlap on the synthetic data.

    Scale shape: the basket self-join is keyed on the ORDER (small
    per-basket fan-out: pairs-per-basket = C(items,2), bounded by
    basket size), the above-average support floor (exact integer
    cross-multiply, SF-relative) prunes the pair table before the
    metric joins (A-Priori's downward-closure cut), and
    the item-support side is vocabulary-sized and broadcast.
    Support counts are exact integers; confidence/lift are single
    fixed IEEE divisions quantized to 1e-6 — deterministic."""
    li = load(spark, sf_dir, "lineitem")
    # One groupBy(orderkey) collect_set feeds EVERY consumer (item
    # supports, basket count, pair generation) — the array-native
    # rewrite of the old distinct + basket self-join + re-agg (see
    # operators.graph.cooccurrence_pairs; baskets hold ≤7 lineitems
    # so the folded item sets are tiny). The old shape cost a
    # corpus-scale distinct exchange, a self-join re-shuffle pair, and
    # a sort-merge join that multiplied rows before the pair agg could
    # shrink them; now the only corpus-scale exchange is the
    # collect_set's, and Spark's exchange reuse shares it across the
    # three consumers of `sets`.
    sets = (
        li.select(
            F.col("l_orderkey").alias("ok"),
            (F.col("l_partkey") % 50).alias("item"),
        )
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
    )
    item_support = (
        sets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("bigint").alias("s_item"))
    )
    # one row per basket by construction, so count(*) == the old
    # countDistinct(ok).
    n_baskets = sets.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pair_all = (
        pairs_from_item_sets(sets, "items")
        .groupBy(F.col("u").alias("item_a"), F.col("v").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("s_pair"))
    )
    pair_stats = pair_all.agg(
        F.sum("s_pair").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )
    # Above-average support: integer cross-multiply keeps the cut
    # exact and SF-relative (an absolute floor goes empty at small
    # SFs and toothless at large ones).
    pair_support = pair_all.crossJoin(F.broadcast(pair_stats)).where(
        F.col("s_pair") * F.col("n_pairs") >= F.col("total")
    ).select("item_a", "item_b", "s_pair")
    sa = item_support.select(
        F.col("item").alias("item_a"), F.col("s_item").alias("s_a")
    )
    sb = item_support.select(
        F.col("item").alias("item_b"), F.col("s_item").alias("s_b")
    )
    out = (
        pair_support.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    conf = pround(
        F.col("s_pair").cast("double") / F.col("s_a").cast("double"), 6
    )
    lift = pround(
        F.col("s_pair").cast("double")
        * F.col("n").cast("double")
        / (F.col("s_a").cast("double") * F.col("s_b").cast("double")),
        6,
    )
    return out.select(
        "item_a",
        "item_b",
        "s_pair",
        "s_a",
        "s_b",
        conf.alias("confidence_a_to_b"),
        lift.alias("lift"),
    )


# ─────────────────── seasonal anomaly baseline ───────────────────

_SEASONAL_SQL = f"""
WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
),
split AS (
  SELECT *, (ts < TIMESTAMP '2024-01-22 00:00:00') AS is_history FROM e
),
baseline AS (
  SELECT event_type,
         CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('value')} AS sx,
         {dsum_sql('value * value', 4)} AS sxx
  FROM split WHERE is_history
  GROUP BY event_type, dayofweek(ts) + 1, hour(ts)
),
stats AS (
  SELECT event_type, dow, hod,
         sx / n AS mu,
         sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) AS sigma
  FROM baseline WHERE n >= 2.0
)
SELECT s.event_type, s.dow, s.hod,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN abs(sp.value - s.mu) > 3.0 * s.sigma
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM stats s
JOIN split sp
  ON sp.event_type = s.event_type
 AND CAST(dayofweek(sp.ts) + 1 AS BIGINT) = s.dow
 AND CAST(hour(sp.ts) AS BIGINT) = s.hod
WHERE NOT sp.is_history
GROUP BY s.event_type, s.dow, s.hod
"""


@register("seasonal_anomaly_baseline", _SEASONAL_SQL)
def seasonal_anomaly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection — the monitoring upgrade
    of the reference's flat μ+2σ threshold (which flags every rush
    hour): per (event_type, day-of-week, hour-of-day) cell, fit
    μ/σ on three weeks of history, then count |x−μ| > 3σ violations
    in the final week against the MATCHING seasonal cell. μ/σ come
    from decimal-exact sufficient statistics (n, Σx, Σx²) so the
    baseline — and therefore each boundary comparison — is
    bit-reproducible on any partitioning.

    Scale shape: the baseline is one hash aggregation to a
    (types × 7 × 24)-cell table, broadcast back onto the scoring
    week — the fact stream never shuffles; thresholds are pure
    column expressions after the broadcast join."""
    e = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    cutoff = F.lit("2024-01-22 00:00:00").cast("timestamp")
    hist = e.where(F.col("ts") < cutoff)
    score = e.where(F.col("ts") >= cutoff)

    key = [
        "event_type",
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ]
    baseline = hist.groupBy(*key).agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("value")).alias("sx"),
        dsum(F.col("value") * F.col("value"), 4).alias("sxx"),
    )
    stats = baseline.where(F.col("n") >= 2.0).select(
        "event_type",
        "dow",
        "hod",
        (F.col("sx") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n") * (F.col("n") - 1.0))
        ).alias("sigma"),
    )
    scored = score.select(
        "value",
        "event_type",
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).join(F.broadcast(stats), ["event_type", "dow", "hod"])
    return scored.groupBy("event_type", "dow", "hod").agg(
        F.count("*").cast("bigint").alias("n_checked"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("mu")) > 3.0 * F.col("sigma"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_anomalies"),
    )


# ───────────────────── closed-form OLS regression ────────────────

_LINREG_SQL = f"""
WITH e AS ({EVENTS_SQL}),
pts AS (
  SELECT event_type,
         CAST(datediff('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS x,
         value AS y
  FROM e
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         {dsum_sql('y')} AS sy,
         {dsum_sql('x * y', 4)} AS sxy,
         {dsum_sql('y * y', 4)} AS syy
  FROM pts
  GROUP BY event_type
),
fit AS (
  SELECT event_type, n, sx, sxx, sy, sxy, syy,
         (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
  FROM s
)
SELECT event_type,
       n AS n_points,
       floor(slope * 1000000.0 + 0.5) / 1000000.0 AS slope_per_hour,
       floor(((sy - slope * sx) / n) * 1000000.0 + 0.5) / 1000000.0
         AS intercept,
       floor((slope * slope * (n * sxx - sx * sx)
              / (n * syy - sy * sy)) * 1000000.0 + 0.5) / 1000000.0 AS r2,
       floor(((sy - slope * sx) / n + slope * 720.0) * 10000.0 + 0.5)
         / 10000.0 AS forecast_h720
FROM fit
"""


@register("ml_linreg_by_group", _LINREG_SQL)
def ml_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend fit in closed form —
    the "fit a line to every key" primitive of monitoring/forecast
    pipelines (value-vs-time per event type, with the fitted line's
    h=720 extrapolation as a one-step forecast). Instead of MLlib's
    iterative LinearRegression, the normal equations are evaluated as
    ONE aggregation pass: slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²),
    intercept and R² from the same six sufficient statistics. That
    makes it embarrassingly parallel — map-side partial sums, no
    driver fit, no iteration — and exactly DuckDB-checkable where a
    gradient-based fit would never be.

    Determinism: x is an integer hour offset from a fixed epoch
    (boundary-exact in both engines since the base is on the hour);
    Σy/Σxy/Σy² go through the decimal-sum convention so every
    sufficient statistic is partition-order-invariant; the closed
    form then runs the same double-op sequence in both engines, and
    results surface under the workload rounding convention. Scale:
    one hash-agg shuffle on the group key — adding a millionth group
    or a billion rows changes nothing structurally; x is centered at
    the epoch base to keep Σx² within bigint at any horizon."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(
            "CAST(timestampdiff(HOUR, TIMESTAMP '2024-01-01', ts) AS BIGINT)"
        ).alias("x"),
        F.col("value").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y"), 4).alias("sxy"),
        dsum(F.col("y") * F.col("y"), 4).alias("syy"),
    )
    fit = s.withColumn(
        "slope",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ),
    )
    return fit.select(
        "event_type",
        F.col("n").alias("n_points"),
        pround(F.col("slope"), 6).alias("slope_per_hour"),
        pround((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"), 6)
            .alias("intercept"),
        pround(
            F.col("slope") * F.col("slope")
            * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
            6,
        ).alias("r2"),
        pround(
            (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")
            + F.col("slope") * 720.0,
            4,
        ).alias("forecast_h720"),
    )


# ───────────────────── k-hop BFS reachability ────────────────────

_BFS_BACKBONE = 5000
_BFS_HOPS = 3

_BFS_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS ok, p AS node FROM (
    SELECT l_orderkey, l_partkey AS p FROM lineitem
  )
),
raw_edges AS (
  SELECT a.node AS u, b.node AS v
  FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.node < b.node
  GROUP BY a.node, b.node
  ORDER BY COUNT(*) DESC, a.node, b.node
  LIMIT {_BFS_BACKBONE}
),
und AS (
  SELECT u AS a, v AS b FROM raw_edges
  UNION ALL
  SELECT v AS a, u AS b FROM raw_edges
),
seed AS (SELECT MIN(u) AS s FROM raw_edges),
walks AS (
  SELECT s AS node, 0 AS dist FROM seed
  UNION ALL
  SELECT e1.b, 1 FROM und e1, seed WHERE e1.a = seed.s
  UNION ALL
  SELECT e2.b, 2 FROM und e1
  JOIN und e2 ON e2.a = e1.b
  CROSS JOIN seed WHERE e1.a = seed.s
  UNION ALL
  SELECT e3.b, 3 FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e2.b
  CROSS JOIN seed WHERE e1.a = seed.s
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(MIN(dist) AS BIGINT) AS dist
FROM walks
GROUP BY node
"""


@register("bfs_khop_reach", _BFS_SQL)
def bfs_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop distance from a seed node out to 3 hops on the part
    co-occurrence graph (edge = two parts share an order; top-5000
    strongest edges, the same bounded-backbone guard as
    graph_triangles). The Spark side runs FRONTIER BFS — per hop,
    expand only nodes discovered last round and anti-join away nodes
    already labeled — which touches each edge O(1) times per hop.
    The oracle's twin instead enumerates ALL walks ≤3 hops and takes
    MIN(dist) per node: same answer by definition of shortest path,
    tractable on the bounded backbone, but quadratic-blowup-prone —
    the contrast is deliberate (the unrolled form is the spec, the
    frontier form is the scale plan; at 1000 executors the frontier
    is a few equi-join shuffles on node id per hop, with no
    walk-count explosion on dense neighborhoods).

    The seed is MIN(node) — one driver scalar from a 1-row aggregate
    (bounded-collect exception, like the ML centroid pull). Fixed
    hop count keeps both sides loop-free; the streaming/iterative
    generalization is pagerank_integer's checkpoint-every-3-rounds
    pattern."""
    li = load(spark, sf_dir, "lineitem")
    # Edge generation via operators.graph.cooccurrence_pairs (one
    # groupBy(orderkey) collect_set + array-native pair explode
    # instead of distinct + self-join + re-agg — see graph_triangles).
    co = cooccurrence_pairs(
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("node")),
        "ok",
        "node",
    )
    edges = (
        co.groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .orderBy(F.desc("w"), "u", "v")
        .limit(_BFS_BACKBONE)
        .select("u", "v")
    )
    # The backbone and per-hop frontier cuts stay eager
    # localCheckpoints DELIBERATELY: the r13 A/B (5 interleaved
    # passes, sf0.1) measured the materialize_bounded persist variant
    # 2.3x slower (min 5.42 s vs 2.34 s) — as in kcore_peel, nothing
    # downstream exploits cached partitioning, and checkpoint blocks
    # capture the AQE-coalesced partition counts that cached plans
    # can't (canChangeCachedPlanOutputPartitioning=false). Build-time
    # materialization under AQE is the accepted cost (the seed pull
    # right below forces the backbone anyway).
    edges = edges.localCheckpoint()  # cut lineage once; reused 3×
    und = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    seed = edges.agg(F.min("u")).first()[0]  # 1-row scalar pull

    dist = spark.createDataFrame([(seed, 0)], "node long, dist int")
    frontier = dist.select("node")
    for hop in range(1, _BFS_HOPS + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = nxt.localCheckpoint()  # materialize the frontier once
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist.select(
        F.col("node").cast("bigint"), F.col("dist").cast("bigint")
    )


# ───────────────── chi-square independence test ──────────────────

_CHI2_SQL = f"""
WITH e AS ({EVENTS_SQL}),
obs AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM e GROUP BY event_type, dayofweek(ts)
),
rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_tot
       FROM obs GROUP BY event_type),
ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS col_tot
       FROM obs GROUP BY dow),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM obs),
cells AS (
  SELECT obs.event_type, obs.dow, obs.o,
         CAST(rt.row_tot * ct.col_tot AS DOUBLE) / n.total AS expected
  FROM obs
  JOIN rt ON rt.event_type = obs.event_type
  JOIN ct ON ct.dow = obs.dow
  CROSS JOIN n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
       floor(CAST(SUM(CAST((o - expected) * (o - expected) / expected
                           AS DECIMAL(18,8))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS chi2
FROM cells
"""


@register("chi2_independence", _CHI2_SQL)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    day-of-week — the categorical-association screen of a feature-
    quality pipeline (MLlib's ChiSquareTest computes the same
    statistic; this closed form is exactly DuckDB-checkable and needs
    no vector assembly). Observed counts are one hash agg; expected
    counts come from broadcast row/column marginals; the statistic is
    a decimal sum of per-cell (O−E)²/E so the result is partition-
    order-exact, surfaced under the rounding convention with the
    degrees of freedom alongside. (Engines disagree on dayofweek
    NUMBERING — Spark 1-7 vs DuckDB 0-6 — but the statistic only
    needs the partition, not the labels, so the output deliberately
    exposes no dow column.) Scale: the contingency table is
    |types|×7 cells regardless of row count — everything after the
    first aggregation is constant-size."""
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek("ts").cast("bigint").alias("dow")
    ).agg(F.count("*").cast("bigint").alias("o"))
    # Materialize the contingency table ONCE (lazy persist of
    # |types|x7 rows — see plans/materialize.py for the
    # localCheckpoint-vs-persist tradeoff). Four consumers (row
    # marginals, column marginals, grand total, the cells join) each
    # re-ran the full events scan + aggregation without this cut —
    # exchange reuse does not collapse them.
    obs = materialize_bounded(obs)
    rt = obs.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("row_tot")
    )
    ct = obs.groupBy("dow").agg(F.sum("o").cast("bigint").alias("col_tot"))
    n = obs.agg(F.sum("o").cast("bigint").alias("total"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "o",
            (
                (F.col("row_tot") * F.col("col_tot")).cast("double")
                / F.col("total")
            ).alias("expected"),
        )
    )
    # dof from distinct counts INSIDE the one final aggregate over the
    # |types|x7 cells table — the former rt.count()/ct.count() scalar
    # actions each re-executed the obs aggregation's full events scan
    # at plan-construction time (round-9 review: 2 extra jobs for a
    # constant).
    return cells.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("bigint").alias("dof"),
        pround(
            dsum(
                (F.col("o") - F.col("expected"))
                * (F.col("o") - F.col("expected"))
                / F.col("expected"),
                8,
            ),
            6,
        ).alias("chi2"),
    ).select("n_cells", "dof", "chi2")


# ───────────────── rolling-window OLS (trend drift) ──────────────

_ROLL_OLS_SQL = f"""
WITH e AS ({EVENTS_SQL}),
pts AS (
  SELECT event_type,
         CAST(datediff('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS x,
         value AS y,
         event_id
  FROM e
),
framed AS (
  SELECT event_type, x, event_id,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sxy
  FROM pts
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               RANGE BETWEEN 168 PRECEDING AND CURRENT ROW)
)
SELECT event_type, x, event_id, n,
       CASE WHEN n * sxx - sx * sx > 0
            THEN floor((n * sxy - sx * sy)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                       * 1000000.0 + 0.5) / 1000000.0
            END AS slope_trailing_7d
FROM framed
"""


@register("rolling_ols_slope", _ROLL_OLS_SQL)
def rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS: at EVERY event, the regression slope of value vs
    time over the trailing 7 days (168-hour RANGE frame) for its
    event type — trend-drift detection as a continuous signal rather
    than ml_linreg_by_group's one line per key. The five sufficient
    statistics are window-frame sums over an integer-hour event-time
    axis (RANGE, not ROWS: the frame is defined by TIME, so
    same-hour ties contribute identically in both engines and the
    frame is layout-independent); Σy/Σxy ride the decimal convention
    inside the frame, the closed form then runs per row. Degenerate
    frames (all points in one hour ⇒ zero variance) surface as NULL
    slope via the guard, not a division blowup.

    Scale: the frame is defined at HOUR granularity, so every event in
    the same (type, hour) cell shares one frame — the five sufficient
    statistics are pre-aggregated per cell in a fully parallel hash
    aggregation (map-side combine; ~28× row reduction on the synthetic
    shape, more when events cluster), the window operator then runs
    over the compact hourly series (one sort over thousands of rows,
    not millions), and per-event rows get their frame stats back via a
    parallel equi-join on (type, hour). This keeps the serial part of
    the low-cardinality PARTITION BY — the classic window bottleneck:
    event_type has a handful of values, so WindowExec parallelism is
    capped at that handful — proportional to distinct hours rather
    than raw events. Decimal partial sums re-aggregate exactly
    (decimal addition is associative), so results are bit-identical to
    the direct per-event window. No self-join against the trailing
    window, which is the naive formulation's quadratic trap."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.expr(
            "CAST(timestampdiff(HOUR, TIMESTAMP '2024-01-01', ts) AS BIGINT)"
        ).alias("x"),
        F.col("value").alias("y"),
        "event_id",
    )
    hourly = pts.groupBy("event_type", "x").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(F.col("y").cast("decimal(18,2)")).alias("sy_h"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,4)")).alias(
            "sxy_h"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(-168, Window.currentRow)
    )
    framed = hourly.select(
        "event_type",
        "x",
        F.sum("cnt").over(w).cast("bigint").alias("n"),
        F.sum(F.col("x") * F.col("cnt")).over(w).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x") * F.col("cnt"))
        .over(w)
        .cast("bigint")
        .alias("sxx"),
        F.sum("sy_h").over(w).cast("double").alias("sy"),
        F.sum("sxy_h").over(w).cast("double").alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return pts.join(framed, ["event_type", "x"]).select(
        "event_type",
        "x",
        "event_id",
        "n",
        F.when(
            den > 0,
            pround(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / den.cast("double"),
                6,
            ),
        ).alias("slope_trailing_7d"),
    )


# ───────────── linear-interpolation gap filling ──────────────────

_INTERP_SQL = f"""
WITH e AS ({EVENTS_SQL}),
masked AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM e
),
bounds AS (
  SELECT event_id, user_id, us, v,
         last_value(v IGNORE NULLS) OVER wa AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
           OVER wa AS pus,
         first_value(v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
           OVER wf AS nus
  FROM masked
  WINDOW wa AS (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, v AS raw_value,
       floor(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL AND nus > pus
           THEN pv + (nv - pv) * (CAST(us - pus AS DOUBLE) / (nus - pus))
         WHEN pv IS NOT NULL THEN pv
         ELSE nv
       END * 1000000.0 + 0.5) / 1000000.0 AS interp_value
FROM bounds
"""


@register("gap_fill_interpolate", _INTERP_SQL)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap filling — the upgrade of
    gap_fill_forward's LOCF: a masked reading is reconstructed from
    its nearest valid neighbors on BOTH sides, weighted by event-time
    distance (integer microseconds → one exact double division), with
    LOCF / backfill degradation at series edges. Two mirrored window
    frames per key (running + following) computed in the same sorted
    pass over one shuffle — no self-join against neighbors, which is
    the naive formulation's trap. Same-timestamp duplicates are
    ordered by event_id so neighbor choice is deterministic; output
    rides the rounding convention."""
    e = load(spark, sf_dir, "events")
    masked = e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wa = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nn_us = F.when(F.col("v").isNotNull(), F.col("us"))
    bounds = masked.select(
        "event_id",
        "user_id",
        "us",
        "v",
        F.last("v", ignorenulls=True).over(wa).alias("pv"),
        F.last(nn_us, ignorenulls=True).over(wa).alias("pus"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(nn_us, ignorenulls=True).over(wf).alias("nus"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nus") > F.col("pus")),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("us") - F.col("pus")).cast("double")
                / (F.col("nus") - F.col("pus"))
            ),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return bounds.select(
        "event_id",
        "user_id",
        F.col("v").alias("raw_value"),
        pround(interp, 6).alias("interp_value"),
    )


# ───────────────── calendar spine zero-fill ──────────────────────

_SPINE_SQL = f"""
WITH e AS ({EVENTS_SQL}),
bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM e
),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
                                     CAST(b.d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds b
),
types AS (SELECT DISTINCT event_type FROM e),
grid AS (SELECT s.day, t.event_type FROM spine s CROSS JOIN types t),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM e GROUP BY CAST(ts AS DATE), event_type
)
SELECT g.day, g.event_type,
       COALESCE(d.n, 0) AS n_events,
       COALESCE(d.cents, 0) AS sum_cents
FROM grid g
LEFT JOIN daily d ON d.day = g.day AND d.event_type = g.event_type
"""


@register("calendar_spine_fill", _SPINE_SQL)
def calendar_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar reporting: a generated day × event-type spine
    LEFT-joined onto daily aggregates so silent days surface as
    explicit zero rows — without the spine, a day with no data simply
    doesn't exist in the output and every downstream moving average /
    chart / anomaly rule silently skips it (the classic time-series
    reporting bug). The spine comes from ``sequence()`` between the
    data's own min/max dates (two scalar aggregates, broadcast), the
    dimension list from a DISTINCT — both tiny at any data scale; the
    daily aggregate broadcasts as the join's build side (the
    preserved grid side of a left join cannot be the build side). Money in
    integer cents."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    types = e.select("event_type").distinct()
    grid = spine.crossJoin(types)
    daily = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    # Build side must be the RIGHT of a left-outer broadcast join —
    # F.broadcast(grid) on the preserved side is silently unsupported
    # (HintErrorLogger) and falls back to a shuffle. The aggregated
    # daily table is the broadcastable side.
    return grid.join(F.broadcast(daily), ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events"),
        F.coalesce(F.col("cents"), F.lit(0).cast("bigint")).alias(
            "sum_cents"
        ),
    )


# ───────────────── k-core peeling (bounded rounds) ───────────────

_KCORE_K = 4
_KCORE_ROUNDS = 3

_KCORE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
),
edges AS (
  SELECT a.s AS u, b.s AS v
  FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.s < b.s
  GROUP BY a.s, b.s
),
und0 AS (
  SELECT u AS a, v AS b FROM edges
  UNION ALL SELECT v AS a, u AS b FROM edges
),
d0 AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und0 GROUP BY a),
keep1 AS (SELECT a FROM d0 WHERE deg >= {_KCORE_K}),
und1 AS (
  SELECT e.a, e.b FROM und0 e
  JOIN keep1 ka ON ka.a = e.a
  JOIN keep1 kb ON kb.a = e.b
),
d1 AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und1 GROUP BY a),
keep2 AS (SELECT a FROM d1 WHERE deg >= {_KCORE_K}),
und2 AS (
  SELECT e.a, e.b FROM und1 e
  JOIN keep2 ka ON ka.a = e.a
  JOIN keep2 kb ON kb.a = e.b
),
d2 AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und2 GROUP BY a),
keep3 AS (SELECT a FROM d2 WHERE deg >= {_KCORE_K}),
und3 AS (
  SELECT e.a, e.b FROM und2 e
  JOIN keep3 ka ON ka.a = e.a
  JOIN keep3 kb ON kb.a = e.b
),
d3 AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und3 GROUP BY a)
SELECT CAST(a AS BIGINT) AS node, deg AS core_degree
FROM d3 WHERE deg >= {_KCORE_K}
"""


@register("kcore_peel", _KCORE_SQL)
def kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition (3 peeling rounds, k=4) on the
    supplier co-occurrence graph: repeatedly drop
    nodes of degree < k and recount — the community-density screen
    used to prune weakly-connected spam subgraphs before expensive
    graph analytics. Fixed round count keeps both sides loop-free
    and the oracle an unrolled-CTE twin (full k-core runs rounds to
    a fixpoint; each round here is the same operator, so the bounded
    form pins the recurrence exactly — pagerank_integer's unrolling
    argument). Spark side: per round one degree aggregation + two
    semi joins against the ≤|nodes| keep-list, frontier lineage cut
    per round. Scale: everything keys on node id; the keep-list
    semi joins broadcast at any realistic core size."""
    li = load(spark, sf_dir, "lineitem")
    # Edge generation via operators.graph.cooccurrence_pairs (one
    # groupBy(orderkey) collect_set + array-native pair explode
    # instead of distinct + self-join + re-agg — see graph_triangles).
    co = cooccurrence_pairs(
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")),
        "ok",
        "s",
    )
    edges = co.distinct()
    und = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    # Loop cuts stay localCheckpoint(eager=False) DELIBERATELY — the
    # r13 A/B (5 interleaved passes, sf0.1) measured the persist
    # alternatives 3-5x SLOWER here (ckpt 1.8-3.3 s vs lazy persists
    # 7-27 s vs no cuts 6-19 s): unlike pagerank's equi-join loop,
    # nothing downstream exploits a cached table's hash partitioning
    # (the keep-list joins broadcast), so persist's only effect is
    # materializing each round as an InMemoryRelation whose partition
    # count AQE cannot coalesce
    # (canChangeCachedPlanOutputPartitioning=false) — the cached
    # union doubles to 2x200 partitions of tiny data per round while
    # the checkpoint captures the AQE-coalesced handful. AQE-eager
    # build-time materialization (see plans/materialize.py) is the
    # accepted cost of the faster shape.
    und = und.localCheckpoint(eager=False)
    for _ in range(_KCORE_ROUNDS):
        deg = und.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= _KCORE_K).select("a")
        und = (
            und.join(F.broadcast(keep), "a", "left_semi")
            .join(
                F.broadcast(keep.select(F.col("a").alias("b"))),
                "b",
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )
    final = und.groupBy("a").agg(F.count("*").cast("bigint").alias("deg"))
    return final.where(F.col("deg") >= _KCORE_K).select(
        F.col("a").cast("bigint").alias("node"),
        F.col("deg").alias("core_degree"),
    )


# ───────────────────── rank-based AUC (model eval) ───────────────

_AUC_SQL = """
WITH scored AS (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS score,
         CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
ranked AS (
  SELECT vec_id, score, y,
         CAST(row_number() OVER (ORDER BY score, vec_id) AS BIGINT) AS r
  FROM scored
),
agg AS (
  SELECT CAST(SUM(CASE WHEN y = 1 THEN r ELSE 0 END) AS BIGINT)
           AS pos_rank_sum,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked
)
SELECT n_pos, n - n_pos AS n_neg,
       floor((CAST(pos_rank_sum - n_pos * (n_pos + 1) // 2 AS DOUBLE)
              / (CAST(n_pos AS DOUBLE) * (n - n_pos)))
             * 1000000.0 + 0.5) / 1000000.0 AS auc
FROM agg
"""


@register("auc_rank_eval", _AUC_SQL)
def auc_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC by the Mann–Whitney rank identity:
    AUC = (Σ rank(positives) − n⁺(n⁺+1)/2) / (n⁺·n⁻) — the model-
    evaluation primitive, computed WITHOUT enumerating the n⁺·n⁻
    score pairs (the naive join is quadratic in class sizes). The
    global rank comes from operators.ranking.global_rank — the
    range-partitioned two-phase construction — so no single-partition
    window exists; everything after ranking is one map-side-combined
    aggregate to a single row. Score ties resolve by vec_id in BOTH
    engines (identical total order → identical ranks; on continuous
    scores this matches the average-rank AUC up to measure-zero
    ties). Numerator stays in integer rank arithmetic until the one
    final division."""
    from skysafe_datalake_spark.operators.ranking import global_rank

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("y"),
    )
    ranked = global_rank(
        scored, [F.col("score").asc(), F.col("vec_id").asc()], rank_name="r"
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("pos_rank_sum"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.count("*").cast("bigint").alias("n"),
    )
    return agg.select(
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        pround(
            (
                F.col("pos_rank_sum")
                - F.expr("n_pos * (n_pos + 1) DIV 2")
            ).cast("double")
            / (
                F.col("n_pos").cast("double")
                * (F.col("n") - F.col("n_pos"))
            ),
            6,
        ).alias("auc"),
    )


# ───────────── confusion-matrix evaluation (P/R/F1) ──────────────

_CONFUSION_SQL = f"""
WITH e AS ({EVENTS_SQL}),
cents AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM e
),
thr AS (
  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)
    AS median_c
  FROM cents
),
pred AS (
  SELECT y, CASE WHEN c >= thr.median_c THEN 1 ELSE 0 END AS p
  FROM cents, thr
),
m AS (
  SELECT CAST(SUM(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS tp,
         CAST(SUM(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS fp,
         CAST(SUM(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS fn,
         CAST(SUM(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS tn
  FROM pred
)
SELECT tp, fp, fn, tn,
       floor(CAST(tp AS DOUBLE) / (tp + fp) * 1000000.0 + 0.5)
         / 1000000.0 AS precision_,
       floor(CAST(tp AS DOUBLE) / (tp + fn) * 1000000.0 + 0.5)
         / 1000000.0 AS recall_,
       floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1000000.0 + 0.5)
         / 1000000.0 AS f1
FROM m
"""


@register("confusion_matrix_eval", _CONFUSION_SQL)
def confusion_matrix_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classifier evaluation: a median-threshold predictor
    (integer cents, exact discrete median via percentile_disc — a
    REAL dataset value, so both engines pick the identical cut with
    no interpolation ambiguity) scored against the purchase label:
    confusion counts plus precision/recall/F1, integers until three
    final divisions. Together with auc_rank_eval this gives the
    model-eval pair every training pipeline ends with (threshold-free
    ranking quality + threshold-dependent operating point). One
    aggregation pass after a broadcast scalar threshold — constant
    output at any scale. (Column named precision_ because DuckDB
    reserves bare `precision`.)"""
    e = load(spark, sf_dir, "events")
    cents = e.select(
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    median_c = cents.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)").cast(
            "bigint"
        )
    ).first()[0]  # 1-row scalar pull (broadcast threshold)
    pred = cents.select(
        "y", F.when(F.col("c") >= median_c, 1).otherwise(0).alias("p")
    )
    m = pred.agg(
        F.sum(F.when((F.col("p") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((F.col("p") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("p") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("p") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        pround(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
        ).alias("precision_"),
        pround(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6
        ).alias("recall_"),
        pround(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ).alias("f1"),
    )


# ───────────── population stability index (drift) ────────────────

_PSI_SQL = f"""
WITH e AS ({EVENTS_SQL}),
halves AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half
  FROM e
),
cuts AS (
  SELECT
    CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c1,
    CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c2,
    CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c3,
    CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c4,
    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c5,
    CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c6,
    CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c7,
    CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c8,
    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY c) AS BIGINT) AS c9
  FROM halves WHERE half = 0
),
binned AS (
  SELECT half,
         CASE WHEN c < cuts.c1 THEN 0 WHEN c < cuts.c2 THEN 1
              WHEN c < cuts.c3 THEN 2 WHEN c < cuts.c4 THEN 3
              WHEN c < cuts.c5 THEN 4 WHEN c < cuts.c6 THEN 5
              WHEN c < cuts.c7 THEN 6 WHEN c < cuts.c8 THEN 7
              WHEN c < cuts.c9 THEN 8 ELSE 9 END AS bin
  FROM halves, cuts
),
counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         CAST(SUM(n_cur) AS BIGINT) AS t_cur
  FROM counts
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       floor(CAST(SUM(CAST(
           (CAST(n_ref AS DOUBLE) / t_ref - CAST(n_cur AS DOUBLE) / t_cur)
           * ln((CAST(n_ref AS DOUBLE) / t_ref)
                / (CAST(n_cur AS DOUBLE) / t_cur))
         AS DECIMAL(18,12))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
         AS psi
FROM counts, tot
"""


@register("psi_drift_monitor", _PSI_SQL)
def psi_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half
    of the event stream — THE production drift alarm for a feature
    or score distribution (rule of thumb: >0.2 means retrain).
    Reference-half decile cuts come from percentile_disc (REAL
    dataset values — both engines cut identically, no interpolation),
    binning is a broadcast CASE chain, and PSI's per-bin terms are
    decimal-summed so the statistic is partition-order-exact. Counts
    stay integer until two divisions and one ln per bin — 10 bins
    regardless of data size, one aggregation pass per half."""
    e = load(spark, sf_dir, "events")
    halves = e.select(
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("c"),
        F.when(F.col("ts") < "2024-01-16", 0).otherwise(1).alias("half"),
    )
    ref = halves.where(F.col("half") == 0)
    cuts = ref.agg(
        *[
            F.expr(
                f"CAST(percentile_disc(0.{q}) WITHIN GROUP (ORDER BY c)"
                " AS BIGINT)"
            ).alias(f"c{q}")
            for q in range(1, 10)
        ]
    ).first()  # 9 scalar cut points — bounded pull, broadcast below
    bin_col = F.lit(9)
    for q in range(9, 0, -1):
        bin_col = F.when(F.col("c") < cuts[f"c{q}"], q - 1).otherwise(
            bin_col
        )
    counts = halves.select("half", bin_col.alias("bin")).groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    )
    p = F.col("n_ref").cast("double") / F.col("t_ref")
    qq = F.col("n_cur").cast("double") / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .agg(
            F.count("*").cast("bigint").alias("n_bins"),
            pround(
                F.sum(((p - qq) * F.log(p / qq)).cast("decimal(18,12)"))
                .cast("double"),
                6,
            ).alias("psi"),
        )
    )


# ───────────── group-wise z-score normalization ──────────────────

_ZSCORE_SQL = f"""
WITH e AS ({EVENTS_SQL}),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS s2
  FROM e GROUP BY event_type
),
mu_sigma AS (
  SELECT event_type, n,
         s1 / n AS mu,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma
  FROM stats
)
SELECT e.event_id, e.event_type,
       floor((e.value - m.mu) / m.sigma * 1000000.0 + 0.5) / 1000000.0
         AS zscore
FROM e JOIN mu_sigma m ON m.event_type = e.event_type
"""


@register("groupwise_zscore", _ZSCORE_SQL)
def groupwise_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization — the feature-scaling step
    before any distance-based ML (the reference's StandardScaler
    semantics, M2, re-derived relationally so it is oracle-exact and
    needs no fitted model object). Group μ/σ come from decimal-exact
    sufficient statistics (sample σ, matching Spark stddev/DuckDB
    stddev_samp) computed in ONE aggregation and broadcast back onto
    the facts — the fact table is scanned twice but never shuffled
    (a window formulation would shuffle every row by group; the
    broadcast join wins whenever groups ≪ rows, which is what
    "normalization per feature/segment" always looks like).
    Reference: /root/reference/src/combine_spark.py:199-204
    (StandardScaler withMean/withStd) and :353-355 (the fitted μ/σ
    reused as plain column expressions — exactly this shape)."""
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum(F.col("value")).alias("s1"),
        dsum(F.col("value") * F.col("value"), 4).alias("s2"),
    )
    mu_sigma = stats.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sigma"),
    )
    return e.join(F.broadcast(mu_sigma), "event_type").select(
        "event_id",
        "event_type",
        pround((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias(
            "zscore"
        ),
    )


# ───────────── event-sequence pattern matching (CEP) ─────────────

_PATTERN_SQL = f"""
WITH e AS ({EVENTS_SQL}),
coded AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
              ELSE 'e' END AS sym
  FROM e
),
seqs AS (
  SELECT user_id,
         string_agg(sym, '' ORDER BY ts, event_id) AS seq
  FROM coded
  GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS n_events,
       CAST(length(seq) - length(regexp_replace(seq, 'v[ce]*c[ce]*p', '',
                                                'g')) AS BIGINT)
         AS matched_len,
       CAST(len(regexp_extract_all(seq, 'v[ce]*c[ce]*p')) AS BIGINT)
         AS n_conversions
FROM seqs
WHERE len(regexp_extract_all(seq, 'v[ce]*c[ce]*p')) > 0
"""


@register("event_pattern_match", _PATTERN_SQL)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style complex-event detection, relationally:
    each user's event history becomes an ordered symbol string (one
    deterministic char per event type, total order (ts, event_id)),
    and the pattern "view, then click, then purchase, with only
    clicks/errors between" is the regex v[ce]*c[ce]*p — counting
    non-overlapping matches per user. Spark has no MATCH_RECOGNIZE;
    encoding runs as ordered string aggregation (one shuffle by
    user, sequences bounded by per-user activity) and the PATTERN
    layer is a pure codegen regex — the same trick scales to any
    regular pattern, which is exactly the MATCH_RECOGNIZE subset
    most CEP queries use. Greedy regex semantics are identical in
    both engines (POSIX leftmost-longest differences don't arise:
    the pattern is deterministic on this alphabet)."""
    e = load(spark, sf_dir, "events")
    coded = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
        .alias("sym"),
    )
    seqs = coded.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "sym"))
                ),
                lambda s: s["sym"],
            ),
            "",
        ).alias("seq")
    )
    pat = "v[ce]*c[ce]*p"
    n_conv = F.size(F.expr(f"regexp_extract_all(seq, '{pat}', 0)"))
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        (
            F.length("seq")
            - F.length(F.regexp_replace("seq", pat, ""))
        )
        .cast("bigint")
        .alias("matched_len"),
        n_conv.cast("bigint").alias("n_conversions"),
    ).where(n_conv > 0)


# ───────────── calibration bins (reliability) ────────────────────

_CALIB_SQL = """
WITH scored AS (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS raw,
         CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
bounds AS (SELECT MIN(raw) AS lo, MAX(raw) AS hi FROM scored),
binned AS (
  SELECT y, raw,
         LEAST(CAST(floor((raw - bounds.lo) / (bounds.hi - bounds.lo)
                          * 10.0) AS BIGINT), 9) AS bin
  FROM scored, bounds
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       floor(CAST(SUM(CAST(raw AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*)
             * 1000000.0 + 0.5) / 1000000.0 AS mean_score,
       floor(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
         / 1000000.0 AS pos_rate
FROM binned
GROUP BY bin
"""


@register("calibration_bins", _CALIB_SQL)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram data — the third leg of the eval family
    (ranking quality: auc_rank_eval; operating point:
    confusion_matrix_eval; calibration: this): scores bucketed into
    10 equi-width bins between the observed min/max (two broadcast
    scalars), per-bin mean score vs positive rate. A calibrated
    model's bins hug the diagonal; the gap drives recalibration.
    Integer counts plus a decimal-summed score mean; bin assignment
    is a single exact double expression clamped at the top edge
    (the max score lands in bin 9, not a phantom bin 10). One
    aggregation pass, 10 output rows at any scale."""
    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.element_at("embedding", 1).cast("double").alias("raw"),
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("y"),
    )
    bounds = scored.agg(
        F.min("raw").alias("lo"), F.max("raw").alias("hi")
    )
    binned = scored.crossJoin(F.broadcast(bounds)).select(
        "y",
        "raw",
        F.least(
            F.floor(
                (F.col("raw") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 10.0
            ).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        pround(
            dsum(F.col("raw"), 8) / F.count("*"), 6
        ).alias("mean_score"),
        pround(
            F.sum("y").cast("double") / F.count("*"), 6
        ).alias("pos_rate"),
    )
