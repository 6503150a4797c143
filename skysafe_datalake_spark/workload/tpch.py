"""TPC-H-shaped subquery & join-pattern battery (general SQL surface).

The reference pipeline has no subqueries (SURVEY.md §4 "join
reordering, constant folding, subquery decorrelation — not
applicable"), but a complete engine must run them; these queries
exercise the Catalyst rewrites that make correlated SQL scale:
scalar-subquery decorrelation (Q17), EXISTS/NOT EXISTS → semi/anti
hash joins (Q21/Q22), IN-subquery over a HAVING aggregate (Q18),
outer-join count distributions (Q13), aggregate-equals-scalar-max
(Q15), and nested IN with a group-key-correlated HAVING (Q20). Each query runs the SAME SQL
text through spark.sql and the DuckDB oracle, so the driver gate
verifies both the operator semantics and the SQL front-end — with
two r13 exceptions: Q11 and Q18 keep their oracle SQL verbatim but
Spark executes a provably-identical one-pass restructuring (see
_Q11_SPARK_SQL/_Q18_SPARK_SQL for the equivalence arguments; the
gate re-verifies both row-for-row).

Cross-engine determinism: fractional aggregates go through
DECIMAL sums (associative, partition-order-invariant) per the
workload/__init__ convention; money comparisons use integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.relational import dsum_sql
from skysafe_datalake_spark.workload.tables import load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# ───────────────────────── Q13: outer-join distribution ──────────

_Q13_SQL = """
SELECT n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
  SELECT c_custkey,
         CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY n_orders
"""


@register("tpch_q13_like", _Q13_SQL)
def tpch_q13_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with a non-equi residual predicate, COUNT over the nullable
    side (customers with zero orders land in the n_orders=0 bucket),
    then a second aggregation over the first's output. Scale shape:
    both aggregations are hash aggs with map-side partials; the outer
    join shuffles on custkey once and the second groupBy reduces
    |customers| rows to a handful of buckets — no driver round-trip.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL)


# ───────────────────────── Q17: correlated scalar subquery ───────

_Q17_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       {dsum_sql('l.l_extendedprice')} AS total_price
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < (
    SELECT 0.5 * ({dsum_sql('l2.l_quantity')} / COUNT(*))
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("tpch_q17_like", _Q17_SQL)
def tpch_q17_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): a correlated scalar
    subquery computing the per-part average quantity. Catalyst
    decorrelates it into one aggregate over lineitem grouped by
    partkey joined back to the outer lineitem — the plan a human
    would hand-write; written as correlated SQL to prove the rewrite.
    The per-part average goes through a decimal sum and ONE double
    division so the 0.5·avg threshold is bit-identical across
    engines and partitionings (a float SUM would make boundary rows
    flip). Scale: the decorrelated agg shuffles lineitem once on
    l_partkey; the Brand filter pushes into the part scan and the
    part join is broadcastable."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


# ───────────────────────── Q18: IN over HAVING aggregate ─────────

_Q18_SQL = f"""
SELECT c.c_name,
       o.o_orderkey,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
       {dsum_sql('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {dsum_sql('l_quantity')} > 180.0
)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
"""


# Spark-side one-pass form (r13 optimization; the registered oracle
# SQL above is unchanged and DuckDB still runs the IN-over-HAVING
# text). The original shape pays lineitem twice: the IN subquery
# aggregates it per orderkey, then the semi-joined outer join scans
# it AGAIN and re-aggregates the same per-order quantity sum. But
# the outer GROUP BY includes o_orderkey, and orders/customer join
# 1:1 per line, so every output group is exactly the line set of one
# order — the outer SUM is bit-for-bit the inner one (same decimal
# sum over the same rows, same final cast). Computing the per-order
# aggregate ONCE and joining it through orders→customer is therefore
# identical row-for-row, and does one lineitem pass instead of two
# (guide §1.2). The >180.0 filter compares the same casted double as
# the original HAVING.
_Q18_SPARK_SQL = f"""
WITH order_qty AS (
  SELECT l_orderkey,
         {dsum_sql('l_quantity')} AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT c.c_name,
       o.o_orderkey,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
       q.sum_qty
FROM order_qty q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE q.sum_qty > 180.0
"""


@register("tpch_q18_like", _Q18_SQL)
def tpch_q18_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery whose
    inner query is itself a grouped HAVING aggregate; the oracle runs
    that text verbatim, pinning the semantics. Spark executes the
    one-pass form above (see _Q18_SPARK_SQL comment for the
    equivalence argument): the per-order quantity aggregate is
    computed once and carried through the orders/customer joins
    instead of being recomputed by the decorrelated semi join + outer
    re-aggregation. The quantity threshold compares a decimal-summed
    double against a constant, so the qualifying-order set is
    identical across engines. Scale: ONE lineitem shuffle on
    l_orderkey; the orders/customer dimension sides broadcast into
    the filtered per-order aggregate (the committed plan builds the
    broadcast from orders — see plans/r13/tpch_q18_like_after.txt)."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18_SPARK_SQL)


# ───────────────────────── Q21: EXISTS + NOT EXISTS ──────────────

_Q21_SQL = """
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@register("tpch_q21_like", _Q21_SQL)
def tpch_q21_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    hardest decorrelation pattern in the suite — an EXISTS (other
    suppliers touched the order) AND a NOT EXISTS (but none of THEM
    were late). Catalyst turns them into a left-semi and a left-anti
    hash join on l_orderkey. "Late" is a pure date comparison
    (shipdate > orderdate + 60 days) — integer day arithmetic, no
    float anywhere, so the qualifying set is exact. The final top-20
    is ORDER BY count DESC with the unique supplier name as
    tie-breaker → TakeOrderedAndProject, deterministic cut. Scale:
    three shuffles, all keyed on orderkey; the supplier dimension
    broadcasts."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_SQL)


# ───────────────────────── Q22: anti join + global scalar ────────

_Q22_SQL = """
WITH pos AS (
  SELECT CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal > 0.0
),
stats AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM pos
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM customer c, stats
WHERE CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) * stats.n_pos
        > stats.sum_cents
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_mktsegment
"""


@register("tpch_q22_like", _Q22_SQL)
def tpch_q22_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (promising inactive customers): a global
    scalar aggregate (average positive balance) feeding a filter,
    plus NOT EXISTS → left-anti join against orders (restricted to
    urgent orders so the anti side is non-trivially selective on the
    synthetic data). The average
    comparison is cross-multiplied into pure integer math
    (cents·n > sum_cents ⟺ cents > avg) so no engine ever divides —
    boundary-exact at any scale. DuckDB would promote SUM(BIGINT) to
    HUGEINT (renders as float64 in the gate's canonicalizer), hence
    the explicit CAST AS BIGINT on every sum. Scale: the stats CTE
    is a 1-row broadcast; the anti join shuffles on custkey once."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


# ───────────────────────── Q15: agg = scalar max ─────────────────

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("tpch_q15_like", _Q15_SQL)
def tpch_q15_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by revenue): a derived aggregate
    referenced TWICE — once as the join input, once inside a scalar
    MAX subquery the filter compares against. Catalyst evaluates the
    scalar subquery once (a 1-row broadcast), not per outer row, and
    the equality is between two decimal-summed doubles computed by
    the identical expression — so the 'equals the max' cut is exact
    even though revenue is fractional (a float-summed revenue would
    make ties engine-dependent). Scale: one shuffle for the revenue
    agg; the supplier join broadcasts the aggregated side."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


# ───────────── Q20: nested IN + correlated HAVING ────────────────

_Q20_SQL = f"""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM part WHERE p_size < 10
  )
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING {dsum_sql('l.l_quantity')} > 0.3 * (
    SELECT {dsum_sql('l2.l_quantity')}
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
)
ORDER BY s.s_suppkey
"""


@register("tpch_q20_like", _Q20_SQL)
def tpch_q20_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (dominant suppliers of small parts): THREE
    nesting levels — an IN whose inner query filters through another
    IN and whose HAVING compares each (supplier, part) group against
    a scalar subquery CORRELATED ON THE GROUP KEY (this supplier's
    share vs the part's total volume). Catalyst decorrelates the
    inner scalar into a per-part aggregate joined on l_partkey and
    plans both INs as semi joins — no per-group re-execution. Share
    threshold compares two decimal sums scaled by an exact binary
    fraction, so group membership is boundary-exact. Scale: two
    lineitem aggregations (both keyed on partkey/suppkey) and two
    semi joins; the part filter pushes into its scan."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(_Q20_SQL)


# ───────────────────────── Q2: correlated MIN subquery ───────────

_Q2_SQL = """
SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
       l.l_extendedprice AS min_price
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND p.p_size = 15
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p.p_partkey
      AND r2.r_name = 'EUROPE'
  )
GROUP BY p.p_partkey, p.p_brand, s.s_name, n.n_name, l.l_extendedprice
"""


@register("tpch_q2_like", _Q2_SQL)
def tpch_q2_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): a correlated MIN subquery
    over the same join tree as the outer query (lineitem stands in
    for partsupp — the testdata has no partsupp table, but
    l_partkey+l_suppkey is the same part↔supplier bridge). Catalyst
    decorrelates the MIN into one aggregate grouped by partkey and
    joins it back — the outer tree is never re-executed per row. The
    equality compares a STORED double against MIN of the same stored
    column (no arithmetic), so the qualifying set is exact. The
    trailing GROUP BY dedupes multiple line items at the min price so
    the result is a set, not a bag. Scale: the region/nation/supplier
    dims broadcast; lineitem shuffles once on partkey for the
    decorrelated MIN and once for the join back."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


# ───────────────────────── Q4: EXISTS + date-window agg ──────────

_Q4_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("tpch_q4_like", _Q4_SQL)
def tpch_q4_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS whose inner
    predicate references BOTH sides (l_shipdate > o_orderdate + 30
    days — the reference uses commitdate<receiptdate; the testdata
    lineitem has neither column, so ship-lag-after-order carries the
    same correlated-inequality shape). Catalyst plans it as a
    left-semi join on orderkey with the inequality as a join residual.
    Date math is integer-day arithmetic — exact. Scale: the quarter
    filter prunes orders at the scan; one shuffle on orderkey."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


# ───────────────────────── Q6: single-scan filter agg ────────────

_Q6_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24.0
"""


@register("tpch_q6_like", _Q6_SQL)
def tpch_q6_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    scan-dominated query — no join, every predicate pushes into the
    parquet reader (date range, discount band, quantity cap all show
    as PushedFilters), one global aggregate with map-side partials.
    Discount bounds compare STORED doubles against constants (the
    generator emits 11 discrete discount values; 0.02/0.04 are exact
    binary-representable comparisons on unmodified column values).
    The revenue product goes through the decimal-sum convention.
    At 100 TB this query is pure scan throughput — the plan has no
    shuffle at all until the single-row final agg."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


# ───────────────────────── Q7: volume shipping ───────────────────

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume', 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1.0 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
     OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_like", _Q7_SQL)
def tpch_q7_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between trading blocs): a
    6-way join where the interesting predicate is a symmetric OR over
    the two dimension legs (Europe↔Asia in either direction — region
    pairs rather than the reference's nation pairs, because the
    testdata's 10 suppliers don't guarantee any single nation is
    populated across scale factors). Group key includes a
    year extracted from the ship date. Scale: nation/region/supplier
    /customer all broadcast; lineitem→orders is the only real
    shuffle; the OR cannot push into one dim scan but Catalyst still
    prunes both region scans to the two named regions."""
    _views(
        spark, sf_dir,
        "supplier", "lineitem", "orders", "customer", "nation", "region",
    )
    return spark.sql(_Q7_SQL)


# ───────────────────────── Q8: market share ratio ────────────────

_Q8_SQL = f"""
SELECT o_year,
       {dsum_sql('euro_volume', 4)} / {dsum_sql('volume', 4)} AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1.0 - l.l_discount) AS volume,
         CASE WHEN r1.r_name = 'EUROPE'
              THEN l.l_extendedprice * (1.0 - l.l_discount)
              ELSE 0.0 END AS euro_volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE r2.r_name = 'ASIA'
) all_nations
GROUP BY o_year
"""


@register("tpch_q8_like", _Q8_SQL)
def tpch_q8_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): ratio of a CASE-gated sum to
    the total sum per group — European suppliers' share of
    Asian-customer revenue by order year. Both numerator and
    denominator go through exact decimal sums and meet in ONE double
    division per group, so the ratio is bit-identical across engines
    and partition orders (two float sums would each drift
    independently and the division would amplify it). Scale: same
    join graph as Q7 — dims broadcast, one lineitem↔orders shuffle;
    the CASE costs nothing extra since both branches read the same
    columns."""
    _views(
        spark, sf_dir,
        "lineitem", "supplier", "orders", "customer", "nation", "region",
    )
    return spark.sql(_Q8_SQL)


# ───────────────────────── Q9: profit by nation × year ───────────

_Q9_SQL = f"""
SELECT nation, o_year,
       {dsum_sql('amount', 4)} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1.0 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@register("tpch_q9_like", _Q9_SQL)
def tpch_q9_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): revenue minus a cost
    term (0.1·retailprice·quantity stands in for the missing
    partsupp.ps_supplycost) over a 5-way join with a LIKE filter on
    part name, grouped by supplier nation and order year. The profit
    expression is computed per row in double then decimal-summed —
    the one rounding step happens at a deterministic per-row point,
    not across a partition-ordered float sum. Scale: part/supplier/
    nation broadcast; the LIKE pushes to the part scan as a
    StringContains filter; lineitem shuffles once to meet orders."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    return spark.sql(_Q9_SQL)


# ───────────────────────── Q10: returned-item ranking ────────────

_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name,
       {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)', 4)} AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("tpch_q10_like", _Q10_SQL)
def tpch_q10_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter-filtered
    3-way join restricted to returned lines, grouped per customer,
    global top-20 by revenue. The revenue sort key is a decimal sum
    (exact), and c_custkey breaks ties, so the LIMIT cut is
    deterministic across engines — a float revenue would make rank
    19/20/21 engine-dependent. Scale: plans as
    TakeOrderedAndProject (per-partition top-20, driver merges k·p
    rows); the date filter prunes the orders scan."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL)


# ───────────────────────── Q11: value concentration ──────────────

_Q11_SQL = f"""
WITH part_value AS (
  SELECT l_partkey,
         {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM part_value
WHERE value > (
  SELECT 1.5 * {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)}
           / COUNT(DISTINCT l_partkey)
  FROM lineitem
)
ORDER BY value DESC, l_partkey
"""


# Spark-side one-pass form (r13 optimization; the registered oracle
# SQL above is unchanged). The original text pays lineitem twice:
# once for the per-partkey aggregate and once for the scalar
# subquery's global sum + COUNT(DISTINCT l_partkey) (itself another
# partkey-keyed exchange). Both are derivable EXACTLY from the
# per-key decimal partials: decimal addition is exact and
# associative, so SUM(dec_value) over the groups equals the direct
# DECIMAL sum over all rows to the last digit (same value → same
# double after the one final cast), and COUNT(*) over the groups
# equals COUNT(DISTINCT l_partkey) because l_partkey is never null.
# The threshold arithmetic keeps the original shape and order
# (1.5 * total) / n in doubles, so the comparison is bit-identical.
# What this buys (guide §2.4): the old scalar subquery planned
# SUM(expr) + COUNT(DISTINCT l_partkey) as the two-phase distinct
# HashAggregate chain (4 aggregate phases + an extra partkey
# exchange — see plans/r13/tpch_q11_like_before.txt); the new scalar
# side is a plain per-key agg + a single-row fold. (Measured: AQE's stage cache does NOT reuse the partkey
# exchange across the subquery boundary, so both sides still scan the
# 3-column pruned lineitem — the win is the removed Expand + second
# distinct-shuffle, 1.59 → 1.07 s min-of-5 at sf0.1. The
# crossJoin-a-1-row-agg form that makes reuse possible in one plan
# tree measured SLOWER — 1.16 vs 1.02 s — the BNLJ overhead eats the
# saved scan at this SF; documented here so the next round doesn't
# re-derive it.)
_Q11_SPARK_SQL = """
WITH part_value_dec AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
           AS dec_value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(dec_value AS DOUBLE) AS value
FROM part_value_dec
WHERE CAST(dec_value AS DOUBLE) > (
  SELECT 1.5 * CAST(SUM(dec_value) AS DOUBLE) / COUNT(*)
  FROM part_value_dec
)
ORDER BY value DESC, l_partkey
"""


@register("tpch_q11_like", _Q11_SQL)
def tpch_q11_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-key
    aggregate filtered against a FRACTION OF THE GLOBAL aggregate —
    the HAVING-vs-scalar-subquery pattern (parts whose traded value
    exceeds 1.5× the average per-part value; lineitem value stands in
    for the missing partsupp stock value, and the threshold is
    relative to the per-part average because an absolute fraction of
    the total — the reference's 0.0001/SF — empties out as the part
    count grows with scale); the oracle runs that text verbatim.
    Spark executes the restructured form above (see _Q11_SPARK_SQL
    comment for the exactness argument): the global sum and distinct
    part count are folded over the per-key DECIMAL partials instead
    of COUNT(DISTINCT)'s expand-and-reshuffle. Both sides of the
    comparison are decimal-summed doubles; the scaling and compare
    are single double ops — boundary-exact. Catalyst still evaluates
    the scalar subquery once as a 1-row broadcast. Scale: two pruned
    3-column scans of lineitem (cross-subquery stage reuse measured
    not to fire), one partkey exchange each — but no Expand row
    doubling; the per-key aggs are map-side-combined."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q11_SPARK_SQL)


# ───────────────────────── Q12: priority class counts ────────────

_Q12_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
"""


@register("tpch_q12_like", _Q12_SQL)
def tpch_q12_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split): join with a
    cross-table inequality residual (shipped after ordered; the
    testdata has no l_shipmode/commitdate so returnflag is the group
    key) and two complementary CASE-gated integer counts. Pure
    integer aggregation — no float anywhere past the filter. The
    explicit CAST AS BIGINT keeps DuckDB's SUM from widening to
    HUGEINT (which the gate canonicalizer renders as float64).
    Scale: one shuffle on orderkey; the year filter pushes into the
    lineitem scan; both CASE sums fold into one hash-agg pass."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_SQL)


# ───────────────────────── Q14: promo revenue ratio ──────────────

_Q14_SQL = f"""
SELECT 100.0 * {dsum_sql('promo_rev', 4)} / {dsum_sql('rev', 4)}
         AS promo_pct
FROM (
  SELECT l.l_extendedprice * (1.0 - l.l_discount) AS rev,
         CASE WHEN p.p_type = 'PROMO'
              THEN l.l_extendedprice * (1.0 - l.l_discount)
              ELSE 0.0 END AS promo_rev
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
    AND l.l_shipdate < TIMESTAMP '1996-10-01'
) month_lines
"""


@register("tpch_q14_like", _Q14_SQL)
def tpch_q14_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): single-month join with a
    CASE-gated numerator over the same measure as the denominator,
    surfaced as one percentage row. Decimal sums on both sides, then
    exactly two double ops (multiply by 100, one division) — the
    published number is bit-stable. Scale: part broadcasts; the
    month filter prunes the lineitem scan to ~1/80th of the table
    before the join; the final agg is a single row."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14_SQL)


# ───────────────────────── Q16: supplier-count distribution ──────

_Q16_SQL = """
SELECT p.p_brand, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
  )
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
"""


@register("tpch_q16_like", _Q16_SQL)
def tpch_q16_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT)
    per group with a NOT IN anti-subquery excluding flagged suppliers
    (lineitem bridges part↔supplier in lieu of partsupp; acctbal<2000
    replaces the complaint-LIKE so the excluded set is non-empty in
    the synthetic data). Catalyst plans NOT IN as a null-aware anti
    join — s_suppkey is non-null here so it degenerates to a plain
    left-anti broadcast. COUNT DISTINCT expands to a two-phase
    aggregate (dedup shuffle, then count) — exact, no HLL. Scale:
    the IN-list and brand/type predicates push to the part scan; one
    shuffle on the distinct key."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q16_SQL)


# ───────────────────────── Q19: disjunctive theta join ───────────

_Q19_SQL = f"""
SELECT {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)', 4)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1.0 AND l.l_quantity <= 11.0)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10.0 AND l.l_quantity <= 20.0)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20.0 AND l.l_quantity <= 30.0)
"""


@register("tpch_q19_like", _Q19_SQL)
def tpch_q19_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    an equi-join whose filter is an OR of three conjunctions mixing
    columns from BOTH sides. Catalyst keeps the equi-key as the hash
    join condition and evaluates the disjunction as a post-join
    residual, while the single-side implications (brand IN the three
    named brands, size ≤ 15, quantity ≤ 30) are inferred nowhere —
    which is exactly why the shape is in the battery: the plan must
    stay correct under predicates it cannot decompose. Quantity
    bounds compare stored integral-valued doubles — exact. Scale:
    part broadcasts; lineitem is scanned once with no shuffle before
    the final 1-row agg."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19_SQL)
