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
verifies both the operator semantics and the SQL front-end.

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


@register("tpch_q18_like", _Q18_SQL)
def tpch_q18_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery whose
    inner query is itself a grouped HAVING aggregate. Catalyst plans
    the IN as a left-semi hash join against the aggregated subquery —
    no materialized ID list on the driver. The quantity threshold
    compares a decimal-summed double against a constant, so the
    qualifying-order set is identical across engines. Scale: the
    inner agg and the outer join both key on l_orderkey/o_orderkey —
    one shuffle each, co-partitionable under bucketing."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18_SQL)


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
