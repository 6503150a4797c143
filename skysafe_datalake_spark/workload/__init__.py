"""Driver-facing workload: named queries + DuckDB oracle SQL.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable over the
driver's synthetic tables (TESTDATA.md), exercising one operator
family from SURVEY.md §2. ``ORACLE`` holds the ANSI-SQL equivalent
DuckDB runs side-by-side; column names/aliases match exactly.

Cross-engine determinism rules used throughout (so value-hashes
match bit-for-bit):
- fractional aggregates go through DECIMAL sums (exact), then one
  double division, then ``round(x, 4)``;
- window/rank orderings always end in a unique tie-breaker column;
- distance-like ranking uses ``round(d, 6)`` so sub-nanometre libm
  divergence between JVM and C can never flip a winner.
"""

from skysafe_datalake_spark.workload.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
