"""Bucketed-table storage: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides. Pre-bucketing both tables on the join key (same bucket count)
makes bucket membership part of the table layout: the planner proves
both sides are already hash-partitioned on the key and drops BOTH
Exchanges — the join reads bucket i of each table on the same
executor. ``sort_by`` additionally pre-sorts within buckets so
sort-merge join skips its Sort. This is Spark's native data-source
bucketing (no Hive metastore needed); write once, amortize over every
subsequent join/aggregation keyed on the bucket columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table.

    ``path`` makes it an external table (data at the given location);
    otherwise it lands in the session warehouse. Bucket count should
    be sized so one bucket of the LARGER table fits an executor's
    memory at target scale.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
