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


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    sort_within_by: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of (typically
    streaming-produced) files into ceil(bytes / target) right-sized
    files, returning the new file count.

    Streaming sinks and per-micro-batch upserts accrete small files;
    at scale, scan cost becomes dominated by per-file open/footer
    overhead and the driver's file listing. This is the maintenance
    job every table format schedules (Delta OPTIMIZE / Iceberg
    rewrite_data_files) expressed directly on a parquet directory:
    one read, one repartition to the target count (coalesce can't
    RAISE parallelism and skips the optional re-sort), an optional
    within-partition sort to restore clustering (compose with
    operators.zorder.zorder_key to re-cluster while compacting), and
    an atomic directory swap so readers never observe a half-written
    table. The swap is a local-FS rename here; on an object store the
    same operator runs against a table-format commit instead.
    """
    import math
    import os
    import shutil
    import uuid

    partition_dirs = [
        d
        for d in (os.listdir(path) if os.path.isdir(path) else [])
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if partition_dirs:
        # A flat rewrite would silently collapse the partition layout
        # (and its pruning). Compact leaf partitions individually —
        # which is also the right unit of parallelism for the job.
        raise ValueError(
            f"compact() operates on leaf directories; {path} is "
            f"hive-partitioned ({partition_dirs[0]}, ...) — compact "
            "each partition directory instead"
        )

    df = spark.read.format(fmt).load(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)

    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    out.write.format(fmt).mode("overwrite").save(tmp)
    backup = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return n_files
