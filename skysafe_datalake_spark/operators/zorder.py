"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

At 100 TB, a table sorted by one column skips beautifully on that
column and not at all on any other. Interleaving the bits of several
bucketized columns into one Morton key and range-partitioning + sorting
the write on that key gives every participating column locality: each
output file covers a small tile of the key space, so its parquet
row-group min/max footer stats are tight in EVERY dimension and the
reader prunes files/row-groups for predicates on any of them. This is
the same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY; here
it is a pure Spark write-path operator (repartitionByRange + sort), no
table format required.

All arithmetic is integer shifts/masks in JVM expressions (zero UDFs),
so the key is deterministic and cheap, and the oracle twin
(workload/analytics.zorder_tile_stats) verifies the curve math
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton key interleaving ``bits`` low bits of each column.

    Bit ``i`` of column ``d`` lands at position ``i * len(cols) + d``,
    so consecutive key values walk a space-filling curve over the
    (2^bits)^N grid. Inputs must already be bucketized to
    [0, 2^bits) (see :func:`range_bucket`); values outside wrap via
    the masking ``& 1`` — bucketize first. Pure shift/mask column
    expression: whole-stage-codegen-friendly, no shuffle of its own.
    """
    n = len(cols)
    if bits * n > 63:
        # Bit position 63 is the bigint sign bit: 1 << 63 overflows a
        # LongType literal (and past it the key ordering corrupts) —
        # e.g. 8 columns at the default bits=8, or 4 at bits=16.
        raise ValueError(
            f"zorder_key needs bits * len(cols) <= 63 to fit a signed "
            f"bigint; got bits={bits} * {n} columns = {bits * n}. "
            "Lower bits (coarser tiles) or drop a column."
        )
    key = F.lit(0).cast("bigint")
    for d, c in enumerate(cols):
        cb = c.cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cb, i).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(1 << (i * n + d))).cast("bigint")
    return key


def range_bucket(col_sql: str, n_sql: str, bits: int = 8) -> Column:
    """Map a dense integer key in [0, n) to a [0, 2^bits) bucket with
    exact integer math: ``(col * 2^bits) div n`` — order-preserving,
    so the Morton tiles align with range predicates on the original
    column. Takes SQL snippets (not Columns) because integer division
    must stay integral: ``div`` never routes through doubles, which
    would lose exactness past 2^53 on real key domains."""
    return F.expr(
        f"(CAST({col_sql} AS BIGINT) * {1 << bits}) div CAST({n_sql} AS BIGINT)"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    key: Column,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` on the Morton ``key`` and write ``n_files``
    parquet files, each covering a contiguous key range.

    repartitionByRange samples the key to build balanced range
    boundaries (one shuffle), and the within-partition sort makes
    row-group-level stats tight too, so both file-level AND
    row-group-level min/max pruning fire. At cluster scale this is
    the standard compaction job shape: one range shuffle, no driver
    involvement, output size controlled by n_files."""
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
