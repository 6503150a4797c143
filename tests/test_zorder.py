"""Z-order clustering: curve math goldens + real file-skipping win."""

from __future__ import annotations

import glob
import tempfile

import pytest
from pyspark.sql import functions as F

from skysafe_datalake_spark.operators.zorder import (
    range_bucket,
    zorder_key,
    zorder_write,
)
from tests.conftest import SF_SMALL


def _morton(x: int, y: int, bits: int = 8) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_golden(spark):
    cases = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame(cases, "x int, y int")
    rows = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in rows:
        assert r.z == _morton(r.x, r.y), (r.x, r.y)


def test_zorder_key_locality(spark):
    """Consecutive Morton keys stay in a small spatial neighbourhood:
    any aligned 256-key block spans ≤16 in each dimension."""
    pts = [(x, y) for x in range(0, 256, 7) for y in range(0, 256, 11)]
    df = spark.createDataFrame(pts, "x int, y int")
    spans = (
        df.select("x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z"))
        .groupBy(F.expr("z div 256").alias("blk"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert spans and all(r.sx <= 15 and r.sy <= 15 for r in spans)


def test_range_bucket_exact(spark):
    df = spark.createDataFrame([(0,), (499,), (999,)], "k bigint")
    got = [
        r.b
        for r in df.select(range_bucket("k", "1000").alias("b"))
        .orderBy("b")
        .collect()
    ]
    assert got == [0, (499 * 256) // 1000, (999 * 256) // 1000]


@pytest.mark.parametrize("n_files", [8])
def test_zorder_write_tightens_both_dims(spark, n_files):
    """The clustered write's per-file min/max spans must be tight in
    BOTH dimensions, where a single-column sort is tight in one only
    — that spread is exactly what parquet min/max pruning reads."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    np_, ns_ = li.agg(
        F.max("l_partkey") + 1, F.max("l_suppkey") + 1
    ).first()
    key = zorder_key(
        [
            range_bucket("l_partkey", str(np_)),
            range_bucket("l_suppkey", str(ns_)),
        ]
    )

    def file_spans(path: str) -> tuple[float, float]:
        tot_p = tot_s = n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            mins: dict[str, int] = {}
            maxs: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in ("l_partkey", "l_suppkey") and col.statistics:
                        st = col.statistics
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
            if mins:
                tot_p += maxs["l_partkey"] - mins["l_partkey"]
                tot_s += maxs["l_suppkey"] - mins["l_suppkey"]
                n += 1
        assert n > 1, "expected a multi-file layout"
        return tot_p / n, tot_s / n

    with tempfile.TemporaryDirectory(prefix="zorder_") as tmp:
        zorder_write(li, f"{tmp}/clustered", key, n_files)
        # Baseline: same file count, sorted by partkey only.
        (
            li.repartitionByRange(n_files, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.parquet(f"{tmp}/onecol")
        )
        zp, zs = file_spans(f"{tmp}/clustered")
        op, os_ = file_spans(f"{tmp}/onecol")
        # One-column sort is tight on partkey but spans ~the whole
        # suppkey range per file → suppkey predicates prune nothing.
        assert os_ > (ns_ - 1) * 0.8
        # Z-order shrinks the NEGLECTED dimension by a large factor
        # (that's the point: bounds the worst-dimension span)...
        assert zs < os_ * 0.6
        # ...while partkey stays well below its full range too, so
        # predicates on EITHER column prune files.
        assert zp < (np_ - 1) * 0.75


def test_zorder_and_compact_tolerate_empty_and_tiny(spark, tmp_path):
    """Write-path operators survive degenerate inputs: a zero-row
    frame z-order-writes an empty (readable) table; compacting a
    single-file table is a no-op rewrite with identical content."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.storage import compact

    empty = spark.createDataFrame([], "a bigint, b bigint")
    key = zorder_key([F.col("a"), F.col("b")])
    zorder_write(empty, str(tmp_path / "empty"), key, 4)
    back = spark.read.parquet(str(tmp_path / "empty"))
    assert back.count() == 0 and back.columns == ["a", "b"]

    one = spark.range(5).withColumn("v", F.col("id") + 1)
    one.coalesce(1).write.parquet(str(tmp_path / "one"))
    n = compact(spark, str(tmp_path / "one"), target_file_mb=64)
    assert n == 1
    assert sorted(
        r.v for r in spark.read.parquet(str(tmp_path / "one")).collect()
    ) == [1, 2, 3, 4, 5]


def test_compact_refuses_partitioned_dir(spark, tmp_path):
    """Compacting a hive-partitioned root would flatten the layout
    (and its pruning) — must refuse with a clear message."""
    from skysafe_datalake_spark.storage import compact

    path = str(tmp_path / "parted")
    spark.range(100).withColumn("p", F.col("id") % 3).write.partitionBy(
        "p"
    ).parquet(path)
    with pytest.raises(ValueError, match="leaf directories"):
        compact(spark, path, target_file_mb=1)
    # A leaf partition compacts fine.
    n = compact(spark, f"{path}/p=1", target_file_mb=64)
    assert n == 1


def test_zorder_key_rejects_sign_bit_overflow(spark):
    """bits * len(cols) > 63 would place a bit at the bigint sign bit
    (1 << 63 overflows a LongType literal) — rejected loudly instead
    of failing inside Catalyst or corrupting the key order."""
    import pytest
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.operators.zorder import zorder_key

    cols8 = [F.col(f"c{i}") for i in range(8)]
    with pytest.raises(ValueError, match="bits \\* len\\(cols\\) <= 63"):
        zorder_key(cols8, bits=8)
    # 63 bits exactly is fine (7 cols x 9 bits)
    zorder_key([F.col(f"c{i}") for i in range(7)], bits=9)
