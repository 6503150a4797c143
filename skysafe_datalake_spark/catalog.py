"""Medallion lake catalog: layer/source/entity → partitioned Parquet.

Replaces the reference's path arithmetic + S3 ListObjectsV2 scanning
(``/root/reference/src/helpers.py:90-154``:
``<layer>/<source>/<entity>/date=YYYY-MM-DD/hour=HH``) with
partition COLUMNS, so Catalyst does static partition pruning from a
``WHERE date = ... AND hour = ...`` predicate instead of application
code enumerating object-store prefixes. Layers follow the reference's
medallion layout (``README.md:57-75``): raw (JSON) → formatted /
enriched / usage (Parquet).

Scale design: dynamic partition overwrite (only touched partitions
rewritten — the reference's ``mode("overwrite")`` nukes the whole
entity dir); latest-partition discovery is a partition-listing-only
query (no data files read).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYERS = ("raw", "formatted", "enriched", "usage")


def _hadoop_ls(spark: SparkSession, path: str):
    """Directory listing as (basename, is_dir, bytes) triples via the
    Hadoop FileSystem API — the same client Spark's own reader uses,
    so it sees every URI scheme the session can read (file://, s3a://,
    hdfs://, ...). This is the Spark-side twin of the reference's S3
    ListObjectsV2 discovery (``src/helpers.py:90-154``): partition
    discovery stays listing-only, no data files opened, on a real
    object-store lake. Returns [] for a missing path and None when the
    listing itself fails (unsupported scheme, gateway down) so callers
    can fall back."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        return [
            (st.getPath().getName(), st.isDirectory(), int(st.getLen()))
            for st in fs.listStatus(jpath)
        ]
    except Exception:  # py4j Py4JJavaError / gateway errors
        return None


class LakeCatalog:
    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def path(self, layer: str, source: str, entity: str) -> str:
        if layer not in LAYERS:
            raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
        return f"{self.root}/{layer}/{source}/{entity}"

    @staticmethod
    def partition_values(ts: datetime | None = None) -> tuple[str, str]:
        ts = ts or datetime.now(timezone.utc)
        return ts.strftime("%Y-%m-%d"), ts.strftime("%H")

    def write(
        self,
        df: DataFrame,
        layer: str,
        source: str,
        entity: str,
        *,
        ts: datetime | None = None,
        fmt: str = "parquet",
        options: dict[str, str] | None = None,
    ) -> str:
        """Write one batch into its date/hour partition (dynamic
        overwrite: re-running a minute replaces only that partition —
        idempotent retries, matching the reference's per-partition
        overwrite semantics without its full-table clobber)."""
        date, hour = self.partition_values(ts)
        target = self.path(layer, source, entity)
        (
            df.withColumn("date", F.lit(date))
            .withColumn("hour", F.lit(hour))
            .write.format(fmt)
            .options(**(options or {}))
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date", "hour")
            .save(target)
        )
        return target

    def read(
        self,
        spark: SparkSession,
        layer: str,
        source: str,
        entity: str,
        *,
        fmt: str = "parquet",
        options: dict[str, str] | None = None,
        schema=None,
    ) -> DataFrame:
        """``schema`` (StructType) applies to the data files only;
        partition columns (date/hour) are still appended by partition
        discovery. Required for raw JSON whose payload types must not
        be inferred (e.g. opensky.RAW_SCHEMA keeps heterogeneous
        states[][] scalars as strings)."""
        reader = spark.read.format(fmt).options(**(options or {}))
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(self.path(layer, source, entity))

    def _ls(self, path: str, spark: SparkSession | None = None):
        """(basename, is_dir, bytes) triples for one directory. Plain
        local roots use os.listdir (no JVM hop); URI-schemed roots go
        through the Hadoop FileSystem client when a session is at hand.
        [] = missing/empty dir; None = can't list this root at all
        (URI root without a session, or the Hadoop listing failed)."""
        if "://" in self.root:
            return _hadoop_ls(spark, path) if spark is not None else None
        import os as _os

        try:
            out = []
            for name in _os.listdir(path):
                full = _os.path.join(path, name)
                if _os.path.isdir(full):
                    out.append((name, True, 0))
                else:
                    out.append((name, False, _os.path.getsize(full)))
            return out
        except FileNotFoundError:
            return []

    def _latest_partition(
        self,
        layer: str,
        source: str,
        entity: str,
        spark: SparkSession | None = None,
    ) -> tuple[str, str] | None:
        """Newest (date, hour) partition from the DIRECTORY listing —
        the same discovery compact() uses, via the Hadoop FileSystem
        client on URI-schemed lake roots (the Spark-side twin of the
        reference's S3 ListObjectsV2 walk, ``src/helpers.py:90-154``).
        The former select(date,hour).distinct() was a full data scan
        (metadata-only optimization is off by default), so finding
        the latest raw-JSON partition re-parsed every file ever
        written, O(history) per minute-cadence run. Hours compare
        numerically so an unpadded hour=8 from a foreign writer still
        orders correctly; hour values that don't parse as int (e.g.
        hour=__HIVE_DEFAULT_PARTITION__ from a foreign writer) are
        skipped, and so are hour dirs with no data files (a failed or
        in-flight write leaves an empty dir — selecting it would
        return zero rows while older populated partitions exist).

        Returns None when the root can't be LISTED at all (a URI root
        with no session to reach it, or the Hadoop listing failed);
        read_latest then falls back to Spark-side distinct() discovery
        instead of silently skipping the filter."""
        root = self.path(layer, source, entity)
        entries = self._ls(root, spark)
        if entries is None:
            return None
        dates = sorted(
            n for n, is_dir, _sz in entries if is_dir and n.startswith("date=")
        )
        for date_dir in reversed(dates):  # ISO dates: lexicographic = chrono
            hours = []
            for h, is_dir, _sz in self._ls(f"{root}/{date_dir}", spark) or []:
                if not (is_dir and h.startswith("hour=")):
                    continue
                try:
                    hour_num = int(h.split("=", 1)[1])
                except ValueError:
                    continue
                files = self._ls(f"{root}/{date_dir}/{h}", spark) or []
                if any(
                    not n.startswith((".", "_"))
                    for n, d, _s in files
                    if not d
                ):
                    hours.append((hour_num, h))
            if hours:
                best = max(hours)[1]
                return date_dir.split("=", 1)[1], best.split("=", 1)[1]
        return None

    def read_latest(
        self,
        spark: SparkSession,
        layer: str,
        source: str,
        entity: str,
        *,
        fmt: str = "parquet",
        options: dict[str, str] | None = None,
        schema=None,
    ) -> DataFrame:
        """Latest date/hour partition only (reference S7,
        ``src/helpers.py:126-154``). Discovery is a directory listing
        (no data read) on any filesystem the session can reach —
        os.listdir locally, the Hadoop FileSystem client on URI roots
        (file://, s3a://, hdfs://). If the listing itself fails, falls
        back to a Spark-side distinct() over the partition columns —
        a partition-values scan instead of a listing, but correct on
        any filesystem Spark can read (returning ALL partitions would
        be a silent semantic downgrade)."""
        df = self.read(
            spark, layer, source, entity, fmt=fmt, options=options, schema=schema
        )
        latest = self._latest_partition(layer, source, entity, spark)
        if latest is None and {"date", "hour"} <= set(df.columns):
            row = (
                df.select("date", "hour")
                .distinct()
                .orderBy(
                    F.col("date").desc(),
                    # numeric hour ordering, tolerant of foreign
                    # non-numeric values (try_cast: NULL, sorts last)
                    F.expr("try_cast(hour AS INT)").desc_nulls_last(),
                )
                .limit(1)
                .collect()
            )
            if row:
                # Filter on the COLUMN-TYPED values (partition
                # inference may have read hour=08 as int 8 — a
                # stringified "8" would no longer match the column).
                d_v, h_v = row[0]["date"], row[0]["hour"]
                return df.where(
                    (F.col("date") == F.lit(d_v)) & (F.col("hour") == F.lit(h_v))
                )
        if latest is None:
            return df
        date, hour = latest
        return df.where((F.col("date") == date) & (F.col("hour") == hour))

    def compact(
        self,
        spark: SparkSession,
        layer: str,
        source: str,
        entity: str,
        *,
        target_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
    ) -> dict[str, tuple[int, int]]:
        """Small-file compaction: rewrite each date/hour partition
        whose file count exceeds what its data volume needs.

        A minute-cadence pipeline writes 1440 partitions/day and each
        micro-batch can leave many small files; scans then pay one
        task + one open per file. Compaction reads a partition once,
        coalesces to ceil(bytes / target_bytes) files, and swaps it
        atomically via dynamic partition overwrite — untouched
        partitions are never rewritten (same mechanism as the upsert
        sink). Returns {partition: (files_before, files_after)} for
        the partitions actually rewritten. Discovery shares ``_ls``
        with read_latest, so it works on URI-schemed lake roots
        (file://, s3a://, hdfs://) through the Hadoop FileSystem
        client.
        """
        root = self.path(layer, source, entity)
        entries = self._ls(root, spark)
        if entries is None:
            raise FileNotFoundError(
                f"cannot list lake root {root!r} for compaction"
            )
        plan: dict[str, tuple[str, str, int, int]] = {}
        for date_dir, d_is_dir, _dsz in sorted(entries):
            if not (d_is_dir and date_dir.startswith("date=")):
                continue
            hour_entries = self._ls(f"{root}/{date_dir}", spark) or []
            for hour_dir, h_is_dir, _hsz in sorted(hour_entries):
                if not (h_is_dir and hour_dir.startswith("hour=")):
                    continue
                listing = (
                    self._ls(f"{root}/{date_dir}/{hour_dir}", spark) or []
                )
                files = [
                    (n, sz)
                    for n, is_dir, sz in listing
                    if not is_dir and n.endswith(".parquet")
                ]
                nbytes = sum(sz for _n, sz in files)
                want = max(1, -(-nbytes // target_bytes))
                if len(files) >= min_files and len(files) > want:
                    key = f"{date_dir}/{hour_dir}"
                    plan[key] = (
                        date_dir.split("=", 1)[1],
                        hour_dir.split("=", 1)[1],
                        len(files),
                        want,
                    )
        result: dict[str, tuple[int, int]] = {}
        for key, (date, hour, before, want) in plan.items():
            part = self.read(spark, layer, source, entity).where(
                (F.col("date") == date) & (F.col("hour") == hour)
            )
            # Re-attach the partition columns as the EXACT directory
            # strings (the write() convention). Partition-type
            # inference reads hour=08 back as int 8; writing that
            # inferred value lands in a NEW hour=8 directory while
            # dynamic overwrite never clears hour=08 — the partition's
            # data silently doubles on every compaction (round-9
            # review, reproduced: 100 rows -> 200).
            part = (
                part.drop("date", "hour")
                .withColumn("date", F.lit(date))
                .withColumn("hour", F.lit(hour))
            )
            (
                part.coalesce(want)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("date", "hour")
                .save(root)
            )
            result[key] = (before, want)
        return result
