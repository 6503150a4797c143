"""Usage stage: serving-layer projection + keyed upsert semantics
(reference ``/root/reference/src/index_elastic.py:88-158,199-211``).

The reference collect()s every row to the Python driver and bulk-
posts to Elasticsearch — the one place it abandons distributed
execution (SURVEY.md §3 step 5). Engine-native replacement:
- the wide projection / w_-prefix strip stays a single select (P4);
- upsert-by-key (ES ``_id=icao24``) becomes a deterministic
  latest-row-per-key reduction (argmax over extracted_at) — the same
  no-duplicate serving semantics, computed distributively;
- lat/lon merge into a ``location`` struct (geo_point shape).
A distributed ES sink would attach here via the es-hadoop connector
(``org.elasticsearch.spark.sql``, es.mapping.id=icao24) — not
available in this container, so parquet is the serving sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# usage projection: flight + unprefixed weather + derived cols
# (reference src/index_elastic.py:88-123; FIXTURES.md §5).
_FLIGHT_COLS = (
    "icao24",
    "callsign",
    "origin_country",
    "latitude",
    "longitude",
    "baro_altitude",
    "geo_altitude",
    "velocity",
    "true_track",
    "vertical_rate",
    "on_ground",
    "observation_time",
)
_WEATHER_STRIP = (
    "wind_speed_10m",
    "wind_direction_10m",
    "wind_gusts_10m",
    "precipitation",
    "rain",
    "cloud_cover",
    "weather_code",
    "visibility",
    "temperature_2m",
)
_DERIVED = (
    "dist_km",
    "risk_score",
    "risk_category",
    "flight_phase",
    "flight_phase_id",
    "is_anomaly",
    "anomaly_score",
    "extracted_at",
)


def usage_projection(enriched: DataFrame) -> DataFrame:
    cols = [F.col(c) for c in _FLIGHT_COLS]
    cols += [F.col(f"w_{c}").alias(c) for c in _WEATHER_STRIP]
    cols += [F.col(c) for c in _DERIVED]
    return enriched.select(*cols)


def latest_per_key(df: DataFrame, key: str = "icao24", ts: str = "extracted_at") -> DataFrame:
    """Keyed upsert semantics: keep the newest row per key.

    min(struct(-ord, payload)) == argmax with a total order (ties by
    payload — deterministic, unlike dropDuplicates). Partial
    aggregation combines map-side, so the shuffle carries ≤1 row per
    key per task — the MERGE-into-keyed-table topology at any scale.

    Two ordering guards (round 9): a NULL timestamp LOSES to every
    real row (a null first field would otherwise WIN min(struct) and
    a single unparseable extracted_at would beat all future upserts
    for its key forever — same hazard operators.nn_join._argmin
    flags), and recency compares at MICROSECOND precision
    (unix_timestamp truncates to whole seconds, which let payload
    bytes pick the survivor among same-second rows).
    """
    payload = [c for c in df.columns if c != key]
    ordered = df.select(
        F.col(key),
        F.struct(
            F.col(ts).isNull().cast("int").alias("_null"),
            (-F.unix_micros(F.col(ts).cast("timestamp"))).alias("_neg_ts"),
            F.struct(*payload).alias("_row"),
        ).alias("_s"),
    )
    best = ordered.groupBy(key).agg(F.min("_s").alias("_m"))
    return best.select(key, *[F.col(f"_m._row.{c}").alias(c) for c in payload])


def with_location(df: DataFrame) -> DataFrame:
    """geo_point struct assembly (reference src/index_elastic.py:146-150)."""
    return df.withColumn(
        "location",
        F.when(
            F.col("latitude").isNotNull() & F.col("longitude").isNotNull(),
            F.struct(F.col("latitude").alias("lat"), F.col("longitude").alias("lon")),
        ),
    )


def build_usage(enriched: DataFrame) -> DataFrame:
    return with_location(latest_per_key(usage_projection(enriched)))


def upsert_partitioned(
    batch: DataFrame,
    table_dir: str,
    *,
    key: str = "icao24",
    ts_col: str = "extracted_at",
    n_buckets: int = 64,
) -> None:
    """MERGE-equivalent keyed upsert into a hash-bucketed parquet
    table: only the buckets the batch touches are read and rewritten.

    Layout: the table is partitioned by ``kb = pmod(xxhash64(key),
    n_buckets)``. A micro-batch touching k keys reads ≤ min(k,
    n_buckets) partitions, merges with :func:`latest_per_key`, and
    writes back through DYNAMIC partition overwrite — one write job,
    per-partition swap at commit (no staging double-write, untouched
    partitions' files are never rewritten). Work per batch is
    O(touched buckets), not O(table) — the property the round-1
    full-table rewrite lacked (VERDICT.md #5).

    Self-read is safe: with dynamic overwrite, existing files are
    replaced at job COMMIT, after the merge tasks (which scan them)
    have finished.

    Size ``n_buckets`` so one bucket ≈ a few hundred MB at the target
    key cardinality (the usage table holds one row per key). With
    Delta/Iceberg this whole function becomes ``MERGE INTO``; the
    surrounding topology is unchanged.
    """
    spark = batch.sparkSession
    bucketed = batch.withColumn(
        "kb", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    exists = os.path.isdir(table_dir) and any(
        not f.startswith((".", "_")) for f in os.listdir(table_dir)
    )
    if exists:
        touched = [r["kb"] for r in bucketed.select("kb").distinct().collect()]
        existing = spark.read.parquet(table_dir).where(F.col("kb").isin(touched))
        merged = latest_per_key(existing.unionByName(bucketed), key=key, ts=ts_col)
    else:
        merged = latest_per_key(bucketed, key=key, ts=ts_col)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("kb")
        .parquet(table_dir)
    )
