"""Test-table loaders + deterministic synthetic domain columns.

The driver provides TPC-H-ish parquet tables (TESTDATA.md). The
SkySafe domain queries derive flight/weather columns from them with
exact integer/IEEE arithmetic so Spark and DuckDB compute identical
values (see workload/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver has shipped events.ts as TIMESTAMP(NANOS) (which
        # Spark only reads as a nanos-since-epoch long, via the legacy
        # conf) and as TIMESTAMP(MICROS) without timezone (read as
        # TIMESTAMP_NTZ). Normalize either to a session-TZ TIMESTAMP
        # at microsecond precision — identical to what DuckDB's
        # CAST(ts AS TIMESTAMP) yields on the same file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanos-as-long → truncate to micros
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pround(col: F.Column, n: int) -> F.Column:
    """Portable round: floor(x·10ⁿ + 0.5)/10ⁿ in pure IEEE double ops,
    bit-identical across engines. Spark's round() rounds the exact
    BigDecimal of the double (HALF_UP) while DuckDB rounds the double
    product — they disagree when x·10ⁿ lands exactly on .5, so neither
    built-in is usable for cross-engine value-hash parity."""
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def pround_sql(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


# Oracle-side twin of the events normalization in load().
EVENTS_SQL = (
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events"
)


# The reference's 6 fixed French weather stations
# (/root/reference/src/extract_weather.py:42-49), with deterministic
# synthetic current-weather values chosen to straddle every risk
# threshold (FIXTURES.md §2).
STATIONS = [
    # id, lat, lon, weather_code, gusts, precip, visibility, cloud
    (1, 48.709632, 2.208563, 95, 85.0, 6.0, 800.0, 90),   # Paris CDG: storm
    (2, 43.629421, 1.367789, 61, 55.0, 2.0, 2500.0, 60),  # Toulouse
    (3, 45.726009, 5.090928, 0, 20.0, 0.0, 10000.0, 10),  # Lyon
    (4, 43.434242, 5.212784, 3, 30.0, 0.0, 9000.0, 40),   # Marseille
    (5, 47.460152, -0.529704, 80, 70.0, 4.5, 3500.0, 85), # Nantes
    (6, 50.561237, 3.086957, 45, 10.0, 0.5, 900.0, 55),   # Lille
]

STATIONS_SCHEMA = (
    "station_id INT, s_lat DOUBLE, s_lon DOUBLE, weather_code INT, "
    "wind_gusts_10m DOUBLE, precipitation DOUBLE, visibility DOUBLE, "
    "cloud_cover INT"
)

STATIONS_SQL_VALUES = ", ".join(
    f"({i}, {la!r}, {lo!r}, {wc}, {g!r}, {p!r}, {v!r}, {cc})"
    for (i, la, lo, wc, g, p, v, cc) in STATIONS
)

STATIONS_CTE = (
    "stations(station_id, s_lat, s_lon, weather_code, wind_gusts_10m, "
    "precipitation, visibility, cloud_cover) AS (VALUES "
    + STATIONS_SQL_VALUES
    + ")"
)


def stations_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(STATIONS, STATIONS_SCHEMA)


def stations_weather_df(spark: SparkSession) -> DataFrame:
    """STATIONS fixture widened to the full formatted-weather schema
    (constant filler for the non-risk variables) — the weather side
    expected by plans.combine.combine_enrich."""
    return stations_df(spark).select(
        F.col("s_lat").alias("latitude"),
        F.col("s_lon").alias("longitude"),
        F.lit(100.0).alias("elevation"),
        F.to_timestamp(F.lit("2026-02-26 14:00:00")).alias("weather_time"),
        F.lit(10.0).alias("temperature_2m"),
        F.lit(60).alias("relative_humidity_2m"),
        F.lit(20.0).alias("wind_speed_10m"),
        F.lit(200.0).alias("wind_direction_10m"),
        F.col("wind_gusts_10m"),
        F.col("precipitation"),
        F.col("precipitation").alias("rain"),
        F.col("cloud_cover"),
        F.col("weather_code"),
        F.col("visibility"),
    )


def synthetic_flights(events: DataFrame) -> DataFrame:
    """Derive a deterministic 'flights snapshot' from the events table.

    Positions land on a lattice inside the France bounding box
    [41.3, 51.1] x [-5.1, 9.6] (reference
    src/serverless_function_call.py:10); kinematics straddle the
    phase-rule and risk thresholds. Integer modulo + one IEEE
    division/addition each → bit-identical in Spark and DuckDB.
    """
    e = F.col("event_id")
    return events.select(
        e.alias("flight_id"),
        (F.lit(41.3) + (e % 981) / F.lit(100.0)).alias("lat"),
        (F.lit(-5.1) + ((e * 7) % 1471) / F.lit(100.0)).alias("lon"),
        ((e * 13) % 13000).cast("double").alias("baro_altitude"),
        (e % 10 == 0).alias("on_ground"),
        F.col("value").alias("velocity"),
        ((e % 41) - 20).cast("double").alias("vertical_rate"),
    )


SYNTHETIC_FLIGHTS_SQL = """
SELECT event_id AS flight_id,
       41.3 + (event_id % 981) / 100.0 AS lat,
       -5.1 + ((event_id * 7) % 1471) / 100.0 AS lon,
       CAST((event_id * 13) % 13000 AS DOUBLE) AS baro_altitude,
       (event_id % 10 = 0) AS on_ground,
       value AS velocity,
       CAST((event_id % 41) - 20 AS DOUBLE) AS vertical_rate
FROM events
"""

HAVERSINE_SQL = (
    "2.0 * 6371.0 * atan2(sqrt({a}), sqrt(1.0 - ({a})))".format(
        a=(
            "sin(radians(s_lat - lat) / 2) * sin(radians(s_lat - lat) / 2)"
            " + cos(radians(lat)) * cos(radians(s_lat))"
            " * sin(radians(s_lon - lon) / 2) * sin(radians(s_lon - lon) / 2)"
        )
    )
)


# Dense synthetic station lattice (600 points, 0.5° spacing over the
# France bbox) — a right side representative of "too many stations to
# broadcast": guarantees >= 1 station per 0.5° grid cell inside the
# domain, which is the density contract grid_nn_join's ring search
# needs for exactness.
N_LATTICE_LON = 30  # lon steps: -5.0 + 0.5*j, j in [0, 30)
N_LATTICE_LAT = 20  # lat steps: 41.5 + 0.5*i, i in [0, 20)

LATTICE_STATIONS_SQL = f"""
SELECT CAST(range AS BIGINT) AS station_id,
       41.5 + CAST(range // {N_LATTICE_LON} AS DOUBLE) * 0.5 AS s_lat,
       -5.0 + CAST(range % {N_LATTICE_LON} AS DOUBLE) * 0.5 AS s_lon
FROM range(0, {N_LATTICE_LAT * N_LATTICE_LON})
"""


def lattice_stations_df(spark: SparkSession) -> DataFrame:
    sid = F.col("id")
    return spark.range(N_LATTICE_LAT * N_LATTICE_LON).select(
        sid.alias("station_id"),
        (
            F.lit(41.5)
            + F.expr(f"id div {N_LATTICE_LON}").cast("double") * F.lit(0.5)
        ).alias("s_lat"),
        (
            F.lit(-5.0) + (sid % F.lit(N_LATTICE_LON)).cast("double") * F.lit(0.5)
        ).alias("s_lon"),
    )
