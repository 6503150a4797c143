"""Open-Meteo current-weather formatting — per-station JSON →
typed weather table, in Spark.

The reference unpacks ``point["current"][var]`` in driver Python
(``/root/reference/src/format_weather.py:20-39``); here the nested
struct is projected with column paths. Timestamps: ``current.time``
is an ISO local minute, ``_extracted_at`` ISO UTC — both normalized
to UTC timestamps (``src/format_weather.py:46-54``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Open-Meteo current-weather variables (reference
# src/extract_weather.py:29-40).
CURRENT_VARS = StructType(
    [
        StructField("time", StringType()),
        StructField("temperature_2m", DoubleType()),
        StructField("relative_humidity_2m", IntegerType()),
        StructField("wind_speed_10m", DoubleType()),
        StructField("wind_direction_10m", DoubleType()),
        StructField("wind_gusts_10m", DoubleType()),
        StructField("precipitation", DoubleType()),
        StructField("rain", DoubleType()),
        StructField("cloud_cover", IntegerType()),
        StructField("weather_code", IntegerType()),
        StructField("visibility", DoubleType()),
    ]
)

RAW_SCHEMA = StructType(
    [
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("elevation", DoubleType()),
        StructField("current", CURRENT_VARS),
        StructField("_extracted_at", StringType()),
    ]
)


def format_weather(raw: DataFrame) -> DataFrame:
    """Raw per-station DataFrame (RAW_SCHEMA) → flat typed table
    (reference src/format_weather.py:20-54)."""
    return raw.select(
        F.col("latitude"),
        F.col("longitude"),
        F.col("elevation"),
        F.to_timestamp(F.col("current.time")).alias("weather_time"),
        F.col("current.temperature_2m").alias("temperature_2m"),
        F.col("current.relative_humidity_2m").alias("relative_humidity_2m"),
        F.col("current.wind_speed_10m").alias("wind_speed_10m"),
        F.col("current.wind_direction_10m").alias("wind_direction_10m"),
        F.col("current.wind_gusts_10m").alias("wind_gusts_10m"),
        F.col("current.precipitation").alias("precipitation"),
        F.col("current.rain").alias("rain"),
        F.col("current.cloud_cover").alias("cloud_cover"),
        F.col("current.weather_code").alias("weather_code"),
        F.col("current.visibility").alias("visibility"),
        F.to_timestamp(F.col("_extracted_at")).alias("extracted_at"),
    )
