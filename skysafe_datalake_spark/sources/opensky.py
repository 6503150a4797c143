"""OpenSky state-vector formatting — raw JSON snapshot → typed
flights table, entirely in Spark.

The reference flattens the positional ``states[][]`` arrays in a
driver-side Python loop (``/root/reference/src/format_flights.py:
69-102`` with ``_safe_get``/``_to_float``/``_clean_callsign``
``:19-41``); that caps throughput at one Python process. Here the
raw payload is read as a DataFrame and flattened with
``element_at`` + lenient casts — distributed, codegen'd, and
semantically identical:

- ``_safe_get(state, i)``  → ``element_at(states, i+1)`` (1-based;
  NULL when out of range — same tolerance for ragged arrays)
- ``_to_float(x)``         → ``try_cast("double")`` (NULL on junk)
- ``_clean_callsign(x)``   → ``nullif(trim(x), '')``
- epoch → UTC timestamp    → ``timestamp_seconds`` (the reference's
  ``to_utc_timestamp(from_unixtime(...), "UTC")`` is a no-op under a
  UTC session; we preserve the *semantics*: epoch seconds are UTC
  instants — ``src/format_flights.py:138-151``)
- null-GPS filter          → ``:133``
- position-source decode   → ``:155-162``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

# Raw snapshot shape: {"time": epoch_sec, "states": [[...17 fields]],
# "_extracted_at": iso}. states elements are heterogeneous JSON
# scalars; reading them as strings keeps every value losslessly and
# lets lenient casts do the per-field typing.
RAW_SCHEMA = StructType(
    [
        StructField("time", LongType()),
        StructField("states", ArrayType(ArrayType(StringType()))),
        StructField("_extracted_at", StringType()),
    ]
)

# OpenSky positional indices (reference src/format_flights.py:71-101).
_IDX = {
    "icao24": 0,
    "callsign": 1,
    "origin_country": 2,
    "time_position": 3,
    "last_contact": 4,
    "longitude": 5,
    "latitude": 6,
    "baro_altitude": 7,
    "on_ground": 8,
    "velocity": 9,
    "true_track": 10,
    "vertical_rate": 11,
    "geo_altitude": 13,
    "squawk": 14,
    "position_source": 16,
}


def _slot(name: str) -> Column:
    # try_element_at is 1-based and returns NULL beyond the array end
    # (under ANSI mode plain element_at throws) — the _safe_get
    # ragged-row tolerance for free.
    return F.try_element_at(F.col("state"), F.lit(_IDX[name] + 1))


def position_source_label(position_source: Column) -> Column:
    """Decode map (reference src/format_flights.py:155-162)."""
    return (
        F.when(position_source == 0, F.lit("ADS-B"))
        .when(position_source == 1, F.lit("ASTERIX"))
        .when(position_source == 2, F.lit("MLAT"))
        .when(position_source == 3, F.lit("FLARM"))
        .otherwise(F.lit(None).cast("string"))
    )


def format_flights(raw: DataFrame) -> DataFrame:
    """Raw snapshot DataFrame (RAW_SCHEMA) → typed flights table.

    One narrow pipeline: explode(states) → element_at projections →
    casts → filter → timestamps. No shuffle at all — formatting is
    embarrassingly parallel and stays in one WholeStageCodegen span.
    """
    exploded = raw.select(
        F.col("time").alias("observation_time_epoch"),
        F.col("_extracted_at").alias("extracted_at_str"),
        F.explode_outer(F.col("states")).alias("state"),
    )
    df = exploded.select(
        _slot("icao24").alias("icao24"),
        F.nullif(F.trim(_slot("callsign")), F.lit("")).alias("callsign"),
        _slot("origin_country").alias("origin_country"),
        F.col("observation_time_epoch").cast("int").alias("observation_time_epoch"),
        _slot("time_position").try_cast("int").alias("time_position_epoch"),
        _slot("last_contact").try_cast("int").alias("last_contact_epoch"),
        _slot("longitude").try_cast("double").alias("longitude"),
        _slot("latitude").try_cast("double").alias("latitude"),
        _slot("baro_altitude").try_cast("double").alias("baro_altitude"),
        F.lower(_slot("on_ground")).try_cast("boolean").alias("on_ground"),
        _slot("geo_altitude").try_cast("double").alias("geo_altitude"),
        _slot("velocity").try_cast("double").alias("velocity"),
        _slot("true_track").try_cast("double").alias("true_track"),
        _slot("vertical_rate").try_cast("double").alias("vertical_rate"),
        _slot("squawk").alias("squawk"),
        _slot("position_source").try_cast("int").alias("position_source"),
        F.col("extracted_at_str"),
    )
    df = df.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
    df = (
        df.withColumn(
            "observation_time", F.timestamp_seconds(F.col("observation_time_epoch"))
        )
        .withColumn("time_position", F.timestamp_seconds(F.col("time_position_epoch")))
        .withColumn("last_contact", F.timestamp_seconds(F.col("last_contact_epoch")))
        .withColumn("extracted_at", F.to_timestamp(F.col("extracted_at_str")))
        .drop(
            "observation_time_epoch",
            "time_position_epoch",
            "last_contact_epoch",
            "extracted_at_str",
        )
    )
    return df.withColumn(
        "position_source_label", position_source_label(F.col("position_source"))
    )
