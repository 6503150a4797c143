"""SkySafe domain queries: the reference pipeline's operators on the
driver's synthetic tables (nearest-station spatial join, risk scoring,
flight-phase rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skysafe_datalake_spark.functions.geo import haversine_km
from skysafe_datalake_spark.functions.phase import flight_phase_id, flight_phase_rules
from skysafe_datalake_spark.functions.risk import risk_category, risk_score
from skysafe_datalake_spark.operators.nn_join import nearest_neighbor_join
from skysafe_datalake_spark.workload.registry import register
from skysafe_datalake_spark.workload.tables import (
    HAVERSINE_SQL,
    pround,
    pround_sql,
    STATIONS_CTE,
    SYNTHETIC_FLIGHTS_SQL,
    load,
    stations_df,
    synthetic_flights,
)


def _nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flights x 6 stations -> top-1 by Haversine (J2/W1/P2/F1)."""
    flights = synthetic_flights(load(spark, sf_dir, "events"))
    stations = stations_df(spark)
    dist = haversine_km("lat", "lon", "s_lat", "s_lon")
    return nearest_neighbor_join(
        flights,
        stations,
        partition_by=["flight_id"],
        distance=dist,
        distance_name="dist_raw",
        order_by=pround(F.col("dist_raw"), 6),
        tie_breakers=["station_id"],
    )


_NEAREST_SQL = f"""
WITH flights AS ({SYNTHETIC_FLIGHTS_SQL}),
{STATIONS_CTE},
joined AS (
  SELECT f.*, s.*, {HAVERSINE_SQL} AS dist_raw
  FROM flights f CROSS JOIN stations s
),
nearest AS (
  SELECT * FROM joined
  QUALIFY row_number() OVER (
    PARTITION BY flight_id ORDER BY floor(dist_raw * 1000000.0 + 0.5) / 1000000.0, station_id) = 1
)
"""


@register(
    "nn_station_join",
    _NEAREST_SQL
    + """
SELECT flight_id, station_id, floor(dist_raw * 10000.0 + 0.5) / 10000.0 AS dist_km
FROM nearest
""",
)
def nn_station_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature operator: nearest-neighbor spatial join
    (reference /root/reference/src/combine_spark.py:104-122)."""
    nearest = _nearest_station(spark, sf_dir)
    return nearest.select(
        "flight_id",
        "station_id",
        pround(F.col("dist_raw"), 4).alias("dist_km"),
    )


_RISK_SQL_TERMS = """
  CAST(
      (CASE WHEN weather_code >= 95 THEN 40 ELSE 0 END)
    + (CASE WHEN wind_gusts_10m > 80 THEN 25
            WHEN wind_gusts_10m > 50 THEN 10 ELSE 0 END)
    + (CASE WHEN precipitation > 5 THEN 20
            WHEN precipitation > 0 THEN 10 ELSE 0 END)
    + (CASE WHEN visibility < 1000 THEN 20
            WHEN visibility < 3000 THEN 10 ELSE 0 END)
    + (CASE WHEN cloud_cover > 80 THEN 10
            WHEN cloud_cover > 50 THEN 5 ELSE 0 END)
    + (CASE WHEN (NOT on_ground) AND baro_altitude < 300 THEN 15 ELSE 0 END)
  AS INTEGER)
"""


@register(
    "skysafe_enriched",
    _NEAREST_SQL
    + f"""
, scored AS (
  SELECT flight_id, station_id, floor(dist_raw * 10000.0 + 0.5) / 10000.0 AS dist_km,
         {_RISK_SQL_TERMS} AS risk_score,
         CASE WHEN baro_altitude < 300 AND velocity < 60 THEN 'Takeoff / Landing'
              WHEN baro_altitude > 3000 AND abs(vertical_rate) < 2.5 THEN 'Cruise'
              ELSE 'Climb / Descent' END AS flight_phase
  FROM nearest
)
SELECT flight_id, station_id, dist_km, risk_score,
       CASE WHEN risk_score >= 60 THEN 'HIGH'
            WHEN risk_score >= 30 THEN 'MEDIUM'
            ELSE 'LOW' END AS risk_category,
       flight_phase,
       CAST(CASE WHEN flight_phase = 'Takeoff / Landing' THEN 0
                 WHEN flight_phase = 'Climb / Descent' THEN 1
                 ELSE 2 END AS INTEGER) AS flight_phase_id
FROM scored
""",
)
def skysafe_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship minimum slice (SURVEY.md §7.3): nearest station +
    risk score/category + rules-based flight phase, all native
    expressions."""
    nearest = _nearest_station(spark, sf_dir)
    score = risk_score(
        weather_code=F.col("weather_code"),
        wind_gusts_10m=F.col("wind_gusts_10m"),
        precipitation=F.col("precipitation"),
        visibility=F.col("visibility"),
        cloud_cover=F.col("cloud_cover"),
        on_ground=F.col("on_ground"),
        baro_altitude=F.col("baro_altitude"),
    ).cast("int")
    phase = flight_phase_rules(
        F.col("baro_altitude"), F.col("velocity"), F.col("vertical_rate")
    )
    return (
        nearest.withColumn("risk_score", score)
        .withColumn("risk_category", risk_category(F.col("risk_score")))
        .withColumn("flight_phase", phase)
        .withColumn("flight_phase_id", flight_phase_id(F.col("flight_phase")).cast("int"))
        .select(
            "flight_id",
            "station_id",
            pround(F.col("dist_raw"), 4).alias("dist_km"),
            "risk_score",
            "risk_category",
            "flight_phase",
            "flight_phase_id",
        )
    )
