"""Flight weather-risk scoring expressions.

Semantics parity with the reference's additive rule set
(``/root/reference/src/combine_spark.py:134-173``) and its spec tests
(``tests/test_risk_score.py``): the score is UNCAPPED (max observable
130 even though docs say 0–100) and category boundaries are 30/60.

All terms are native ``CASE WHEN`` chains — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def risk_score(
    weather_code: Column,
    wind_gusts_10m: Column,
    precipitation: Column,
    visibility: Column,
    cloud_cover: Column,
    on_ground: Column,
    baro_altitude: Column,
) -> Column:
    """Additive risk score, cast to int by the caller if desired.

    Terms (reference ``src/combine_spark.py:134-163``):
      thunderstorm (code ≥ 95) +40; gusts >80 km/h +25 / >50 +10;
      precipitation >5 mm +20 / >0 +10; visibility <1000 m +20 /
      <3000 +10; cloud cover >80 % +10 / >50 % +5;
      airborne below 300 m +15.
    """
    return (
        F.when(weather_code >= 95, F.lit(40)).otherwise(F.lit(0))
        + F.when(wind_gusts_10m > 80, F.lit(25))
        .when(wind_gusts_10m > 50, F.lit(10))
        .otherwise(F.lit(0))
        + F.when(precipitation > 5, F.lit(20))
        .when(precipitation > 0, F.lit(10))
        .otherwise(F.lit(0))
        + F.when(visibility < 1000, F.lit(20))
        .when(visibility < 3000, F.lit(10))
        .otherwise(F.lit(0))
        + F.when(cloud_cover > 80, F.lit(10))
        .when(cloud_cover > 50, F.lit(5))
        .otherwise(F.lit(0))
        + F.when((~on_ground) & (baro_altitude < 300), F.lit(15)).otherwise(F.lit(0))
    )


def risk_category(score: Column) -> Column:
    """LOW < 30 ≤ MEDIUM < 60 ≤ HIGH (reference ``src/combine_spark.py:168-173``)."""
    return (
        F.when(score >= 60, F.lit("HIGH"))
        .when(score >= 30, F.lit("MEDIUM"))
        .otherwise(F.lit("LOW"))
    )
