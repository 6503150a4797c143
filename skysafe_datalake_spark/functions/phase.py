"""Flight-phase business rules (K-Means fallback path).

Semantics parity: aeronautical threshold rules used when K-Means
clusters are not meaningfully separated
(``/root/reference/src/combine_spark.py:287-318``):

  baro_altitude < 300 AND velocity < 60          → "Takeoff / Landing"
  baro_altitude > 3000 AND |vertical_rate| < 2.5 → "Cruise"
  otherwise                                      → "Climb / Descent"

Phase ids: Takeoff / Landing → 0, Climb / Descent → 1, Cruise → 2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PHASE_TAKEOFF_LANDING = "Takeoff / Landing"
PHASE_CLIMB_DESCENT = "Climb / Descent"
PHASE_CRUISE = "Cruise"


def flight_phase_rules(
    baro_altitude: Column, velocity: Column, vertical_rate: Column
) -> Column:
    return (
        F.when(
            (baro_altitude < 300) & (velocity < 60), F.lit(PHASE_TAKEOFF_LANDING)
        )
        .when(
            (baro_altitude > 3000) & (F.abs(vertical_rate) < 2.5), F.lit(PHASE_CRUISE)
        )
        .otherwise(F.lit(PHASE_CLIMB_DESCENT))
    )


def flight_phase_id(flight_phase: Column) -> Column:
    return (
        F.when(flight_phase == PHASE_TAKEOFF_LANDING, F.lit(0))
        .when(flight_phase == PHASE_CLIMB_DESCENT, F.lit(1))
        .otherwise(F.lit(2))
    )
