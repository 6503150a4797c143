"""Native-expression function library (zero Python UDFs).

Every function here returns a :class:`pyspark.sql.Column` built from
JVM-side built-ins, so expressions stay inside WholeStageCodegen and
keep predicate pushdown alive — the reference's stated design rule
(``/root/reference/README.md:85``, ``index.md:184``).
"""

from skysafe_datalake_spark.functions.geo import haversine_km
from skysafe_datalake_spark.functions.risk import risk_category, risk_score
from skysafe_datalake_spark.functions.phase import flight_phase_id, flight_phase_rules

__all__ = [
    "haversine_km",
    "risk_score",
    "risk_category",
    "flight_phase_rules",
    "flight_phase_id",
]
