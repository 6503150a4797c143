"""skysafe_datalake_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the SkySafe-DataLake reference
(aircraft x weather spatial enrichment, risk scoring, flight-phase
classification, anomaly detection, medallion lake layout), extended
with large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7.1):
- DataFrame/SQL first; Catalyst owns optimization.
- Zero row-at-a-time Python UDFs in hot paths (reference rule,
  README.md:85 of the reference); Pandas UDFs only where built-ins
  genuinely cannot express the semantics.
- Every operator designed for a 1000-executor / 100 TB deployment:
  broadcast small sides, partial aggregation before shuffles,
  partition-column pruning, AQE on.
"""

from skysafe_datalake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
