"""Distributed Elasticsearch serving sink — es-hadoop connector
wiring behind a feature flag.

The reference serves its dashboard by ``collect()``ing the whole
usage table to the Python driver and bulk-posting row dicts over HTTP
(``/root/reference/src/index_elastic.py:161-218``) — the one place it
abandons distributed execution. The engine-native replacement is the
es-hadoop Spark datasource (``org.elasticsearch.spark.sql``): every
executor writes its partitions straight to ES with ``es.mapping.id =
icao24``, reproducing the reference's ``_id=icao24`` idempotent-upsert
semantics (``:199-211``) with no driver hop and no row limit.

The connector jar is not shipped in this container, so:

- :func:`es_write_options` and :data:`INDEX_MAPPING` pin the full
  config + typed mapping contract (what a deployment must provision —
  reference ``index_elastic.py:22-62``), and
- :func:`write_batch_to_es` / :func:`attach_es_sink` raise a clear
  ``EsSinkUnavailable`` unless the datasource is actually on the
  classpath (``spark.jars.packages=org.elasticsearch:elasticsearch-
  spark-30_2.13:<ver>``), keeping the serving boundary config-complete
  while the default sink remains the bucketed parquet upsert
  (:func:`skysafe_datalake_spark.plans.usage.upsert_partitioned`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ES_DATASOURCE = "org.elasticsearch.spark.sql"

# Typed index mapping the serving cluster must be provisioned with
# (reference src/index_elastic.py:22-62). Values written by
# plans.usage.build_usage cast cleanly onto these types; `location`
# is the {lat, lon} struct assembled by with_location → geo_point.
INDEX_MAPPING = {
    "mappings": {
        "properties": {
            "icao24": {"type": "keyword"},
            "callsign": {"type": "keyword"},
            "origin_country": {"type": "keyword"},
            "location": {"type": "geo_point"},
            "baro_altitude": {"type": "float"},
            "geo_altitude": {"type": "float"},
            "on_ground": {"type": "boolean"},
            "velocity": {"type": "float"},
            "true_track": {"type": "float"},
            "vertical_rate": {"type": "float"},
            "observation_time": {"type": "date"},
            "extracted_at": {"type": "date"},
            "wind_speed_10m": {"type": "float"},
            "wind_direction_10m": {"type": "float"},
            "wind_gusts_10m": {"type": "float"},
            "precipitation": {"type": "float"},
            "rain": {"type": "float"},
            "cloud_cover": {"type": "integer"},
            "weather_code": {"type": "integer"},
            "visibility": {"type": "float"},
            "temperature_2m": {"type": "float"},
            "risk_score": {"type": "integer"},
            "risk_category": {"type": "keyword"},
            "flight_phase": {"type": "keyword"},
            "flight_phase_id": {"type": "integer"},
            "is_anomaly": {"type": "boolean"},
            "anomaly_score": {"type": "float"},
        }
    }
}


class EsSinkUnavailable(RuntimeError):
    """The es-hadoop datasource is not on the Spark classpath."""


def es_write_options(
    es_nodes: str = "localhost",
    es_port: int = 9200,
    index: str = "sky_safe_dashboard",
    key: str = "icao24",
) -> dict[str, str]:
    """Datasource options reproducing the reference's upsert contract:
    ``es.mapping.id`` keys documents (no duplicates, newest wins —
    reference ``_id=icao24``), upsert write mode, index auto-create
    left OFF so the provisioned INDEX_MAPPING (geo_point!) is
    authoritative."""
    return {
        "es.nodes": es_nodes,
        "es.port": str(es_port),
        "es.resource": index,
        "es.mapping.id": key,
        "es.write.operation": "upsert",
        "es.index.auto.create": "no",
        # geo_point arrives as a {lat, lon} struct column
        "es.mapping.names": "location:location",
    }


def es_available(spark) -> bool:
    """True when the es-hadoop datasource class is loadable."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.elasticsearch.spark.sql.DefaultSource"
        )
        return True
    except Exception:
        return False


def write_batch_to_es(batch: DataFrame, options: dict[str, str]) -> None:
    """Distributed bulk upsert of one (micro-)batch."""
    if not es_available(batch.sparkSession):
        raise EsSinkUnavailable(
            "es-hadoop datasource not on the classpath; add "
            "spark.jars.packages=org.elasticsearch:elasticsearch-spark-"
            "30_2.13:<version> (and provision INDEX_MAPPING), or keep "
            "the default parquet upsert sink"
        )
    batch.write.format(ES_DATASOURCE).options(**options).mode("append").save()


def attach_es_sink(usage_stream, options: dict[str, str], *, base=None):
    """foreachBatch hook that mirrors each usage micro-batch into ES.

    A ``DataStreamWriter`` holds exactly ONE foreachBatch function —
    calling this on a writer that already registered one (e.g.
    ``run_flights_stream``'s parquet upsert) would silently REPLACE
    it, stopping the usage-table writes (round-9 review). Pass that
    existing batch function as ``base`` and the composed sink runs it
    first, then the ES mirror — the batch reaches BOTH sinks."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if base is not None:
            base(batch, batch_id)
        write_batch_to_es(batch, options)

    return usage_stream.foreachBatch(sink)
