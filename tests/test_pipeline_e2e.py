"""End-to-end batch pipeline tests: fixture-fed fetchers (the real
OAuth2/token/tolerance code paths, transport swapped), all four
medallion layers materialized through the catalog, and the bucketed
keyed-upsert sink's partition-pruning contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skysafe_datalake_spark.catalog import LakeCatalog
from skysafe_datalake_spark.plans.pipeline import run_batch_pipeline
from skysafe_datalake_spark.plans.usage import build_usage, upsert_partitioned
from skysafe_datalake_spark.sources import ingest
from skysafe_datalake_spark.workload.pipeline import (
    FIXTURE_TS,
    fixture_clients,
    fixture_transport,
    states_payload,
    weather_payload,
)
from skysafe_datalake_spark.workload.tables import STATIONS


def _rows(n=40):
    # synthetic_flights-shaped dicts without needing the events table
    out = []
    for i in range(1, n + 1):
        out.append(
            {
                "flight_id": i,
                "lat": 41.3 + (i % 981) / 100.0,
                "lon": -5.1 + ((i * 7) % 1471) / 100.0,
                "baro_altitude": float((i * 13) % 13000),
                "on_ground": i % 10 == 0,
                "velocity": 100.0 + i,
                "vertical_rate": float((i % 41) - 20),
            }
        )
    return out


# ───────────────────────── fetcher contracts ──────────────────────


def test_opensky_token_flow_is_enforced():
    doc = states_payload(_rows(3))
    transport = fixture_transport(doc, {})
    client = ingest.OpenSkyClient(transport, client_id="fixture", client_secret="s")
    payload = client.fetch_states()
    assert len(payload["states"]) == 3
    assert "_extracted_at" in payload

    # a transport that refuses the token must fail the fetch
    def no_token(method, url, **kw):
        if url == ingest.OPENSKY_TOKEN_URL:
            raise ingest.HttpError("500")
        return transport(method, url, **kw)

    bad = ingest.OpenSkyClient(no_token, client_id="fixture", client_secret="s")
    with pytest.raises(ingest.HttpError):
        bad.fetch_states()


def test_opensky_proxy_path_and_none_payload():
    calls = []

    def proxy_transport(method, url, *, json_body=None, **kw):
        calls.append((method, url, json_body))
        return {"time": 1, "states": []}

    client = ingest.OpenSkyClient(proxy_transport, proxy_url="https://proxy.test/")
    client.fetch_states()
    method, url, body = calls[0]
    assert (method, url) == ("POST", "https://proxy.test/")
    assert body == {"bounding_box": list(ingest.FRANCE_BBOX)}

    none_client = ingest.OpenSkyClient(
        lambda *a, **k: None, proxy_url="https://proxy.test/"
    )
    with pytest.raises(ingest.IngestError):
        none_client.fetch_states()


def test_weather_per_point_error_tolerance():
    """One dead station is skipped, the batch succeeds with the other
    five (reference extract_weather.py:78-85 semantics)."""
    weather_by_point = {(s[1], s[2]): weather_payload(s) for s in STATIONS[1:]}
    transport = fixture_transport({"states": []}, weather_by_point)
    client = ingest.OpenMeteoClient(transport)
    results = client.fetch_all()
    assert len(results) == 5
    assert all("_extracted_at" in r for r in results)


# ─────────────────────── end-to-end pipeline ──────────────────────


def test_batch_pipeline_materializes_all_layers(spark, tmp_path):
    import time as _time

    flights_client, weather_client = fixture_clients(states_payload(_rows(60)))
    cat = LakeCatalog(str(tmp_path / "lake"))
    t0 = _time.perf_counter()
    result = run_batch_pipeline(
        spark, cat, flights_client, weather_client, ts=FIXTURE_TS, with_counts=True
    )
    total = _time.perf_counter() - t0

    # Per-stage wall attribution: every DAG stage records a positive
    # wall time. Since r14 the flights and weather legs (extract →
    # format) run concurrently (guide §2.6), so the stage sum may
    # legitimately EXCEED the wall (overlapped time counts twice);
    # the serial-spine invariant below replaces the old
    # `staged <= total` bound. The legs still dominate the wall, so
    # the 0.95 lower bound stands.
    expected_stages = {
        "extract_flights",
        "extract_weather",
        "format_flights",
        "format_weather",
        "combine",
        "usage",
        "counts",  # with_counts=True
    }
    assert set(result.stage_seconds) == expected_stages
    assert all(s >= 0 for s in result.stage_seconds.values())
    staged = sum(result.stage_seconds.values())
    assert staged >= 0.95 * total
    # Serial spine: the longest leg plus the sequential tail stages
    # must fit inside the pipeline wall (a stage timer counting work
    # outside its thread would break this).
    s = result.stage_seconds
    flights_leg = s["extract_flights"] + s["format_flights"]
    weather_leg = s["extract_weather"] + s["format_weather"]
    spine = max(flights_leg, weather_leg) + s["combine"] + s["usage"] + s["counts"]
    assert spine <= total + 0.05
    # bench.py reads the module-level copy for the e2e detail row
    from skysafe_datalake_spark.plans import pipeline as plans_pipeline

    assert plans_pipeline.LAST_STAGE_SECONDS == result.stage_seconds

    assert result.counts["formatted_flights"] == 60
    assert result.counts["formatted_weather"] == 6
    assert result.counts["enriched"] == 60
    assert result.counts["usage"] == 60

    # raw layer holds the verbatim payload documents
    raw = cat.read_latest(spark, "raw", "opensky", "flights", fmt="text")
    assert raw.count() == 1 and raw.first()["value"].startswith("{")

    # usage layer == build_usage applied to the formatted layers
    flights = cat.read_latest(spark, "formatted", "opensky", "flights").drop(
        "date", "hour"
    )
    weather = cat.read_latest(spark, "formatted", "open_meteo", "weather").drop(
        "date", "hour"
    )
    from skysafe_datalake_spark.plans.combine import combine_enrich

    enriched, _ = combine_enrich(flights, weather)
    expected = {
        (r["icao24"], r["risk_score"], r["risk_category"], round(r["dist_km"], 6))
        for r in build_usage(enriched)
        .select("icao24", "risk_score", "risk_category", "dist_km")
        .collect()
    }
    usage = cat.read_latest(spark, "usage", "skysafe", "flights")
    got = {
        (r["icao24"], r["risk_score"], r["risk_category"], round(r["dist_km"], 6))
        for r in usage.select(
            "icao24", "risk_score", "risk_category", "dist_km"
        ).collect()
    }
    assert got == expected

    # partition pruning survives the pipeline: latest-read plans carry
    # the partition predicate, not a full-table scan
    plan = usage._jdf.queryExecution().executedPlan().toString()
    assert "date=2026-02-26" in plan or "PartitionFilters" in plan


# ───────────────────── bucketed upsert contract ───────────────────


def _bucket_files(table_dir):
    out = {}
    for d in os.listdir(table_dir):
        if d.startswith("kb="):
            full = os.path.join(table_dir, d)
            out[d] = {
                f: os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    table = str(tmp_path / "usage")
    base = spark.createDataFrame(
        [(f"k{i}", f"2026-01-01T00:0{i % 10}:00", i) for i in range(20)],
        "icao24 string, ts_str string, v int",
    ).withColumn("extracted_at", F.to_timestamp("ts_str")).drop("ts_str")
    upsert_partitioned(base, table, n_buckets=4)
    before = _bucket_files(table)
    assert len(before) >= 2  # keys spread over multiple buckets

    batch = spark.createDataFrame(
        [("k3", "2026-01-01T01:00:00", 999)],
        "icao24 string, ts_str string, v int",
    ).withColumn("extracted_at", F.to_timestamp("ts_str")).drop("ts_str")
    upsert_partitioned(batch, table, n_buckets=4)
    after = _bucket_files(table)

    (touched_kb,) = [
        r["kb"]
        for r in batch.withColumn(
            "kb", F.pmod(F.xxhash64("icao24"), F.lit(4)).cast("int")
        )
        .select("kb")
        .distinct()
        .collect()
    ]
    for kb_dir, files in before.items():
        if kb_dir == f"kb={touched_kb}":
            assert after[kb_dir] != files, "touched bucket must be rewritten"
        else:
            assert after[kb_dir] == files, f"untouched {kb_dir} was rewritten"

    # merge semantics: newer row won, all other keys intact
    final = spark.read.parquet(table)
    assert final.count() == 20
    assert final.filter(F.col("icao24") == "k3").first()["v"] == 999


def test_upsert_dedupes_within_first_batch(spark, tmp_path):
    table = str(tmp_path / "usage")
    df = spark.createDataFrame(
        [("a", "2026-01-01T00:00:00", 1), ("a", "2026-01-01T00:05:00", 2)],
        "icao24 string, ts_str string, v int",
    ).withColumn("extracted_at", F.to_timestamp("ts_str")).drop("ts_str")
    upsert_partitioned(df, table, n_buckets=2)
    out = spark.read.parquet(table)
    assert out.count() == 1
    assert out.first()["v"] == 2


def test_es_sink_contract_without_connector(spark):
    """Serving-boundary stub: the mapping contract is complete and the
    sink fails with a clear signal when the es-hadoop jar is absent
    (it is, in this container)."""
    from skysafe_datalake_spark.streaming import es_sink

    opts = es_sink.es_write_options(index="idx")
    assert opts["es.mapping.id"] == "icao24"
    assert opts["es.write.operation"] == "upsert"
    props = es_sink.INDEX_MAPPING["mappings"]["properties"]
    assert props["location"] == {"type": "geo_point"}
    assert set(props) >= {
        "icao24", "risk_score", "risk_category", "flight_phase",
        "is_anomaly", "anomaly_score", "extracted_at",
    }

    df = spark.createDataFrame([("a",)], "icao24 string")
    assert not es_sink.es_available(spark)
    with pytest.raises(es_sink.EsSinkUnavailable):
        es_sink.write_batch_to_es(df, opts)


def test_es_sink_composes_with_existing_batch_function(monkeypatch):
    """A DataStreamWriter holds exactly ONE foreachBatch function, so
    attach_es_sink must COMPOSE with the parquet-upsert batch fn via
    base= (round-9 review: calling it bare silently replaced the
    upsert and the usage table stopped updating) — and the base runs
    FIRST so the serving mirror never precedes the table write."""
    from skysafe_datalake_spark.streaming import es_sink

    calls = []
    monkeypatch.setattr(
        es_sink, "write_batch_to_es",
        lambda batch, options: calls.append(("es", batch)),
    )

    class FakeWriter:
        def foreachBatch(self, fn):
            self.fn = fn
            return self

    w = es_sink.attach_es_sink(
        FakeWriter(),
        {"es.resource": "idx"},
        base=lambda batch, bid: calls.append(("upsert", batch)),
    )
    w.fn("BATCH", 7)
    assert calls == [("upsert", "BATCH"), ("es", "BATCH")]


def test_run_flights_stream_none_trigger_means_default(spark, tmp_path, monkeypatch):
    """trigger_seconds=None is the advertised way to ask for the
    default ASAP trigger; it used to interpolate the literal string
    'None seconds' into trigger(processingTime=...) and crash at
    query start (round-9 review)."""
    from skysafe_datalake_spark.streaming import driver as sdriver

    # An EMPTY raw dir: no micro-batch ever fires, so only the trigger
    # construction (the thing under test) is exercised.
    raw = tmp_path / "raw"
    raw.mkdir()
    weather = spark.createDataFrame([], "station_id long")
    q = sdriver.run_flights_stream(
        spark,
        str(raw),
        weather,
        str(tmp_path / "usage"),
        str(tmp_path / "ckpt"),
        trigger_seconds=None,  # used to build trigger('None seconds')
    )
    try:
        assert q.isActive  # started: the interval parse did not throw
    finally:
        q.stop()


def test_catalog_compaction_rewrites_only_fragmented_partitions(spark, tmp_path):
    """Small-file compaction: a fragmented partition collapses to the
    file count its volume needs; already-compact partitions are left
    byte-untouched (dynamic-overwrite swap, like the upsert sink)."""
    from datetime import datetime, timezone

    from skysafe_datalake_spark.catalog import LakeCatalog

    cat = LakeCatalog(str(tmp_path / "lake"))
    frag = spark.range(1000).repartition(8).withColumnRenamed("id", "x")
    cat.write(frag, "formatted", "opensky", "flights",
              ts=datetime(2026, 2, 26, 13, tzinfo=timezone.utc))
    tidy = spark.range(1000, 2000).coalesce(1).withColumnRenamed("id", "x")
    cat.write(tidy, "formatted", "opensky", "flights",
              ts=datetime(2026, 2, 26, 14, tzinfo=timezone.utc))

    root = cat.path("formatted", "opensky", "flights")

    def files(hour):
        d = os.path.join(root, "date=2026-02-26", f"hour={hour}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before13, before14 = files(13), files(14)
    assert len(before13) == 8 and len(before14) == 1

    result = cat.compact(spark, "formatted", "opensky", "flights")
    assert result == {"date=2026-02-26/hour=13": (8, 1)}
    assert len(files(13)) == 1
    assert files(14) == before14  # untouched partition: same files, same mtime

    # values intact across the whole entity
    vals = sorted(
        r["x"] for r in cat.read(spark, "formatted", "opensky", "flights").collect()
    )
    assert vals == list(range(2000))


def test_round2_operators_handle_empty_inputs(spark, tmp_path):
    """Empty-input robustness for the round-2 operators: an empty
    micro-batch / an empty change batch / an empty left side must be
    no-ops or empty results, never errors."""
    from pyspark.sql import functions as F2

    from skysafe_datalake_spark.functions.geo import haversine_km
    from skysafe_datalake_spark.operators.nn_join import grid_nn_join
    from skysafe_datalake_spark.operators.temporal import scd2_build, scd2_merge

    # empty batch into an existing upsert table: table unchanged
    table = str(tmp_path / "usage")
    base = spark.createDataFrame(
        [("a", "2026-01-01T00:00:00", 1)],
        "icao24 string, ts_str string, v int",
    ).withColumn("extracted_at", F2.to_timestamp("ts_str")).drop("ts_str")
    upsert_partitioned(base, table, n_buckets=2)
    empty = base.where(F2.lit(False))
    upsert_partitioned(empty, table, n_buckets=2)
    assert spark.read.parquet(table).count() == 1

    # empty change batch merged into SCD2 history: history unchanged
    changes = spark.createDataFrame(
        [(1, "P1", "2026-01-01T00:00:00", 10)],
        "k long, v string, ts_str string, seq long",
    ).withColumn("ts", F2.to_timestamp("ts_str")).drop("ts_str")
    hist = scd2_build(changes, key="k", value="v", ts="ts", seq="seq")
    merged = scd2_merge(
        hist, changes.where(F2.lit(False)), key="k", value="v", ts="ts", seq="seq"
    )
    assert merged.count() == hist.count() == 1

    # empty left side through the grid NN join: empty result, no error
    left = spark.createDataFrame([], "fid long, lat double, lon double")
    right = spark.createDataFrame([(1, 45.0, 2.0)], "sid long, s_lat double, s_lon double")
    out = grid_nn_join(
        left, right,
        partition_by=["fid"], left_lat="lat", left_lon="lon",
        right_lat="s_lat", right_lon="s_lon",
        distance=haversine_km("lat", "lon", "s_lat", "s_lon"),
        cell_deg=0.5,
    )
    assert out.count() == 0


def test_kibana_provisioning_flow(tmp_path):
    """S11 provisioning through fixture transports: readiness polling
    with retries, xsrf-header import, loud failures on missing file /
    dead Kibana."""
    from skysafe_datalake_spark.serving import kibana

    nd = tmp_path / "dash.ndjson"
    nd.write_text('{"type":"index-pattern","id":"usage"}\n')

    calls = {"status": 0}

    def transport(method, url, *, params=None, data=None, json_body=None,
                  files=None, headers=None, timeout=None):
        if url.endswith("/api/status"):
            calls["status"] += 1
            if calls["status"] < 3:  # ready on 3rd poll
                raise ingest.HttpError("503")
            return {"status": "available"}
        assert "saved_objects/_import" in url and "overwrite=true" in url
        assert headers["kbn-xsrf"] == "true"
        # Kibana's _import accepts only multipart file uploads, so the
        # payload must ride the files= channel with its .ndjson name
        fname, content = files["file"]
        assert fname.endswith(".ndjson")
        assert "index-pattern" in content
        assert data is None
        return {"successCount": 5, "errors": []}

    slept = []
    out = kibana.import_dashboard(
        transport, nd, sleep=slept.append
    )
    assert out["successCount"] == 5
    assert calls["status"] == 3 and len(slept) == 2

    with pytest.raises(FileNotFoundError):
        kibana.import_dashboard(transport, tmp_path / "missing.ndjson")

    def never_ready(method, url, **kw):
        raise ingest.HttpError("503")

    with pytest.raises(RuntimeError, match="ready"):
        kibana.import_dashboard(
            never_ready, nd, sleep=lambda s: None
        )


def test_catalog_orc_round_trip(spark, tmp_path):
    """The catalog is format-agnostic: ORC (columnar, built-in)
    round-trips with values intact and latest-partition pruning, same
    as parquet/JSON/CSV — a lake can mix formats per entity."""
    from datetime import datetime, timezone

    cat = LakeCatalog(str(tmp_path / "lake"))
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, -3.25)], "id LONG, name STRING, score DOUBLE"
    )
    cat.write(df, "formatted", "api", "things", fmt="orc",
              ts=datetime(2026, 2, 26, 13, tzinfo=timezone.utc))
    got = cat.read_latest(spark, "formatted", "api", "things", fmt="orc")
    assert {
        (r["id"], r["name"], r["score"])
        for r in got.select("id", "name", "score").collect()
    } == {(1, "alpha", 1.5), (2, None, -3.25)}


def test_latest_per_key_null_ts_loses_and_subsecond_wins(spark):
    """Round-9 review, both reproduced: a NULL extracted_at row beat
    every real row forever (null first field wins min(struct)), and
    unix_timestamp's whole-second truncation let payload bytes pick
    the survivor among same-second rows."""
    from skysafe_datalake_spark.plans.usage import latest_per_key

    df = spark.createDataFrame(
        [("k1", None, "corrupt"),
         ("k1", "2026-01-01 00:00:01.000000", "old"),
         ("k1", "2026-01-01 00:00:01.600000", "newest"),
         ("k2", None, "only-null")],
        "icao24 string, extracted_at string, v string",
    ).withColumn("extracted_at", F.to_timestamp("extracted_at"))
    out = {r["icao24"]: r["v"] for r in latest_per_key(df).collect()}
    assert out["k1"] == "newest"   # not "corrupt" (null), not "old" (.0 < .6)
    assert out["k2"] == "only-null"  # all-null key still emits its row


def test_compact_preserves_zero_padded_hour_partitions(spark, tmp_path):
    """Round-9 review, reproduced: partition inference read hour=08
    back as int 8 and compaction rewrote into a NEW hour=8 dir while
    dynamic overwrite never cleared hour=08 — the partition's rows
    doubled on every compact() run."""
    import os
    from datetime import datetime, timezone

    cat = LakeCatalog(str(tmp_path / "lake"))
    ts = datetime(2026, 2, 26, 8, tzinfo=timezone.utc)  # zero-padded hour=08
    df = spark.range(100).select(F.col("id").alias("v"))
    # several small writes into the same partition -> many files
    for chunk in (df.where("v < 50"), df.where("v >= 50")):
        cat.write(
            chunk.repartition(4), "formatted", "api", "pad", ts=ts
        )
    # dynamic overwrite per-write replaced the partition; write both
    # halves in ONE write so all 100 rows coexist
    cat.write(df.repartition(8), "formatted", "api", "pad", ts=ts)
    root = cat.path("formatted", "api", "pad")
    assert cat.compact(spark, "formatted", "api", "pad", min_files=2)
    hours = sorted(
        h for h in os.listdir(os.path.join(root, "date=2026-02-26"))
        if h.startswith("hour=")
    )
    assert hours == ["hour=08"], hours  # no stray hour=8 twin
    assert cat.read(spark, "formatted", "api", "pad").count() == 100


def test_read_latest_discovers_from_listing(spark, tmp_path):
    """Latest-partition discovery is a directory listing (no data
    scan) and still picks the true max across padded/unpadded hours."""
    from datetime import datetime, timezone

    cat = LakeCatalog(str(tmp_path / "lake"))
    for day, hour, tag in ((25, 23, "old"), (26, 8, "mid"), (26, 14, "new")):
        cat.write(
            spark.createDataFrame([(tag,)], "tag string"),
            "formatted", "api", "lst",
            ts=datetime(2026, 2, day, hour, tzinfo=timezone.utc),
        )
    rows = cat.read_latest(spark, "formatted", "api", "lst").collect()
    assert [r["tag"] for r in rows] == ["new"]
    assert cat._latest_partition("formatted", "api", "missing") is None


def test_urllib_transport_maps_connection_errors_to_httperror():
    """wait_for_kibana retries on HttpError; the dominant boot-time
    failure is connection-refused (URLError), which escaped the loop
    before round 9."""
    import pytest

    with pytest.raises(ingest.HttpError, match="->"):
        ingest.urllib_transport(
            "GET", "http://127.0.0.1:1/api/status", timeout=0.5
        )


def test_urllib_transport_builds_multipart_for_files(monkeypatch):
    """The files= channel must produce a real multipart/form-data body
    (Kibana's _import rejects anything else)."""
    import io
    import json as _json
    import urllib.request

    captured = {}

    def fake_urlopen(req, timeout=None):
        captured["body"] = req.data
        captured["ctype"] = req.get_header("Content-type")
        return io.BytesIO(_json.dumps({"ok": 1}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    out = ingest.urllib_transport(
        "POST", "http://kibana.example.com/api/saved_objects/_import",
        files={"file": ("dash.ndjson", '{"type":"index-pattern"}\n')},
        headers={"kbn-xsrf": "true"},
    )
    assert out == {"ok": 1}
    assert captured["ctype"].startswith("multipart/form-data; boundary=")
    boundary = captured["ctype"].split("boundary=", 1)[1]
    body = captured["body"].decode()
    assert f"--{boundary}\r\n" in body and f"--{boundary}--" in body
    assert 'filename="dash.ndjson"' in body
    assert '{"type":"index-pattern"}' in body
