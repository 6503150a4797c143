"""bench.py harness behavior (no Spark session needed)."""

from __future__ import annotations

import os

import pytest

import bench


def _touch(d, *names):
    for n in names:
        (d / n).write_text("{}")


def test_round_number_builder_run_after_finished_round(tmp_path):
    # Both r4 files exist: round 4 is finished, we're a builder run in r5.
    _touch(tmp_path, "BENCH_r04.json", "CORRECTNESS_r04.json")
    assert bench._round_number(str(tmp_path)) == 5


def test_round_number_driver_bench_mid_round(tmp_path):
    # The driver writes CORRECTNESS_r{N} first, THEN runs bench: a
    # correctness file without its bench twin means we ARE round N
    # (the naive max+1 mislabeled the round-4 driver detail as r05).
    _touch(
        tmp_path,
        "BENCH_r04.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
    )
    assert bench._round_number(str(tmp_path)) == 5


def test_round_number_env_override(tmp_path, monkeypatch):
    _touch(tmp_path, "BENCH_r04.json", "CORRECTNESS_r04.json")
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "9")
    assert bench._round_number(str(tmp_path)) == 9


def test_round_number_empty_repo(tmp_path):
    assert bench._round_number(str(tmp_path)) == 1


def test_round_number_warns_on_unparseable_env(tmp_path, monkeypatch, capsys):
    # A set-but-non-integer SPARK_GRAFT_ROUND must not be silently
    # ignored — that re-introduces the detail-file mislabeling the
    # env override exists to prevent.
    _touch(tmp_path, "BENCH_r04.json", "CORRECTNESS_r04.json")
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "r5")
    assert bench._round_number(str(tmp_path)) == 5  # falls back to files
    assert "SPARK_GRAFT_ROUND='r5'" in capsys.readouterr().err


def test_loadavg_shape():
    # On Linux this reads /proc/loadavg; elsewhere it returns None.
    la = bench._loadavg()
    if la is not None:
        assert len(la) == 3 and all(isinstance(x, float) for x in la)


def test_stateful_shuffle_partitions_sizing():
    from skysafe_datalake_spark.streaming.driver import (
        stateful_shuffle_partitions,
    )

    # replay volume: floor wins
    assert stateful_shuffle_partitions(10_000) == 8
    assert stateful_shuffle_partitions(10_000, lo=4) == 4
    # 64x smoke volume: 6.4M rows / 200k = 32 stores
    assert stateful_shuffle_partitions(6_400_000) == 32
    # unbounded input: hi caps store instances
    assert stateful_shuffle_partitions(10**9) == 128
    assert stateful_shuffle_partitions(0) == 8


def test_stateful_sizing_pinned_at_bench_scale():
    """Pin the five stateful queries' BENCH-SCALE partition counts.

    Round 5 introduced data-sized state-store parallelism and its one
    coinciding bench regression (streaming_stateful_running_agg +30%)
    could not be ruled a partition-count change or noise. This test
    recomputes each site's Observation row count from the same sf0.1
    events table the bench replays and asserts the helper still lands
    on the measured replay floors (8/8/4/4/4) — so any future bench
    delta on these queries is provably not a sizing change.
    """
    import duckdb

    from skysafe_datalake_spark.streaming.driver import (
        stateful_shuffle_partitions,
    )

    events = "/root/testdata/sf0.1/events.parquet"
    if not os.path.exists(events):
        pytest.skip("sf0.1 testdata not present")
    con = duckdb.connect()
    total, clicks, purchases, dup_extra = con.execute(
        f"""SELECT count(*),
                   count(*) FILTER (event_type = 'click'),
                   count(*) FILTER (event_type = 'purchase'),
                   count(*) FILTER (event_id % 3 = 0)
            FROM '{events}'"""
    ).fetchone()
    con.close()
    # workload/pipeline.py stateful sites, same Observation inputs:
    #   streaming_stateful_running_agg: all events, default lo=8
    assert stateful_shuffle_partitions(total) == 8
    #   streaming_interval_join: clicks + purchases, default lo=8
    assert stateful_shuffle_partitions(clicks + purchases) == 8
    #   streaming_left/full_outer_join: clicks + purchases + 2
    #   sentinel rows, lo=4 (4 state stores per partition)
    assert stateful_shuffle_partitions(clicks + purchases + 2, lo=4) == 4
    assert stateful_shuffle_partitions(clicks + purchases + 2, lo=4) == 4
    #   streaming_dedup_watermark: events + every-3rd re-sent, lo=4
    assert stateful_shuffle_partitions(total + dup_extra, lo=4) == 4
