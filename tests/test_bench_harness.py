"""bench.py harness behavior (no Spark session needed)."""

from __future__ import annotations

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
