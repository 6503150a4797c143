"""Real Structured Streaming runs (file source → availableNow →
memory sink) for the stateful operators: applyInPandasWithState
sessionization (cross-batch state via checkpoint restart),
dropDuplicatesWithinWatermark, and built-in session_window
aggregation — each checked against its batch twin on the same rows.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL


def _normalized_events(spark, tmp_path, n_files=1):
    """events (ts normalized to micros) written as n_files parquet
    files split on global ts median — per-user time order is
    preserved across files, so file order == event-time order."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.workload.tables import load

    e = load(spark, SF_SMALL, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events_in")
    if n_files == 1:
        e.coalesce(1).write.mode("overwrite").parquet(out)
        return e, [out]
    median = e.approxQuantile("event_id", [0.5], 0.0)[0]
    parts = [
        e.filter(F.col("event_id") <= median),
        e.filter(F.col("event_id") > median),
    ]
    dirs = []
    for i, p in enumerate(parts):
        d = str(tmp_path / f"part{i}")
        p.coalesce(1).write.mode("overwrite").parquet(d)
        dirs.append(d)
    return e, dirs


def _run_available_now(stream_df, name, checkpoint):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState session assignment == batch sessionize
    on identical input, including state carried across a checkpoint
    restart (two files fed through two availableNow runs)."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.operators.temporal import sessionize
    from skysafe_datalake_spark.streaming.driver import sessionize_stream

    e, dirs = _normalized_events(spark, tmp_path, n_files=2)
    stream_dir = str(tmp_path / "stream_in")
    out_dir = str(tmp_path / "sess_out")
    os.makedirs(stream_dir)
    checkpoint = str(tmp_path / "ckpt")

    def feed(src_dir, run):
        """One availableNow run per file: the second run restarts from
        the checkpoint, proving per-key state survives across
        micro-batch boundaries AND query restarts. Memory sink cannot
        recover a checkpoint, so output appends to parquet."""
        for f in os.listdir(src_dir):
            if f.endswith(".parquet"):
                os.link(
                    os.path.join(src_dir, f),
                    os.path.join(stream_dir, f"{run}_{f}"),
                )
        stream = spark.readStream.schema(e.schema).parquet(stream_dir)
        q = (
            sessionize_stream(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    feed(dirs[0], 0)
    feed(dirs[1], 1)

    got = {
        (r.user_id, r.event_id): r.session_idx
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.user_id, r.event_id): r.session_idx
        for r in sessionize(
            e, by=["user_id"], ts="ts", gap_seconds=1800, tie_breakers=["event_id"]
        ).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark on a stream carrying every event
    twice emits each event_id exactly once."""
    from skysafe_datalake_spark.streaming.driver import streaming_dedup

    e, (d,) = _normalized_events(spark, tmp_path, n_files=1)
    doubled_dir = str(tmp_path / "doubled")
    e.unionByName(e).coalesce(1).write.mode("overwrite").parquet(doubled_dir)

    stream = spark.readStream.schema(e.schema).parquet(doubled_dir)
    q = _run_available_now(
        streaming_dedup(stream, id_col="event_id", watermark="2 hours"),
        "dedup_out",
        str(tmp_path / "ckpt_dedup"),
    )
    q.stop()
    n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_out").first()
    assert n.c == n.n == e.count()


def test_session_window_agg_stream_matches_batch(spark, tmp_path):
    """Built-in session_window aggregation over a stream (complete
    mode) produces the same sessions as the batch plan."""
    from skysafe_datalake_spark.streaming.driver import session_window_agg

    e, (d,) = _normalized_events(spark, tmp_path, n_files=1)
    stream = spark.readStream.schema(e.schema).parquet(d)
    q = (
        session_window_agg(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("swa_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_swa"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = sorted(
        map(tuple, spark.sql("SELECT * FROM swa_out").collect())
    )
    want = sorted(map(tuple, session_window_agg(e, gap="30 minutes").collect()))
    assert got == want and len(got) > 0


def test_interval_join_streams_matches_batch(spark, tmp_path):
    """Stream-stream interval join (view→purchase attribution within
    30 min) over two file-source streams produces exactly the batch
    join's pairs."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.streaming.driver import interval_join_streams

    e, (d,) = _normalized_events(spark, tmp_path, n_files=1)
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    buys = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"),
        F.col("user_id").alias("buy_user"),
        F.col("ts").alias("buy_ts"),
    )
    vdir, bdir = str(tmp_path / "views"), str(tmp_path / "buys")
    views.coalesce(1).write.mode("overwrite").parquet(vdir)
    buys.coalesce(1).write.mode("overwrite").parquet(bdir)

    joined_stream = interval_join_streams(
        spark.readStream.schema(views.schema).parquet(vdir),
        spark.readStream.schema(buys.schema).parquet(bdir),
        left_key="view_user",
        right_key="buy_user",
        left_ts="view_ts",
        right_ts="buy_ts",
        watermark="2 hours",
        within="30 minutes",
    )
    q = _run_available_now(
        joined_stream, "ivj_out", str(tmp_path / "ckpt_ivj")
    )
    q.stop()
    got = {
        (r.view_id, r.buy_id)
        for r in spark.sql("SELECT view_id, buy_id FROM ivj_out").collect()
    }
    want = {
        (r.view_id, r.buy_id)
        for r in interval_join_streams(
            views,
            buys,
            left_key="view_user",
            right_key="buy_user",
            left_ts="view_ts",
            right_ts="buy_ts",
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_idempotent_foreach_batch_skips_replayed_batches(spark, tmp_path):
    """An append sink wrapped in the commit-log guard writes each
    batch id exactly once even when the engine replays it (the
    failure-recovery contract foreachBatch leaves to the sink)."""
    from skysafe_datalake_spark.streaming.driver import idempotent_foreach_batch

    out = str(tmp_path / "out")
    commits = str(tmp_path / "commits")

    def append(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    guarded = idempotent_foreach_batch(append, commits)
    batch = spark.range(100).withColumnRenamed("id", "v")

    guarded(batch, 7)
    guarded(batch, 7)  # replay of the same micro-batch: must no-op
    guarded(batch, 8)  # a new batch id still writes

    got = spark.read.parquet(out)
    assert got.count() == 200  # 2 distinct batches, no duplicates
    import os

    assert sorted(os.listdir(commits)) == ["7.committed", "8.committed"]
