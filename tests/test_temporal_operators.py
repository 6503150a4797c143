"""Golden-value tests for the temporal operators (as-of join,
sessionization) on tiny DataFrames — the SURVEY.md §5 per-operator
test pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from skysafe_datalake_spark.operators.temporal import asof_join, sessionize


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in [(f.name, f.dataType.simpleString()) for f in df.schema.fields]:
        if c.endswith("_s") and t == "string":
            df = df.withColumn(c[:-2], F.to_timestamp(c)).drop(c)
    return df


def test_asof_join_backward_inclusive_and_outer(spark):
    left = _ts_df(
        spark,
        [(1, 10, "2024-01-01 00:10:00"), (1, 11, "2024-01-01 00:00:00"),
         (2, 12, "2024-01-01 00:30:00")],
        "k long, lid long, ts_s string",
    )
    right = _ts_df(
        spark,
        [(1, 100, "2024-01-01 00:05:00"), (1, 101, "2024-01-01 00:10:00"),
         (3, 102, "2024-01-01 00:00:00")],
        "k long, rid long, rts_s string",
    )
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, by=["k"], left_on="ts", right_on="rts",
            payload=["rid", "rts"], tie_breaker="rid",
        ).collect()
    }
    assert out[10] == 101  # equal timestamp is visible (<=)
    assert out[11] is None  # no prior right row → left-outer NULL
    assert out[12] is None  # key 2 has no right rows at all


def test_asof_join_null_payload_comes_from_matched_row(spark):
    """merge_asof semantics: the payload is whatever the MATCHED row
    carries — a legitimately-NULL payload on the as-of match must stay
    NULL, not be back-filled from a staler right row (the round-9
    ignorenulls bug: independent per-column fills could even stitch
    different right rows together)."""
    left = _ts_df(
        spark,
        [(1, 10, "2024-01-01 11:05:00")],
        "k long, lid long, ts_s string",
    )
    right = _ts_df(
        spark,
        [(1, 7, "old", "2024-01-01 10:00:00"),
         (1, None, "new", "2024-01-01 11:00:00")],
        "k long, click_id long, tag string, rts_s string",
    )
    row = asof_join(
        left, right, by=["k"], left_on="ts", right_on="rts",
        payload=["click_id", "tag"],
    ).collect()[0]
    # match is the 11:00 row: click_id NULL (not 7 from 10:00), and
    # both payload columns come from that same row
    assert row["click_id"] is None
    assert row["tag"] == "new"
    # with a tolerance the 11:00 match is fresh — still NULL, not 7
    row = asof_join(
        left, right, by=["k"], left_on="ts", right_on="rts",
        payload=["click_id", "tag"], tolerance="30 minutes",
    ).collect()[0]
    assert row["click_id"] is None and row["tag"] == "new"


def test_asof_join_tie_breaker_must_be_payload(spark):
    import pytest

    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")], "k long, lid long, ts_s string")
    right = _ts_df(spark, [(1, 100, "2024-01-01 00:05:00")], "k long, rid long, rts_s string")
    with pytest.raises(ValueError, match="must be one of the payload"):
        asof_join(
            left, right, by=["k"], left_on="ts", right_on="rts",
            payload=["rid"], tie_breaker="rts",
        )


def test_asof_join_tie_breaker_picks_greatest(spark):
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")], "k long, lid long, ts_s string")
    right = _ts_df(
        spark,
        [(1, 100, "2024-01-01 00:05:00"), (1, 200, "2024-01-01 00:05:00")],
        "k long, rid long, rts_s string",
    )
    out = asof_join(
        left, right, by=["k"], left_on="ts", right_on="rts",
        payload=["rid"], tie_breaker="rid",
    ).collect()
    assert out[0]["rid"] == 200


def test_sessionize_splits_on_gap(spark):
    df = _ts_df(
        spark,
        [(1, 1, "2024-01-01 00:00:00"), (1, 2, "2024-01-01 00:20:00"),
         (1, 3, "2024-01-01 01:10:00"),  # 50 min gap → new session
         (1, 4, "2024-01-01 01:40:00"),  # exactly 30 min → SAME session
         (2, 5, "2024-01-01 00:00:00")],
        "u long, eid long, ts_s string",
    )
    out = {
        r["eid"]: r["session_idx"]
        for r in sessionize(df, by=["u"], gap_seconds=1800, tie_breakers=["eid"]).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_multitouch_attribution_conserves_cents(spark):
    """Total credited cents must equal total purchase cents over
    purchases that have at least one touch — the integer split may
    not create or leak a single cent."""
    from tests.conftest import SF_SMALL

    from skysafe_datalake_spark.workload import QUERIES
    from skysafe_datalake_spark.workload.tables import load
    from pyspark.sql import functions as F

    credited = (
        QUERIES["multitouch_attribution"](spark, SF_SMALL)
        .agg(F.sum("credit_cents"))
        .first()[0]
    )
    e = load(spark, SF_SMALL, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    touched = (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
            "left_semi",
        )
        .agg(F.sum("cents"))
        .first()[0]
    )
    assert credited == touched
