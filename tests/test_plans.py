"""Physical-plan assertions — the scale contract, not just the answer.

Each test pins the plan property that makes the operator viable at
100 TB (broadcast instead of shuffle, pushdown into the scan,
semi/anti decorrelation, whole-stage codegen). A refactor that keeps
results correct but regresses the plan (e.g. drops a broadcast hint
and silently falls back to a sort-merge join over the fact table)
fails here long before a benchmark would catch it.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from skysafe_datalake_spark.workload import QUERIES


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_decode_map_join_broadcasts(spark):
    """The 5-row decode table must broadcast — never shuffle the
    event fact side for a lookup join."""
    plan = plan_of(spark, "decode_map_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_nn_join_broadcasts_stations(spark):
    """The 6-row station table broadcasts under the cross join: the
    flights side streams in place (BroadcastNestedLoopJoin), no
    all-to-all exchange of the big side."""
    plan = plan_of(spark, "nn_station_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_subquery_exists_decorrelates(spark):
    """EXISTS / NOT EXISTS must decorrelate to semi/anti joins (one
    pass over orders), not re-run a subquery per customer row."""
    plan = plan_of(spark, "subquery_exists")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_filter_project_pushes_down(spark):
    """Filter and projection reach the parquet scan: the scan reports
    pushed filters and a pruned read schema, so at 100 TB only the
    needed columns/row-groups leave storage."""
    plan = plan_of(spark, "filter_project")
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_column_pruning_reaches_scan(spark):
    """A 3-column projection over the 11-column lineitem must not
    read all 11 columns (ReadSchema shows the pruned struct)."""
    plan = plan_of(spark, "topk_global")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "l_comment" not in read_schema[0]
    assert len(read_schema[0].split(",")) <= 6


def test_ann_lsh_is_equi_join(spark):
    """The LSH bucket key turns ANN from a cross join into an
    equi-join (broadcast hash join on bucket)."""
    plan = plan_of(spark, "ann_lsh_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_window_pass(spark):
    """The as-of join is one union + one window pass: exactly one
    shuffle (hashpartitioning on the key), never a per-key range
    explosion or sort-merge join."""
    plan = plan_of(spark, "asof_join_attrib")
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_rolling_ols_window_runs_on_hourly_cells(spark):
    """The 168-hour range frame partitions by low-cardinality
    event_type, so WindowExec parallelism is capped at a handful of
    tasks — the plan must feed it the PRE-AGGREGATED hourly series
    (HashAggregate below the Window), never the raw event stream,
    and attach frame stats back to events via an equi-join."""
    plan = plan_of(spark, "rolling_ols_slope")
    win = re.search(r"^\(\d+\) Window", plan, re.M)
    assert win is not None
    # a hash aggregate (the hourly fold) must appear in the window's
    # input subtree: cheap structural proxy — at least two
    # HashAggregate ops (partial+final) precede the Window node
    aggs_before = [
        m
        for m in re.finditer(r"^\(\d+\) HashAggregate", plan, re.M)
        if m.start() < win.start()
    ]
    assert len(aggs_before) >= 2, plan[:2000]


def test_hot_expressions_stay_in_codegen(spark):
    """Text analysis runs entirely inside whole-stage codegen — no
    Python/UDF boundary in the hot path."""
    plan = plan_of(spark, "text_quality")
    assert "codegen id" in plan  # formatted mode's codegen marker
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_stratified_sample_broadcasts_rates(spark):
    plan = plan_of(spark, "stratified_sample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouping_cube_single_shuffle(spark):
    """CUBE expands grouping sets in one aggregation pipeline: a
    partial HashAggregate before and a final one after a single
    exchange — not four separate scans unioned."""
    plan = plan_of(spark, "grouping_cube")
    assert "Expand" in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "Union" not in plan


def test_catalog_latest_partition_prunes(spark, tmp_path):
    """read_latest turns latest-partition discovery into partition-
    column predicates: the scan's PartitionFilters prune to one
    date=/hour= directory — never a full-table read plus filter
    (the reference lists object-store prefixes in application code
    to get the same effect)."""
    from datetime import datetime, timezone

    from skysafe_datalake_spark.catalog import LakeCatalog

    cat = LakeCatalog(str(tmp_path / "lake"))
    df = spark.range(10).withColumnRenamed("id", "v")
    cat.write(df, "formatted", "t", "e", ts=datetime(2026, 2, 26, 13, tzinfo=timezone.utc))
    cat.write(df, "formatted", "t", "e", ts=datetime(2026, 2, 26, 14, tzinfo=timezone.utc))

    latest = cat.read_latest(spark, "formatted", "t", "e")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        latest.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert re.search(r"date#\d+ = 2026-02-26", plan)
    assert re.search(r"hour#\d+ = 14", plan)
    assert latest.count() == 10


def test_bucketed_join_drops_both_exchanges(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join with ZERO Exchange operators: bucket layout satisfies the
    join's distribution requirement on both sides — the co-located
    join that makes repeated fact-fact joins affordable at 100 TB.
    Bucket-sorting also eliminates both Sort operators."""
    from pyspark.sql import functions as F

    from skysafe_datalake_spark.storage import read_table, write_bucketed
    from skysafe_datalake_spark.workload.tables import load

    o = load(spark, SF_SMALL, "orders")
    c = load(spark, SF_SMALL, "customer")
    write_bucketed(
        o, "b_orders", keys=["o_custkey"], n_buckets=4,
        sort_by=["o_custkey"], path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        c, "b_customer", keys=["c_custkey"], n_buckets=4,
        sort_by=["c_custkey"], path=str(tmp_path / "b_customer"),
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0
        assert joined.count() == o.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_aqe_splits_skewed_join_partitions(spark):
    """A join with one hot key (80% of rows) triggers AQE's skew-join
    split: the final adaptive plan marks the sort-merge join
    skew=true, meaning the hot partition was subdivided across tasks
    instead of serializing on one straggler — the runtime half of the
    skew story (the compile-time half is salted_skew_agg)."""
    from pyspark.sql import functions as F

    saved = {
        c: spark.conf.get(c)
        for c in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # thresholds shrunk so test-sized data exhibits "skew"
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 8, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 200000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for c, v in saved.items():
            spark.conf.set(c, v)


def test_tpch_q3_like_topk_and_pushdown(spark):
    """The Q3 shape must plan as: filters pushed into all three scans
    and the final ORDER BY+LIMIT as TakeOrderedAndProject (per-
    partition top-k merged on the driver) — a global Sort of the agg
    output is the 100 TB failure mode."""
    plan = plan_of(spark, "tpch_q3_like")
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"^\(\d+\) Sort", plan, re.M)) == 0
    assert plan.count("PushedFilters: [Is") + plan.count(
        "PushedFilters: [Great"
    ) + plan.count("PushedFilters: [Less") + plan.count("PushedFilters: [EqualTo") >= 3


def test_grid_nn_join_avoids_cross_join(spark):
    """The grid strategy must resolve NN through a cell-key equi-join
    — no cross join, no broadcast-nested-loop of the station side —
    and reduce candidates with the map-side-combining argmin
    (partial_min before the exchange), the shape that survives a
    non-broadcastable right side."""
    plan = plan_of(spark, "nn_station_grid")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_cx" in plan and "_cy" in plan  # the cell equi-join key
    assert "partial_min" in plan  # argmin combines map-side


def test_grid_nn_join_unmatched_policies(spark):
    """With a right side too sparse for the ring (density-contract
    violation), the default drops the orphan left row; 'error' raises
    with the dropped count; 'broadcast' routes the orphans through the
    exact cross-join path so no row is lost. Also: a keep= whitelist
    missing the ranking columns must fail fast, not deep in argmin."""
    import pytest

    from skysafe_datalake_spark.functions.geo import haversine_km
    from skysafe_datalake_spark.operators.nn_join import grid_nn_join

    left = spark.createDataFrame(
        [(1, 45.0, 2.0), (2, 45.1, 2.1), (3, 10.0, 70.0)],
        "fid long, lat double, lon double",
    )
    right = spark.createDataFrame(
        [(100, 45.05, 2.05), (200, 44.9, 1.9)],
        "sid long, s_lat double, s_lon double",
    )
    kwargs = dict(
        partition_by=["fid"],
        left_lat="lat", left_lon="lon",
        right_lat="s_lat", right_lon="s_lon",
        distance=haversine_km("lat", "lon", "s_lat", "s_lon"),
        cell_deg=0.5, ring=2,
    )

    dropped = grid_nn_join(left, right, **kwargs)
    assert sorted(r["fid"] for r in dropped.collect()) == [1, 2]

    with pytest.raises(ValueError, match="dropped 1 left rows"):
        grid_nn_join(left, right, unmatched="error", **kwargs)

    full = grid_nn_join(left, right, unmatched="broadcast", **kwargs)
    rows = {r["fid"]: r["sid"] for r in full.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3] == 100  # true NN recovered via the fallback path

    with pytest.raises(ValueError, match="keep= must retain"):
        grid_nn_join(left, right, keep=["sid"], **kwargs)


def test_tpch_q17_decorrelates_scalar_subquery(spark):
    """The correlated scalar subquery must decorrelate into a grouped
    aggregate joined back to the outer query — the plan shows hash
    aggregates and equi-joins only; a per-row subquery re-execution
    or a cartesian fallback is the at-scale failure mode."""
    plan = plan_of(spark, "tpch_q17_like")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_tpch_q21_semi_anti_joins(spark):
    """EXISTS and NOT EXISTS must plan as left-semi and left-anti
    hash joins (no nested-loop re-probe per outer row)."""
    plan = plan_of(spark, "tpch_q21_like")
    low = plan.lower()
    assert "leftsemi" in low
    assert "leftanti" in low
    assert "CartesianProduct" not in plan


def test_graph_triangles_backbone_is_topk(spark):
    """The top-20 output cut must be a TakeOrderedAndProject (per-
    partition top-k), not a global Sort; the backbone edge list must
    be a checkpoint cut (ExistingRDD), so the expensive pairs
    self-join + top-5000 cut materializes ONCE instead of once per
    consuming branch (pre-cut, the executed plan re-ran it per branch:
    22 lineitem scans / 12 TakeOrdereds). r13: the cut is a lazy
    persist (InMemoryRelation), not a localCheckpoint — under AQE the
    checkpoint ran the backbone at query-BUILD time (see
    plans/materialize.py); the build subtree's lineitem scan is
    now visible in the plan but executes once, on first action.
    r13 optimization: the backbone edge generation is
    operators.graph.cooccurrence_pairs (one groupBy(orderkey)
    collect_set + array-native pair explode), so the build subtree
    scans lineitem ONCE — the old distinct + self-join formulation
    scanned it twice (once per join side) and paid two extra
    corpus-scale exchanges."""
    plan = plan_of(spark, "graph_triangles")
    assert "TakeOrderedAndProject" in plan
    assert "InMemoryRelation" in plan
    assert "ExistingRDD" not in plan
    assert _parquet_scans(plan) == 1


def _parquet_scans(plan: str) -> int:
    """Actual parquet-scan NODES in a formatted plan (the tree and the
    details section each print a node once — count details headers)."""
    import re

    return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))


def test_bounded_subtree_checkpoints_cut_rescans(spark):
    """Queries whose bounded intermediate feeds several plan branches
    must cut lineage there — Spark's exchange reuse does NOT collapse
    the duplicated subtrees, so without the cut each consumer re-runs
    the full upstream scan. The cached table is bounded in every case
    (contingency cells, ≤64-row sketch, ≤|nation| key sets), so the
    materialization is free at any SF. r13: the cut is a lazy persist
    (InMemoryRelation), not localCheckpoint — see plans/materialize.py
    for why (AQE ran the checkpoint at query-BUILD time, and its
    executor-local blocks had no lineage to recover from); the
    cache-build subtree's scans are now visible in the plan (counted
    once per unique node; they execute once per run, not per
    consumer)."""
    for name, allowed_scans in [
        # events scanned once, inside the cache build
        ("chi2_independence", 1),
        # one scan per cached key-set build (customer + supplier)
        ("set_operations", 2),
        # 1-row bounds build + binning pass + exact-percentile
        # reference pass (the reference is by design a second scan).
        ("histogram_quantile_sketch", 3),
    ]:
        plan = plan_of(spark, name)
        assert "InMemoryRelation" in plan, name
        assert "ExistingRDD" not in plan, name
        assert _parquet_scans(plan) == allowed_scans, (
            name,
            _parquet_scans(plan),
        )


def test_materialize_bounded_rebuild_recomputes(spark, tmp_path):
    """A REBUILD of a lazily-persisted bounded intermediate must not
    read the previous build's materialized blocks: the CacheManager
    matches canonicalized plans session-wide, so without the
    unpersist-first in materialize_bounded a second build (bench pass
    2, a repeated service call) silently skips the whole build subtree
    — cross-run result caching (observed live: graph_triangles bench
    passes [6.7 s, 0.6 s, 0.6 s]). Proven here via the stale-cache
    gotcha itself: overwrite the source between builds — a reused
    stale entry would answer with the OLD data."""
    from skysafe_datalake_spark.plans.materialize import materialize_bounded

    p = str(tmp_path / "t.parquet")
    spark.range(0, 5).write.mode("overwrite").parquet(p)
    m1 = materialize_bounded(spark.read.parquet(p).groupBy().count())
    assert m1.first()[0] == 5  # materialize build 1
    spark.range(0, 7).write.mode("overwrite").parquet(p)
    m2 = materialize_bounded(spark.read.parquet(p).groupBy().count())
    assert m2.first()[0] == 7, (
        "rebuild read the previous build's cache — the stale entry "
        "was not evicted"
    )
    m2.unpersist()


def test_kmv_set_ops_two_corpus_passes(spark):
    """The sketch-merge side must be ONE linear chain over the ≤2k-row
    sketch (group-then-rank), not rank-then-join-back — the latter
    consumes the sketch twice and each consumer re-runs the full
    corpus tokenize/distinct/top-k. Exactly two documents scans: the
    sketch chain plus the by-design exact-reference pass."""
    plan = plan_of(spark, "kmv_set_ops")
    assert _parquet_scans(plan) == 2


def test_dq_expectations_single_pass(spark):
    """The DQ suite must collect ALL per-table rule metrics in one
    aggregation per table (deequ's single-pass design): one orders
    scan + one orders anti-join probe + one lineitem scan + the
    customer build side = 4 scans total, with the rule rows unpivoted
    from the 1-row metric vectors (no per-rule UNION of aggregates,
    which re-scanned orders five times)."""
    plan = plan_of(spark, "dq_expectations")
    assert _parquet_scans(plan) == 4
    # the unpivot: one generate(stack) node, no 5-way union
    assert "Generate" in plan
    assert "Union" not in plan


def test_countmin_cells_bounded(spark):
    """The CMS build must reduce to ≤ d·w cells regardless of input
    size — the cells aggregation output is what any downstream reader
    touches."""
    from skysafe_datalake_spark.workload.sketches import _CMS_D, _CMS_W

    df = QUERIES["countmin_heavyhitters"](spark, SF_SMALL)
    # The sketch itself: reconstruct cells the same way and count.
    rows = df.collect()
    assert 0 < len(rows) <= 15
    # estimate >= exact for every heavy hitter (CMS one-sided error).
    assert all(r.cms_cnt >= r.exact_cnt for r in rows)
    assert _CMS_D * _CMS_W == 384


def test_sequence_packing_invariants(spark):
    """Offsets per shard are contiguous (no token gaps/overlaps) and
    every document's seq assignment matches its start offset."""
    df = QUERIES["sequence_packing"](spark, SF_SMALL)
    import collections

    per_src = collections.defaultdict(list)
    for r in df.collect():
        per_src[r.source].append(r)
    for rows in per_src.values():
        rows.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in rows:
            assert r.start_off == expect
            assert r.seq_id == r.start_off // 256
            assert r.pos_in_seq == r.start_off % 256
            expect += r.n_tokens


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """Star-join DPP: a fact table partitioned on the join key must be
    pruned at RUNTIME by a filter on the joined dimension — the scan
    shows a dynamicpruning subquery on the partition column. At 100 TB
    this is the difference between scanning 2 partitions and 200."""
    fact = (
        spark.range(2000)
        .withColumn("pk", (F.col("id") % 10).cast("int"))
        .withColumn("v", F.col("id") * 2)
    )
    fact.write.partitionBy("pk").parquet(str(tmp_path / "fact"))
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(10)], "pk int, tag string"
    )
    dim.write.parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).where(F.col("tag") == "keep")
    # Disable broadcast so the exchange-reuse path isn't the only DPP
    # trigger; Spark inserts a dynamicpruning expression either way.
    joined = f.join(d, "pk").groupBy("tag").agg(F.sum("v").alias("sv"))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(True)
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[-2000:]
    assert joined.count() == 1


def test_compact_small_files(spark, tmp_path):
    """200 tiny files → right-sized files, same rows, atomic swap."""
    from skysafe_datalake_spark.storage import compact

    import glob

    path = str(tmp_path / "smallfiles")
    spark.range(20000).withColumn("v", F.col("id") * 3).repartition(
        200
    ).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 200
    before = spark.read.parquet(path).agg(F.sum("v")).first()[0]

    n = compact(spark, path, target_file_mb=1, sort_within_by=["id"])
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n <= 4
    after = spark.read.parquet(path).agg(F.sum("v")).first()[0]
    assert before == after


def test_spatial_bbox_join_is_equi_join(spark):
    """Cell covering must turn the containment theta join into a hash
    equi-join on the cell key — a BroadcastNestedLoopJoin over the
    points is the O(|points|·|boxes|) failure mode."""
    plan = plan_of(spark, "spatial_bbox_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_global_rank_avoids_single_partition_window(spark):
    """The two-phase ranking must never plan a windowing over ONE
    partition (no empty-frame `Window [...] ORDER BY` without a
    partitionBy hash exchange): the window's exchange key is the
    range-partition id, so work stays spread across the cluster."""
    plan = plan_of(spark, "global_rank_ranged", mode="extended")
    # The only Window operator present partitions by the internal pid,
    # and nothing in the physical plan collapses to SinglePartition.
    assert "_gr_pid" in plan
    assert "SinglePartition" not in plan


def test_bloom_semi_prune_probe_is_codegen_filter(spark):
    """The Bloom pre-screen must be a pure Filter over the customer
    scan (bitmap embedded as a literal array — no join, no shuffle to
    evaluate it), followed by ONE broadcast semi join for exactness.
    A regression that turns the bitmap into a joined table would put
    a shuffle in front of every probe row."""
    plan = plan_of(spark, "bloom_semi_prune")
    assert "LeftSemi" in plan
    # exactly one join in the whole plan: the exactness semi join
    assert len(re.findall(r"Join", plan)) <= 4  # operator + refs
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_skyline_no_quadratic_join_no_global_window(spark):
    """skyline_2d must not fall back to the oracle's quadratic
    dominance self-join, and its windows must be partitioned (the
    range-partition two-phase construction)."""
    plan = plan_of(spark, "skyline_pareto")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every window spec carries the pid partition key
    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    assert specs, "expected window specs in the plan"
    for spec in specs:
        assert "_sk_pid" in spec, spec


def test_ann_pq_scoring_is_broadcast_join(spark):
    """PQ scoring joins corpus codes against the per-query lookup
    table — which is ≤ n_subspaces·256 rows and must broadcast; the
    corpus side must never sort-merge for it."""
    plan = plan_of(spark, "ann_pq_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q6_full_pushdown_no_shuffle_before_agg(spark):
    """Q6 is the scan-throughput query: every predicate must reach
    the parquet reader and the only exchange is the single-row final
    aggregate's."""
    plan = plan_of(spark, "tpch_q6_like")
    assert "PushedFilters" in plan
    assert plan.count("Exchange") <= 2  # partial->final agg only
    assert "Join" not in plan


def test_tpch_q19_broadcasts_part(spark):
    """Q19's disjunctive residual must not break the equi-join: part
    broadcasts, lineitem never shuffles."""
    plan = plan_of(spark, "tpch_q19_like")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_recursive_cte_uses_engine_recursion(spark):
    """WITH RECURSIVE must plan through the engine's recursion
    operator (UnionLoop in Spark 4). The registered query's result
    materializes through a localCheckpoint (so its recursion-limit
    conf can be scoped and restored), which hides the operator from
    its explain output — assert the operator on the recursion text
    itself, and that the registered query still runs it (it would
    fail to parse otherwise; parity pins the values)."""
    spark.range(3).selectExpr("id AS n").createOrReplaceTempView("rb")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.sql(
            "WITH RECURSIVE r AS ("
            " SELECT n FROM rb WHERE n = 0"
            " UNION ALL SELECT n + 1 FROM r WHERE n < 2"
            ") SELECT * FROM r"
        ).explain("formatted")
    assert "UnionLoop" in buf.getvalue()
    assert QUERIES["recursive_cte_walk"](spark, SF_SMALL).count() > 0


def test_join_strategy_hints_honored(spark):
    """The SQL surface must expose optimizer control: BROADCAST,
    MERGE, and SHUFFLE_HASH hints each force their join strategy on
    the same query (how a user overrides a bad stats-driven choice
    on a real cluster)."""
    from skysafe_datalake_spark.workload.tables import load

    load(spark, SF_SMALL, "orders").createOrReplaceTempView("h_orders")
    load(spark, SF_SMALL, "customer").createOrReplaceTempView("h_customer")
    base = (
        "SELECT /*+ {hint}(c) */ c.c_custkey, o.o_orderkey "
        "FROM h_orders o JOIN h_customer c ON c.c_custkey = o.o_custkey"
    )

    def plan(hint: str) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            spark.sql(base.format(hint=hint)).explain("formatted")
        return buf.getvalue()

    assert "BroadcastHashJoin" in plan("BROADCAST")
    assert "SortMergeJoin" in plan("MERGE")
    assert "ShuffledHashJoin" in plan("SHUFFLE_HASH")
