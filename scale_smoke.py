#!/usr/bin/env python
"""Scale smoke: replicate sf0.1 8x (key-shifted copies, so join and
group cardinalities grow honestly) into /tmp and compare wall time of
representative queries at both scales.

Not part of the driver contract (bench.py is) — this is the evidence
artifact behind README's "Measured scaling" section. Run:

    python scale_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/sparkgraft_sf0.8"
REPL = 8
SHIFT = 10_000_000
NAMES = [
    "pricing_summary",
    "window_topk_per_group",
    "tpch_q3_like",
    "sessionize_events",
    "nn_station_join",
    "global_stats",
    "asof_join_attrib",
    "rollup_hierarchy",
    # round-2 operators
    "nn_station_grid",
    "scd2_merge_upsert",
    "llm_corpus_prep",
    "tpch_q5_like_sql",
    "window_distribution",
    # round-3 operators
    "tpch_q17_like",
    "tpch_q21_like",
    "snapshot_diff_cdc",
    "block_dedup_reconstruct",
    "sequence_packing",
    "kmv_distinct_sketch",
    "countmin_heavyhitters",
    "graph_triangles",
    "zorder_tile_stats",
    "bm25_topk",
    "corpus_shuffle_order",
    "histogram_quantile_sketch",
    "incremental_agg_merge",
    "funnel_conversion",
    "spatial_bbox_join",
    # round-3 later additions
    "tpch_q9_like",
    "tpch_q16_like",
    "tpch_q19_like",
    "bloom_semi_prune",
    "bfs_khop_reach",
    "ann_pq_topk",
    "ml_linreg_by_group",
    # round-3 third batch
    "skyline_pareto",
    "recursive_cte_walk",
    "multitouch_attribution",
    "minhash_incremental_pairs",
    "rolling_ols_slope",
    "gap_fill_interpolate",
    "calendar_spine_fill",
    "kcore_peel",
    "lateral_topn_per_key",
    "bag_set_operations",
]


def replicate(spark) -> None:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def rep(df, id_cols):
        parts = []
        for i in range(REPL):
            p = df
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * SHIFT))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    shifted = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    os.makedirs(DST, exist_ok=True)
    for t, cols in shifted.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        r = rep(df, cols)
        if t == "documents":
            # make replica texts distinct so dedup/fingerprint group
            # cardinalities grow honestly instead of 8x-duplicating
            r = r.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" rep"), (F.col("doc_id") / SHIFT).cast("long").cast("string")),
            )
        r.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    for t in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )


def timed(spark, sf_dir: str) -> dict[str, float]:
    from skysafe_datalake_spark.workload import QUERIES

    for n in NAMES:  # warm: codegen + readers
        QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for n in NAMES:
        # min of 3: single long-session measurements catch GC /
        # shuffle-fetch stalls worth 5-10x the query itself on this
        # shared box; the min is the reproducible engine cost.
        # Time construction AND action (bench.py convention): some
        # queries do real work eagerly while the plan is built
        # (recursive CTE materializes through a checkpoint) — timing
        # only the action under-reports them to near zero.
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[n] = min(runs)
    return out


def main() -> None:
    from skysafe_datalake_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="scale-smoke", master=f"local[{cpus}]")
    replicate(spark)
    small = timed(spark, SRC)
    big = timed(spark, DST)
    print(f"{'query':24s} {'1x':>7s} {f'{REPL}x':>7s} {'ratio':>6s}")
    for n in NAMES:
        print(f"{n:24s} {small[n]:7.2f} {big[n]:7.2f} {big[n] / small[n]:6.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
