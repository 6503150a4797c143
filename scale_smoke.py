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
# SPARK_GRAFT_SMOKE_REPL=64 runs the deeper spot check that separates
# n-log-n from quadratic-with-small-constant growth (8x can't).
REPL = int(os.environ.get("SPARK_GRAFT_SMOKE_REPL", "8"))


def _dst() -> str:
    try:  # name the replica dir by its EFFECTIVE scale factor
        base = float(SRC.rstrip("/").rsplit("sf", 1)[-1])
        return f"/tmp/sparkgraft_sf{base * REPL:g}"
    except ValueError:
        return f"/tmp/sparkgraft_x{REPL}"


DST = os.environ.get("SPARK_GRAFT_SMOKE_DST") or _dst()
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
    # round-4 batch: the dedup/text family
    "dedup_exact",
    "doc_fingerprint",
    "minhash_signatures",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_keep_canonical",
    "dedup_clusters",
    "simhash_neardup_pairs",
    "contamination_ngram_overlap",
    "html_boilerplate_strip",
    "text_quality",
    "lang_id",
    "token_count",
    "unigram_logprob_score",
    "lang_temperature_sample",
    "weighted_sample_ares",
    "mmr_diversity_rerank",
    "quality_repetition",
    "chunk_documents",
    "bigram_topk",
    "tfidf_top_terms",
    # round-4 batch: embeddings / ANN
    "similarity_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup",
    "embedding_crossdup",
    "embedding_quantize",
    "embedding_l2_normalize",
    "random_projection_reduce",
    # round-4 batch: crawl curation
    "link_graph_extract",
    "url_canonicalize",
    "quality_classifier_linear",
    # round-4 batch: relational / window
    "grouping_cube",
    "salted_skew_agg",
    "pivot_wide",
    "percentile_stats",
    "join_multiway",
    "window_rank_ties",
    "window_moving_avg",
    "unpivot_long",
    "global_rank_ranged",
    "json_nested_flatten",
    "fuzzy_levenshtein_match",
    "collect_ordered",
    # round-4 batch: TPC-H remainder (join-heavy)
    "tpch_q7_like",
    "tpch_q8_like",
    "tpch_q13_like",
    "tpch_q18_like",
    "tpch_q22_like",
    # round-4 batch: eval / curation / stats
    "auc_rank_eval",
    "confusion_matrix_eval",
    "calibration_bins",
    "psi_drift_monitor",
    "leakage_safe_split",
    "golden_record_merge",
    "dq_expectations",
    "pii_redact",
    "retention_cohorts",
    "frequent_itempairs",
    "seasonal_anomaly_baseline",
    "chi2_independence",
    "groupwise_zscore",
    "event_pattern_match",
    # round-4 batch: graph / ML / streaming representatives
    "pagerank_integer",
    "skysafe_ml_pipeline",
    "streaming_windowed_counts",
    "streaming_dedup_watermark",
    # round-4 second batch: join/window/sketch shapes not yet covered
    "dedup_minhash_lsh",
    "hll_distinct_sketch",
    "kmv_set_ops",
    "join_theta_range",
    "ohlc_bars",
    "session_window_agg",
    "pit_join_scd2",
    "asof_join_forward_tol",
    "nn_station_topk",
    "subquery_exists",
    "window_range_frame",
    "tpch_q2_like",
    # round-5 batch: complete the registry sweep (every remaining
    # query, mostly single-shuffle batteries plus the streaming
    # matrix and pipeline composites that had never been scale-smoked)
    "window_running_sum",
    "topk_global",
    "join_left_outer",
    "join_semi_anti",
    "set_operations",
    "conditional_decode",
    "datetime_bucketing",
    "string_cleaning",
    "json_extraction",
    "anomaly_threshold",
    "multimodal_manifest",
    "dataset_split",
    "stratified_sample",
    "subquery_scalar",
    "skysafe_enriched",
    "keyed_upsert_latest",
    "multimodal_byte_features",
    "multimodal_frame_sample",
    "gap_detect",
    "decode_map_join",
    "array_functions",
    "window_navigation",
    "string_functions",
    "datetime_functions",
    "stats_correlation",
    "histogram_fixed_width",
    "terms_agg_topn",
    "gap_fill_forward",
    "join_full_outer",
    "profile_table",
    "scd2_intervals",
    "iqr_outlier_filter",
    "batch_pipeline_e2e",
    "ml_rules_fallback",
    "phase_rules_labels",
    "streaming_upsert_partitioned",
    "null_semantics",
    "grouping_sets_custom",
    "try_arithmetic",
    "filter_project",
    "count_distinct",
    "grouping_rollup",
    "tpch_q15_like",
    "tpch_q20_like",
    "tpch_q4_like",
    "tpch_q6_like",
    "tpch_q10_like",
    "tpch_q11_like",
    "tpch_q12_like",
    "tpch_q14_like",
    "cdc_apply_roundtrip",
    "ml_kmeans_strata",
    "streaming_static_join",
    "streaming_stateful_running_agg",
    "streaming_interval_join",
    "streaming_left_outer_join",
    "schema_evolution_read",
    "multi_format_union",
    "streaming_full_outer_join",
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
            # Make replica texts GENUINELY distinct so dedup/fingerprint
            # group cardinalities grow honestly. A plain " repN" suffix
            # is not enough: all shingles except the last few survive,
            # so every replica 8-group is a near-dup CLIQUE — at 8x the
            # corpus is 87.5% duplicates and banded candidate joins do
            # quadratically more REAL work (simhash_neardup_pairs hit
            # 47x wall: ~64x more true candidate pairs, i.e. the
            # operator was sub-linear in its actual input). Interleaving
            # the replica tag into every 4th token breaks every 5-token
            # shingle, so replica texts are far apart in Jaccard space
            # and near-dup density stays constant as the corpus grows —
            # the realistic web-corpus shape.
            r = r.withColumn(
                "text",
                F.expr(
                    # The tag must be unique PER DOC (r<doc_id>), not
                    # per replica: a shared per-replica token inserted
                    # into every doc creates new cross-doc shingle
                    # overlap and fuses whole replicas into one giant
                    # LSH bucket (measured: max minhash bucket 1146 →
                    # 17001 instead of ~8×).
                    "array_join(flatten(transform(split(text, ' '), "
                    "(t, i) -> IF(i % 4 = 3, "
                    "array(t, concat('r', CAST(doc_id AS STRING))), "
                    "array(t)))), ' ')"
                ),
            )
        r.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    for t in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )


def timed(spark, sf_dir: str) -> dict[str, float | None]:
    from skysafe_datalake_spark.errors import OverScaleRefusal
    from skysafe_datalake_spark.workload import QUERIES

    # Some queries REFUSE over-scale input by design rather than
    # silently degrading (batch_pipeline_e2e caps its fixture
    # snapshot at 2M rows — a snapshot models one bounded API
    # response, and 64x replication exceeds it). Record the refusal
    # (None -> "refused" in the table) instead of killing the whole
    # sweep mid-table. Only the dedicated OverScaleRefusal type is a
    # refusal: a genuine ValueError regression (size-parse failure,
    # bad salt_groups, >512-family configs) must still kill the
    # sweep, not be mislabeled as by-design.
    refused: set[str] = set()
    for n in NAMES:  # warm: codegen + readers
        try:
            QUERIES[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except OverScaleRefusal as exc:
            print(f"# {n} at {sf_dir}: refused by design: {exc}", file=sys.stderr)
            refused.add(n)
    out = {}
    for n in NAMES:
        if n in refused:
            out[n] = None
            continue
        # min of 3: single long-session measurements catch GC /
        # shuffle-fetch stalls worth 5-10x the query itself on this
        # shared box; the min is the reproducible engine cost.
        # Time construction AND action (bench.py convention): some
        # queries do real work eagerly while the plan is built
        # (recursive CTE materializes through a checkpoint) — timing
        # only the action under-reports them to near zero.
        runs = []
        stages = []  # batch_pipeline_e2e only: per-DAG-stage wall
        for _ in range(3):
            t0 = time.perf_counter()
            df = QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            if n == "batch_pipeline_e2e":
                from skysafe_datalake_spark.plans.pipeline import (
                    LAST_STAGE_SECONDS,
                )

                stages.append(dict(LAST_STAGE_SECONDS))
        out[n] = min(runs)
        if stages:
            # Keep the stage split of the run that produced the min —
            # the composite row is only attributable if its parts come
            # from the same (least-stalled) run the total came from.
            E2E_STAGE_SEC[sf_dir] = stages[runs.index(min(runs))]
    return out


# Per-stage wall seconds of batch_pipeline_e2e's min run at each scale
# timed() saw, keyed by sf_dir — the attribution behind README's 8x
# row (its composite ratio was a single opaque number through round 8).
E2E_STAGE_SEC: dict[str, dict[str, float]] = {}


def print_e2e_stage_table(small_dir: str, big_dir: str) -> None:
    small, big = E2E_STAGE_SEC.get(small_dir), E2E_STAGE_SEC.get(big_dir)
    if not small or not big:
        return
    print(f"\nbatch_pipeline_e2e stage attribution (1x vs {REPL}x):")
    print(f"{'stage':18s} {'1x':>7s} {f'{REPL}x':>7s} {'ratio':>6s}")
    for st in small:
        s, b = small.get(st), big.get(st)
        if s is None or b is None:
            continue
        r_txt = f"{b / s:6.1f}" if s > 0 else f"{'—':>6s}"
        print(f"{st:18s} {s:7.2f} {b:7.2f} {r_txt}")


def _print_adaptive_decisions(scale: str) -> None:
    """Machine-readable record of the adaptive scale-branch decisions
    the queries just timed actually took (pagerank checkpoint level,
    LSH auto-salt) — the stderr markers prove a branch fired in the
    log stream; this line pins the decision inputs (row counts, size
    estimates) next to the timing table so the README's
    Measured-scaling claims are reproducible from one artifact."""
    import json

    decisions = {}
    try:
        from skysafe_datalake_spark.workload.analytics import (
            LAST_PAGERANK_CHECKPOINT,
        )

        if LAST_PAGERANK_CHECKPOINT:
            decisions["pagerank_checkpoint"] = dict(LAST_PAGERANK_CHECKPOINT)
    except ImportError:
        pass
    try:
        from skysafe_datalake_spark.operators.dedup import LAST_SALT_DECISION

        if LAST_SALT_DECISION:
            decisions["minhash_lsh_salt"] = dict(LAST_SALT_DECISION)
    except ImportError:
        pass
    if decisions:
        print(
            f"# adaptive-branch decisions at {scale}: "
            + json.dumps(decisions, sort_keys=True),
            file=sys.stderr,
        )


def main() -> None:
    from skysafe_datalake_spark.session import get_spark

    # Optional positional args: re-run only the named queries (after
    # a harness or operator change) instead of the full ~35 min table.
    subset = [a for a in sys.argv[1:] if not a.startswith("-")]
    if subset:
        unknown = [n for n in subset if n not in NAMES]
        if unknown:
            # Fail fast: an all-typo subset would otherwise pay the
            # full 8x replicate() before timing zero queries.
            print(f"not in NAMES: {unknown}", file=sys.stderr)
            sys.exit(2)
        NAMES[:] = [n for n in NAMES if n in subset]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="scale-smoke", master=f"local[{cpus}]")
    if os.environ.get("SPARK_GRAFT_SKIP_REPLICATE") != "1":
        replicate(spark)
    small = timed(spark, SRC)
    _print_adaptive_decisions("1x")
    big = timed(spark, DST)
    _print_adaptive_decisions(f"{REPL}x")
    print(f"{'query':24s} {'1x':>7s} {f'{REPL}x':>7s} {'ratio':>6s}")
    for n in NAMES:
        s, b = small[n], big[n]
        s_txt = f"{s:7.2f}" if s is not None else f"{'refused':>7s}"
        b_txt = f"{b:7.2f}" if b is not None else f"{'refused':>7s}"
        r_txt = (
            f"{b / s:6.1f}"
            if s is not None and b is not None and s > 0
            else f"{'—':>6s}"
        )
        print(f"{n:24s} {s_txt} {b_txt} {r_txt}")
    print_e2e_stage_table(SRC, DST)
    spark.stop()


if __name__ == "__main__":
    main()
