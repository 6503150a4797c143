"""Query registry: name -> (spark, sf_dir) -> DataFrame, + oracle SQL.

Grouped by SURVEY.md §2 operator family. Every Spark query aliases
its computed columns identically to its oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Query modules self-register on import (order fixes registry order).
from skysafe_datalake_spark.workload import domain  # noqa: E402,F401
from skysafe_datalake_spark.workload import relational  # noqa: E402,F401
from skysafe_datalake_spark.workload import llm_ops  # noqa: E402,F401
from skysafe_datalake_spark.workload import temporal  # noqa: E402,F401
from skysafe_datalake_spark.workload import advanced  # noqa: E402,F401
from skysafe_datalake_spark.workload import analytics  # noqa: E402,F401
from skysafe_datalake_spark.workload import tpch  # noqa: E402,F401
from skysafe_datalake_spark.workload import sketches  # noqa: E402,F401
from skysafe_datalake_spark.workload import curation  # noqa: E402,F401
from skysafe_datalake_spark.workload import pipeline  # noqa: E402,F401
from skysafe_datalake_spark.workload import crawl  # noqa: E402,F401

# The external correctness gate checks the FIRST 50 registered queries per
# round, and the testdata it runs against is regenerated between rounds (its
# physical types have drifted before), so a green row goes stale with age.
# Instead of a hand-maintained rotation list, order the registry stalest-first
# from the CORRECTNESS_r*.json files the gate itself writes: queries with no
# green row ever come first (new queries and red rows get checked immediately),
# then ascending by the latest round that verified them. Import order breaks
# ties, so the ordering is deterministic and self-maintaining round over round.
# All queries stay covered by tests/test_oracle_parity.py locally regardless
# of window position.

# Queries whose physical plan changed in round N AFTER that round's gate had
# already sampled them: their newest green gate row predates the code that is
# now in the tree, so staleness-by-round under-prioritizes exactly the queries
# with the least-verified plans. Map name -> round the plan changed; the sort
# force-includes them ahead of ordinary green rows until the gate records a
# green row in a LATER round, at which point the entry self-retires (the
# condition goes false; remove the line on the next touch). Maintained by
# hand at each plan-shape commit — the same commit that changes a plan adds
# its query here.
PLAN_CHANGED_ROUND: dict[str, int] = {
    # r12 localCheckpoint cuts landed after these queries' r11 gate rows;
    # r13 then switched the cuts to lazy persist (plans/materialize.py).
    "graph_triangles": 13,
    "chi2_independence": 12,
    "set_operations": 12,
    # persist switch landed before the r13 gate: its newest row (r12)
    # covers the old localCheckpoint plan.
    "histogram_quantile_sketch": 12,
    # r13 optimization round: plan reshaped (partitioning-preserving
    # lazy persists, no mid-loop checkpoint cuts).
    "pagerank_integer": 13,
    # r13 optimization round: co-occurrence backbones rewritten to the
    # single-shuffle collect_set pair generation
    # (operators.graph.cooccurrence_pairs); graph_triangles above got
    # the same rewrite on top of its r12 persist switch.
    "bfs_khop_reach": 13,
    "kcore_peel": 13,
    "frequent_itempairs": 13,
    # r13 optimization round, batch 2: dedup folded into the index
    # aggregation (contamination), window final over the recursion
    # (rcte), build-side distinct dropped + one-literal bitmap
    # (bloom), one-literal hyperplanes (LSH pair), Arrow snapshot
    # collect (e2e).
    "contamination_ngram_overlap": 13,
    "recursive_cte_walk": 13,
    "bloom_semi_prune": 13,
    "ann_lsh_topk": 13,
    "similarity_topk": 13,
    "batch_pipeline_e2e": 13,
    # r13 optimization round, batch 3: greedy MMR rounds moved to the
    # driver over the bounded candidate set.
    "mmr_diversity_rerank": 13,
    # r13 optimization round, batch 4: stream-stream replay staging
    # rewritten to one partitionBy pass + Observation metrics +
    # pyarrow sentinel (job-level change; returned plans are the
    # checkpoint-truncated result scans, but the computing code is
    # new so the gate should re-sample them).
    "streaming_left_outer_join": 13,
    "streaming_full_outer_join": 13,
    "streaming_interval_join": 13,
    # r13: concurrent format-leg writes + explicit JSON read schema.
    "multi_format_union": 13,
    # r13: Q11/Q18 Spark-side one-pass restructurings (oracle SQL
    # unchanged; see workload/tpch.py equivalence comments).
    "tpch_q11_like": 13,
    "tpch_q18_like": 13,
}


def _green(row: dict) -> bool:
    if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
        return True
    # no_oracle queries get a rows-only check; a recorded row count is the
    # strongest signal the gate can produce for them.
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def _gate_history() -> tuple[dict[str, int], set[str]]:
    """(latest green round per query, set of queries ever checked)."""
    import json
    import re
    from pathlib import Path

    latest: dict[str, int] = {}
    checked: set[str] = set()
    repo_root = Path(__file__).resolve().parents[2]
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            checked.add(name)
            if _green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, checked


def _apply_staleness_order() -> None:
    latest, checked = _gate_history()
    import_idx = {n: i for i, n in enumerate(QUERIES)}

    def key(n: str):
        if n in checked and n not in latest:
            cls = 0  # checked and red: a fix awaiting re-verification
        elif n not in checked:
            # Never gate-checked. Within this class the same-SQL-text
            # battery (spark.sql(X) vs DuckDB(X)) carries the least
            # divergence risk — custom operators go first when the
            # window can't fit everything.
            cls = 2 if n.startswith("tpch_q") else 1
        elif latest.get(n, 0) <= PLAN_CHANGED_ROUND.get(n, -1):
            cls = 3  # green row predates a plan change: re-verify now
        else:
            cls = 4  # green: ascending staleness
        return (cls, latest.get(n, 0), import_idx[n])

    ordered = sorted(QUERIES, key=key)
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)


_apply_staleness_order()
