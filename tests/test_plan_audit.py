"""Registry-wide plan-audit gate (tools/plan_audit.py).

tests/test_plans.py pins hand-picked plan properties; this gate
sweeps EVERY registered query's physical plan for the anti-patterns
that kill a 100 TB run (row-at-a-time Python, cartesian products,
unbounded nested-loop joins, fact-sized global sorts) and fails on
any occurrence that is not adjudicated by name with the bound that
makes it safe — and on any adjudication gone stale, so the allowlist
can't rot in either direction.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL

from tools.plan_audit import ADJUDICATED, PATTERNS, audit_all


def test_registry_plans_have_no_unadjudicated_antipatterns(spark):
    hits, stale, errors, budget = audit_all(spark, SF_SMALL)
    assert budget and all(
        s >= 0 and b >= 0 for s, b in budget.values()
    )
    assert not errors, f"queries failed to build a plan: {errors}"
    bad = [(h.query, h.pattern) for h in hits if h.justification is None]
    assert not bad, (
        "un-adjudicated plan anti-patterns (fix the plan or add the "
        f"bound to tools/plan_audit.ADJUDICATED): {bad}"
    )
    assert not stale, (
        "stale adjudications (pattern no longer occurs — remove from "
        f"tools/plan_audit.ADJUDICATED): {stale}"
    )


def test_adjudications_name_a_bound():
    """Every allowlist entry must say WHY it is safe at scale — a
    non-empty justification naming a bound (rows / 1-row / k / fixed
    / bounded / groups / dimension / days), not a bare waiver."""
    bound_words = re.compile(
        r"1-row|\brows\b|\bk\b|k_\w+|fixed|bounded|group|dimension|days",
        re.IGNORECASE,
    )
    for query, pats in ADJUDICATED.items():
        for pat, why in pats.items():
            assert pat in PATTERNS, f"{query}: unknown pattern {pat!r}"
            assert why and bound_words.search(why), (
                f"{query}/{pat}: justification must name the bound, "
                f"got {why!r}"
            )
