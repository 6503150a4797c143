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


def test_memory_sinks_are_allowlisted():
    """A streaming memory sink pins every output row on the driver
    heap for the life of the session — a collect() in disguise that
    the plan audit cannot see (the audited frame is the post-stream
    read-back). The 128x scale smoke OOMed the JVM on exactly this
    (170M events through streaming_dedup_watermark's memory sink), so
    the rule is now a source gate: memory sinks are allowed ONLY
    where the streamed output is the aggregate itself, bounded
    independent of input volume, and each site is pinned here."""
    from pathlib import Path

    allowed = {
        # complete-mode hour x category cells: volume-independent
        "skysafe_datalake_spark/workload/pipeline.py": 1,
    }
    root = Path(__file__).resolve().parents[1]
    found: dict[str, int] = {}
    for path in (root / "skysafe_datalake_spark").rglob("*.py"):
        n = path.read_text().count('format("memory")')
        if n:
            found[str(path.relative_to(root))] = n
    assert found == allowed, (
        "new streaming memory sink(s) — outputs on the driver heap "
        f"scale with input; use a file sink + read-back: {found}"
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
