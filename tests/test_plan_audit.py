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


_MEMORY_SINK = re.compile(r"\.format\(\s*([\"'])memory\1\s*\)")
_DEF = re.compile(r"^(\s*)def\s+(\w+)")


def _memory_sink_sites(root):
    """(relpath, enclosing function) for every memory-sink literal,
    tolerant of quote style and whitespace. The enclosing function is
    the closest preceding ``def`` at a shallower indent than the
    match, so the allowlist pins WHERE the sink lives, not a bare
    per-file count a same-file swap could hide behind."""
    sites = []
    for path in sorted(root.rglob("*.py")):
        lines = path.read_text().splitlines()
        defs = []  # (lineno, indent, name), in order
        for i, line in enumerate(lines):
            m = _DEF.match(line)
            if m:
                defs.append((i, len(m.group(1)), m.group(2)))
        for i, line in enumerate(lines):
            if not _MEMORY_SINK.search(line):
                continue
            indent = len(line) - len(line.lstrip())
            fn = "<module>"
            for dline, dindent, dname in defs:
                if dline < i and dindent < indent:
                    fn = dname
            sites.append((str(path.relative_to(root.parent)), fn))
    return sorted(sites)


def test_memory_sinks_are_allowlisted():
    """A streaming memory sink pins every output row on the driver
    heap for the life of the session — a collect() in disguise that
    the plan audit cannot see (the audited frame is the post-stream
    read-back). The 128x scale smoke OOMed the JVM on exactly this
    (170M events through streaming_dedup_watermark's memory sink), so
    the rule is a source gate: memory sinks are allowed ONLY where
    the streamed output is the aggregate itself, bounded independent
    of input volume — and each site is pinned by (file, function),
    quote-style-tolerant, so neither format('memory') nor moving the
    sink to a different query in the same file evades it. A
    variable-passed format still evades a source grep; the runtime
    backstop is the 64x/128x scale smoke."""
    from pathlib import Path

    allowed = [
        # complete-mode hour x category cells: volume-independent
        (
            "skysafe_datalake_spark/workload/pipeline.py",
            "streaming_static_join",
        ),
    ]
    root = Path(__file__).resolve().parents[1]
    found = _memory_sink_sites(root / "skysafe_datalake_spark")
    assert found == allowed, (
        "memory-sink site set changed — outputs on the driver heap "
        "scale with input; use a file sink + read-back, or pin the "
        f"new bounded site here with its reason: {found}"
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
