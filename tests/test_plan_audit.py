"""Registry-wide plan-audit gate (tools/plan_audit.py).

tests/test_plans.py pins hand-picked plan properties; this gate
sweeps EVERY registered query's physical plan for the anti-patterns
that kill a 100 TB run (row-at-a-time Python, cartesian products,
unbounded nested-loop joins, fact-sized global sorts) and fails on
any occurrence that is not adjudicated by name with the bound that
makes it safe — and on any adjudication gone stale, so the allowlist
can't rot in either direction.

It also pins the SHAPE of every plan: per-query shuffle/broadcast
exchange counts are snapshotted in PLAN_BUDGET.json and
``test_shuffle_budget_pinned`` fails on any drift. Plan shape is the
noise-free regression signal this load-noisy host can't give through
wall-clock — the round-7 countmin fix (a 4x re-plan of the corpus
aggregate) would have been a +3 in the snapshot at introduction time.
"""

from __future__ import annotations

import ast
import json
import re

import pytest

from tests.conftest import SF_SMALL

from tools.plan_audit import (
    ADJUDICATED,
    PATTERNS,
    audit_all,
    check_budget,
    load_budget,
    update_budget,
)


@pytest.fixture(scope="module")
def audit(spark):
    """One registry-wide sweep shared by the anti-pattern and budget
    gates (explaining all ~183 plans is the expensive part)."""
    return audit_all(spark, SF_SMALL)


def test_registry_plans_have_no_unadjudicated_antipatterns(audit):
    hits, stale, errors, budget = audit
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


# ── pinned shuffle budget ──────────────────────────────────────────


def test_shuffle_budget_pinned(audit):
    """Every query's static-plan (shuffles, broadcasts) must equal the
    committed PLAN_BUDGET.json snapshot — a refactor that adds an
    Exchange shows up as a +1 here long before it costs minutes at
    100 TB. Accepting a change: `python tools/plan_audit.py
    --update-budget` (an INCREASE additionally needs a dated note in
    the entry; check_budget enforces that via baseline_shuffles)."""
    _hits, _stale, errors, budget = audit
    assert not errors, f"queries failed to build a plan: {errors}"
    problems = check_budget(budget, load_budget())
    assert problems == [], (
        "plan-shape drift vs PLAN_BUDGET.json (if intended, re-pin "
        "with `python tools/plan_audit.py --update-budget` and add a "
        f"dated note for any increase):\n" + "\n".join(problems)
    )


def test_audit_counts_insensitive_to_cache_materialization(spark):
    """The budget pins STATIC plan shape, but the CacheManager matches
    canonicalized plans session-wide: once some earlier action has
    materialized a lazily-persisted bounded intermediate
    (plans/materialize.py), a fresh build of the same query explains
    the cached subtree's FINAL adaptive plan — different exchange
    counts than the clean-session pin (observed live: the oracle-parity
    module running before this one flipped chi2_independence 6 -> 7).
    audit_all therefore clears the cache before sweeping; this pins
    that a pre-materialized cache cannot change its counts."""
    from skysafe_datalake_spark.workload import QUERIES

    name = "chi2_independence"
    _h, _s, errors, fresh = audit_all(spark, SF_SMALL, names=[name])
    assert not errors
    # Materialize the query's persisted intermediate via a real action.
    QUERIES[name](spark, SF_SMALL).write.format("noop").mode(
        "overwrite"
    ).save()
    _h, _s, errors, warm = audit_all(spark, SF_SMALL, names=[name])
    assert not errors
    assert warm[name] == fresh[name], (
        "audit counts drifted after cache materialization — the sweep "
        f"is order-dependent again: fresh={fresh[name]} warm={warm[name]}"
    )


def _snap(queries: dict) -> dict:
    return {"_meta": {}, "queries": queries}


def test_budget_detects_drift_and_coverage_gaps():
    """Pure-Python negative battery: a doctored snapshot proves the
    gate actually fails on each drift class."""
    pinned = _snap(
        {"q": {"shuffles": 2, "broadcasts": 1, "baseline_shuffles": 2}}
    )
    # clean tree: green
    assert check_budget({"q": (2, 1)}, pinned) == []
    # +1 shuffle: drift, and the message demands the dated note
    probs = check_budget({"q": (3, 1)}, pinned)
    assert len(probs) == 1 and "drifted" in probs[0]
    assert "dated note" in probs[0]
    # -1 shuffle: still a drift (the pin is exact), but no note demand
    probs = check_budget({"q": (1, 1)}, pinned)
    assert len(probs) == 1 and "dated note" not in probs[0]
    # broadcast drift alone is also a drift
    assert check_budget({"q": (2, 2)}, pinned)
    # unpinned new query / pinned-but-removed query
    assert any(
        "not in PLAN_BUDGET.json" in p
        for p in check_budget({"q": (2, 1), "new_q": (0, 0)}, pinned)
    )
    assert any(
        "not in the registry" in p
        for p in check_budget({}, pinned)
    )


def test_budget_missing_snapshot_is_one_actionable_line():
    """An absent/empty snapshot reports ONE `--update-budget` line, not
    |registry| copies of 'not in PLAN_BUDGET.json' drowning the real
    audit output (the round-8 broken-by-default failure mode)."""
    probs = check_budget({"a": (1, 0), "b": (2, 0)}, _snap({}))
    assert len(probs) == 1 and "--update-budget" in probs[0]


def test_budget_malformed_entry_reported_not_raised():
    """A hand-edited entry missing its counts is a reported problem,
    not a TypeError from comparing against None."""
    probs = check_budget({"q": (1, 0)}, _snap({"q": {"note": "oops"}}))
    assert len(probs) == 1 and "malformed" in probs[0]


def test_budget_increase_then_repin_requires_dated_note(tmp_path):
    """The gate's central claim: a shuffle increase can NOT be waved
    through by a bare re-pin. Round 8's update_budget defaulted a
    missing baseline to the NEW count, so the first regression became
    its own baseline — this walks the exact increase→re-pin→note path
    that bug broke."""
    path = str(tmp_path / "PLAN_BUDGET.json")
    # initial pin at 2 shuffles: green, baseline persisted
    update_budget({"q": (2, 1)}, path=path)
    snap = load_budget(path)
    assert snap["queries"]["q"]["baseline_shuffles"] == 2
    assert check_budget({"q": (2, 1)}, snap) == []
    # regression to 3: drift flagged
    assert check_budget({"q": (3, 1)}, snap)
    # bare re-pin: baseline survives at 2 and the note rule fires
    update_budget({"q": (3, 1)}, path=path)
    snap = load_budget(path)
    assert snap["queries"]["q"]["shuffles"] == 3
    assert snap["queries"]["q"]["baseline_shuffles"] == 2
    probs = check_budget({"q": (3, 1)}, snap)
    assert len(probs) == 1 and "without a dated note" in probs[0]
    # an undated note does not clear it
    snap["queries"]["q"]["note"] = "needed for the new agg"
    assert check_budget({"q": (3, 1)}, snap)
    # a dated note does — and survives the next re-pin
    snap["queries"]["q"]["note"] = "2026-08-15: extra agg exchange"
    assert check_budget({"q": (3, 1)}, snap) == []
    with open(path, "w") as f:
        json.dump(snap, f)
    update_budget({"q": (3, 1)}, path=path)
    snap = load_budget(path)
    assert snap["queries"]["q"]["note"].startswith("2026-08-15")
    assert snap["queries"]["q"]["baseline_shuffles"] == 2
    assert check_budget({"q": (3, 1)}, snap) == []
    # recovery to 2 re-baselines cleanly (lowest-ever stays 2)
    update_budget({"q": (2, 1)}, path=path)
    snap = load_budget(path)
    assert snap["queries"]["q"]["baseline_shuffles"] == 2
    assert check_budget({"q": (2, 1)}, snap) == []


def test_budget_second_increase_drops_the_stale_note(tmp_path):
    """A dated note adjudicates the increase it was written for: a
    SECOND increase re-pinned bare must not ride the first increase's
    explanation — the note is dropped and the rule fires again."""
    path = str(tmp_path / "PLAN_BUDGET.json")
    update_budget({"q": (2, 1)}, path=path)
    update_budget({"q": (3, 1)}, path=path)  # first increase
    snap = load_budget(path)
    snap["queries"]["q"]["note"] = "2026-08-15: extra agg exchange"
    with open(path, "w") as f:
        json.dump(snap, f)
    assert check_budget({"q": (3, 1)}, load_budget(path)) == []
    # second increase, bare re-pin: stale note must NOT carry over
    update_budget({"q": (4, 1)}, path=path)
    snap = load_budget(path)
    assert "note" not in snap["queries"]["q"]
    assert snap["queries"]["q"]["baseline_shuffles"] == 2
    probs = check_budget({"q": (4, 1)}, snap)
    assert len(probs) == 1 and "without a dated note" in probs[0]


def test_budget_update_refuses_while_queries_fail_to_build(tmp_path):
    """--update-budget rewrites the snapshot from the measured set
    only, so a transiently-broken query would silently lose its pin
    and lowest-ever baseline — the update must refuse instead."""
    path = str(tmp_path / "PLAN_BUDGET.json")
    update_budget({"q": (2, 1), "r": (1, 0)}, path=path)
    with pytest.raises(ValueError, match="refusing --update-budget"):
        update_budget(
            {"q": (2, 1)}, path=path, errors={"r": "TypeError: boom"}
        )
    # snapshot untouched by the refused update
    assert set(load_budget(path)["queries"]) == {"q", "r"}


# ── streaming memory-sink source gate ──────────────────────────────

_MEMORY_SINK = re.compile(r"\.format\(\s*([\"'])memory\1\s*\)")


def _memory_sink_sites(root):
    """(relpath, enclosing function) for every memory-sink literal,
    tolerant of quote style and whitespace. The enclosing function is
    resolved from the AST (innermost FunctionDef whose span contains
    the line), so a sink inside an indented module-level block after a
    function is `<module>`, not misattributed to that function."""
    sites = []
    for path in sorted(root.rglob("*.py")):
        text = path.read_text()
        if not _MEMORY_SINK.search(text):
            continue
        spans = [
            (node.lineno, node.end_lineno, node.name)
            for node in ast.walk(ast.parse(text))
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for lineno, line in enumerate(text.splitlines(), start=1):
            if not _MEMORY_SINK.search(line):
                continue
            enclosing = [s for s in spans if s[0] <= lineno <= s[1]]
            fn = (
                max(enclosing, key=lambda s: s[0])[2]
                if enclosing
                else "<module>"
            )
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


def test_memory_sink_site_attribution_is_ast_accurate(tmp_path):
    """Regression for the indent-heuristic bug: a memory sink in an
    indented module-level block following a function must attribute to
    <module>, a nested def to the innermost function."""
    pkg = tmp_path / "pkg"
    pkg.mkdir()
    (pkg / "mod.py").write_text(
        "def unrelated():\n"
        "    return 1\n"
        "\n"
        "with open('/dev/null') as f:\n"
        "    x = w.format('memory')\n"
        "\n"
        "def outer():\n"
        "    def inner():\n"
        '        return w.format("memory")\n'
        "    return inner\n"
    )
    assert _memory_sink_sites(pkg) == [
        ("pkg/mod.py", "<module>"),
        ("pkg/mod.py", "inner"),
    ]


def test_write_markdown_byte_idempotent_under_dict_order(tmp_path):
    """Round-9 judge re-run on an unchanged tree produced a 4-line
    reorder diff: equal-shuffle-count budget rows followed dict order
    (which varies with the registry's staleness sort). The top-plans
    table tie-breaks on the query name now, so regeneration is
    byte-idempotent whatever order the sweep visited the queries in."""
    from tools.plan_audit import write_markdown

    budget_a = {"q_b": (6, 1), "q_a": (6, 2), "q_d": (5, 3), "q_c": (5, 0)}
    budget_b = {k: budget_a[k] for k in ("q_c", "q_a", "q_d", "q_b")}
    p1, p2 = tmp_path / "a.md", tmp_path / "b.md"
    write_markdown(str(p1), [], [], {}, 4, "sf0.001", budget=budget_a)
    write_markdown(str(p2), [], [], {}, 4, "sf0.001", budget=budget_b)
    text = p1.read_text()
    assert text == p2.read_text()
    # ties resolve by name, descending shuffle count first
    assert text.index("`q_a`") < text.index("`q_b`")
    assert text.index("`q_b`") < text.index("`q_c`")
    assert text.index("`q_c`") < text.index("`q_d`")


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
