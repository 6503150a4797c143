"""tools/bench_history.py — cross-round slow-creep detection over the
durable BENCH_FULL records (pure Python, no Spark)."""

from __future__ import annotations

import json

from tools import bench_history


def _record(walls_by_query, canary=0.1, passes=3, noisy=False, shift=None):
    """A minimal BENCH_FULL-shaped record: flat per-pass walls at the
    given min level, steady canaries (thin-matrix canary-quotient
    estimator: cost = wall/canary, deterministic for tests)."""
    noise = {"canary_sec": [canary] * passes}
    if noisy:
        noise["noisy_host"] = True
    if shift is not None:
        noise["uniform_shift"] = shift
    return {
        "samples": {n: [w] * passes for n, w in walls_by_query.items()},
        "queries": dict(walls_by_query),
        "noise": noise,
        "all": True,
    }


def _write(tmp_path, rnd, rec):
    (tmp_path / f"BENCH_FULL_r{rnd:02d}.json").write_text(json.dumps(rec))


def test_history_flags_slow_creep_single_steps_miss(tmp_path):
    """A query creeping +10% per round never clears the 1.25x
    single-step bar (bench.py is structurally blind to it) but is
    1.33x cumulative over three steps — exactly what the tool must
    surface. The flat companion queries stay unflagged."""
    base = {"flat_a": 1.0, "flat_b": 2.0, "creep": 1.0}
    for i, rnd in enumerate(range(7, 11)):
        walls = dict(base)
        walls["creep"] = round(1.0 * 1.1**i, 4)
        _write(tmp_path, rnd, _record(walls))
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert [r["round"] for r in out["rounds"]] == [7, 8, 9, 10]
    assert all(r["clean"] for r in out["rounds"])
    # Every single step is under the bar...
    for step in out["steps"]:
        assert step["clean_pair"] is True
        assert step["median"] < bench_history._CUMULATIVE_BAR
    # ...but the chained drift is not.
    cum = out["cumulative"]
    assert (cum["from_round"], cum["to_round"]) == (7, 10)
    assert cum["cumulative_suspects"] == {"creep": 1.331}
    assert cum["median"] == 1.0  # the bulk of the set is flat


def test_history_excludes_unclean_endpoints(tmp_path):
    """bench.py's anchor-inheritance rule applied retroactively: a
    record that marked its own run noisy (or demoted a uniform shift)
    cannot anchor the cumulative ratio — its costs are the unreliable
    half of any ratio built on them. It still appears in the listing,
    marked unclean, and its steps are marked clean_pair: False."""
    _write(tmp_path, 9, _record({"q": 2.0, "r": 1.0}, noisy=True))
    _write(tmp_path, 10, _record({"q": 1.0, "r": 1.0}))
    _write(tmp_path, 11, _record({"q": 1.0, "r": 1.0}))
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert [r["clean"] for r in out["rounds"]] == [False, True, True]
    assert [s["clean_pair"] for s in out["steps"]] == [False, True]
    cum = out["cumulative"]
    assert (cum["from_round"], cum["to_round"]) == (10, 11)
    # Had the noisy r9 anchored the cumulative, q would read 0.5x;
    # from the clean pair it is flat.
    assert cum["cumulative_suspects"] == {}
    # A demoted uniform shift is equally disqualifying.
    _write(tmp_path, 12, _record({"q": 1.0, "r": 1.0}, shift=1.3))
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert out["cumulative"]["to_round"] == 11
    # ...but a shift parked under uniform_shift_vs_noisy_anchor is an
    # ANCHOR-side artifact (bench.py r12): the run's own walls are
    # fine and it stays a clean endpoint.
    rec = _record({"q": 1.0, "r": 1.0})
    rec["noise"]["uniform_shift_vs_noisy_anchor"] = 0.8
    _write(tmp_path, 13, rec)
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert out["rounds"][-1]["round"] == 13
    assert out["rounds"][-1]["clean"] is True
    assert out["cumulative"]["to_round"] == 13


def test_history_wall_floor_binds_both_endpoints(tmp_path):
    """Sub-floor walls are jitter at every round; chaining them turns
    jitter into fake creep. A 0.05s query tripling stays unflagged;
    the same ratio on a 0.5s query is flagged."""
    _write(tmp_path, 10, _record({"tiny": 0.05, "big": 0.5}))
    _write(tmp_path, 11, _record({"tiny": 0.15, "big": 1.5}))
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert out["cumulative"]["cumulative_suspects"] == {"big": 3.0}


def test_history_restricts_to_the_newest_records_scale_factor(tmp_path):
    """bench.py writes BENCH_FULL on any --all run at the active
    SF_DIR, and a cross-SF ratio is data volume, not engine drift —
    one local sf0.001 sweep landing between two sf0.1 records would
    otherwise turn the trajectory into fake 100x improvement. Records
    at a different SF than the newest are dropped and listed."""
    r10 = _record({"q": 1.0, "r": 1.0})
    r10["sf"] = 0.1
    tiny = _record({"q": 0.01, "r": 0.01})
    tiny["sf"] = 0.001
    r12 = _record({"q": 1.0, "r": 1.0})
    r12["sf"] = 0.1
    _write(tmp_path, 10, r10)
    _write(tmp_path, 11, tiny)
    _write(tmp_path, 12, r12)
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert out["sf"] == 0.1
    assert out["skipped_other_sf"] == ["BENCH_FULL_r11.json"]
    assert [r["round"] for r in out["rounds"]] == [10, 12]
    cum = out["cumulative"]
    assert (cum["from_round"], cum["to_round"]) == (10, 12)
    assert cum["cumulative_suspects"] == {}


def test_history_degenerate_inputs(tmp_path):
    # No records at all.
    out = bench_history.history([])
    assert out["rounds"] == [] and out["steps"] == []
    assert out["cumulative"] is None
    # One clean record: a trajectory needs two endpoints.
    _write(tmp_path, 11, _record({"q": 1.0}))
    out = bench_history.history(bench_history.load_full_records(str(tmp_path)))
    assert out["cumulative"] is None and len(out["rounds"]) == 1
    # Records without samples are not trajectory material.
    (tmp_path / "BENCH_FULL_r09.json").write_text(
        json.dumps({"noise": {"canary_sec": [0.1]}, "queries": {"q": 1.0}})
    )
    assert [
        r for r, _, _ in bench_history.load_full_records(str(tmp_path))
    ] == [11]


def test_history_runs_on_the_real_repo_records():
    """Integration smoke: whatever BENCH_FULL records this checkout
    carries must parse and chain without raising. Structural checks
    only — record cleanliness, round numbers, and registry size drift
    round over round and are the artifacts' contract, not this unit
    suite's (the r11 version pinned `from_round >= 10` /
    `n_queries > 150` and would break on unrelated future rounds)."""
    import os

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = bench_history.load_full_records(repo)
    if not records:
        pytest.skip("no committed BENCH_FULL records in this checkout")
    out = bench_history.history(records)
    assert [r["round"] for r in out["rounds"]] == sorted(
        r for r, _, _ in records
    )
    cum = out["cumulative"]
    if cum is not None:
        assert cum["from_round"] <= cum["to_round"]
        assert cum["n_queries"] > 0
