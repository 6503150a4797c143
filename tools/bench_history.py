#!/usr/bin/env python
"""Cross-round engine-cost trajectories from the durable full-registry
bench records — the slow-creep complement to bench.py's single-round
flags.

bench.py flags a query only when one round-over-round normalized ratio
clears 1.25x (then confirms it with targeted passes). A query that
creeps +10% every round never trips that bar in any single comparison
yet is 1.33x after three rounds — invisible to every per-round record.
This tool closes that blind spot: it recomputes each round's per-query
engine cost from the committed ``BENCH_FULL_r{N}.json`` records with
the SAME estimator bench.py uses (``_per_pass_costs``: per-pass
wall-load-corrected walls over the record's own host-speed estimate,
so host weather is divided out record by record) and chains them —
per-step ratios between consecutive records plus a CUMULATIVE ratio
between the earliest and latest CLEAN records.

Quality gating mirrors bench.py's anchor-inheritance rule: a record
that marked its own run noisy (``noise.noisy_host``) or carried a
demoted ``noise.uniform_shift`` cannot serve as a cumulative endpoint
(its costs are the unreliable half of any ratio built on them); such
records still appear in the per-round listing, marked unclean.

Cumulative flags are reported as ``cumulative_suspects``, not
regressions: the cross-record comparability of canary-relative costs
carries the same fixed-overhead asymmetry bench.py documents (a
CPU-slower host flattens overhead-dominated ratios), and no
confirmation pass re-timed anything here. A suspect is a hypothesis to
hand to bench.py's confirmation machinery (re-run the sweep, watch the
query), not a verdict. The wall floor applies to BOTH endpoints'
recorded min walls — sub-``_REGRESSION_MIN_SEC`` queries are
jitter-dominated at every round and chain jitter into fake creep.

Usage: ``python tools/bench_history.py [--repo ROOT] [--write]``.
Prints one JSON line; ``--write`` also lands BENCH_HISTORY.json in the
repo root for the judge.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import bench  # noqa: E402  (repo-root module, path fixed above)

# A cumulative drift past bench.py's single-step bar is exactly the
# creep the per-round flags structurally miss.
_CUMULATIVE_BAR = bench._NORMALIZED_REGRESSION_RATIO


def load_full_records(repo_root: str) -> list[tuple[int, str, dict]]:
    """(round, filename, data) for every durable full-registry record
    that carries per-pass samples and canaries, ascending round order.
    BENCH_FULL only: DETAIL files are clobbered by the driver's
    round-end headline run and stdout captures have no samples — the
    durable copies are the only records whose estimator matches
    across rounds (same 183-query shape, same per-pass arithmetic)."""
    out = []
    for path in glob.glob(os.path.join(repo_root, "BENCH_FULL_r*.json")):
        m = re.search(r"BENCH_FULL_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        samples = data.get("samples") or {}
        canaries = (data.get("noise") or {}).get("canary_sec") or []
        if samples and canaries:
            out.append((int(m.group(1)), os.path.basename(path), data))
    out.sort()
    return out


def record_quality(data: dict) -> dict:
    """Whether a record can anchor a cost ratio (bench.py's
    anchor-inheritance rule applied retroactively)."""
    noise = data.get("noise") or {}
    noisy = bool(noise.get("noisy_host"))
    shift = noise.get("uniform_shift")
    return {
        "noisy_host": noisy,
        "uniform_shift": shift,
        "clean": not noisy and not shift,
    }


def _costs(data: dict) -> dict[str, float]:
    return bench._per_pass_costs(
        data.get("samples") or {},
        (data.get("noise") or {}).get("canary_sec") or [],
    )


def _ratio_map(
    frm: dict[str, float], to: dict[str, float]
) -> dict[str, float]:
    out = {}
    for name, c in to.items():
        p = frm.get(name)
        if p and p > 0:
            out[name] = round(c / p, 3)
    return out


def _walls_ok(name: str, *records: dict) -> bool:
    for data in records:
        try:
            w = float((data.get("queries") or {}).get(name) or 0)
        except (TypeError, ValueError):
            return False
        if w < bench._REGRESSION_MIN_SEC:
            return False
    return True


def history(records: list[tuple[int, str, dict]]) -> dict:
    """Per-round quality + step ratios + the clean-endpoint cumulative
    drift read. Step ratios pair EVERY consecutive record (marked with
    both endpoints' cleanliness); the cumulative compares only the
    earliest clean record to the latest clean one.

    Records are first restricted to the NEWEST record's scale factor:
    bench.py writes BENCH_FULL on any --all run at the active SF_DIR,
    and a cross-SF ratio is data volume, not engine drift (the same
    guard bench.py applies to its own cross-round normalization — one
    local sf0.001 sweep landing as a FULL record would otherwise turn
    the whole trajectory into fake 100x "improvement"). Dropped
    records are listed under ``skipped_other_sf``; records without an
    ``sf`` field (old fixtures) are kept."""
    target_sf = None
    for _, _, data in reversed(records):
        if data.get("sf") is not None:
            target_sf = data.get("sf")
            break
    skipped = [
        fname
        for _, fname, data in records
        if data.get("sf") is not None and data.get("sf") != target_sf
    ]
    records = [
        (rnd, fname, data)
        for rnd, fname, data in records
        if data.get("sf") in (None, target_sf)
    ]
    rounds = []
    for rnd, fname, data in records:
        q = record_quality(data)
        rounds.append({"round": rnd, "file": fname, **q})
    steps = []
    for (r1, f1, d1), (r2, f2, d2) in zip(records, records[1:]):
        ratios = _ratio_map(_costs(d1), _costs(d2))
        med = bench._median(ratios.values()) if ratios else None
        steps.append(
            {
                "from_round": r1,
                "to_round": r2,
                "clean_pair": record_quality(d1)["clean"]
                and record_quality(d2)["clean"],
                "n_queries": len(ratios),
                "median": round(med, 3) if med is not None else None,
            }
        )
    clean = [(rnd, f, d) for rnd, f, d in records if record_quality(d)["clean"]]
    cumulative = None
    if len(clean) >= 2:
        r1, f1, d1 = clean[0]
        r2, f2, d2 = clean[-1]
        ratios = _ratio_map(_costs(d1), _costs(d2))
        suspects = {
            n: r
            for n, r in ratios.items()
            if r > _CUMULATIVE_BAR and _walls_ok(n, d1, d2)
        }
        med = bench._median(ratios.values()) if ratios else None
        cumulative = {
            "from_round": r1,
            "from_file": f1,
            "to_round": r2,
            "to_file": f2,
            "n_queries": len(ratios),
            "median": round(med, 3) if med is not None else None,
            "bar": _CUMULATIVE_BAR,
            # Hypotheses for bench.py's confirmation machinery, NOT
            # verdicts — nothing here was re-timed.
            "cumulative_suspects": dict(
                sorted(suspects.items(), key=lambda kv: -kv[1])
            ),
        }
    return {
        "sf": target_sf,
        "skipped_other_sf": skipped,
        "rounds": rounds,
        "steps": steps,
        "cumulative": cumulative,
    }


def main() -> int:
    repo_root = os.path.dirname(_HERE)
    argv = sys.argv[1:]
    if "--repo" in argv:
        idx = argv.index("--repo") + 1
        if idx >= len(argv):
            print("usage: bench_history.py [--repo ROOT] [--write]",
                  file=sys.stderr)
            return 2
        repo_root = argv[idx]
    records = load_full_records(repo_root)
    out = history(records)
    if not records:
        print(
            "# no BENCH_FULL_r*.json with per-pass samples found",
            file=sys.stderr,
        )
    cum = out.get("cumulative")
    if cum:
        sus = cum["cumulative_suspects"]
        print(
            f"# cumulative drift r{cum['from_round']} -> "
            f"r{cum['to_round']}: median {cum['median']} over "
            f"{cum['n_queries']} queries; "
            + (
                f"{len(sus)} suspects past {cum['bar']}x: "
                + ", ".join(f"{n} x{r}" for n, r in sus.items())
                if sus
                else f"no query past {cum['bar']}x cumulative"
            ),
            file=sys.stderr,
        )
    line = json.dumps(out, separators=(",", ":"))
    print(line)
    if "--write" in argv:
        path = os.path.join(repo_root, "BENCH_HISTORY.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
