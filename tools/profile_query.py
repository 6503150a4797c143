#!/usr/bin/env python
"""Profile one registry query: construction wall vs action wall, a
pass count, and an optional formatted-plan dump.

Usage:
    python tools/profile_query.py QUERY [QUERY...] [--passes N]
        [--explain-dir DIR] [--sf-dir DIR]

Methodology matches bench.py (construction + noop action, min of
passes) so numbers here are comparable to the headline table, but the
construction/action split and per-pass samples localize WHERE a
query's wall goes — the guide §1 step bench.py's single number can't
answer. setJobDescription labels every action for the UI.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from skysafe_datalake_spark.session import get_spark
    from skysafe_datalake_spark.workload import QUERIES

    spark = get_spark(app_name="profile-query")
    sc = spark.sparkContext

    for name in args.queries:
        if name not in QUERIES:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        rows = []
        for p in range(args.passes):
            sc.setJobDescription(f"{name}: construction pass {p}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name}: action pass {p}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            rows.append((t1 - t0, t2 - t1, t2 - t0))
        best = min(rows, key=lambda r: r[2])
        print(
            f"{name}: total={best[2]:.3f}s construction={best[0]:.3f}s "
            f"action={best[1]:.3f}s  (all passes: "
            + ", ".join(f"{r[2]:.3f}" for r in rows)
            + ")"
        )
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain_dir, f"{name}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"  plan -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
