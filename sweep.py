#!/usr/bin/env python
"""Full-surface performance sweep: time EVERY registered query at
$SPARK_GRAFT_SF_DIR (default sf0.1) and ratchet against the previous
sweep artifact.

bench.py covers 23 headline queries; a non-headline query can silently
regress (the round-4 example: a 123 s single-partition window in
f4_traj_snap that bench never executed). This sweep is the per-round
backstop: it writes ``SWEEP.json`` (per-query seconds + rows) and exits
non-zero if any query is BOTH >2x slower than the previous sweep AND >1 s
absolute (the absolute floor keeps sub-second job-scheduling jitter from
tripping the ratchet).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python sweep.py
    python sweep.py --baseline SWEEP.json   # explicit comparison file
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from convml_data_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SWEEP.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=ARTIFACT)
    ap.add_argument("--out", default=ARTIFACT)
    args = ap.parse_args()

    prev = {}
    if os.path.exists(args.baseline):
        with open(args.baseline) as fh:
            prev = (json.load(fh) or {}).get("queries", {})

    spark = get_spark(app_name="convml-data-spark-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1000).count()
    from convml_data_spark import tables as _tables

    for t in _tables.TABLE_NAMES:
        _tables.load_table(spark, SF_DIR, t).count()

    timings: dict[str, dict] = {}
    failures: list[str] = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            n = fn(spark, SF_DIR).count()
            err = None
        except Exception as e:  # a crash is a regression too
            n, err = -1, f"{type(e).__name__}: {e}"
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = {"sec": dt, "rows": n, **({"err": err} if err else {})}
        flag = ""
        if err:
            failures.append(f"{name}: CRASH {err}")
            flag = "  <-- CRASH"
        elif name in prev and "err" not in prev[name]:
            p = prev[name]["sec"]
            if dt > 2.0 * p and dt > 1.0:
                failures.append(f"{name}: {p:.2f}s -> {dt:.2f}s (> 2x ratchet)")
                flag = "  <-- RATCHET"
        print(f"# {name}: {dt:.3f}s ({n} rows){flag}", file=sys.stderr)

    total = round(sum(v["sec"] for v in timings.values()), 3)
    out = {
        "metric": "all_queries_total_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": SF_DIR,
        "n_queries": len(timings),
        "queries": timings,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"total_sec": total, "n": len(timings), "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
