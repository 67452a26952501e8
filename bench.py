#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "runs": {name: [sec, ...]}, "sf": <sf>}

Each query executes its full plan via a noop-style action (count on the
final plan) — no driver-side collect of large results.

Timings are MIN-OF-N (N = $SPARK_GRAFT_BENCH_RUNS, default 3, same
session): single-run wall-clock swings ±25% with machine state and JIT
warmth (BASELINE.md "Ratchet refresh"; the round-12 bench showed two
phantom 1.3x "regressions" that were pure noise), and a real plan
regression reproduces across back-to-back runs while a cold-start
artifact does not — the same policy sweep.py already applies to
would-trip keys. "queries" carries the min; "runs" carries every
measurement so a reader can judge the spread.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from convml_data_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

HEADLINE = [
    "scene_table",
    "s3_calendar_scan",
    "f1_time_intervals",
    "j2_asof_single",
    "a1_pricing_summary",
    "q3_shipping_priority",
    "a5_binned_2d",
    "a6_ecdf",
    "a7_equidepth",
    "w2_argmin_per_group",
    "w5_sliding_tiles",
    "w7_sessionize",
    "a14_rollup",
    "g2_tile_pixel_slice",
    "dedup_jaccard",
    "text_quality",
    "ann_cosine_topk",
    "derived_dag",
    "r5_triplet_locations",
    "g1_nearest_regrid",
    "doc_fingerprint",
    "text_langid",
    "stream_daily_counts",
    # round 13: one headline key per LLM-pipeline north-star family —
    # dedup (MinHash-LSH end-to-end), retrieval (BM25), ANN (SQ8 top-k) —
    # so the round-over-round bench covers that surface, not just the
    # SURVEY §2 relational core (workload change noted in BASELINE.md)
    "dedup_minhash",
    "bm25_topk",
    "similarity_sq_topk",
    # round 18 (additions ONLY — the 26 keys above stay, in order, for
    # round-over-round comparability): the r17 optimization round's five
    # biggest wins all sat outside the headline set by construction
    # (sub-second relational keys can't see optimization work), so PERF
    # was blind to ~90% of the round. One key per optimized family:
    # Gopher gates, k-means, checksum encoders, connected components,
    # and the two composed pipelines (curation, RAG).
    "gopher_repetition",
    "kmeans_labels",
    "vocab_encode",
    "dedup_components",
    "spec_curation_pipeline",
    "spec_rag_pipeline",
]


def sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="convml-data-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # warm-up: session startup + parquet reader/codegen paths + OS page
    # cache for every input table, so query 1 isn't charged the cold start
    spark.range(1000).count()
    from convml_data_spark import tables as _tables

    for t in ("events", "lineitem", "documents", "embeddings"):
        _tables.load_table(spark, SF_DIR, t).count()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        runs: list[float] = []
        n = 0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        best = min(runs)
        timings[name] = best
        all_runs[name] = runs
        total += best
        print(f"# {name}: min {best:.3f}s of {runs} ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "runs": all_runs,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
