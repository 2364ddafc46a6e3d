#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing methodology:
- the SparkSession is built first, and every headline query runs ONCE
  untimed (warm-up: JVM startup, codegen JIT, parquet footer + page
  cache) before the timed pass — BASELINE.md: 'compare steady-state
  query time, not process wall clock';
- each query executes its FULL physical plan into the noop sink
  (``format("noop")``) — no collect-to-driver cost, no skipped
  stages from count() shortcuts;
- explicit GC between timed queries so one query's cleanup debt
  (JVM garbage + Spark ContextCleaner work) never bills the next;
- each query is timed THREE times and the MEDIAN is reported, with
  the raw per-run times kept under "runs" so the round-over-round
  artifact shows each query's run-to-run spread directly (VERDICT r8
  item 5: rounds kept re-litigating ±25% phantom swings on sub-second
  queries — `word_count` +25% r7→r8 on unchanged code — because the
  artifact held a single number with no spread). This host is a VM
  with bursty CPU steal (~5%+ spikes); median-of-3 rejects a single
  stolen run while not understating the way min-of-N can;
- value = sum of per-query steady-state wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY  # noqa: E402
from mapreduce_in_pthreads_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "inverted_index",          # reference flagship (R1-R11)
    "word_count",              # map-side-combinable derived query
    "q1_pricing_summary",      # big-scan aggregation
    "q6_forecast_revenue",     # selective pushdown scan
    "revenue_by_nation",       # broadcast-dim + shuffle fact join
    "top_orders_per_customer", # window top-N
    "tumbling_hourly",         # event-time windows
    "session_windows_30m",     # session windows
    "exact_dedup",             # content dedup
    "minhash_lsh_dedup",       # MinHash+LSH near-dup pipeline
    "ann_topk_bruteforce",     # vector top-k
    "tfidf_top_terms",         # text analysis
    "q3_shipping_priority",    # 3-way join + top-k
    "asof_join_prior_event",   # as-of join (union+window)
    "salted_word_count",       # skew-proof two-stage aggregation
]


def run_noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    jvm_gc = spark.sparkContext._jvm.java.lang.System.gc

    # warm-up pass: run every headline query once untimed
    for name in HEADLINE:
        run_noop(REGISTRY[name].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        # GC between queries: JVM garbage + Spark's GC-driven
        # ContextCleaner (old shuffle/broadcast state) otherwise
        # accumulate across the suite and bill later queries for
        # earlier queries' cleanup debt (measured: 10s → 170s+ drift
        # on the allocation-heavy LSH query without this).
        runs: list[float] = []
        for _ in range(3):
            jvm_gc()
            t0 = time.perf_counter()
            run_noop(REGISTRY[name].fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 4))
        raw_runs[name] = runs
        timings[name] = sorted(runs)[1]  # median of 3

    total = round(sum(timings.values()), 4)
    # Protocol seam (VERDICT r9 item 5): BENCH_r01..r08 recorded
    # min-of-3 totals; r09+ record median-of-3 as the headline `value`.
    # `value_min_of_3` is the min-of-3 total derived from the SAME raw
    # runs so round-over-round trend reading never needs manual
    # recomputation across the seam.
    total_min = round(sum(min(r) for r in raw_runs.values()), 4)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "protocol": "median_of_3",
        "value_min_of_3": total_min,
        "unit": "sec",
        "queries": timings,
        "runs": raw_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # r11 (VERDICT r10 item 6): record the core count the run
        # actually used so scaling artifacts are self-describing.
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))


if __name__ == "__main__":
    main()
