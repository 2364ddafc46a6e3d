#!/usr/bin/env python
"""Regenerate ``tests/plan_budgets.json`` — the fleet-wide per-query
exchange-budget snapshot enforced by ``tests/test_plan_budgets.py``.

Why this exists (VERDICT r4 item 5): the exchange-replay heuristic —
"a query whose physical plan shows far more exchanges than its logical
shuffle count is re-executing a multiply-referenced subrelation" —
caught `triangle_count` executing 33 exchanges and
`clustering_coefficient` 41 (each should shuffle a handful of
vocab-bounded relations).  That detection only happened because a
human ran `tools/plan_audit.py` and eyeballed the numbers.  This tool
pins the CURRENT static plan shape of EVERY registry query into a
committed JSON snapshot, and the companion pytest fails the moment any
query's exchange count rises above its snapshot (or a cartesian
product appears anywhere) — so a dropped lineage cut, an accidental
re-join, or an optimizer-defeating refactor breaks CI instead of
waiting for the next manual audit.

Static (un-executed) plans are used on BOTH sides — deterministic,
cheap (no job runs beyond the bounded training collects some queries
perform at build time), and an upper bound on the AQE-final plan
(AQE only ever removes/coalesces exchanges, e.g. SMJ→BHJ conversion).

Usage:
    python tools/plan_budgets.py            # rewrite the snapshot
    python tools/plan_budgets.py --check    # verify without writing
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "plan_budgets.json")
SF_DIR = os.environ.get("PLAN_BUDGET_SF_DIR", "/root/testdata/sf0.01")


def static_plan_facts(df) -> dict:
    """The plan facts the budget test enforces, from the STATIC
    executed plan (never runs a job). Must stay in lockstep with
    tests/test_plan_budgets.py's reading side."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "range_exchanges": plan.count("Exchange rangepartitioning"),
        "single_exchanges": plan.count("Exchange SinglePartition"),
        "cartesian": plan.count("CartesianProduct"),
    }


def collect_budgets() -> dict[str, dict]:
    from mapreduce_in_pthreads_spark.plans.registry import REGISTRY
    from mapreduce_in_pthreads_spark.session import get_spark
    spark = get_spark("plan-budgets", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, q in REGISTRY.items():
        out[name] = static_plan_facts(q.fn(spark, SF_DIR))
    return dict(sorted(out.items()))


def main() -> None:
    budgets = collect_budgets()
    if "--check" in sys.argv:
        with open(SNAPSHOT) as f:
            committed = json.load(f)
        drift = {n: (committed.get(n), v) for n, v in budgets.items()
                 if committed.get(n) != v}
        print(f"{len(budgets)} queries; {len(drift)} drifted")
        for n, (old, new) in sorted(drift.items()):
            print(f"  {n}: {old} -> {new}")
        sys.exit(1 if drift else 0)
    with open(SNAPSHOT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {SNAPSHOT}: {len(budgets)} queries")


if __name__ == "__main__":
    main()
