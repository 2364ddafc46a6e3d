#!/usr/bin/env python
"""Fleet-wide physical-plan audit — the measured evidence behind
SCALE.md. Executes every registry query at sf0.01 (AQE on, so the
audited plan is the FINAL adaptive plan, not the static guess) and
counts the plan facts that matter at 100 TB: exchanges, cartesian
products, global sorts, broadcast vs sort-merge joins, Python eval
nodes, pushed filters, non-scalar output columns.

Usage:  python tools/plan_audit.py [sf_dir]
Prints one JSON document; paste the summary into SCALE.md when the
registry changes (ADVICE r3: the audit must cover the CURRENT registry
— stale counts are worse than none).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY  # noqa: E402
from mapreduce_in_pthreads_spark.session import get_spark  # noqa: E402

PY_EVAL = re.compile(
    r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
    r"|MapInPandas|PythonMapInArrow|MapInArrow|FlatMapGroupsInPandasWithState")
NON_SCALAR = re.compile(r"^(array|map|struct|binary)", re.IGNORECASE)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    per_query: dict[str, dict] = {}
    for name, q in REGISTRY.items():
        try:
            df = q.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()  # finalize AQE
            plan = df._jdf.queryExecution().executedPlan().toString()
            per_query[name] = {
                "exchanges": plan.count("Exchange hashpartitioning"),
                "range_exchange": plan.count("Exchange rangepartitioning"),
                "cartesian": plan.count("CartesianProduct"),
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "py_eval": len(PY_EVAL.findall(plan)),
                "pushed": ("PushedFilters: [" in plan
                           and "PushedFilters: []" not in plan),
                "take_ordered": plan.count("TakeOrderedAndProject"),
                "non_scalar_out": sum(
                    1 for f in df.schema.fields
                    if NON_SCALAR.match(f.dataType.simpleString())),
            }
        except Exception as ex:  # audit must cover everything or say so
            per_query[name] = {"error": f"{type(ex).__name__}: {ex}"[:200]}

    ok = {n: v for n, v in per_query.items() if "error" not in v}
    summary = {
        "n_queries": len(per_query),
        "n_audited": len(ok),
        "errors": sorted(n for n, v in per_query.items() if "error" in v),
        "zero_exchange": sum(1 for v in ok.values()
                             if v["exchanges"] + v["range_exchange"] == 0),
        "one_exchange": sum(1 for v in ok.values()
                            if v["exchanges"] == 1 and v["range_exchange"] == 0),
        "cartesian_total": sum(v["cartesian"] for v in ok.values()),
        "range_exchange_queries": sum(
            1 for v in ok.values() if v["range_exchange"] > 0),
        "bhj_queries": sum(1 for v in ok.values() if v["bhj"] > 0),
        "smj_queries": sum(1 for v in ok.values() if v["smj"] > 0),
        "py_eval_queries": sorted(n for n, v in ok.items() if v["py_eval"] > 0),
        "pushed_filter_queries": sum(1 for v in ok.values() if v["pushed"]),
        "take_ordered_queries": sum(
            1 for v in ok.values() if v["take_ordered"] > 0),
        "non_scalar_output_queries": sorted(
            n for n, v in ok.items() if v["non_scalar_out"] > 0),
    }
    print(json.dumps({"summary": summary, "per_query": per_query}, indent=1))


if __name__ == "__main__":
    main()
