#!/usr/bin/env python
"""Capture .explain("formatted") for a set of registry queries into
plans/<tag>/<query>_<suffix>.txt (OPTIMIZATION round deliverable: the
judge checks plan claims against these committed files).

Usage:
    python tools/capture_plans.py --tag r10 --suffix before [query ...]

With no query args, captures the bench HEADLINE set.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY  # noqa: E402
from mapreduce_in_pthreads_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries
    if not names:
        import bench
        names = list(bench.HEADLINE)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
