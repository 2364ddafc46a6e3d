"""Driver-gate mirror: every registry query vs its DuckDB oracle at
sf=0.01 (the exact comparison the driver records in CORRECTNESS)."""

from __future__ import annotations

import pytest

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

from .oracle import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, sf_dir, name)
