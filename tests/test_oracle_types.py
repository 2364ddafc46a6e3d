"""Oracle-twin output-type lint (VERDICT r7 item 2).

DuckDB's SUM over INTEGER/BIGINT returns HUGEINT — a 128-bit type the
driver's fetch path can materialize differently from the local
``fetchall()`` comparison, hashing green locally and red on the driver
(`user_growth_curve`, CORRECTNESS_r07). The fleet convention wraps every
final integer aggregate in ``CAST(... AS BIGINT)`` (219 sites); this
test ENFORCES it structurally: every oracle twin is bound (not executed)
by DuckDB against the sf0.001 views and the test fails if any OUTPUT
column's type is HUGEINT/UHUGEINT. Binding catches the hazard wherever
the bare ``sum(...)``/``sum() OVER`` sits — outer select, USING join,
or a CTE projected through unchanged — which a regex over the outer
SELECT cannot.
"""

from __future__ import annotations

import os

import pytest

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

from .oracle import duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_SF001_DIR", "/root/testdata/sf0.001")

BANNED_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


def _oracle_names():
    return [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_types_are_driver_safe(con, name):
    rel = con.sql(REGISTRY[name].oracle)  # lazy: binds, does not execute
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if str(t).upper().startswith(BANNED_PREFIXES)]
    assert not bad, (
        f"{name}: oracle output column(s) {bad} are HUGEINT/DECIMAL — "
        "wrap the final integer aggregate in CAST(... AS BIGINT) and "
        "any decimal literal/accumulator in CAST(... AS DOUBLE) (fleet "
        "convention; see cross-engine gotchas / CORRECTNESS_r07 "
        "user_growth_curve; Spark returns long/double, so a DECIMAL-"
        "typed oracle column rides a different driver fetch path)")
