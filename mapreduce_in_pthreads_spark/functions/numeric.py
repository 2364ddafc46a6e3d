"""Order-stable numeric aggregates.

Double summation is order-dependent (a+b+c != c+a+b in IEEE754), and
Spark's shuffle order differs run-to-run and from DuckDB's scan order.
For oracle-comparable results we route double sums through
``decimal(25,4)``: each input is rounded once (deterministic per value),
then summed with exact integer arithmetic — associative, so partition
order can't change the result — and cast back to double at the end.
This is also the right call at 100 TB: decimal partial aggregation is
still map-side combinable and the per-row cast is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,4)"
# DuckDB twin of the same construct; keep in sync with DEC.
SQL_DEC = "DECIMAL(25,4)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive sum of a double column. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE) AS alias``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive mean: exact decimal sum divided by count, in
    double. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE) / COUNT(x) AS alias``."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")
