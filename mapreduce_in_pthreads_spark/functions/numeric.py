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


MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"


def money(col: Column | str) -> Column:
    """Exact decimal view of a 2-dp monetary double column. The source
    data carries exactly 2 decimal digits, so this cast is EXACT in
    both Spark and DuckDB (no tie-rounding) — products/sums built on it
    are bit-identical across engines. Products of doubles cast to
    decimal are NOT safe: Spark rounds the shortest string repr
    (HALF_UP) while DuckDB rounds the binary value, and they disagree
    on x.xxxx5 ties."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: Column | str) -> Column:
    """Exact decimal view of a 2-dp ratio column (discount/tax)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def one() -> Column:
    """Decimal literal 1.00 — a function because Column construction
    needs an active SparkContext (import-time lit() would fail)."""
    return F.lit(1).cast("decimal(3,2)")


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")
