"""Vector math as pure Catalyst expressions — no UDFs.

The hot path of similarity search is the distance kernel; doing it with
``zip_with`` + ``aggregate`` keeps it JVM-side and codegen-friendly, so
a 100 TB embedding scan never crosses into Python. Elements are cast to
double BEFORE multiplying so Spark and the DuckDB oracle (both summing
sequentially over the same 64 elements) produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(_d(a), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
