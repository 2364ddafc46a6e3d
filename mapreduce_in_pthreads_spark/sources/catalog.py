"""SQL catalog surface: register every testdata table as a temp view so
the engine is a drop-in ``spark.sql`` target (the reference's only
"catalog" is the hard-coded file-name template, mapreduce.c:309).

Views go through ``load_table``, so the events nanos→µs contract and
missing-file behavior apply uniformly. Temp views are metadata-only:
no data is materialized, and queries over them still get full predicate
pushdown and column pruning into the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLES, load_table


def register_all(spark: SparkSession, sf_dir: str,
                 prefix: str = "") -> list[str]:
    """Register all 10 tables as ``{prefix}{name}`` temp views; returns
    the view names. Idempotent (createOrReplaceTempView)."""
    names = []
    for name in TABLES:
        view = f"{prefix}{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
