"""Parquet table sources for the driver's synthetic star schema.

The reference's only source is a line-oriented text scan
(mapreduce.c:97-138, producer()); the relational surface here reads
the driver-generated parquet tables (TESTDATA.md). Parquet scans are
the scale path: columnar, splittable, and Catalyst pushes predicates
and prunes columns into the scan (``.explain`` shows PushedFilters /
ReadSchema), which the reference could never do (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor —
# region/nation are fixed-size (5/25 rows at 100 TB too).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; missing file tolerance mirrors the
    reference's missing-input behavior (mapreduce.c:100-103 prints
    'no such file' and the task becomes a no-op) by raising a clear
    error instead of a cryptic one."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no such table file: {path}")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) —
        # which the vectorized reader rejects (PARQUET_TYPE_ILLEGAL)
        # unless read as raw int64 via nanosAsLong — and plain
        # TIMESTAMP(MICROS), which reads natively. Handle both: with
        # nanosAsLong=true a NANOS column surfaces as bigint (convert
        # ns→µs, matching DuckDB's truncation so oracle comparisons
        # align; integer `div`, since ns epoch values exceed 2^53)
        # while a MICROS column is unaffected and passes through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin the session zone so the NTZ->LTZ normalization below is
        # an identity on the stored instant even under a session the
        # caller configured differently (the driver passes its own).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Normalize NTZ to session-zone TIMESTAMP so downstream
            # chrono functions (unix_micros, window, date_trunc) see
            # one consistent type regardless of how the file was
            # written. Sessions here run UTC, so the instant is
            # unchanged and matches DuckDB's naive reading.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
