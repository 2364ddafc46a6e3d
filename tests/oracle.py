"""Local mirror of the driver's correctness gate: run a registry query
on Spark AND its DuckDB oracle over the same parquet tables, compare
row-count + column names + order-insensitive values (exact — the driver
hashes values, so 'close' is not good enough; numeric stability is the
queries' job, see functions.numeric)."""

from __future__ import annotations

import math

import duckdb

from mapreduce_in_pthreads_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v):
    """Canonicalize one cell for order-insensitive comparison."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NAN"
        return repr(v)  # full precision — mismatches must surface
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return repr(v)
    return str(v)


def rows_canon(cols, rows):
    """Sort columns by name (driver behavior), then canonicalize and
    sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_rows, oracle_cols):
    scols = list(spark_df.columns)
    srows = [tuple(r) for r in spark_df.collect()]
    assert sorted(scols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(oracle_cols)}")
    assert len(srows) == len(oracle_rows), (
        f"row count mismatch: spark={len(srows)} oracle={len(oracle_rows)}")
    a = rows_canon(scols, srows)
    b = rows_canon(oracle_cols, oracle_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")


def check_query(spark, sf_dir: str, name: str):
    from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = df.count()
        assert n >= 0
        return n
    con = duck_con(sf_dir)
    rel = con.sql(q.oracle)
    compare(df, rel.fetchall(), list(rel.columns))
    return None
