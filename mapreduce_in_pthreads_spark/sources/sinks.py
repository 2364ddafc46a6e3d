"""Sinks: the write side of the engine (SURVEY.md §2.1 R11).

The reference's sink is stdout with per-reducer atomic blocks
(printmutex, mapreduce.c:93,216-222) — each reducer's whole table
prints contiguously. The distributed equivalents:

- ``write_partitioned``: one file per partition (per-partition
  atomicity, exactly R11's guarantee), columnar parquet with optional
  partition columns for downstream pruning;
- ``write_text_report``: the reference's human-readable line format
  rendered distributed and written as text (one part-file per
  partition = one reducer block).

Scale notes: partitionBy columns must be low-cardinality (lang/source,
never doc_id); sort-within-partitions before write gives run-length-
friendly parquet without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str] | None = None,
                      fmt: str = "parquet") -> None:
    """Columnar write, optionally hive-partitioned; sorted within
    partitions on the partition key for compression locality."""
    w = df.write.mode("overwrite").format(fmt)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def write_text_report(df: DataFrame, line_col: str, path: str,
                      coalesce: int | None = None) -> None:
    """Write a single string column as text files — the reference's
    stdout sink, one part-file per reduce partition (R11's atomic
    block)."""
    out = df.select(line_col)
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").text(path)


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8) -> None:
    """Bucketed managed-table write: hash-clustered on ``key`` into
    ``n_buckets`` files per partition, sorted within buckets.

    Bucketing is the storage-level answer to repeated join/agg
    shuffles: two tables bucketed on the same key with the same bucket
    count join with NO exchange on either side (asserted in
    tests/test_layout_and_sources.py) — at 100 TB this turns every
    fact⋈fact join on the bucket key from a full network shuffle into
    a local merge. The write itself shuffles once to cluster; that
    cost amortizes over every downstream read."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key).sortBy(key)
       .format("parquet").saveAsTable(table))
