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


def compact(spark, path: str, target_file_bytes: int = 128 << 20) -> int:
    """Small-files compaction — the standard table-maintenance op: many
    small part-files (streaming micro-batches, over-parallel writes)
    are rewritten into ``ceil(total_bytes / target)`` right-sized files.
    At 100 TB this is what keeps scan task counts sane: parquet scans
    schedule ~one task per file when files are under the split size,
    so 10⁶ tiny files = 10⁶ tasks of pure overhead.

    Local-FS implementation rewrites to a temp dir and swaps; on an
    object store you'd commit via manifest/rename conventions instead.
    Returns the new file count.
    """
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + "._compact_tmp"
    spark.read.parquet(path).repartition(n).write.mode(
        "overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n


def write_clustered(df: DataFrame, path: str, *keys: str,
                    num_files: int | None = None) -> None:
    """Range-clustered write: ``repartitionByRange`` on the leading key
    + ``sortWithinPartitions`` on all keys gives files with DISJOINT
    key ranges and sorted row groups — parquet min/max stats then let
    any engine skip whole files/row-groups for key predicates (the
    single-dimension analogue of Z-ordering, with no custom layout
    code: Spark's range partitioner does the clustering).

    ``num_files`` pins the output file count (otherwise AQE picks by
    size — which is what you want at scale, but coalesces tiny inputs
    to one file)."""
    cols = [df[k] for k in keys]
    parted = (df.repartitionByRange(num_files, *cols) if num_files
              else df.repartitionByRange(*cols))
    (parted.sortWithinPartitions(*keys)
     .write.mode("overwrite").parquet(path))
