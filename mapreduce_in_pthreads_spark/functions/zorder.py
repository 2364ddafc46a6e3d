"""Z-order (Morton) clustering key from pure Spark expressions.

Multi-dimensional layout: interleaving the bits of two key columns
gives a single sort key whose ranges are compact in BOTH dimensions —
files written range-partitioned on it carry narrow min/max envelopes
for each source column, so parquet stats prune scans filtered on
either one (what table formats call Z-ordering / liquid clustering).
Built entirely from shift/mask expressions — JVM codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns into one BIGINT sort key (a's bit i lands at 2i+1, b's at
    2i). Columns are masked to ``bits`` first, so out-of-range keys
    degrade to coarse bucketing instead of failing."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    mask = (1 << bits) - 1
    ca, cb = ca.bitwiseAND(F.lit(mask)), cb.bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)),
                        2 * i + 1).cast("bigint"))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)),
                        2 * i).cast("bigint"))
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   num_files: int, bits: int = 16) -> None:
    """Write parquet files clustered on the Morton key of two columns:
    range-partition + sort on the interleaved key, then drop it. Each
    output file covers a compact rectangle of (col_a, col_b) space."""
    keyed = df.withColumn("__z", zorder_key(col_a, col_b, bits))
    (keyed.repartitionByRange(num_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))
