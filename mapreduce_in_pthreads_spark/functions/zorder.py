"""Z-order (Morton) clustering key from pure Spark expressions.

Multi-dimensional layout: interleaving the bits of two key columns
gives a single sort key whose ranges are compact in BOTH dimensions —
files written range-partitioned on it carry narrow min/max envelopes
for each source column, so parquet stats prune scans filtered on
either one (what table formats call Z-ordering / liquid clustering).
Built entirely from shift/mask expressions — JVM codegen, no UDF.

Interleaving only balances the dimensions when both columns occupy the
same effective bit-width: raw values with unequal ranges (e.g. a
~16-bit orderkey vs a ~11-bit partkey) put every high interleaved bit
on the wider column, collapsing the curve back to a 1-D sort. So the
key is built from min-max-scaled values — each column mapped into
[0, 2^bits) over its actual range — which costs one scalar min/max
aggregate over the input (4 numbers to the driver; at 100 TB that is
a single cheap combinable agg job, or substitute known catalog stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Min-max scale a numeric column into [0, 2^bits - 1]."""
    top = (1 << bits) - 1
    span = max(float(hi) - float(lo), 1.0)
    scaled = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(span)
                     * F.lit(float(top))).cast("bigint")
    # Clamp: values outside the advertised range degrade to the edge
    # buckets instead of corrupting the interleave.
    return F.greatest(F.lit(0), F.least(F.lit(top).cast("bigint"), scaled))


def zorder_key(a: Column | str, b: Column | str, bits: int = 16,
               a_range: tuple[float, float] | None = None,
               b_range: tuple[float, float] | None = None) -> Column:
    """Morton-interleave two integer columns into one BIGINT sort key
    (a's bit i lands at 2i+1, b's at 2i). When ``a_range``/``b_range``
    (min, max) are given, each column is min-max scaled into the full
    ``bits``-wide range first so both dimensions contribute equally to
    the high bits; without ranges, raw low bits are used (only correct
    when both columns already span ~2^bits)."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    if a_range is not None:
        ca = _scaled(ca, a_range[0], a_range[1], bits)
    if b_range is not None:
        cb = _scaled(cb, b_range[0], b_range[1], bits)
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
    min-max scale both into equal bit-widths (one scalar agg over the
    input), range-partition + sort on the interleaved key, then drop
    it. Each output file covers a compact rectangle of (col_a, col_b)
    space."""
    stats = df.agg(F.min(col_a), F.max(col_a),
                   F.min(col_b), F.max(col_b)).first()
    keyed = df.withColumn("__z", zorder_key(
        col_a, col_b, bits,
        a_range=(stats[0], stats[1]), b_range=(stats[2], stats[3])))
    (keyed.repartitionByRange(num_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))
