"""Round-10 optimization pins.

The optimization round rewrote the exact-decimal aggregation machinery
(functions/numeric.py) onto hi/lo-split LONG sums and removed a
countDistinct from tfidf_top_terms. These tests pin the two claims the
rewrites rest on:

1. dsum/davg/split_sum/msum are BIT-IDENTICAL to the decimal
   formulations they replaced (the DuckDB oracle twins are unchanged,
   so any divergence is a driver FAIL);
2. doc_id is the documents PRIMARY KEY at every committed SF (the
   invariant that makes count(*) == count(DISTINCT doc_id) in
   tfidf_top_terms).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.functions.numeric import (
    DEC, davg, disc_rev_u, dsum, money_scaled, msum, scaled_long, split_sum)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")

# Adversarial doubles for the 4-dp HALF_UP equivalence: exact 4-dp
# ties, shortest-repr edge cases, negatives, nulls, large magnitudes,
# sub-ulp neighbors of ties.
ADVERSARIAL = [
    0.00005, -0.00005, 0.00015, -0.00015, 1.00005, 123.45675,
    0.1 + 0.2, 1e-5, -1e-5, 0.0, -0.0, 5e10, -5e10, 4.9999999999e10,
    12345.67891, -98765.43215, 0.123456789, 7.25e-4, None, 42.0,
    1.0000499999999999, 0.99995, -0.99995, 3.000049999999999,
]


@pytest.fixture(scope="module")
def adv_df(spark):
    rows = [(i, v) for i, v in enumerate(ADVERSARIAL)]
    return spark.createDataFrame(rows, "id bigint, x double")


def _one(df):
    return df.collect()[0]


def test_dsum_bit_identical_to_decimal_form(adv_df):
    old = adv_df.agg(F.sum(F.col("x").cast(DEC)).cast("double")
                     .alias("s"))
    new = adv_df.agg(dsum("x", "s"))
    assert repr(_one(old).s) == repr(_one(new).s)


def test_davg_bit_identical_to_decimal_form(adv_df):
    old = adv_df.agg((F.sum(F.col("x").cast(DEC)).cast("double")
                      / F.count("x")).alias("a"))
    new = adv_df.agg(davg("x", "a"))
    assert repr(_one(old).a) == repr(_one(new).a)


def test_dsum_grouped_with_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", -2.25), ("b", None), ("c", 0.00005)],
        "g string, x double")
    old = {r.g: repr(r.s) for r in df.groupBy("g").agg(
        F.sum(F.col("x").cast(DEC)).cast("double").alias("s")).collect()}
    new = {r.g: repr(r.s) for r in df.groupBy("g").agg(
        dsum("x", "s")).collect()}
    assert old == new
    assert new["b"] == "None"  # all-null group stays NULL, not 0


def test_scaled_long_matches_decimal_unscaled(adv_df):
    """round(round(x,4)*1e4) == unscaled(cast(x as decimal(25,4)))."""
    rows = adv_df.select(
        scaled_long("x").alias("u"),
        (F.col("x").cast(DEC) * F.lit(10000)).cast("long").alias("v"),
    ).collect()
    for r in rows:
        assert r.u == r.v


def test_split_sum_reconstructs_negatives(spark):
    vals = [3, -3, (1 << 40) + 123, -(1 << 40) - 123, 0, 7, -7,
            (1 << 22) - 1, -(1 << 22) + 1, 1 << 22, -(1 << 22)]
    df = spark.createDataFrame([(v,) for v in vals], "u bigint")
    got = df.agg(split_sum(F.col("u")).cast("long").alias("s")).collect()[0].s
    assert got == sum(vals)


def test_disc_rev_msum_bit_identical_to_decimal_product(spark):
    df = spark.createDataFrame(
        [(100.00, 0.05), (99.99, 0.0), (0.01, 0.10), (104999.91, 0.07),
         (55.55, 0.02), (None, 0.05), (12.34, None)],
        "l_extendedprice double, l_discount double")
    rev_dec = (F.col("l_extendedprice").cast("decimal(12,2)")
               * (F.lit(1).cast("decimal(3,2)")
                  - F.col("l_discount").cast("decimal(4,2)")))
    old = df.agg(F.sum(rev_dec).cast("double").alias("r"))
    new = df.agg(msum(disc_rev_u(), "r"))
    assert repr(_one(old).r) == repr(_one(new).r)


def test_money_scaled_negative_half_up(spark):
    """HALF_UP (away from zero) agreement on negative 2-dp money."""
    df = spark.createDataFrame(
        [(-1.25,), (-999.99,), (9999.99,), (-0.01,)], "x double")
    rows = df.select(
        money_scaled("x").alias("u"),
        (F.col("x").cast("decimal(12,2)") * F.lit(100)).cast("long")
        .alias("v")).collect()
    for r in rows:
        assert r.u == r.v


@pytest.mark.parametrize("sfd", SF_DIRS)
def test_doc_id_is_documents_primary_key(sfd):
    """Backs the tfidf_top_terms count(*) == count(DISTINCT doc_id)
    rewrite: one row per doc_id at every committed SF."""
    t = pq.read_table(f"{sfd}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids))


@pytest.mark.parametrize("sfd", SF_DIRS)
def test_o_orderkey_is_orders_primary_key(sfd):
    """Backs cogroup_reconcile's vectorized per-bucket reconcile (one
    header row per order) — same invariant the pre-r10 implementation
    relied on via iloc[0]."""
    t = pq.read_table(f"{sfd}/orders.parquet", columns=["o_orderkey"])
    ids = t.column("o_orderkey").to_pylist()
    assert len(ids) == len(set(ids))
