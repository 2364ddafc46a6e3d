"""Round-11 optimization pins.

1. split_sum_wide's division is EXACT for 4-dp inputs (ADVICE r10:
   the old decimal(38,0)/10^8 division had its scale capped at 6,
   silently HALF_UP-rounding 8-dp quotients — only ever exact because
   committed data is 2-dp);
2. the 2-dp data invariant the r10 money rewrites lean on
   (round(x*100) ≡ unscaled cast(x as decimal(12,2))) holds for every
   monetary column at every committed SF;
3. minhash signatures are materialized ONCE (narrow schema) and equal
   the inline expression they replaced;
4. tfidf's broadcast-join df equals the window-count df it replaced;
5. cogroup_reconcile's bucket count scales with the orders row count.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.functions.numeric import (
    money_scaled, split_sum_wide)
from mapreduce_in_pthreads_spark.sources.tables import (
    load_table, table_row_count_hint)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")


# --- 1. split_sum_wide exact division ------------------------------------

# 4-dp unscaled longs whose Σu², Σuv quotients by 10^8 carry a full 8
# fractional digits (indivisible by 100) — the case the old capped-at-6
# division rounded. Includes negatives (sxy-style cross moments).
U4 = [1111, 2357, -9973, 40009, 123457, -31, 7, 999983]
V4 = [-2221, 911, 131071, -3, 524287, 10007, -777215, 23]


def _exact_double(num: int, den: int) -> float:
    return float(Fraction(num, den))


def test_split_sum_wide_4dp_quotient_exact(spark):
    df = spark.createDataFrame(
        [(u, v) for u, v in zip(U4, V4)], "u long, v long")
    got = df.agg(
        split_sum_wide(F.col("u") * F.col("u"), 10 ** 8)
        .cast("double").alias("sxx"),
        split_sum_wide(F.col("u") * F.col("v"), 10 ** 8)
        .cast("double").alias("sxy")).collect()[0]
    sxx = sum(u * u for u in U4)
    sxy = sum(u * v for u, v in zip(U4, V4))
    assert sxx % 100 != 0 and sxy % 100 != 0  # adversarial: true 8-dp
    assert repr(got.sxx) == repr(_exact_double(sxx, 10 ** 8))
    assert repr(got.sxy) == repr(_exact_double(sxy, 10 ** 8))


def test_split_sum_wide_no_div_still_exact_integer(spark):
    df = spark.createDataFrame([(u,) for u in U4], "u long")
    got = df.agg(split_sum_wide(F.col("u") * F.col("u"))
                 .cast("string").alias("s")).collect()[0].s
    assert int(got) == sum(u * u for u in U4)


# --- 2. the 2-dp money invariant ------------------------------------------

MONEY_COLS = [
    ("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
    ("lineitem", "l_tax"), ("orders", "o_totalprice"),
    ("part", "p_retailprice"), ("customer", "c_acctbal"),
    ("events", "value"),
]


@pytest.mark.parametrize("sfd", SF_DIRS)
def test_money_columns_are_exactly_2dp(spark, sfd):
    """round(x*100) must equal the unscaled value of
    cast(x as decimal(12,2)) on EVERY row — the equivalence q1's
    cents/bp rewrite (and every money_scaled call) rests on. Only
    genuinely-2-dp stored doubles satisfy it."""
    for table, col in MONEY_COLS:
        df = load_table(spark, sfd, table)
        bad = df.filter(
            money_scaled(col)
            != (F.col(col).cast("decimal(12,2)") * 100).cast("long")
        ).count()
        assert bad == 0, f"{sfd}/{table}.{col}: {bad} non-2dp rows"


# --- 3. minhash signature materialization ---------------------------------

def test_minhash_signatures_narrow_and_equal_inline(spark):
    from mapreduce_in_pthreads_spark.operators.dedup import (
        HASH_FAMILY, N_HASHES, P_MINHASH, _minhash_signatures,
        _shingle_sets)

    sets = _shingle_sets(spark, SF_DIRS[0])
    sig = _minhash_signatures(sets)
    # narrow: doc_id + mh0..7 only (callers take shset from `sets`)
    assert sig.columns == ["doc_id"] + [f"mh{i}" for i in range(N_HASHES)]
    # materialized: no Generate/scan subtree left in the plan
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan and "Generate" not in plan
    # values equal the inline expression they replaced
    hashed = sets.withColumn(
        "harr",
        F.transform("shset",
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
                    .cast("bigint") % P_MINHASH))
    inline = hashed.select(
        "doc_id",
        *[F.array_min(F.transform(
            "harr", (lambda aa, bb: lambda h:
                     (F.lit(aa) * h + F.lit(bb)) % P_MINHASH)(a, b)))
          .alias(f"mh{i}")
          for i, (a, b) in enumerate(HASH_FAMILY)])
    got = {r.doc_id: tuple(r)[1:] for r in sig.collect()}
    want = {r.doc_id: tuple(r)[1:] for r in inline.collect()}
    assert got == want


# --- 4. tfidf df: broadcast-join aggregate ≡ window count ------------------

def test_tfidf_df_equals_window_formulation(spark):
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIRS[0], "documents")
    tok = docs.select("doc_id",
                      F.explode(F.split("text", " ")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    via_window = {(r.doc_id, r.word): r.df for r in tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("word")))
        .collect()}
    # the implementation's reuse-friendly form: tf >= 1 always, so
    # sum(when(tf>=1,1)) IS the row count per word
    df_rel = tf.groupBy("word").agg(
        F.sum(F.when(F.col("tf") >= 1, F.lit(1))).alias("df"))
    via_join = {(r.doc_id, r.word): r.df for r in
                tf.join(F.broadcast(df_rel), "word").collect()}
    assert via_join == via_window


def test_embeddings_parallel_loader(spark):
    """load_embeddings_parallel must spread the single-file embeddings
    scan to the session parallelism (the per-pair/per-row vector
    stages otherwise inherit 1-2 tasks — the r11 17.7x
    embedding_near_dup find) while keeping rows identical."""
    from mapreduce_in_pthreads_spark.sources.tables import (
        load_embeddings_parallel, load_table)

    par = spark.sparkContext.defaultParallelism
    wide = load_embeddings_parallel(spark, SF_DIRS[0])
    assert wide.rdd.getNumPartitions() == par
    a = sorted(tuple(r) for r in wide.collect())
    b = sorted(tuple(r) for r in
               load_table(spark, SF_DIRS[0], "embeddings").collect())
    assert a == b
    # the flagship consumer really rides it: round-robin exchange in plan
    from mapreduce_in_pthreads_spark.operators.similarity import (
        ann_topk_bruteforce)
    plan = (ann_topk_bruteforce(spark, SF_DIRS[0])
            ._jdf.queryExecution().executedPlan().toString())
    assert "roundrobin" in plan.lower(), plan[:500]


def test_duplicate_spans_gram_exchange_reuse_fires(spark):
    """The shuffle_hash hint exists so the two gram-join sides become
    canonical twins and AQE materializes the gram relation ONCE —
    without it the planner broadcasts the corpus-sized cold side and
    re-evaluates gram generation per side."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        duplicate_spans)

    q = duplicate_spans(spark, SF_DIRS[0])
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1


def test_tfidf_exchange_reuse_fires(spark):
    """The whole point of the sum(when(...)) form: the df branch must
    REUSE the tf exchange at AQE runtime instead of re-scanning +
    re-exploding the corpus."""
    from mapreduce_in_pthreads_spark.operators.text_analysis import (
        tfidf_top_terms)

    q = tfidf_top_terms(spark, SF_DIRS[0])
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1


# --- 5. cogroup bucket scaling ---------------------------------------------

def test_reconcile_buckets_scale_with_orders():
    from mapreduce_in_pthreads_spark.operators.udfs import (
        RECONCILE_MIN_BUCKETS, RECONCILE_TARGET_ORDERS_PER_BUCKET,
        _reconcile_buckets)

    for sfd in SF_DIRS:
        n = table_row_count_hint(sfd, "orders")
        b = _reconcile_buckets(sfd)
        assert b >= RECONCILE_MIN_BUCKETS
        # per-bucket order count stays bounded by the target (+1 for
        # integer division) — the 100 TB memory contract
        assert n / b <= RECONCILE_TARGET_ORDERS_PER_BUCKET + 1
    # no footer stats → the r10 constant
    assert _reconcile_buckets("/nonexistent") == RECONCILE_MIN_BUCKETS
