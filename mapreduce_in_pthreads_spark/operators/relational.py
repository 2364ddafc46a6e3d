"""Core relational surface: scan → project/filter → aggregate → sort/top-k,
grouping sets, set ops, scalar functions (SURVEY.md §2.3 rows 1-4, 7-9).

The reference has exactly one projection (lowercase+trim, mapreduce.c:
110-111), one predicate (drop-empty, :112-114) and one aggregation
(collect-list, :168-185); this module is the full relational
generalization of those three shapes, expressed declaratively so
Catalyst gets predicate pushdown / column pruning / partial aggregation
— none of which the reference could do (SURVEY.md §4.2).

Scale notes: every aggregate here is map-side combinable (sums/counts/
min/max over decimals); filters sit directly on the parquet scan
(PushedFilters); top-k is `orderBy().limit(k)` which Spark executes as
TakeOrderedAndProject — per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum, split_sum, sql_davg, sql_dsum
from ..sources.tables import load_table


# --- TPC-H Q1 shape: big scan, few groups, many partial aggregates -----

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem (TPC-H Q1 shape). The classic
    map-side-combine showcase: 4 groups regardless of data size, so the
    shuffle carries only #partitions × 4 rows at any scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02"))
    # Exact fixed-point arithmetic on the 2-dp sources, run on LONGS
    # (optimization r10, guide §2.3 narrower types): the decimal form
    # money(p)*(1.00-rate(d)) = (12,2)*(3,2) → (16,4), *(3,2) → (20,6)
    # left the compact-long decimal representation and paid a
    # BigDecimal multiply + add per row (measured 2.1 s → 1.0 s at
    # sf0.1). cents·(100-bp) / 1e4 and cents·(100-bp)·(100+tx) / 1e6
    # are the SAME exact rationals — products of unscaled integers —
    # summed via numeric.split_sum (exact, overflow-safe past 10^12
    # rows) and converted to double once per group. Bit-identical to
    # the decimal form; the DuckDB oracle twin is unchanged.
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    bp = F.round(F.col("l_discount") * 100).cast("long")
    tx = F.round(F.col("l_tax") * 100).cast("long")
    disc_u = cents * (100 - bp)             # unscaled 1e-4 dollars
    charge_u = disc_u * (100 + tx)          # unscaled 1e-6 dollars
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            split_sum(disc_u, 10 ** 4).cast("double")
            .alias("sum_disc_price"),
            split_sum(charge_u, 10 ** 6).cast("double")
            .alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
            AS DOUBLE) AS sum_charge,
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective scan-filter-sum (TPC-H Q6 shape) — all three
    predicates push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q6_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heaps, no full sort). Tie-broken on the key for determinism."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOP_K_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group-by + HAVING: nations with enough customers, with a
    decimal-stable average balance."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             davg("c_acctbal", "avg_acctbal"),
             F.min("c_acctbal").alias("min_acctbal"),
             F.max("c_acctbal").alias("max_acctbal"))
        .filter(F.col("n_customers") > 20)
    )


GROUP_HAVING_SQL = f"""
SELECT c_nationkey, count(*) AS n_customers,
       {sql_davg('c_acctbal', 'avg_acctbal')},
       min(c_acctbal) AS min_acctbal,
       max(c_acctbal) AS max_acctbal
FROM customer GROUP BY c_nationkey HAVING count(*) > 20
"""


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase aggregate,
    both phases partial-aggregable."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"),
             F.countDistinct("o_orderpriority").alias("n_priorities"),
             F.count(F.lit(1)).alias("n_orders"))
    )


DISTINCT_AGG_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


APPROX_DISTINCT_BOUND = 0.05  # documented |HLL++ − exact|/exact at rsd=0.02


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the sketch the reference
    could never afford to skip (it kept every occurrence in memory,
    mapreduce.c:170-174) — reported as a BOUNDED-ERROR AUDIT: the
    sketch estimates are engine-internal (DuckDB's HLL registers differ
    bit-for-bit from Spark's, so the raw estimates can never hash-match
    an oracle), so the OUTPUT is the exact NDVs plus within-bound flags
    asserting |approx − exact|/exact ≤ 5% (the unit-test band for
    rsd=0.02, deterministic: HLL++ is hash-based, no RNG). The oracle
    pins the exact counts and flags=1, upgrading this entry from the
    driver's rows-only check to a real driver-adjudicated error-bound
    check (VERDICT r8 item 7). At 100 TB the sketch is the product and
    the exact distinct is the audit you run on a sampled partition.
    """
    agg = load_table(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("a_ord"),
        F.approx_count_distinct("l_partkey", 0.02).alias("a_part"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"))

    def ok(a: str, e: str) -> Column:
        rel = (F.abs(F.col(a).cast("double") - F.col(e).cast("double"))
               / F.col(e).cast("double"))
        return (rel <= APPROX_DISTINCT_BOUND).cast("long")

    return agg.select(
        "exact_orders", "exact_parts",
        ok("a_ord", "exact_orders").alias("orders_within_bound"),
        ok("a_part", "exact_parts").alias("parts_within_bound"))


APPROX_DISTINCT_SQL = """
SELECT count(DISTINCT l_orderkey) AS exact_orders,
       count(DISTINCT l_partkey)  AS exact_parts,
       CAST(1 AS BIGINT) AS orders_within_bound,
       CAST(1 AS BIGINT) AS parts_within_bound
FROM lineitem
"""


def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
    )
    return (
        li.withColumn("qty_bucket", bucket)
        .groupBy("qty_bucket")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"),
             F.count(F.when(F.col("l_returnflag") == "R", 1))
             .alias("n_returned"))
    )


CASE_WHEN_SQL = f"""
SELECT CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'medium'
            ELSE 'large' END AS qty_bucket,
       count(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
FROM lineitem GROUP BY 1
"""


def in_between_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + null-safe predicates, all pushdown-eligible."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_acctbal").between(100.0, 5000.0)
            & F.col("c_name").isNotNull()
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


IN_BETWEEN_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal BETWEEN 100.0 AND 5000.0
  AND c_name IS NOT NULL
"""


def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: upper/substr/concat_ws/split/regexp/
    length/lpad — all codegen'd JVM expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "[^0-9]", "").alias("brand_num"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 5) AS name_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
       string_split(p_type, ' ')[1] AS type_first,
       length(p_name) AS name_len,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: extract, trunc, diff, format. Output kept in
    engine-neutral types (ints + strings) so the oracle hash is stable."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month_start"),
        F.datediff(F.lit("2002-01-01"), F.col("o_orderdate"))
        .alias("days_to_2002"),
    )


DATE_FUNCTIONS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CAST(day(o_orderdate) AS INT) AS order_day,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT)
           AS days_to_2002
FROM orders
"""


# --- grouping sets -------------------------------------------------------

def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over orders: subtotals + grand total; GROUPING() columns
    disambiguate rollup nulls from data nulls."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice", "sum_price"),
             F.grouping("o_orderstatus").cast("int").alias("g_status"),
             F.grouping("o_orderpriority").cast("int").alias("g_priority"))
    )


ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice', 'sum_price')},
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over lineitem return flag × line status."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum("l_quantity", "sum_qty"),
             F.grouping("l_returnflag").cast("int").alias("g_flag"),
             F.grouping("l_linestatus").cast("int").alias("g_status"))
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       {sql_dsum('l_quantity', 'sum_qty')},
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- set operations ------------------------------------------------------

def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of tagged key sets (customer vs supplier nations)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("side"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("side"))
    return c.unionAll(s).groupBy("nationkey", "side").agg(
        F.count(F.lit(1)).alias("n"))


SET_UNION_SQL = """
SELECT nationkey, side, count(*) AS n FROM (
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
) GROUP BY nationkey, side
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers
    and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT DISTINCT (exceptAll would only remove one
    # occurrence per right row from the left multiset)
    return c.subtract(s)


SET_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics): customers' order months
    present in BOTH 1996 and 1997, keeping min(count96, count97)
    duplicates per (custkey, month) — the bag overlap, not the set."""
    o = load_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return (o.filter(F.year("o_orderdate") == year)
                .select("o_custkey",
                        F.month("o_orderdate").cast("bigint")
                        .alias("o_month")))

    return (keys(1996).intersectAll(keys(1997))
            .groupBy("o_custkey", "o_month")
            .agg(F.count(F.lit(1)).alias("n")))


SET_INTERSECT_ALL_SQL = """
SELECT o_custkey, o_month, count(*) AS n FROM (
    SELECT o_custkey, CAST(month(o_orderdate) AS BIGINT) AS o_month
    FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT ALL
    SELECT o_custkey, CAST(month(o_orderdate) AS BIGINT) AS o_month
    FROM orders WHERE year(o_orderdate) = 1997
) GROUP BY o_custkey, o_month
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics): 1996 order months with each
    1997 occurrence removing only ONE matching 1996 occurrence —
    count96 − count97 surviving duplicates, vs EXCEPT's all-or-
    nothing."""
    o = load_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return (o.filter(F.year("o_orderdate") == year)
                .select("o_custkey",
                        F.month("o_orderdate").cast("bigint")
                        .alias("o_month")))

    return (keys(1996).exceptAll(keys(1997))
            .groupBy("o_custkey", "o_month")
            .agg(F.count(F.lit(1)).alias("n")))


SET_EXCEPT_ALL_SQL = """
SELECT o_custkey, o_month, count(*) AS n FROM (
    SELECT o_custkey, CAST(month(o_orderdate) AS BIGINT) AS o_month
    FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT ALL
    SELECT o_custkey, CAST(month(o_orderdate) AS BIGINT) AS o_month
    FROM orders WHERE year(o_orderdate) = 1997
) GROUP BY o_custkey, o_month
"""
