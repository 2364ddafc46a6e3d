"""Storage-layout and source-format coverage:

- partition pruning: a lang-partitioned write must produce scans whose
  PartitionFilters prune to one directory (the layout decision that
  turns a 100 TB scan into a 4 TB scan);
- CSV and JSON sources round-trip through the engine with schemas
  preserved (beyond the parquet-only driver surface).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.sources.sinks import write_partitioned
from mapreduce_in_pthreads_spark.sources.tables import load_table

SCRATCH = Path("/root/repo/.scratch")


def test_partition_pruning_after_partitioned_write(spark, sf_dir):
    out = str(SCRATCH / "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents")
    write_partitioned(docs, out, partition_cols=["lang"])
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:120]
    # pruned result matches the unpartitioned filter
    assert back.count() == docs.filter(F.col("lang") == "en").count()
    shutil.rmtree(out, ignore_errors=True)


def test_csv_source_round_trip(spark, sf_dir):
    out = str(SCRATCH / "customer_csv")
    c = load_table(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    back = (spark.read.option("header", True)
            .schema(c.schema).csv(out))
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, c.collect())))
    shutil.rmtree(out, ignore_errors=True)


def test_json_source_round_trip(spark, sf_dir):
    out = str(SCRATCH / "nation_json")
    n = load_table(spark, sf_dir, "nation")
    n.write.mode("overwrite").json(out)
    back = spark.read.schema(n.schema).json(out)
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, n.collect())))
    shutil.rmtree(out, ignore_errors=True)


def test_approx_quantiles_bounded(spark, sf_dir):
    """Audit panel: group counts match recomputation and the
    sketch-vs-exact-percentile within-5% flags (the driver-adjudicated
    bound) hold for every event type."""
    from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

    rows = {r.event_type: r for r in
            REGISTRY["approx_quantiles_events"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    counts = {r.event_type: r.n for r in
              ev.groupBy("event_type").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(rows) == set(counts)
    for et, r in rows.items():
        assert r.n_values == counts[et]
        assert r.median_within_bound == 1, et
        assert r.p99_within_bound == 1, et


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key at the same bucket count
    must SortMergeJoin with ZERO Exchange operators — the co-located
    join contract bucketing exists for."""
    from mapreduce_in_pthreads_spark.sources.sinks import write_bucketed
    from mapreduce_in_pthreads_spark.sources.tables import load_table
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    write_bucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "orders_b", "o_custkey")
    write_bucketed(c.select("c_custkey", "c_acctbal"),
                   "customer_b", "c_custkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the co-location claim is actually tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (spark.table("orders_b")
             .join(spark.table("customer_b"),
                   F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
                  .cast("double").alias("total")))
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p
        # no exchange anywhere: the join reads bucket-aligned files and
        # the aggregate rides the same clustering (custkey ⊂ group keys)
        assert "Exchange" not in p
        # sanity: result matches the unbucketed plan
        expect = (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
                  .groupBy("c_custkey")
                  .agg(F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
                       .cast("double").alias("total")))
        assert (sorted(map(tuple, j.collect()))
                == sorted(map(tuple, expect.collect())))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_orc_source_round_trip(spark, sf_dir):
    """ORC is the remaining first-class columnar source/sink: values,
    schema, and predicate pushdown all survive the round trip."""
    out = str(SCRATCH / "orders_orc")
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == o.schema
    assert back.count() == o.count()
    # pushdown reaches the ORC scan
    plan = (back.filter(F.col("o_totalprice") > 1000)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(o_totalprice), " \
           "GreaterThan(o_totalprice,1000.0)]" in plan
    shutil.rmtree(out, ignore_errors=True)


def test_dynamic_partition_overwrite_backfill(spark, sf_dir):
    """Incremental backfill contract: with dynamic partitionOverwrite,
    rewriting ONE lang's data must leave every other partition's files
    untouched — the idempotent-backfill pattern for daily reruns at
    scale (static mode would wipe the whole table first)."""
    out = str(SCRATCH / "docs_by_lang_dpo")
    docs = load_table(spark, sf_dir, "documents")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
        langs = [r.lang for r in docs.select("lang").distinct().collect()]
        target = sorted(langs)[0]
        before = docs.count()
        # backfill one partition with a marker rewrite
        (docs.filter(F.col("lang") == target)
         .withColumn("source", F.lit("backfilled"))
         .write.mode("overwrite").partitionBy("lang").parquet(out))
        back = spark.read.parquet(out)
        assert back.count() == before          # nothing else was dropped
        assert (back.filter(F.col("lang") == target)
                .filter(F.col("source") != "backfilled").count() == 0)
        assert (back.filter(F.col("lang") != target)
                .filter(F.col("source") == "backfilled").count() == 0)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(out, ignore_errors=True)


def test_join_strategy_hints_honored(spark, sf_dir):
    """Join-strategy intent must be controllable per join: a merge hint
    forces SortMergeJoin and a shuffle_hash hint forces ShuffledHashJoin
    even when the side is broadcast-sized."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    merge_plan = (o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
                  ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in merge_plan
    hash_plan = (o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
                 ._jdf.queryExecution().executedPlan().toString())
    assert "ShuffledHashJoin" in hash_plan


def test_xml_source_round_trip(spark, sf_dir):
    """Native XML (Spark 4): values and schema survive the round trip
    — completes the source matrix (parquet/CSV/JSON/ORC/XML/text/
    binary/wordline)."""
    out = str(SCRATCH / "nation_xml")
    n = load_table(spark, sf_dir, "nation")
    (n.write.mode("overwrite")
     .option("rootTag", "nations").option("rowTag", "nation").xml(out))
    back = spark.read.option("rowTag", "nation").schema(n.schema).xml(out)
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, n.collect())))
    shutil.rmtree(out, ignore_errors=True)


def test_compact_small_files(spark, sf_dir, tmp_path):
    import glob

    from mapreduce_in_pthreads_spark.sources.sinks import compact
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    path = str(tmp_path / "docs")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(40).write.parquet(path)
    before_files = glob.glob(f"{path}/*.parquet")
    assert len(before_files) == 40
    total = sum(__import__("os").path.getsize(f) for f in before_files)
    before_rows = docs.count()
    before_chars = docs.agg({"n_chars": "sum"}).first()[0]

    n = compact(spark, path, target_file_bytes=max(1, total // 3))
    after_files = glob.glob(f"{path}/*.parquet")
    assert len(after_files) == n <= 5
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.agg({"n_chars": "sum"}).first()[0] == before_chars


def test_clustered_write_disjoint_ranges(spark, sf_dir, tmp_path):
    import glob

    from mapreduce_in_pthreads_spark.sources.sinks import write_clustered
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    path = str(tmp_path / "clustered")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered(orders.repartition(8), path, "o_orderkey",
                    num_files=6)

    from pyspark.sql import functions as F
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min("o_orderkey"), F.max("o_orderkey")).first()
        if r[0] is not None:
            spans.append((r[0], r[1]))
    spans.sort()
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file key ranges must be disjoint"


def test_zorder_layout_compact_in_both_dimensions(spark, sf_dir, tmp_path):
    """Files written z-ordered on (l_orderkey, l_partkey) must carry
    narrow min/max envelopes in BOTH columns; a single-column sort
    would leave the second column's per-file span at ~full range."""
    import glob

    from pyspark.sql import functions as F

    from mapreduce_in_pthreads_spark.functions.zorder import write_zordered
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    path = str(tmp_path / "zordered")
    write_zordered(li, path, "l_orderkey", "l_partkey", num_files=16)

    glob_span = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("a"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("b")).first()
    spans_a, spans_b = [], []
    for f in glob.glob(f"{path}/*.parquet"):
        r = spark.read.parquet(f).agg(
            F.min("l_orderkey"), F.max("l_orderkey"),
            F.min("l_partkey"), F.max("l_partkey")).first()
        if r[0] is None:
            continue
        spans_a.append(r[1] - r[0])
        spans_b.append(r[3] - r[2])
    assert len(spans_a) >= 8
    # 16 files ~ 4x4 grid: expect per-file spans well under the global
    # span in BOTH dimensions (a 1-D sort gives ~1.0 on the other axis)
    avg_a = sum(spans_a) / len(spans_a) / glob_span.a
    avg_b = sum(spans_b) / len(spans_b) / glob_span.b
    assert avg_a < 0.6, avg_a
    assert avg_b < 0.6, avg_b


def test_ignore_corrupt_files_contract(spark, sf_dir, tmp_path):
    """Dirty-lake resilience: with spark.sql.files.ignoreCorruptFiles a
    corrupt parquet part is skipped, not fatal — rows from healthy
    parts survive (the 100 TB reality: a million-file lake always has
    a few truncated writes; one bad part must not kill the job). The
    default (strict) mode must still raise, so corruption is never
    silently ignored unless opted into."""
    import shutil

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", mixed / "part-0000.parquet")
    (mixed / "part-0001.parquet").write_bytes(
        b"PAR1 this is not a real parquet footer")

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(str(mixed)).count() == 25
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    with _pytest.raises((Py4JJavaError, CapturedException)):
        spark.read.parquet(str(mixed)).count()


def test_parquet_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Schema evolution contract: a shard written BEFORE a column was
    added and a shard written after coexist in one table when read
    with mergeSchema — the old shard's missing column reads as NULL,
    and the unified schema is the superset. This is the append-only
    ingestion reality at 100 TB: producers upgrade schemas mid-corpus
    and readers must not re-write history."""
    from pyspark.sql import functions as F
    from mapreduce_in_pthreads_spark.sources.tables import load_table

    out = str(tmp_path / "evolved")
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").limit(5).write.parquet(out)
    (docs.select("doc_id", "text", "lang").limit(7)
     .write.mode("append").parquet(out))

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    assert merged.count() == 12
    # rows from the pre-evolution shard surface the new column as NULL
    assert merged.filter(F.col("lang").isNull()).count() == 5
    assert merged.filter(F.col("lang").isNotNull()).count() == 7


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing is the layout that deletes the join shuffle outright:
    two tables bucketed+sorted on the join key with equal bucket
    counts must SortMergeJoin with ZERO Exchange operators — at 100 TB
    this is the difference between shuffling both fact tables every
    run and never shuffling them again after one write. (Broadcast is
    disabled inside the test so the bucketed path, not a dim-ship,
    is what proves out.)"""
    from pyspark.sql import functions as F

    from mapreduce_in_pthreads_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .option("path", str(tmp_path / "orders_b"))
     .mode("overwrite").saveAsTable("t_orders_bucketed"))
    (cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .option("path", str(tmp_path / "cust_b"))
     .mode("overwrite").saveAsTable("t_cust_bucketed"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("t_orders_bucketed")
             .join(spark.table("t_cust_bucketed"),
                   F.col("o_custkey") == F.col("c_custkey")))
        n = j.count()
        assert n == orders.count()  # FK: every order has its customer
        exe = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in exe
        assert "Exchange" not in exe, exe
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_cust_bucketed")


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning: a partitioned fact joined to a
    FILTERED dim must plan a dynamicpruning subquery on the partition
    column — at 100 TB this is the difference between scanning every
    lang partition and scanning the one the dim selects (the
    runtime sibling of the static pruning this file already pins)."""
    from .conftest import SF_CORRECT

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    part = spark.read.parquet(out)
    dim = (spark.createDataFrame(
        [("en", 1), ("fr", 2)], ["lang", "prio"])
        .filter(F.col("prio") == 1))
    j = part.join(dim, "lang").groupBy("lang").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result really is only the selected partition
    rows = j.collect()
    assert [r["lang"] for r in rows] == ["en"]
