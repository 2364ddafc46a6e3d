"""Invariant tests for the extended SQL surface — properties the
oracle hash can't see (bounds, structural guarantees), mirroring the
metamorphic strategy of SURVEY.md §5.2."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.plans.registry import REGISTRY

from .conftest import SF_SMOKE


def test_recursive_split_halves_exactly(spark):
    df = REGISTRY["recursive_cte_split"].fn(spark, SF_SMOKE).cache()
    rows = df.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.o_orderkey, {})[r.lvl] = r.amount
    assert by_key, "seed filter matched no orders"
    for key, levels in by_key.items():
        assert set(levels) == set(range(len(levels))), "levels contiguous"
        for lvl in range(1, len(levels)):
            # halving a double is exact: binary exponent decrement
            assert levels[lvl] == levels[lvl - 1] / 2
        assert levels[len(levels) - 1] >= 1000
        assert levels[len(levels) - 1] / 2 < 1000
    df.unpersist()


def test_scd2_partitions_user_timeline(spark):
    df = REGISTRY["scd2_dimension"].fn(spark, SF_SMOKE).cache()
    # exactly one open (current) version per user
    open_counts = (df.groupBy("user_id")
                   .agg(F.count_if(F.col("is_current")).alias("n_open"))
                   .agg(F.min("n_open"), F.max("n_open")).first())
    assert open_counts == (1, 1)
    # versions chain: each valid_to equals the next valid_from (no gaps,
    # no overlaps), verified by recomputing the successor with a window
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("valid_from_us")
    chained = (df.withColumn("next_from", F.lead("valid_from_us").over(w))
               .filter(F.col("valid_to_us").isNotNull())
               .filter(F.col("valid_to_us") != F.col("next_from")))
    assert chained.count() == 0
    # consecutive versions always change the attribute
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    same = (df.withColumn("prev_attr", F.lag("attr").over(w2))
            .filter(F.col("attr") == F.col("prev_attr")))
    assert same.count() == 0
    df.unpersist()


def test_token_entropy_bounds(spark):
    df = REGISTRY["token_entropy"].fn(spark, SF_SMOKE)
    bad = df.filter(
        (F.col("entropy") < 0)
        | (F.col("entropy") > F.round(F.log(F.col("n_distinct")
                                            .cast("double")), 6) + 1e-6))
    assert bad.count() == 0
    # a uniform single-word doc has zero entropy
    one_word = df.filter(F.col("n_distinct") == 1)
    assert one_word.filter(F.col("entropy") != 0.0).count() == 0


def test_map_higher_order_consistency(spark):
    df = REGISTRY["map_higher_order"].fn(spark, SF_SMOKE)
    # n_repeated equals the number of entries rendered in the summary
    mismatch = df.filter(
        F.when(F.col("n_repeated") == 0, F.col("repeated_summary") != "")
        .otherwise(F.size(F.split("repeated_summary", ","))
                   != F.col("n_repeated")))
    assert mismatch.count() == 0


def test_url_parse_roundtrip(spark):
    df = REGISTRY["url_parse_surface"].fn(spark, SF_SMOKE)
    # host constant, path embeds the partkey, query param echoes p_size
    bad = df.filter(
        (F.col("host") != "shop.example.com")
        | ~F.col("path").endswith(F.concat(F.lit("/"),
                                           F.col("p_partkey").cast("string")))
        | F.col("q_size").isNull())
    assert bad.count() == 0


def test_regression_r2_within_unit_interval(spark):
    rows = REGISTRY["regression_metrics"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        assert math.isfinite(r.slope) and math.isfinite(r.intercept)


def test_catalog_register_all_sql_join(spark):
    from mapreduce_in_pthreads_spark.sources.catalog import register_all

    views = register_all(spark, SF_SMOKE, prefix="cat_")
    assert len(views) == 10
    row = spark.sql("""
        SELECT r.r_name, count(*) AS n_nations
        FROM cat_nation n JOIN cat_region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """).collect()
    assert sum(r.n_nations for r in row) == spark.table("cat_nation").count()


def test_ordered_funnel_monotone(spark):
    rows = {r.stage: r.n_users
            for r in REGISTRY["ordered_funnel"].fn(spark, SF_SMOKE).collect()}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view>click>purchase"] >= 0


def test_ordered_funnel_empty_stage_matches_oracle(spark, tmp_path):
    """ADVICE r3 (medium): with an empty funnel stage the oracle's
    GROUP BY emits no row for it, and the Spark stack() must not emit
    a (stage, 0) row either. Dataset: views and clicks in order, but
    every purchase happens BEFORE the user's first click — the
    strictly-after rule leaves the purchase stage empty."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: view@0, purchase@5 (before click), click@10
        (1, ts(0), 1, "view"), (2, ts(5), 1, "purchase"),
        (3, ts(10), 1, "click"),
        # user 2: view then click, no purchase at all
        (4, ts(0), 2, "view"), (5, ts(7), 2, "click"),
        # user 3: only a click — joins no stage
        (6, ts(3), 3, "click"),
    ]
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    q = REGISTRY["ordered_funnel"]
    got = {r.stage: r.n_users
           for r in q.fn(spark, str(tmp_path)).collect()}
    assert got == {"view": 2, "view>click": 2}, got

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = dict(con.sql(q.oracle).fetchall())
    assert got == want
