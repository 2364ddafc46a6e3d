"""Loader-contract tests: parquet dtype drift (the round-2 killer) and
session-conf hygiene (VERDICT r3 items 4 & 6, ADVICE r3 streaming conf
leak). The probe test is the round-start tripwire: it fails loudly the
moment driver testdata drifts from the loaders' assumptions, before the
driver's correctness gate does."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.sources.tables import (
    TABLES, _load_events, load_table)

from .conftest import SF_SMOKE

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.isdir(d)]

# The exact arrow schema every loader/oracle assumes, pinned from the
# driver-generated parquet. events.ts is the one column with a history
# of drift (NANOS in round 2, MICROS now) — any timestamp unit is
# accepted there because _load_events handles all of them; everything
# else must match exactly.
EXPECTED = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [("n_nationkey", "int32"), ("n_name", "string"),
               ("n_regionkey", "int32")],
    "customer": [("c_custkey", "int64"), ("c_name", "string"),
                 ("c_nationkey", "int32"), ("c_acctbal", "double"),
                 ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "int64"), ("s_name", "string"),
                 ("s_nationkey", "int32"), ("s_acctbal", "double")],
    "part": [("p_partkey", "int64"), ("p_name", "string"),
             ("p_brand", "string"), ("p_type", "string"),
             ("p_size", "int32"), ("p_retailprice", "double")],
    "orders": [("o_orderkey", "int64"), ("o_custkey", "int64"),
               ("o_orderstatus", "string"), ("o_totalprice", "double"),
               ("o_orderdate", "timestamp"), ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "int64"), ("l_partkey", "int64"),
                 ("l_suppkey", "int64"), ("l_linenumber", "int32"),
                 ("l_quantity", "double"), ("l_extendedprice", "double"),
                 ("l_discount", "double"), ("l_tax", "double"),
                 ("l_returnflag", "string"), ("l_linestatus", "string"),
                 ("l_shipdate", "timestamp")],
    "events": [("event_id", "int64"), ("ts", "timestamp"),
               ("user_id", "int64"), ("event_type", "string"),
               ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "int64"), ("text", "string"),
                  ("lang", "string"), ("source", "string"),
                  ("n_chars", "int64")],
    "embeddings": [("vec_id", "int64"),
                   ("embedding", "list<element: float>"),
                   ("label", "int32")],
}


def _type_token(t: pa.DataType) -> str:
    """Collapse timestamp unit/tz variants to 'timestamp' — the loaders
    normalize those; every other type must match verbatim."""
    return "timestamp" if pa.types.is_timestamp(t) else str(t)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_testdata_dtype_probe(sf_dir):
    """Round-start tripwire: pq.read_schema on every table at every SF,
    diffed against the loaders' pinned assumptions (VERDICT r3 item 6)."""
    for name in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{name}.parquet"))
        got = [(f.name, _type_token(f.type)) for f in schema]
        assert got == EXPECTED[name], (
            f"TESTDATA DRIFT in {sf_dir}/{name}.parquet:\n"
            f"  got      {got}\n  expected {EXPECTED[name]}\n"
            "Update sources/tables.py loaders AND the oracle SQL before "
            "the driver's correctness gate hits this.")


def _conf_snapshot(spark):
    return (spark.conf.get("spark.sql.session.timeZone"),
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None))


def test_load_events_under_weird_session_tz(spark):
    """VERDICT r3 item 4 'done' criterion: load_table('events') under a
    deliberately weird session zone must (a) leave the session conf
    exactly as it found it and (b) still yield the same stored instants
    DuckDB reads naively-as-UTC."""
    from mapreduce_in_pthreads_spark.sources.tables import (
        clear_relation_cache)

    prior_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    try:
        clear_relation_cache(spark)  # exercise the real loader, not a hit
        before = _conf_snapshot(spark)
        df = load_table(spark, SF_SMOKE, "events")
        got = {r.event_id: r.us for r in
               df.select("event_id", F.unix_micros("ts").alias("us"))
               .limit(50).collect()}
        assert _conf_snapshot(spark) == before, (
            "load_table leaked session conf mutations")
        con = duckdb.connect()
        want = dict(con.sql(
            f"SELECT event_id, epoch_us(ts) FROM "
            f"read_parquet('{SF_SMOKE}/events.parquet') "
            f"WHERE event_id IN ({','.join(map(str, got))})").fetchall())
        assert got == want, "stored instant drifted under non-UTC session"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior_tz)


def _write_nanos_events(dirpath: str) -> None:
    ns = [1700000000_123456789, 1700003600_000000001, 1700007200_999999999]
    table = pa.table({
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array(ns, type=pa.timestamp("ns")),
        "user_id": pa.array([10, 10, 11], type=pa.int64()),
        "event_type": pa.array(["view", "click", "view"]),
        "value": pa.array([1.0, 2.0, 3.0]),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))


def test_load_events_nanos_roundtrip_conf_restored(spark, tmp_path):
    """The dormant NANOS path still works — ns truncates to µs exactly
    as DuckDB would — and nanosAsLong does not leak out of the loader."""
    _write_nanos_events(str(tmp_path))
    before = _conf_snapshot(spark)
    df = _load_events(spark, os.path.join(str(tmp_path), "events.parquet"))
    assert _conf_snapshot(spark) == before, "nanosAsLong leaked"
    got = {r.event_id: r.us for r in
           df.select("event_id", F.unix_micros("ts").alias("us")).collect()}
    assert got == {1: 1700000000_123456, 2: 1700003600_000000,
                   3: 1700007200_999999}


def test_relation_cache_hits_and_invalidates(spark, tmp_path):
    """The catalog-style relation cache returns the SAME logical plan
    for repeat loads (no schema re-inference) and invalidates when the
    file is replaced (mtime key)."""
    import shutil
    import time as _time

    from mapreduce_in_pthreads_spark.sources.tables import (
        clear_relation_cache)

    a = load_table(spark, SF_SMOKE, "region")
    b = load_table(spark, SF_SMOKE, "region")
    assert a is b, "repeat load must be a cache hit"
    clear_relation_cache(spark)
    c = load_table(spark, SF_SMOKE, "region")
    assert c is not a and c.schema == a.schema

    # mtime invalidation: copy a table, load, replace with new mtime
    p = tmp_path / "region.parquet"
    shutil.copyfile(os.path.join(SF_SMOKE, "region.parquet"), p)
    d1 = load_table(spark, str(tmp_path), "region")
    assert load_table(spark, str(tmp_path), "region") is d1
    _time.sleep(0.01)
    os.utime(p)  # simulate replacement
    d2 = load_table(spark, str(tmp_path), "region")
    assert d2 is not d1


def test_table_row_count_hint_matches_footer(spark):
    """The footer-stats hint (the count()-free plan gate of
    embedding_near_dup, VERDICT r3 item 3) is exact."""
    from mapreduce_in_pthreads_spark.sources.tables import (
        table_row_count_hint)

    for name in ("embeddings", "region", "events"):
        hint = table_row_count_hint(SF_SMOKE, name)
        assert hint == load_table(spark, SF_SMOKE, name).count()
    assert table_row_count_hint(SF_SMOKE, "no_such_table") is None


def test_embedding_near_dup_plan_has_no_count_job(spark):
    """Building the near-dup plan must not trigger any Spark job (the
    old emb.count() gate ran a full scan per invocation)."""
    from mapreduce_in_pthreads_spark.operators.dedup import (
        embedding_near_dup)

    sc = spark.sparkContext
    # Baseline: a bare table load (parquet schema inference may itself
    # run one tiny footer-only job — that is fine and unavoidable).
    sc.setJobGroup("neardup_baseline", "bare load")
    load_table(spark, SF_SMOKE, "embeddings")
    baseline = len(sc.statusTracker().getJobIdsForGroup("neardup_baseline"))
    sc.setJobGroup("neardup_gate_probe", "plan build only")
    try:
        embedding_near_dup(spark, SF_SMOKE)  # build, never execute
        jobs = len(sc.statusTracker().getJobIdsForGroup("neardup_gate_probe"))
        assert jobs <= baseline, (
            f"plan build launched {jobs} jobs vs {baseline} for a bare "
            "load — a count()-style gate is back in the query path")
    finally:
        sc.setJobGroup("", "")


def test_streaming_nanos_conf_restored(spark, tmp_path):
    """ADVICE r3: _read_event_stream must not leave session conf
    mutated; the NANOS stream still executes after the restore."""
    from mapreduce_in_pthreads_spark.streaming.event_windows import (
        _read_event_stream, run_to_memory)

    _write_nanos_events(str(tmp_path))
    before = _conf_snapshot(spark)
    stream = _read_event_stream(spark, str(tmp_path))
    assert _conf_snapshot(spark) == before, "stream setup leaked conf"
    out = run_to_memory(
        spark, stream.select("event_id", F.unix_micros("ts").alias("us")),
        "nanos_conf_probe", "append")
    got = {r.event_id: r.us for r in out.collect()}
    assert got == {1: 1700000000_123456, 2: 1700003600_000000,
                   3: 1700007200_999999}
