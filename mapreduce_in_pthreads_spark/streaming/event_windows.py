"""Structured Streaming variants of the event-window operators
(SURVEY.md §2.3 'Streaming-shaped'; §7 stretch goal).

Design point: the LOGICAL transformations are shared with the batch
operators in ``operators/timeseries.py`` — one query, two execution
modes. Batch is the driver-oracle surface; these streaming twins are
tested by file-source parity against the batch results (the reference's
own execution model is closer to streaming — bounded producers feeding
blocking queues, mapreduce.c:75-87 — so this is also a fidelity point).

Late-data policy (documented contract):
- 10-minute watermark on ``ts``;
- events later than the watermark are DROPPED (the only option Spark
  gives for append-mode windowed aggregates);
- windows emit when the watermark passes their end — with a bounded
  historical file source, that means all-but-the-last windows emit;
  tests compare against batch modulo that tail.

Scale notes: watermarking bounds state (without it, windowed state
grows forever — the streaming analogue of the reference's unbounded
uthash tables, mapreduce.c:170-174); session windows additionally merge
state per key, which is why the gap parameter is the state-size knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum

_EVENTS_SCHEMA_NANOS = ("event_id bigint, ts bigint, user_id bigint, "
                        "event_type string, value double, props string")
_EVENTS_SCHEMA_MICROS = ("event_id bigint, ts timestamp, user_id bigint, "
                         "event_type string, value double, props string")

WATERMARK = "10 minutes"


def _read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    ``events.ts`` has shipped both as parquet TIMESTAMP(NANOS) — which
    must be read as raw int64 via nanosAsLong and converted — and as
    TIMESTAMP(MICROS), which reads natively (same dual contract as the
    batch loader, sources/tables.py). A stream needs its schema declared
    up front, so probe the footer driver-side (one file, one footer
    read) and declare the matching schema.

    Session conf is left exactly as the caller had it: ``nanosAsLong``
    is scoped set→build→restore (with a declared schema the stream
    never re-derives the catalyst schema from the footer, so restoring
    before ``start()`` is safe — verified empirically in tests), and
    the session zone is not touched — the watermark/window operators in
    the twins are epoch-based and tz-independent. The one calendar op,
    ``streaming_dedup``'s hour truncation, follows the execution-time
    session zone, same as its batch twin — parity tests run both under
    one session, so they agree by construction.
    """
    import pyarrow.parquet as pq

    ts_type = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    if ts_type.startswith("timestamp[ns"):
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            raw = (
                spark.readStream.schema(_EVENTS_SCHEMA_NANOS)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return (
        spark.readStream.schema(_EVENTS_SCHEMA_MICROS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``timeseries.tumbling_hourly``."""
    ev = _read_event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", "sum_value"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "event_type", "n_events", "sum_value")
    )


def streaming_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``timeseries.sliding_2h_1h`` — overlapping
    2-hour windows sliding hourly, so every event feeds exactly two
    concurrent window states. The overlap is the state-cost point this
    twin exists to make: watermarking still bounds retention to
    (window length + lateness) per key, it just holds length/slide
    copies of each in-flight hour."""
    ev = _read_event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", "sum_value"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "n_events", "sum_value")
    )


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``timeseries.session_windows_30m`` — native
    merging session state with watermark-bounded retention."""
    ev = _read_event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", "sum_value"))
        .select("user_id",
                F.unix_micros(F.col("w.start")).alias("session_start_us"),
                "n_events", "sum_value")
    )


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming event dedup: dropDuplicates on (user_id, event_type,
    hour) with watermark-bounded dedup state — the streaming twin of
    ``timeseries.dedup_events_in_window``."""
    ev = _read_event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    return (
        ev.withColumn("hour", F.date_trunc("hour", "ts"))
        .dropDuplicates(["user_id", "event_type", "hour"])
        .select("event_id", "user_id", "event_type",
                F.unix_micros("hour").alias("hour_us"))
    )


def run_to_memory(spark: SparkSession, stream_df: DataFrame,
                  name: str, output_mode: str) -> DataFrame:
    """Execute a bounded stream to completion into a memory sink and
    return the materialized result (test harness helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name).outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def streaming_purchase_click_join(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Stream-stream interval join — the streaming twin of
    ``joins.purchases_with_prior_clicks``: for each purchase, count
    same-user clicks in the preceding hour.

    Both sides are watermarked streams; the time-range predicate is
    what BOUNDS the join state: Spark derives from it how long click
    rows must be buffered (1 h + watermark) and evicts older state.
    An unconstrained stream-stream join would buffer both streams
    forever — the interval condition is mandatory at scale, not an
    optimization. Inner join (not left): streaming left-outer emits
    null-matches only on watermark expiry, which never fires for the
    final windows of a bounded file source — the parity test compares
    against the batch inner-join projection instead."""
    ev1 = _read_event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    ev2 = _read_event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    purchases = ev1.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"))
    clicks = ev2.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"))
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id")


def streaming_dedup_within_watermark(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Exactly-once ingestion dedup via dropDuplicatesWithinWatermark:
    the union of TWO reads of the same source (an at-least-once
    delivery double) collapses back to one row per event_id.

    Contrast with ``streaming_dedup``'s plain dropDuplicates, whose
    dedup state lives forever per key: WithinWatermark keeps a key only
    until the watermark passes its event time — the state-bounded shape
    for unbounded streams where duplicates arrive close together
    (retries, replayed batches), which is the 100 TB-safe default for
    ingestion pipelines.
    """
    a = _read_event_stream(spark, sf_dir)
    b = _read_event_stream(spark, sf_dir)
    doubled = a.unionByName(b).withWatermark("ts", WATERMARK)
    return (
        doubled.dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type",
                F.unix_micros("ts").alias("ts_us"))
    )
