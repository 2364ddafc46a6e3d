"""foreachBatch idempotent sink — the exactly-once recipe for
non-transactional stores.

Spark's foreachBatch gives at-least-once delivery: after a failure the
last uncommitted micro-batch REPLAYS with the same ``batch_id``. The
standard fix (documented in the Structured Streaming guide) is to make
the write idempotent by keying the output on ``batch_id`` — here via
dynamic partition overwrite, so a replayed batch overwrites its own
partition instead of appending duplicates. Checkpoint (source offsets)
+ idempotent sink = end-to-end exactly-once.

The reference's sink has the same shape of concern: each reducer prints
its whole table once under ``printmutex`` (mapreduce.c:216-222) —
per-partition atomicity, no replay story at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from .event_windows import _read_event_stream


def write_user_totals_batch(batch_df: DataFrame, batch_id: int,
                            out_dir: str) -> None:
    """Idempotent per-batch write: aggregate, stamp batch_id, overwrite
    ONLY this batch's partition (dynamic mode keeps other batches)."""
    out = (batch_df.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                dsum("value", "sum_value"))
           .withColumn("batch_id", F.lit(batch_id)))
    (out.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(out_dir))


def run_idempotent_foreach_batch(spark: SparkSession, sf_dir: str,
                                 out_dir: str, checkpoint_dir: str) -> None:
    """availableNow pass over the events file source, sunk through the
    idempotent foreachBatch writer; returns after the source drains."""
    ev = _read_event_stream(spark, sf_dir).select(
        "event_id", "user_id", "value")
    q = (ev.writeStream
         .foreachBatch(lambda df, bid: write_user_totals_batch(
             df, bid, out_dir))
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_gap_fill_stream(spark: SparkSession, sf_dir: str,
                        checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.gap_fill_hourly`` — the
    "streaming ingest, batch finish per trigger" production pattern
    (SURVEY.md §7 stretch: one more window family as a Structured
    Streaming variant):

    - the INCREMENTAL part — per-(event_type, hour) count + decimal
      avg — runs as a complete-mode streaming aggregation (hour via
      ``date_trunc``, the batch twin's exact definition; no watermark:
      complete-mode series state never expires, the same contract as
      ``streaming/wordline_index.py``'s index);
    - the NON-INCREMENTAL finishing — dense grid + forward fill, which
      no streaming aggregation can express because a fill depends on
      NEIGHBOR rows — re-runs per trigger in ``foreachBatch`` over the
      (bounded: groups × hours) aggregate state, via the SAME
      ``gap_fill_finish`` the batch operator uses, so the two modes
      cannot drift semantically.

    Parity (tests/test_streaming.py): after an availableNow drain the
    last trigger's finished rows equal the batch operator exactly.

    Scale: streaming state is one row per (event_type, hour) — the
    regularized SERIES, not the events; the per-trigger finish is a
    window over that same bounded relation. At 100 TB of events the
    state is still |types| × |hours|.
    """
    from ..functions.numeric import davg
    from ..operators.timeseries import gap_fill_finish

    ev = _read_event_stream(spark, sf_dir)
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).alias("n"),
                   davg("value", "avg_value")))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = gap_fill_finish(batch_df).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (hourly.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_event_anomaly_stream(spark: SparkSession, sf_dir: str,
                             checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.event_rate_anomaly`` — the second
    instance of the "streaming ingest, batch finish per trigger"
    pattern (``run_gap_fill_stream`` is the first): hourly counts
    accumulate as a complete-mode streaming aggregation; the
    non-incremental finishing (dense grid + trailing-24h z-scores,
    which needs NEIGHBOR hours) re-runs per trigger in ``foreachBatch``
    via the SAME ``event_rate_anomaly_finish`` the batch operator
    calls. This is exactly how a production rate monitor runs: state =
    the regularized series (bounded by groups × hours), alarms
    recomputed on each micro-batch.
    """
    from ..operators.timeseries import event_rate_anomaly_finish

    ev = _read_event_stream(spark, sf_dir)
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).alias("n")))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = event_rate_anomaly_finish(batch_df).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (hourly.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_holt_forecast_stream(spark: SparkSession, sf_dir: str,
                             checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.holt_linear_forecast`` — the
    third instance of the "streaming ingest, batch finish per trigger"
    pattern: per-(event_type, day) counts accumulate as a
    complete-mode streaming aggregation; the non-incremental finishing
    (dense daily grid + the order-dependent Holt fold, which no
    streaming aggregate can express) re-runs per trigger in
    ``foreachBatch`` via the SAME ``holt_finish`` the batch operator
    calls. This is how a production forecaster actually runs: state =
    the daily series (bounded by types × days), the forecast
    recomputed per micro-batch from that state.
    """
    from ..operators.timeseries import holt_finish

    ev = _read_event_stream(spark, sf_dir)
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = holt_finish(batch_df).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (daily.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_seasonal_mase_stream(spark: SparkSession, sf_dir: str,
                             checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.seasonal_naive_mase`` — the
    fifth instance of the "streaming ingest, batch finish per trigger"
    pattern: per-(event_type, hour) counts accumulate as a
    complete-mode streaming aggregation (state bounded by types ×
    hours); the non-incremental finishing (dense grid + lag-24 MASE,
    whose test split depends on the CURRENT max hour and so must be
    recomputed as data arrives) re-runs per trigger via the SAME
    ``mase_finish`` the batch operator calls. This is how a live
    forecast-skill monitor actually runs: every micro-batch refreshes
    "is yesterday's naive forecast still beating the in-sample
    error?" from the accumulated series state.
    """
    from ..operators.timeseries import hourly_counts, mase_finish

    counts = hourly_counts(_read_event_stream(spark, sf_dir))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = mase_finish(batch_df).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (counts.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_cusum_stream(spark: SparkSession, sf_dir: str,
                     checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.cusum_changepoint`` — the sixth
    instance of the "streaming ingest, batch finish per trigger"
    pattern: per-(event_type, hour) counts accumulate as a
    complete-mode streaming aggregation (state bounded by types ×
    hours); the non-incremental finishing (dense grid + the
    prefix-sum/running-min CUSUM scan, whose μ/σ baseline depends on
    the CURRENT accumulated series) re-runs per trigger via the SAME
    ``cusum_finish`` the batch operator calls. This is how a live
    drift monitor actually runs: every micro-batch refreshes "has any
    event type accumulated a level shift past h = 4σ?" from the
    series state.
    """
    from ..operators.timeseries import cusum_finish, hourly_counts

    counts = hourly_counts(_read_event_stream(spark, sf_dir))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = cusum_finish(batch_df).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (counts.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_sliding_dau_stream(spark: SparkSession, sf_dir: str,
                           checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.sliding_window_dau`` — the
    seventh instance of the "streaming ingest, batch finish per
    trigger" pattern, this one for the session/engagement family: the
    distinct (user_id, day) visit relation accumulates as a
    complete-mode streaming aggregation (state bounded by users ×
    days, the already-deduplicated engagement grid, NOT raw events);
    the non-incremental finishing — the trailing-7-day expand-to-
    bucket distinct count, whose every output row can change when a
    new (user, day) arrives — re-runs per trigger via the SAME
    ``dau_finish`` the batch operator calls. This is how a live
    DAU/WAU/stickiness dashboard actually runs: each micro-batch
    refreshes the whole trailing-window panel from the visit state.
    """
    from ..operators.timeseries import dau_finish

    ev = _read_event_stream(spark, sf_dir)
    user_days = (ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n")))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = dau_finish(
            batch_df.select("user_id", "day")).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (user_days.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_runs_test_stream(spark: SparkSession, sf_dir: str,
                         checkpoint_dir: str, holder: dict) -> None:
    """Streaming twin of ``timeseries.runs_test_updown`` — the eighth
    "streaming ingest, batch finish per trigger" instance, this one a
    live RANDOMNESS monitor: per-(event_type, day) counts accumulate
    as a complete-mode streaming aggregation (state bounded by types ×
    days), and the non-incremental finishing — the up/down sign
    sequence, run counting and the Wald-Wolfowitz z, all of which can
    change at ANY prefix when a day's count grows — re-runs per
    trigger via the SAME ``runs_finish`` the batch operator calls.
    This is how a drift dashboard watches "have daily volumes stopped
    looking random" next to `run_cusum_stream`'s level-shift alarm.
    """
    from ..operators.timeseries import runs_finish

    ev = _read_event_stream(spark, sf_dir)
    daily = (ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("y")))

    def finish(batch_df: DataFrame, batch_id: int) -> None:
        holder["rows"] = runs_finish(batch_df).collect()
        holder["n_triggers"] = holder.get("n_triggers", 0) + 1

    q = (daily.writeStream
         .foreachBatch(finish)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
