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
