"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star BASELINE.json: 'applyInPandasWithState for custom stateful
operators').

``streaming_user_totals`` maintains per-user running totals (event
count, value sum, first/last event time) as explicit GroupState — the
operator shape you reach for when windows/dedup built-ins can't express
the state machine (e.g. custom sessionization, CDC merge, enrichment
caches).

State contract:
- state value: (n_events, sum_value_micros, min_ts_us, max_ts_us)
  — the value sum is held in integer MICRO-units so state updates are
  exact and associative (float accumulation in state would drift);
- emit: one updated row per user per micro-batch (update semantics);
  with a bounded availableNow source this means exactly one final row
  per user, which the parity test compares against the batch groupBy;
- timeout: none here (bounded source); a production stream would set
  ProcessingTimeTimeout to expire idle users and bound state.

The UDF is a closure (cloudpickle by-value; executors don't need this
package importable — same rule as operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .event_windows import _read_event_stream

OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, sum_value double, "
                 "first_ts_us bigint, last_ts_us bigint")
STATE_SCHEMA = "n bigint, sum_micro bigint, min_us bigint, max_us bigint"


def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals as explicit GroupState."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = _read_event_stream(spark, sf_dir).selectExpr(
        "user_id", "value", "unix_micros(ts) AS ts_us")

    def update_totals(key, pdfs, state):
        import pandas as _pd

        n, sum_micro, min_us, max_us = (
            state.get if state.exists else (0, 0, None, None))
        for pdf in pdfs:
            n += len(pdf)
            # exact integer micro-units; value has 2dp → *1_000_000 exact
            sum_micro += int(round(float(pdf["value"].sum()) * 1_000_000))
            lo = int(pdf["ts_us"].min())
            hi = int(pdf["ts_us"].max())
            min_us = lo if min_us is None else min(min_us, lo)
            max_us = hi if max_us is None else max(max_us, hi)
        state.update((n, sum_micro, min_us, max_us))
        yield _pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [sum_micro / 1_000_000],
            "first_ts_us": [min_us],
            "last_ts_us": [max_us],
        })

    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            update_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout)
    )


TWS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double"


def streaming_user_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same stateful shape on the MODERN API: ``transformWithState``
    (Spark 4 StatefulProcessor) — typed, composable state handles
    (ValueState here; ListState/MapState/timers available) instead of
    applyInPandasWithState's single tuple blob. Requires the RocksDB
    state store (set in the session conf below), which is also the
    production choice: state spills off-heap and snapshots
    incrementally, so per-key state survives executor loss and isn't
    bounded by JVM heap — the 100 TB requirement for any
    billions-of-keys stateful pipeline.

    Runtime dependency note: the transformWithState Python worker
    speaks protobuf to the state server; without a working
    ``google.protobuf`` the stream would die minutes later with an
    opaque "driver worker exited unexpectedly (crashed)" — so probe
    the dependency at PLAN BUILD time and fail fast with an
    actionable error instead (the parity test asserts this exact
    contract where protobuf is absent). ``streaming_user_totals``
    above covers the same semantics on the dependency-free legacy
    API."""
    import pandas as _pd

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the google.protobuf "
            "runtime (its Python worker speaks protobuf to the state "
            "server). Install 'protobuf', or use the dependency-free "
            "legacy twin streaming_user_totals().") from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")

    class UserCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "totals", "n bigint, max_micro bigint")

        def handleInputRows(self, key, rows, timerValues):
            n, max_micro = (self._st.get() if self._st.exists()
                            else (0, None))
            for pdf in rows:
                n += len(pdf)
                # exact integer micro-units (same contract as
                # streaming_user_totals)
                hi = int(round(float(pdf["value"].max()) * 1_000_000))
                max_micro = hi if max_micro is None else max(max_micro, hi)
            self._st.update((n, max_micro))
            yield _pd.DataFrame({
                "user_id": [key[0]],
                "n_events": [n],
                "max_value": [max_micro / 1_000_000],
            })

        def close(self) -> None:
            pass

    ev = _read_event_stream(spark, sf_dir).select("user_id", "value")
    return (
        ev.groupBy("user_id")
        .transformWithStateInPandas(
            UserCounts(), TWS_OUTPUT_SCHEMA, "Update", "None")
    )
