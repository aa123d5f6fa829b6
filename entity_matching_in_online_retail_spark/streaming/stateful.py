"""Custom stateful streaming operator: per-key sessionization with
applyInPandasWithState (Arrow-batched state machine, no per-row Python UDFs
— the grouped-map batch IS the unit of Python execution).

Sessionize an event stream per user: events closer than `gap` seconds extend
the current session; a gap closes it. Closed sessions are emitted as rows;
open sessions live in GroupState with a processing-time timeout so idle keys
eventually flush. This is the canonical operator Structured Streaming cannot
express with window()/dropDuplicates alone.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start long, end long, n int, total double"


def _sessionize_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, pd.Timestamp(start, unit="s"), pd.Timestamp(end, unit="s"), n, total)],
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        return

    events = pd.concat(list(batches)).sort_values("ts")
    ts = (events["ts"].astype("int64") // 1_000_000_000).to_numpy()
    vals = events["value"].to_numpy()

    if state.exists:
        start, end, n, total = state.get
    else:
        start = end = int(ts[0])
        n, total = 0, 0.0

    closed = []
    for t, v in zip(ts, vals):
        t = int(t)
        if n > 0 and t - end > gap_seconds:
            closed.append((user_id, start, end, n, total))
            start, n, total = t, 0, 0.0
        end = max(end, t)
        if n == 0:
            start = min(start, t)
        n += 1
        total += float(v)

    state.update((start, end, n, total))
    state.setTimeoutDuration(gap_seconds * 1000)
    if closed:
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        yield out


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(user_id, ts, value) stream -> closed sessions stream."""

    def fn(key, pdf_iter, state):
        yield from _sessionize_group(key, pdf_iter, state, gap_seconds)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_sessionize_once(
    spark, events_dir: str, out_dir: str, checkpoint_dir: str, gap_seconds: int = 1800
):
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sessions = sessionize(stream.select("user_id", "ts", "value"), gap_seconds)
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
