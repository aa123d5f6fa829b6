"""Gap-based sessionization, batch form: the applyInPandasWithState
streaming operator's twin (streaming/stateful.py) as two windows and one
aggregation — pure Catalyst, SQL-expressible, oracle-checkable.

Session rule (identical to the streaming state machine): events of a user
ordered by time belong to one session while each gap to the previous event
is <= gap_seconds; a larger gap starts a new session. The cumulative sum
of break flags IS the session index, so the whole operator is:

    lag -> break flag -> running sum (one window exchange per user key)
    -> groupBy(user, session) aggregation

Ordering ties are broken by the id column so the lag is deterministic
cross-engine (tied timestamps have gap 0 either way, but the cumulative
assignment of the TIE ROWS must agree with the DuckDB oracle row-for-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user_col, session_start, session_end, n_events, total_value):
    one row per closed session. Batch twin of streaming sessionize_stream
    (differential-tested equal on a drained stream)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # NTZ timestamps (parquet without tz) cannot cast straight to long in
    # Spark 4; go through timestamp first — the session tz is pinned UTC,
    # matching DuckDB's epoch() over naive timestamps.
    sec = F.col(ts_col).cast("timestamp").cast("long")
    brk = F.when(sec - F.lag(sec).over(w) > gap_seconds, 1).otherwise(0)
    sess = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("_sess", sess)
        .groupBy(user_col, "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .drop("_sess")
    )
