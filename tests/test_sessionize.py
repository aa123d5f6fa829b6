"""Batch sessionization (operators/sessionize.py): hand-valued sessions,
and the differential against the stateful streaming sessionizer — every
session the stream CLOSES must appear identically in the batch output
(the stream's open sessions stay in state, so subset, not equality)."""

from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.operators import sessionize as SZ

EVENTS_DDL = (
    "event_id bigint, ts string, user_id bigint, "
    "event_type string, value double, props string"
)
FIVE_EVENTS = [
    # user 1: two sessions separated by a 2h gap
    (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
    (2, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
    (3, "2024-01-01 02:30:00", 1, "view", 3.0, "{}"),
    # user 2: one session
    (4, "2024-01-01 01:00:00", 2, "view", 4.0, "{}"),
    (5, "2024-01-01 01:05:00", 2, "view", 5.0, "{}"),
]


def _events(spark):
    return spark.createDataFrame(FIVE_EVENTS, EVENTS_DDL).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_sessionize_hand_values(spark):
    out = SZ.sessionize(_events(spark), gap_seconds=1800)
    rows = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]),
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }
    assert rows == {
        (1, "2024-01-01 00:00:00"): ("2024-01-01 00:10:00", 2, 3.0),
        (1, "2024-01-01 02:30:00"): ("2024-01-01 02:30:00", 1, 3.0),
        (2, "2024-01-01 01:00:00"): ("2024-01-01 01:05:00", 2, 9.0),
    }


def test_sessionize_exact_gap_extends_session(spark):
    # The rule is strict: gap > gap_seconds breaks; an EXACTLY-gap_seconds
    # gap extends (matches the streaming state machine's `t - end > gap`).
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "c", 1.0, "{}"),
         (2, "2024-01-01 00:30:00", 1, "c", 1.0, "{}")],
        EVENTS_DDL,
    ).withColumn("ts", F.to_timestamp("ts"))
    assert SZ.sessionize(ev, gap_seconds=1800).count() == 1
    assert SZ.sessionize(ev, gap_seconds=1799).count() == 2


def test_streaming_closed_sessions_subset_of_batch(spark, tmp_path):
    from entity_matching_in_online_retail_spark.streaming import stateful as ST

    events = _events(spark)
    events_dir, out_dir, ckpt = (
        str(tmp_path / "ev"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    events.write.mode("overwrite").parquet(events_dir)
    q = ST.run_sessionize_once(spark, events_dir, out_dir, ckpt, gap_seconds=1800)
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]),
            r["n_events"],
            r["total_value"],
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]),
            r["n_events"],
            r["total_value"],
        )
        for r in SZ.sessionize(events, gap_seconds=1800).collect()
    }
    assert streamed  # at least one session closed in-stream
    for k, v in streamed.items():
        assert batch[k] == v
