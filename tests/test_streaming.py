"""Structured Streaming: incremental ingest (two micro-batches, url dedupe,
same frozen extractor as batch) and windowed aggregation with watermark."""

import os

import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark import fixtures as fx
from entity_matching_in_online_retail_spark.operators.normalize import normalize_web_pages
from entity_matching_in_online_retail_spark.streaming import ingest as SI


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {
        "input": str(base / "input"),
        "offers": str(base / "offers"),
        "ckpt": str(base / "ckpt"),
        "agg_out": str(base / "agg_out"),
        "agg_ckpt": str(base / "agg_ckpt"),
        "events": str(base / "events"),
    }


def test_incremental_ingest_matches_batch(spark, tiny_spark, stream_dirs):
    pages, _, _ = tiny_spark
    # Crawl files arrive in rough event-time order; rows older than the
    # watermark are dropped by design, so split micro-batches by warc_ts.
    half1 = pages.where(F.col("warc_ts") < "2024-04-01")
    half2 = pages.where(F.col("warc_ts") >= "2024-04-01")

    half1.write.mode("append").parquet(stream_dirs["input"])
    q = SI.incremental_ingest(
        spark, stream_dirs["input"], stream_dirs["offers"], stream_dirs["ckpt"]
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(stream_dirs["offers"]).count()
    assert n1 > 0

    half2.write.mode("append").parquet(stream_dirs["input"])
    q = SI.incremental_ingest(
        spark, stream_dirs["input"], stream_dirs["offers"], stream_dirs["ckpt"]
    )
    q.awaitTermination(120)

    got = spark.read.parquet(stream_dirs["offers"])
    assert got.count() > n1

    # every streamed offer matches the batch normalization byte-for-byte
    batch = normalize_web_pages(pages, lang="en", use_html=True).select(
        "url", F.col("text").alias("batch_text")
    )
    joined = got.select("url", "text").join(batch, "url")
    assert joined.where(F.col("text") != F.col("batch_text")).count() == 0
    # within-watermark re-crawls deduped: urls unique per micro-batch path
    dup = got.groupBy("url").count().where(F.col("count") > 2).count()
    assert dup == 0


def test_windowed_event_counts(spark, stream_dirs):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:40:00", 1, "click", 2.0, "{}"),
            (3, "2024-01-01 01:10:00", 2, "view", 3.0, "{}"),
            (4, "2024-01-01 05:10:00", 2, "view", 4.0, "{}"),  # advances watermark
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    events.write.mode("overwrite").parquet(stream_dirs["events"])

    q = SI.run_windowed_counts_once(
        spark,
        stream_dirs["events"],
        stream_dirs["agg_out"],
        stream_dirs["agg_ckpt"],
        window="1 hour",
    )
    q.awaitTermination(120)
    out = spark.read.parquet(stream_dirs["agg_out"])
    rows = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in out.collect()
    }
    # windows before the (max_ts - 2h) watermark are finalized and emitted
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01 01:00:00", "view")] == (1, 3.0)


def test_stateful_sessionize(spark, stream_dirs, tmp_path_factory):
    from entity_matching_in_online_retail_spark.streaming import stateful as ST

    base = tmp_path_factory.mktemp("sess")
    events_dir, out_dir, ckpt = str(base / "ev"), str(base / "out"), str(base / "ck")
    events = spark.createDataFrame(
        [
            # user 1: two sessions separated by a 2h gap
            (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
            (3, "2024-01-01 02:30:00", 1, "view", 3.0, "{}"),
            # user 2: one session
            (4, "2024-01-01 01:00:00", 2, "view", 4.0, "{}"),
            (5, "2024-01-01 01:05:00", 2, "view", 5.0, "{}"),
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    events.write.mode("overwrite").parquet(events_dir)

    q = ST.run_sessionize_once(spark, events_dir, out_dir, ckpt, gap_seconds=1800)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    rows = {(r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"]) for r in out.collect()}
    # only CLOSED sessions are emitted in this micro-batch: user 1's first
    # session closed when the 02:30 event arrived; the rest remain in state
    assert rows == {(1, "2024-01-01 00:00:00"): (2, 3.0)}
