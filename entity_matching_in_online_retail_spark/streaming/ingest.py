"""Structured Streaming: incremental crawl ingest + windowed analytics.

The batch pipeline is the primary path (the reference is batch); streaming
covers the incremental-ingest story: new crawl files land in a directory,
the stream normalizes them exactly like the batch stage (same frozen
extractor, same normalization — the byte-identity invariant holds because
both paths call the same pure functions) and appends to the offers table.
Late pages are bounded by a watermark on warc_ts; re-crawled urls within the
watermark are dropped by dropDuplicatesWithinWatermark.

All entry points take explicit schemas (streaming sources cannot infer) and
use availableNow/foreachBatch so tests drive them deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import WEB_PAGES_DDL
from ..operators.normalize import normalize_web_pages


EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, input_path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_DDL).parquet(input_path)


def read_web_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    offers_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
    watermark: str = "1 day",
):
    """Stream web-page files -> normalized offers parquet (append).

    Returns the StreamingQuery (availableNow trigger: processes everything
    currently in the directory, then stops — deterministic for tests; swap
    for processingTime on a live cluster).
    """
    pages = read_web_pages_stream(spark, input_dir)
    deduped = pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        offers = normalize_web_pages(batch_df, lang=lang, use_html=True)
        offers.write.mode("append").parquet(offers_dir)

    return (
        deduped.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with late-data watermark (streaming agg).

    `events` must be a streaming DataFrame with (ts timestamp, event_type
    string, value double)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # No rounding here: consumers round ONCE at presentation time.
            # (An inner round(…,6) under an outer round(…,4) differs from a
            # single round at tie boundaries — a latent oracle flake.)
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_windowed_counts_once(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
):
    """File-source streaming windowed aggregation, availableNow, parquet sink
    (append mode emits only finalized windows past the watermark)."""
    stream = read_events_stream(spark, events_dir)
    agg = windowed_event_counts(stream, window=window)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
