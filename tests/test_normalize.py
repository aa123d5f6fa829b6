"""Normalization, domain keys, extraction golden (byte-identity invariant),
latest-per-url dedupe."""

import hashlib
import json
import os

from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.functions import text as TX
from entity_matching_in_online_retail_spark.operators.normalize import normalize_web_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extracted_text_tiny.json")


def test_normalize_idempotent(spark):
    df = spark.createDataFrame(
        [("  Héllo,   WORLD!! 42 ",), ("ｆｕｌｌｗｉｄｔｈ　ＴＥＸＴ",), ("a-b_c.d",)],
        "t string",
    )
    once = df.select(TX.normalize_text(F.col("t")).alias("n"))
    twice = once.select(TX.normalize_text(F.col("n")).alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]
    vals = [r["n"] for r in once.collect()]
    assert vals[0] == "héllo world 42"
    assert vals[1] == "fullwidth text"  # NFKC folds fullwidth forms
    assert vals[2] == "a b c d"


def test_domain_key(spark):
    df = spark.createDataFrame(
        [
            ("https://www.example.com/x",),
            ("https://shop.example.co.uk/y?q=1",),
            ("http://sub.deep.site.org/z",),
        ],
        "url string",
    )
    got = [r["d"] for r in df.select(TX.domain_key(F.col("url")).alias("d")).collect()]
    assert got == ["example.com", "example.co.uk", "site.org"]


def test_extractor_pure_function():
    html = b"<html><head><title>T</title></head><body><p>Hello &amp; <b>world</b></p><p>x&lt;y</p></body></html>"
    assert TX.extract_text_bytes(html) == "Hello & world\nx<y"
    assert TX.extract_text_bytes(None) is None
    assert TX.extract_text_bytes(b"<html></html>") == ""


def test_extraction_matches_text_column(spark, tiny_spark):
    pages, _, _ = tiny_spark
    bad = pages.where(TX.extract_text(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_extraction_golden_frozen(spark, tiny_spark):
    """Byte-identity invariant: the extractor output per url equals the frozen
    golden digest, across parallelism (this runs under whatever local[k] the
    session uses; the digest is order-canonicalized)."""
    pages, _, _ = tiny_spark
    rows = (
        pages.select("url", TX.extract_text(F.col("html")).alias("t"))
        .orderBy("url", "t")
        .collect()
    )
    digest = hashlib.sha256(
        "\x00".join(f"{r['url']}\x01{r['t']}" for r in rows).encode()
    ).hexdigest()
    if not os.path.exists(GOLDEN):  # freeze on first run
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump({"sha256": digest, "rows": len(rows)}, f)
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert digest == golden["sha256"]
    assert len(rows) == golden["rows"]


def test_latest_per_url_dedupe(spark):
    pages = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00", b"<p>old</p>", "old", "en"),
            ("u1", "2024-02-01 00:00:00", b"<p>new</p>", "new", "en"),
            ("u2", "2024-01-05 00:00:00", b"<p>only</p>", "only", "en"),
        ],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    off = normalize_web_pages(pages, lang="en", use_html=True)
    got = {r["url"]: r["text"] for r in off.collect()}
    assert got == {"u1": "new", "u2": "only"}


def test_offers_schema_and_ids(spark, tiny_spark):
    pages, _, _ = tiny_spark
    off = normalize_web_pages(pages, lang="en", use_html=True)
    assert off.count() == off.select("record_id").distinct().count()
    assert off.where(F.col("lang") != "en").count() == 0
    assert off.where(F.size("tokens") == 0).count() == 0
