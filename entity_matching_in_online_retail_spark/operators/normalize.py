"""Ingest + normalize: web_pages -> offers.

Input (north-rule shape): url string, warc_ts timestamp, html binary,
text string, lang string.

Steps:
  B2  language gate (lang = 'en' by default)
  X3  frozen HTML->text extraction (Arrow-batched; byte-identity invariant)
  B5/W2 latest-crawl-per-url dedupe (row_number over url by warc_ts desc)
  F5  normalization, F6 domain key, tokenization
  record_id = xxhash64(url)  — stable across runs/parallelism/resume

`html` is only touched inside the extraction UDF; every other read path
projects it away so Catalyst prunes the (heavy) binary column at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import text as TX


def normalize_web_pages(
    pages: DataFrame,
    lang: str | None = "en",
    use_html: bool = True,
    min_chars: int = 1,
) -> DataFrame:
    """web_pages -> offers(record_id, url, domain, warc_ts, text, norm_text,
    tokens, title_norm, brand, price, lang)."""
    df = pages
    if lang is not None:
        df = df.where(F.col("lang") == lang)

    # latest crawl per url (B5/W2): newest warc_ts wins, deterministic.
    w = W.partitionBy("url").orderBy(F.col("warc_ts").desc())
    df = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")

    if use_html:
        # Round 6: extraction + NFKC fused into ONE Arrow round trip (the
        # old shape paid two ArrowEvalPython stages AND evaluated
        # extract_text twice per row because the text-length filter was
        # pushed below the second projection — guide §4.1/§4.4; plan diff
        # in plans/r06/er_ingest_normalize_{before,after}.txt). text and
        # norm_text values are byte-identical: same frozen extractor, same
        # NFKC, same JVM normalization tail.
        df = df.withColumn("_ex", TX.extract_nfkc(F.col("html"))).drop("html")
        df = df.withColumn("text", F.col("_ex.text"))
        norm_src = TX.normalize_text_post_nfkc(F.col("_ex.nfkc_text"))
    else:
        df = df.drop("html")
        norm_src = TX.normalize_text(F.col("text"))

    df = df.where(F.col("text").isNotNull() & (F.length(F.trim("text")) >= min_chars))

    df = (
        df.withColumn("record_id", F.xxhash64("url"))
        .withColumn("domain", TX.domain_key(F.col("url")))
        .withColumn("norm_text", norm_src)
        .withColumn("tokens", TX.tokens(F.col("norm_text")))
        .withColumn(
            "title_norm", F.concat_ws(" ", F.slice(F.split("norm_text", " "), 1, 6))
        )
        .withColumn("brand", TX.parse_brand(F.col("norm_text")))
        .withColumn("price", TX.parse_price(F.col("text")))
    )
    return df.select(
        "record_id",
        "url",
        "domain",
        "warc_ts",
        "lang",
        "text",
        "norm_text",
        "tokens",
        "title_norm",
        "brand",
        "price",
    )
