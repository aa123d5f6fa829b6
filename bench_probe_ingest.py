"""Ingest-stage micro-decomposition (optimization round 6, throwaway probe).

Times cumulative prefixes of the normalize_web_pages dataflow with noop
sinks, twice each (min), to find where er_ingest_normalize's ~10s goes.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.functions import text as TX  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_ingest", cores=cores, shuffle_partitions=2 * cores)
sc = spark.sparkContext
pages = spark.read.parquet(os.path.join(REPO, ".bench_cache", "corpus_e20000", "web_pages"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, build):
    walls = []
    for _ in range(2):
        sc.setJobDescription(f"probe: {name}")
        t0 = time.time()
        noop(build())
        walls.append(round(time.time() - t0, 3))
    print(f"{name}: min={min(walls)} reps={walls}", flush=True)


w = W.partitionBy("url").orderBy(F.col("warc_ts").desc())


def base():
    return pages.where(F.col("lang") == "en")


def with_window():
    df = base()
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def with_extract():
    return with_window().withColumn("text", TX.extract_text(F.col("html"))).drop("html")


def with_norm():
    df = with_extract()
    df = df.where(F.col("text").isNotNull() & (F.length(F.trim("text")) >= 1))
    return df.withColumn("norm_text", TX.normalize_text(F.col("text")))


def with_norm_nonfkc():
    df = with_extract()
    df = df.where(F.col("text").isNotNull() & (F.length(F.trim("text")) >= 1))
    return df.withColumn("norm_text", TX.normalize_text(F.col("text"), with_nfkc=False))


def full():
    df = with_norm()
    df = (
        df.withColumn("record_id", F.xxhash64("url"))
        .withColumn("domain", TX.domain_key(F.col("url")))
        .withColumn("tokens", TX.tokens(F.col("norm_text")))
        .withColumn("title_norm", F.concat_ws(" ", F.slice(F.split("norm_text", " "), 1, 6)))
        .withColumn("brand", TX.parse_brand(F.col("norm_text")))
        .withColumn("price", TX.parse_price(F.col("text")))
    )
    return df


t("scan_filter", base)
t("plus_window", with_window)
t("plus_extract", with_extract)
t("plus_norm_nfkc", with_norm)
t("plus_norm_NO_nfkc", with_norm_nonfkc)
t("full_normalize", full)
spark.stop()
