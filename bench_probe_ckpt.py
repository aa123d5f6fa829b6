"""Checkpoint-machinery decomposition (optimization round 6, throwaway probe).

Replicates pipeline.stage_offers/_checkpoint_stage step by step with wall
timing: build+write, metrics re-read+collect, marker commit, read-back; then
counts output files. Also times stage_attrs and stage_pairs the same way.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.functions import similarity as S  # noqa: E402
from entity_matching_in_online_retail_spark.operators import blocking as B  # noqa: E402
from entity_matching_in_online_retail_spark.operators import features as FE  # noqa: E402
from entity_matching_in_online_retail_spark.operators.normalize import normalize_web_pages  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_ckpt", cores=cores, shuffle_partitions=2 * cores)
sc = spark.sparkContext
pages = spark.read.parquet(os.path.join(REPO, ".bench_cache", "corpus_e20000", "web_pages"))
workdir = tempfile.mkdtemp(prefix="er_probe_")
pipe = ERPipeline(spark, workdir)
cfg = DEFAULT_CONFIG
n = cfg.n_checkpoint_partitions

LOG = []


def t(name, fn):
    t0 = time.time()
    out = fn()
    LOG.append((name, round(time.time() - t0, 3)))
    print(f"  {name}: {LOG[-1][1]}s", flush=True)
    return out


def nfiles(stage):
    return len(glob.glob(os.path.join(workdir, stage, "**", "*.parquet"), recursive=True))


# ---- offers, manual decomposition ----
def build_offers():
    off = normalize_web_pages(pages, lang=cfg.lang_filter, use_html=True)
    return off.withColumn("part_id", F.pmod(F.xxhash64("url"), F.lit(n)).cast("int"))

df = build_offers()
t("offers_write", lambda: pipe.catalog.write(df, "offers", mode="overwrite", partition_by=["part_id"], dynamic=True))
print("  offers files:", nfiles("offers"), flush=True)

def metrics_pass():
    written = pipe.catalog.read("offers")
    first_col = [c for c in written.columns if c != "part_id"][0]
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.pmod(F.xxhash64(first_col), F.lit(1_000_000_007))), F.lit(0)).alias("checksum"),
        F.min("warc_ts").cast("string").alias("min_ts"),
        F.max("warc_ts").cast("string").alias("max_ts"),
    ]
    return {int(r["part_id"]): r.asDict() for r in written.groupBy("part_id").agg(*aggs).collect()}

t("offers_metrics_pass", metrics_pass)
offers = t("offers_readback_plan", lambda: pipe.catalog.read("offers"))

# ---- attrs ----
def attrs_build_write():
    idf = S.fit_idf(offers)
    pipe.catalog.write(idf, "idf", mode="overwrite")
    idf2 = pipe.catalog.read("idf")
    attrs = FE.offers_with_vectors(offers, idf2)
    attrs = attrs.withColumn("part_id", F.pmod(F.xxhash64("record_id"), F.lit(n)).cast("int"))
    pipe.catalog.write(attrs, "attrs", mode="overwrite", partition_by=["part_id"], dynamic=True)

t("attrs_build_write", attrs_build_write)
print("  attrs files:", nfiles("attrs"), " idf files:", nfiles("idf"), flush=True)

def attrs_metrics():
    written = pipe.catalog.read("attrs")
    first_col = [c for c in written.columns if c != "part_id"][0]
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.pmod(F.xxhash64(first_col), F.lit(1_000_000_007))), F.lit(0)).alias("checksum"),
    ]
    return {int(r["part_id"]): r.asDict() for r in written.groupBy("part_id").agg(*aggs).collect()}

t("attrs_metrics_pass", attrs_metrics)

# ---- pairs ----
def pairs_keys_write():
    keys = B.all_block_keys(offers, cfg.blocking)
    pipe.catalog.write(keys, "block_keys", mode="overwrite")

t("block_keys_build_write", pairs_keys_write)
print("  block_keys files:", nfiles("block_keys"), flush=True)
keys = pipe.catalog.read("block_keys")
capped = t("cap_blocks_ckpt", lambda: B.cap_blocks(keys, cfg.blocking).localCheckpoint(eager=True))
pairs_df = B.candidate_pairs(capped, cfg.blocking).withColumn(
    "part_id", F.pmod(F.xxhash64("id_l", "id_r"), F.lit(n)).cast("int")
)
t("pairs_write", lambda: pipe.catalog.write(pairs_df, "pairs", mode="overwrite", partition_by=["part_id"], dynamic=True))
print("  pairs files:", nfiles("pairs"), flush=True)

def pairs_metrics():
    written = pipe.catalog.read("pairs")
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.pmod(F.xxhash64("id_l"), F.lit(1_000_000_007))), F.lit(0)).alias("checksum"),
    ]
    return {int(r["part_id"]): r.asDict() for r in written.groupBy("part_id").agg(*aggs).collect()}

t("pairs_metrics_pass", pairs_metrics)
t("pairs_count", lambda: pipe.catalog.read("pairs").count())

print({k: v for k, v in LOG})
import shutil

shutil.rmtree(workdir, ignore_errors=True)
spark.stop()
