"""Micro A/B: candidate_pairs _bsize filter split vs legacy stats broadcast
joins, same checkpointed capped input, alternated, noop sink (probe)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.functions import hashing as H  # noqa: E402
from entity_matching_in_online_retail_spark.operators import blocking as B  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_pairs_ab", cores=cores, shuffle_partitions=2 * cores)
offers = spark.read.parquet("/tmp/er_block_ab/offers")
cfg = DEFAULT_CONFIG.blocking
capped = B.cap_blocks(B.all_block_keys(offers, cfg), cfg).localCheckpoint(eager=True)


def legacy_candidate_pairs(blocks):
    blocks = blocks.drop("_bsize")
    stats = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("block_size"))
    hot_keys = F.broadcast(
        stats.where(F.col("block_size") > cfg.salt_threshold).select("block_key")
    )
    small = blocks.join(hot_keys, "block_key", "left_anti")
    hot = blocks.join(hot_keys, "block_key", "left_semi")
    sl = small.select("block_key", F.col("record_id").alias("id_l"))
    sr = small.select("block_key", F.col("record_id").alias("id_r"))
    small_pairs = sl.join(sr, "block_key").where(F.col("id_l") < F.col("id_r"))
    s = cfg.salt_buckets
    left = hot.select(
        "block_key", F.col("record_id").alias("id_l"), H.salt(F.col("record_id"), s).alias("_salt")
    )
    right = hot.select(
        "block_key",
        F.col("record_id").alias("id_r"),
        F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
    )
    hot_pairs = left.join(right, ["block_key", "_salt"]).where(F.col("id_l") < F.col("id_r"))
    return (
        small_pairs.select("id_l", "id_r")
        .unionByName(hot_pairs.select("id_l", "id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


walls = {"new": [], "legacy": []}
for rep in range(4):
    for nme, fn in [("new", lambda: B.candidate_pairs(capped, cfg)), ("legacy", lambda: legacy_candidate_pairs(capped))]:
        spark.sparkContext.setJobDescription(f"pairs {nme}")
        t0 = time.time()
        noop(fn())
        walls[nme].append(round(time.time() - t0, 2))
for nme in walls:
    print(f"{nme}: min={min(walls[nme])} reps={walls[nme]}", flush=True)
spark.stop()
