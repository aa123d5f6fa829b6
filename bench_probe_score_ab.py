"""Micro A/B for the scoring cheap phase (probe).

A: current shape — gate predicate fused into the r-side join condition
   (array_intersect appears 3x in the condition tree).
B: barrier shape — a nondeterministic column in the projection blocks
   predicate pushdown, so jaccard is computed ONCE per pair in a Project
   (with codegen CSE) and the gate is a plain Filter on the column.
C: full pair_features + score (end-to-end compute, noop).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.functions import similarity as S  # noqa: E402
from entity_matching_in_online_retail_spark.operators import features as FE  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import DEFAULT_MATCHER, ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.operators import model as M  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_score_ab", cores=cores, shuffle_partitions=2 * cores)
wd = "/tmp/er_block_ab"

import shutil  # noqa: E402

pages = spark.read.parquet(os.path.join(REPO, ".bench_cache", "corpus_e20000", "web_pages"))
pipe = ERPipeline(spark, wd)
offers = pipe.catalog.read("offers")
attrs = pipe.stage_attrs(offers)
pairs = pipe.stage_pairs(offers)
n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
g = DEFAULT_CONFIG.scoring.gate_jaccard

light_cols = ["record_id", "token_hashes", "n_tokens", "title_norm", "brand", "price"]
light_l = attrs.select([F.col(c).alias(f"l_{c}") for c in light_cols])
light_r = attrs.select([F.col(c).alias(f"r_{c}") for c in light_cols])


def cheap_A():
    p = pairs.select("id_l", "id_r").repartition(n_part)
    joined = p.join(light_l, p.id_l == light_l.l_record_id).join(
        light_r, p.id_r == light_r.r_record_id
    )
    joined = joined.where(
        S.jaccard_from_sizes(
            F.col("l_token_hashes"), F.col("r_token_hashes"),
            F.col("l_n_tokens"), F.col("r_n_tokens"),
        ) >= g
    )
    return joined.select(
        "id_l", "id_r",
        S.jaccard_from_sizes(
            F.col("l_token_hashes"), F.col("r_token_hashes"),
            F.col("l_n_tokens"), F.col("r_n_tokens"),
        ).alias("jaccard"),
        S.levenshtein_sim(F.col("l_title_norm"), F.col("r_title_norm")).alias("lev_sim"),
    )


def cheap_B():
    p = pairs.select("id_l", "id_r").repartition(n_part)
    joined = p.join(light_l, p.id_l == light_l.l_record_id).join(
        light_r, p.id_r == light_r.r_record_id
    )
    proj = joined.select(
        "id_l", "id_r", "l_title_norm", "r_title_norm",
        S.jaccard_from_sizes(
            F.col("l_token_hashes"), F.col("r_token_hashes"),
            F.col("l_n_tokens"), F.col("r_n_tokens"),
        ).alias("jaccard"),
        F.monotonically_increasing_id().alias("_nb"),
    )
    gated = proj.where(F.col("jaccard") >= g).drop("_nb")
    return gated.select(
        "id_l", "id_r", "jaccard",
        S.levenshtein_sim(F.col("l_title_norm"), F.col("r_title_norm")).alias("lev_sim"),
    )


def full_score():
    feats = FE.pair_features(
        pairs.select("id_l", "id_r").repartition(n_part), attrs, gate_jaccard=g
    )
    return M.score_pairs(feats, DEFAULT_MATCHER)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


walls = {"A_joincond": [], "B_barrier": [], "C_full": []}
for rep in range(3):
    for nme, fn in [("A_joincond", cheap_A), ("B_barrier", cheap_B), ("C_full", full_score)]:
        spark.sparkContext.setJobDescription(f"score {nme}")
        t0 = time.time()
        noop(fn())
        walls[nme].append(round(time.time() - t0, 2))
for nme in walls:
    print(f"{nme}: min={min(walls[nme])} reps={walls[nme]}", flush=True)
spark.stop()
