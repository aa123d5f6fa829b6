"""Probe: can the l/r attribute fetches share ONE broadcast build via
DataFrame.alias (ReuseExchange), and is it faster than two aliased-select
broadcasts? Checks the executed plan for ReusedExchange and times both."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.functions import similarity as S  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_reuse", cores=cores, shuffle_partitions=2 * cores)
pipe = ERPipeline(spark, "/tmp/er_block_ab")
attrs = pipe.catalog.read("attrs")
pairs = pipe.catalog.read("pairs").select("id_l", "id_r")
g = DEFAULT_CONFIG.scoring.gate_jaccard
light_cols = ["record_id", "token_hashes", "n_tokens", "title_norm", "brand", "price"]


def gate(joined, l, r, nl, nr):
    return joined.where(S.jaccard_from_sizes(F.col(l), F.col(r), F.col(nl), F.col(nr)) >= g)


def twin_aliased():
    light_l = attrs.select([F.col(c).alias(f"l_{c}") for c in light_cols])
    light_r = attrs.select([F.col(c).alias(f"r_{c}") for c in light_cols])
    p = pairs.repartition(2 * cores)
    j = p.join(light_l, p.id_l == light_l.l_record_id).join(
        light_r, p.id_r == light_r.r_record_id
    )
    j = gate(j, "l_token_hashes", "r_token_hashes", "l_n_tokens", "r_n_tokens")
    return j.select(
        "id_l", "id_r",
        S.levenshtein_sim(F.col("l_title_norm"), F.col("r_title_norm")).alias("lev_sim"),
    )


def shared_subtree():
    light = attrs.select(*light_cols)
    p = pairs.repartition(2 * cores)
    L = light.alias("L")
    R = light.alias("R")
    j = p.join(L, p.id_l == F.col("L.record_id")).join(R, p.id_r == F.col("R.record_id"))
    j = gate(j, "L.token_hashes", "R.token_hashes", "L.n_tokens", "R.n_tokens")
    return j.select(
        "id_l", "id_r",
        S.levenshtein_sim(F.col("L.title_norm"), F.col("R.title_norm")).alias("lev_sim"),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for nme, fn in [("twin_aliased", twin_aliased), ("shared_subtree", shared_subtree)]:
    plan = fn()._jdf.queryExecution().executedPlan().toString()
    print(nme, "ReusedExchange" in plan, "BroadcastExchange count:", plan.count("BroadcastExchange"))

walls = {"twin_aliased": [], "shared_subtree": []}
for rep in range(3):
    for nme, fn in [("twin_aliased", twin_aliased), ("shared_subtree", shared_subtree)]:
        spark.sparkContext.setJobDescription(f"reuse {nme}")
        t0 = time.time()
        noop(fn())
        walls[nme].append(round(time.time() - t0, 2))
for nme in walls:
    print(f"{nme}: min={min(walls[nme])} reps={walls[nme]}", flush=True)
spark.stop()
