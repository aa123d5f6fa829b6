"""Micro A/B of all_block_keys variants (probe). One JVM, each variant run
twice with noop sink, min reported; variants alternated to balance drift."""

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
spark = get_spark("probe_keys_ab", cores=cores, shuffle_partitions=2 * cores)
pipe_dir = "/tmp/er_block_ab"
offers = spark.read.parquet(os.path.join(pipe_dir, "offers"))
cfg = DEFAULT_CONFIG.blocking


def legacy_minhash_signature(df, id_col="record_id", tokens_col="tokens", k=64):
    tok = df.select(
        F.col(id_col),
        F.explode(F.transform(tokens_col, lambda t: F.xxhash64(t))).alias("_th"),
    )
    aggs = [F.min(F.xxhash64(F.col("_th"), F.lit(i))).alias(f"_h{i}") for i in range(k)]
    sig = tok.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[F.col(f"_h{i}") for i in range(k)]).alias("sig"))


def legacy_keys():
    sigs = legacy_minhash_signature(
        offers.where(F.size("tokens") > 0), "record_id", "tokens", cfg.minhash_k
    )
    mh = H.lsh_band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows, "record_id")
    return (
        B.prefix_block_keys(offers, cfg)
        .unionByName(B.leading_token_block_keys(offers))
        .unionByName(B.domain_block_keys(offers))
        .unionByName(mh)
    )


def new_keys():
    return B.all_block_keys(offers, cfg)


def new_keys_repart():
    return B.all_block_keys(offers.repartition(2 * cores), cfg)


def hybrid_keys():
    """Cheap blockers in one scan (no minhash sig per-row); mh via legacy
    groupBy signature. Two scans total."""
    st = F.sort_array(F.col("tokens"))
    pf_key = F.concat(F.lit("pf:"), F.concat_ws(" ", F.slice(st, 1, cfg.prefix_tokens)))
    bm_key = F.concat(F.lit("bm:"), F.concat_ws(" ", F.slice(F.split("norm_text", " "), 1, 2)))
    dm_key = F.concat_ws(":", F.lit("dm"), F.col("domain"), F.element_at(st, 1))
    cheap = offers.select(
        F.col("record_id"),
        F.explode(
            F.filter(
                F.array(
                    F.when(F.length(pf_key) > 3, pf_key),
                    F.when(F.length(bm_key) > 3, bm_key),
                    F.when(F.col("domain").isNotNull() & (F.size("tokens") > 0), dm_key),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("block_key"),
    )
    sigs = legacy_minhash_signature(
        offers.where(F.size("tokens") > 0), "record_id", "tokens", cfg.minhash_k
    )
    mh = H.lsh_band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows, "record_id")
    return cheap.unionByName(mh)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


variants = [
    ("legacy", legacy_keys),
    ("new", new_keys),
    ("new_repart", new_keys_repart),
    ("hybrid", hybrid_keys),
]
walls = {n: [] for n, _ in variants}
for _rep in range(3):
    for nme, fn in variants:
        spark.sparkContext.setJobDescription(f"keys {nme}")
        t0 = time.time()
        noop(fn())
        walls[nme].append(round(time.time() - t0, 2))
for nme in walls:
    print(f"{nme}: min={min(walls[nme])} reps={walls[nme]}", flush=True)
spark.stop()
