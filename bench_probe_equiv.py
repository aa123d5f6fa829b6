"""Equivalence check: round-6 blocking rewrite vs legacy shapes (probe).

Compares (a) fused all_block_keys vs 4-branch union, (b) per-row minhash
signature vs explode/groupBy aggregation, (c) candidate_pairs via _bsize
filter vs stats broadcast joins — on the bench corpus offers. Exact multiset
checksums + counts.
"""

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
from entity_matching_in_online_retail_spark.operators.normalize import normalize_web_pages  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_equiv", cores=cores, shuffle_partitions=2 * cores)
pages = spark.read.parquet(os.path.join(REPO, ".bench_cache", "corpus_e20000", "web_pages"))
cfg = DEFAULT_CONFIG.blocking
offers = normalize_web_pages(pages, lang="en", use_html=True).localCheckpoint(eager=True)


def legacy_minhash_signature(df, id_col="record_id", tokens_col="tokens", k=64):
    tok = df.select(
        F.col(id_col),
        F.explode(F.transform(tokens_col, lambda t: F.xxhash64(t))).alias("_th"),
    )
    aggs = [F.min(F.xxhash64(F.col("_th"), F.lit(i))).alias(f"_h{i}") for i in range(k)]
    sig = tok.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[F.col(f"_h{i}") for i in range(k)]).alias("sig"))


def legacy_all_block_keys(offers, cfg, id_col="record_id"):
    sigs = legacy_minhash_signature(
        offers.where(F.size("tokens") > 0), id_col, "tokens", cfg.minhash_k
    )
    mh = H.lsh_band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows, id_col)
    pf = offers.select(
        F.col(id_col),
        F.concat(
            F.lit("pf:"),
            F.concat_ws(" ", F.slice(F.sort_array("tokens"), 1, cfg.prefix_tokens)),
        ).alias("block_key"),
    ).where(F.length("block_key") > 3)
    bm = offers.select(
        F.col(id_col),
        F.concat(
            F.lit("bm:"), F.concat_ws(" ", F.slice(F.split("norm_text", " "), 1, 2))
        ).alias("block_key"),
    ).where(F.length("block_key") > 3)
    dm = offers.select(
        F.col(id_col),
        F.concat_ws(
            ":", F.lit("dm"), F.col("domain"), F.element_at(F.sort_array("tokens"), 1)
        ).alias("block_key"),
    ).where(F.col("domain").isNotNull() & (F.size("tokens") > 0))
    return pf.unionByName(bm).unionByName(dm).unionByName(mh)


def multiset_checksum(df, cols):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007))), F.lit(0)).alias("h"),
    ).first()


def legacy_candidate_pairs(blocks, cfg, id_col="record_id"):
    blocks = blocks.drop("_bsize")
    stats = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("block_size"))
    hot_keys = F.broadcast(
        stats.where(F.col("block_size") > cfg.salt_threshold).select("block_key")
    )
    small = blocks.join(hot_keys, "block_key", "left_anti")
    hot = blocks.join(hot_keys, "block_key", "left_semi")
    sl = small.select("block_key", F.col(id_col).alias("id_l"))
    sr = small.select("block_key", F.col(id_col).alias("id_r"))
    small_pairs = sl.join(sr, "block_key").where(F.col("id_l") < F.col("id_r"))
    s = cfg.salt_buckets
    left = hot.select(
        "block_key", F.col(id_col).alias("id_l"), H.salt(F.col(id_col), s).alias("_salt")
    )
    right = hot.select(
        "block_key",
        F.col(id_col).alias("id_r"),
        F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
    )
    hot_pairs = left.join(right, ["block_key", "_salt"]).where(F.col("id_l") < F.col("id_r"))
    return (
        small_pairs.select("id_l", "id_r")
        .unionByName(hot_pairs.select("id_l", "id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )


t0 = time.time()
new_keys = B.all_block_keys(offers, cfg)
r_new = multiset_checksum(new_keys, ["record_id", "block_key"])
t_new = time.time() - t0
t0 = time.time()
old_keys = legacy_all_block_keys(offers, cfg)
r_old = multiset_checksum(old_keys, ["record_id", "block_key"])
t_old = time.time() - t0
print(f"keys new: n={r_new['n']} h={r_new['h']} ({t_new:.2f}s)")
print(f"keys old: n={r_old['n']} h={r_old['h']} ({t_old:.2f}s)")
assert (r_new["n"], r_new["h"]) == (r_old["n"], r_old["h"]), "KEY MISMATCH"

capped = B.cap_blocks(new_keys, cfg).localCheckpoint(eager=True)
t0 = time.time()
p_new = multiset_checksum(B.candidate_pairs(capped, cfg), ["id_l", "id_r"])
t_pn = time.time() - t0
t0 = time.time()
p_old = multiset_checksum(legacy_candidate_pairs(capped, cfg), ["id_l", "id_r"])
t_po = time.time() - t0
print(f"pairs new: n={p_new['n']} h={p_new['h']} ({t_pn:.2f}s)")
print(f"pairs old: n={p_old['n']} h={p_old['h']} ({t_po:.2f}s)")
assert (p_new["n"], p_new["h"]) == (p_old["n"], p_old["h"]), "PAIR MISMATCH"
print("EQUIVALENT")
spark.stop()
