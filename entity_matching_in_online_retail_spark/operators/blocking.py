"""Blocking: normalized keys + MinHash/LSH, block capping, salted self-join.

Per the north rule: "blocking is done with salted repartitioning on
minhash/LSH + normalized-domain keys to bound candidate-pair explosion and
tame skew". Three blockers, unioned, then capped and deduped:

  pf:  sorted-prefix key   — first `prefix_tokens` of sort_array(tokens)
  dm:  domain key          — registrable domain + first sorted token
  mh:  MinHash LSH bands   — b bands x r rows over xxhash64-seeded signature

Skew strategy (scale design, 100 TB):
  1. G1 block-size histogram (one cheap agg) drives decisions per key.
  2. W1 per-block cap: blocks larger than `block_cap` keep the `block_cap`
     smallest record_ids (deterministic) — bounds worst-case pairs per block
     to cap^2/2 regardless of input skew.
  3. J7 salted self-join for blocks above `salt_threshold`: the left side
     keeps its own salt s(id), the right side is replicated x`salt_buckets`,
     joining on (block_key, salt). Every pair is produced exactly once while
     a hot block's pair generation spreads over `salt_buckets` reducer keys.
  4. AQE skew-join splitting remains enabled as a backstop for residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..config import BlockingConfig
from ..functions import hashing as H


def prefix_block_keys(
    offers: DataFrame, cfg: BlockingConfig, id_col: str = "record_id"
) -> DataFrame:
    """'pf:<tok1> <tok2>' from the lexicographically-first tokens."""
    key = F.concat_ws(
        " ", F.slice(F.sort_array("tokens"), 1, cfg.prefix_tokens)
    )
    return offers.select(
        F.col(id_col), F.concat(F.lit("pf:"), key).alias("block_key")
    ).where(F.length("block_key") > 3)


def leading_token_block_keys(
    offers: DataFrame, id_col: str = "record_id"
) -> DataFrame:
    """'bm:<tok1> <tok2>' from the leading tokens of the normalized text
    (brand+model position in product-offer text) — catches heavily-perturbed
    pairs whose head survived intact."""
    key = F.concat_ws(" ", F.slice(F.split("norm_text", " "), 1, 2))
    return offers.select(
        F.col(id_col), F.concat(F.lit("bm:"), key).alias("block_key")
    ).where(F.length("block_key") > 3)


def domain_block_keys(offers: DataFrame, id_col: str = "record_id") -> DataFrame:
    """'dm:<domain>:<first sorted token>' — normalized-domain blocker."""
    key = F.concat_ws(
        ":", F.lit("dm"), F.col("domain"), F.element_at(F.sort_array("tokens"), 1)
    )
    return offers.select(F.col(id_col), key.alias("block_key")).where(
        F.col("domain").isNotNull() & (F.size("tokens") > 0)
    )


def minhash_block_keys(
    offers: DataFrame, cfg: BlockingConfig, id_col: str = "record_id"
) -> DataFrame:
    sigs = H.minhash_signature(
        offers.where(F.size("tokens") > 0), id_col, "tokens", cfg.minhash_k
    )
    return H.lsh_band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows, id_col)


def all_block_keys(
    offers: DataFrame, cfg: BlockingConfig, id_col: str = "record_id"
) -> DataFrame:
    """Union of all blockers: (record_id, block_key)."""
    return (
        prefix_block_keys(offers, cfg, id_col)
        .unionByName(leading_token_block_keys(offers, id_col))
        .unionByName(domain_block_keys(offers, id_col))
        .unionByName(minhash_block_keys(offers, cfg, id_col))
    )


def block_stats(blocks: DataFrame) -> DataFrame:
    """G1: block-size histogram — drives cap + salting decisions."""
    return blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("block_size"))


def cap_blocks(blocks: DataFrame, cfg: BlockingConfig, id_col: str = "record_id") -> DataFrame:
    """W1: keep the `block_cap` smallest ids per block (deterministic)."""
    w = W.partitionBy("block_key").orderBy(F.col(id_col))
    return (
        blocks.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cfg.block_cap)
        .drop("_rn")
    )


def candidate_pairs(
    blocks: DataFrame,
    cfg: BlockingConfig,
    id_col: str = "record_id",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_l < id_r) from capped blocks.

    Small blocks: plain equi self-join on block_key (sort-merge/shuffled-hash,
    AQE decides). Hot blocks (> salt_threshold members): salted self-join so a
    single hot key's quadratic pair generation is spread across
    `salt_buckets` reducer partitions instead of one straggler task.
    """
    if stats is None:
        stats = block_stats(blocks)
    # Round-1 joined the FULL (record_id, block_key) table against stats —
    # a shuffle of every block row just to learn which keys are hot. The hot
    # set (post-cap size > salt_threshold) is the skew tail: tiny by
    # construction (bounded count of keys that survived capping above the
    # threshold), so broadcast it and split with semi/anti joins — zero
    # additional shuffle of the block table, which after cap_blocks is
    # already hash-partitioned by block_key.
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
        "block_key",
        F.col(id_col).alias("id_l"),
        H.salt(F.col(id_col), s).alias("_salt"),
    )
    right = hot.select(
        "block_key",
        F.col(id_col).alias("id_r"),
        F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
    )
    hot_pairs = left.join(right, ["block_key", "_salt"]).where(
        F.col("id_l") < F.col("id_r")
    )

    # U3: the same pair appears in many bands/blockers — dedupe before scoring
    # (correctness-critical: duplicate pairs would double-count in eval).
    return (
        small_pairs.select("id_l", "id_r")
        .unionByName(hot_pairs.select("id_l", "id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
