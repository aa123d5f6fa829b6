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
    """Union of all blockers: (record_id, block_key).

    Round-6 shape (guide §2.4, §6): the three cheap blockers (pf/bm/dm) come
    from ONE scan of offers via a single projection + explode instead of
    three separate scan branches; the MinHash branch keeps its codegen'd
    explode/groupBy signature (a per-row signature expression was
    measured-REJECTED — see H.minhash_signature). Key strings and their
    multiset are identical to the old 4-branch union (pinned by
    tests/test_blocking.py::test_fused_all_block_keys_equals_branch_union):
    per input row the cheap array holds exactly the pf/bm/dm keys the three
    branches would emit, with each branch's row filter expressed as a
    null-mask that the explode-side filter drops.
    """
    st = F.sort_array(F.col("tokens"))
    pf_key = F.concat(
        F.lit("pf:"), F.concat_ws(" ", F.slice(st, 1, cfg.prefix_tokens))
    )
    bm_key = F.concat(
        F.lit("bm:"), F.concat_ws(" ", F.slice(F.split("norm_text", " "), 1, 2))
    )
    dm_key = F.concat_ws(":", F.lit("dm"), F.col("domain"), F.element_at(st, 1))
    cheap = offers.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.array(
                    F.when(F.length(pf_key) > 3, pf_key),
                    F.when(F.length(bm_key) > 3, bm_key),
                    F.when(
                        F.col("domain").isNotNull() & (F.size("tokens") > 0), dm_key
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("block_key"),
    )
    return cheap.unionByName(minhash_block_keys(offers, cfg, id_col))


def block_stats(blocks: DataFrame) -> DataFrame:
    """G1: block-size histogram — drives cap + salting decisions."""
    return blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("block_size"))


def cap_blocks(blocks: DataFrame, cfg: BlockingConfig, id_col: str = "record_id") -> DataFrame:
    """W1: keep the `block_cap` smallest ids per block (deterministic).

    Round 6: also attaches `_bsize` = post-cap block size via a second
    window over the SAME block_key partitioning (no extra exchange — the
    rows are already hash-partitioned and sorted from the row_number window,
    and the count window rides behind the rn filter so the WindowGroupLimit
    map-side pruning of giant blocks stays intact). candidate_pairs uses
    `_bsize` to split small vs hot blocks with a plain filter instead of
    recomputing a block-size aggregation per join branch — the old shape
    re-ran the stats exchange + hash-agg FOUR times (once per anti/semi
    branch side; plan-verified, plans/r06/er_block_pairs_before.txt).
    Classification is unchanged: post-cap size = min(pre-cap, block_cap),
    and block_cap > salt_threshold, so (post > salt_threshold) ==
    (pre > salt_threshold)."""
    w = W.partitionBy("block_key").orderBy(F.col(id_col))
    capped = (
        blocks.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cfg.block_cap)
        .drop("_rn")
    )
    return capped.withColumn(
        "_bsize", F.count(F.lit(1)).over(W.partitionBy("block_key"))
    )


def _key_slot() -> F.Column:
    """Blocker-priority slot of a block_key: pf=0, bm=1, dm=2, mh band b=3+b.

    The slot order is arbitrary but must be a fixed total order shared by
    every record — lowest-slot pair emission (below) relies on both members
    of a pair agreeing on which colliding key is 'first'."""
    head = F.substring("block_key", 1, 3)
    return (
        F.when(head == F.lit("pf:"), F.lit(0))
        .when(head == F.lit("bm:"), F.lit(1))
        .when(head == F.lit("dm:"), F.lit(2))
        .otherwise(F.lit(3) + F.split("block_key", ":").getItem(1).cast("int"))
    )


def with_key_vec(
    capped: DataFrame, cfg: BlockingConfig, id_col: str = "record_id"
) -> DataFrame:
    """Attach (_slot, _vec) to each capped block row: _vec[s] = xxhash64 of
    the record's SURVIVING key in slot s, or a record-unique filler where no
    key survived capping. Built post-cap on purpose: a key capped away must
    not count as a collision, or the pair it would have emitted elsewhere
    gets suppressed. One record_id-partitioned window (single exchange of
    the key rows), no join-back."""
    n_slots = 3 + cfg.lsh_bands
    w_rec = W.partitionBy(id_col)
    keyed = capped.select(
        F.col(id_col),
        "block_key",
        _key_slot().alias("_slot"),
        F.xxhash64("block_key").alias("_kh"),
    )
    keyed = keyed.withColumn(
        "_m",
        F.map_from_entries(F.collect_list(F.struct("_slot", "_kh")).over(w_rec)),
    )
    return keyed.withColumn(
        "_vec",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_slots - 1)),
            lambda s: F.coalesce(
                F.try_element_at("_m", s),
                # filler: record-dependent, so two records' fillers (or a
                # filler and a partner's real key hash) collide only at
                # xxhash64 odds (~2^-64) — the same collision tolerance the
                # engine already accepts for record ids themselves.
                F.xxhash64(F.col(id_col), F.lit(-1), s),
            ),
        ),
    ).drop("_m")


def candidate_pairs(
    blocks: DataFrame,
    cfg: BlockingConfig,
    id_col: str = "record_id",
    stats: DataFrame | None = None,
    emit: str = "all",
) -> DataFrame:
    """Distinct candidate pairs (id_l < id_r) from capped blocks.

    Small blocks: plain equi self-join on block_key (sort-merge/shuffled-hash,
    AQE decides). Hot blocks (> salt_threshold members): salted self-join so a
    single hot key's quadratic pair generation is spread across
    `salt_buckets` reducer partitions instead of one straggler task.

    emit="all" (default): every colliding key emits its pair; a final
    dropDuplicates exchange dedupes (dup factor ~1.6x measured at sf0.1).
    emit="lowest_slot" (round-5 experiment, VERDICT #3): each pair is
    emitted ONLY from its lowest colliding key slot, decided at
    pair-emission time by comparing the two records' per-slot key-hash
    vectors — output is already distinct, so the pair-row dedupe exchange
    (measured row-count-bound) disappears entirely, traded for one
    record_id window over the ~10x-smaller key-row table plus wider join
    rows. Set-equal to emit="all" (tested)."""
    if emit == "lowest_slot":
        blocks = with_key_vec(blocks, cfg, id_col)

    def _lowest(pairs: DataFrame) -> DataFrame:
        # keep the pair iff the FIRST slot where the two key vectors agree
        # is the slot this very join row came from
        first = F.array_position(
            F.zip_with("_vl", "_vr", lambda a, b: a == b), F.lit(True)
        )
        return pairs.where(first == F.col("_slot").cast("bigint") + 1)
    if stats is None and "_bsize" in blocks.columns:
        # Round 6: cap_blocks already attached the post-cap block size as a
        # window column over the same exchange, so the small/hot split is a
        # plain filter — no stats aggregation, no anti/semi joins. The old
        # broadcast-hot-keys shape re-evaluated the stats subtree (exchange
        # + two hash-aggs over every capped key row) once per join branch
        # side — four times in the executed plan (guide §2.4; plan diff in
        # plans/r06/er_block_pairs_{before,after}.txt). `_bsize` equals
        # block_stats(blocks).block_size by construction.
        small = blocks.where(F.col("_bsize") <= cfg.salt_threshold).drop("_bsize")
        hot = blocks.where(F.col("_bsize") > cfg.salt_threshold).drop("_bsize")
    else:
        # Fallback (raw key tables without _bsize, or caller-supplied stats):
        # the hot set (post-cap size > salt_threshold) is the skew tail —
        # tiny by construction — so broadcast it and split with semi/anti
        # joins; zero additional shuffle of the block table.
        if stats is None:
            stats = block_stats(blocks)
        blocks = blocks.drop("_bsize")
        hot_keys = F.broadcast(
            stats.where(F.col("block_size") > cfg.salt_threshold).select("block_key")
        )
        small = blocks.join(hot_keys, "block_key", "left_anti")
        hot = blocks.join(hot_keys, "block_key", "left_semi")

    vec_l = (
        [F.col("_slot"), F.col("_vec").alias("_vl")] if emit == "lowest_slot" else []
    )
    vec_r = [F.col("_vec").alias("_vr")] if emit == "lowest_slot" else []

    sl = small.select("block_key", F.col(id_col).alias("id_l"), *vec_l)
    sr = small.select("block_key", F.col(id_col).alias("id_r"), *vec_r)
    small_pairs = sl.join(sr, "block_key").where(F.col("id_l") < F.col("id_r"))

    s = cfg.salt_buckets
    left = hot.select(
        "block_key",
        F.col(id_col).alias("id_l"),
        H.salt(F.col(id_col), s).alias("_salt"),
        *vec_l,
    )
    right = hot.select(
        "block_key",
        F.col(id_col).alias("id_r"),
        F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("_salt"),
        *vec_r,
    )
    hot_pairs = left.join(right, ["block_key", "_salt"]).where(
        F.col("id_l") < F.col("id_r")
    )

    if emit == "lowest_slot":
        # Each pair survives in exactly one (block_key, slot) join row, so
        # the output is distinct by construction — no dedupe exchange.
        return _lowest(small_pairs).select("id_l", "id_r").unionByName(
            _lowest(hot_pairs).select("id_l", "id_r")
        )

    # U3: the same pair appears in many bands/blockers — dedupe before scoring
    # (correctness-critical: duplicate pairs would double-count in eval).
    return (
        small_pairs.select("id_l", "id_r")
        .unionByName(hot_pairs.select("id_l", "id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
