"""Corpus deduplication operators (training-data-pipeline surface).

Exact dedup, MinHash+LSH near-dup, SimHash near-dup, and character-n-gram
Jaccard near-dup — all as declarative DataFrame dataflows over a
`(doc_id, text)`-shaped table. Scale notes per operator inline; every
candidate-generation step is hash-bucketed (no all-pairs comparison
anywhere), so each scales as O(candidates), not O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions import hashing as H
from ..functions import similarity as S
from ..functions import text as TX


# ---------------------------------------------------------------------------
# Exact dedup: one representative row per identical content.
# groupBy on a 128-bit content hash; representative = min doc_id
# (deterministic, unlike dropDuplicates). One shuffle, map-side partial agg.
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    w = W.partitionBy(F.md5(F.col(content_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """(content_hash, n_dups, keep_id) for groups with >1 identical copies."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# Character shingles (for n-gram Jaccard and shingle-MinHash dedup).
# ---------------------------------------------------------------------------


def char_shingles(norm_col: Column, n: int = 5) -> Column:
    """Distinct overlapping character n-grams of an already-normalized string.
    Built-ins only: transform over a position sequence + substring."""
    usable = F.greatest(F.length(norm_col) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), usable)
    return F.when(
        usable > 0,
        F.array_distinct(F.transform(idx, lambda i: norm_col.substr(i, F.lit(n)))),
    ).otherwise(F.array(norm_col))


def ngram_jaccard(a_norm: Column, b_norm: Column, n: int = 3) -> Column:
    """Character n-gram Jaccard between two normalized strings (built-ins)."""
    return S.token_jaccard(char_shingles(a_norm, n), char_shingles(b_norm, n))


# ---------------------------------------------------------------------------
# MinHash near-dup: shingle/tokenize -> minhash -> LSH bands -> bucket join
# -> exact Jaccard verification >= threshold. The verification join fetches
# token arrays for candidates only.
# ---------------------------------------------------------------------------


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.8,
    use_shingles: bool = False,
    shingle_n: int = 5,
) -> DataFrame:
    """(id_l, id_r, jaccard) for pairs with token/shingle Jaccard >= threshold."""
    norm = TX.normalize_text(F.col(text_col), with_nfkc=False)
    toks = char_shingles(norm, shingle_n) if use_shingles else TX.tokens(norm)
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).where(
        F.size("_toks") > 0
    )
    sig = H.minhash_signature(base, "_id", "_toks", k)
    keys = H.lsh_band_keys(sig, bands, rows, "_id")
    l = keys.select(F.col("block_key"), F.col("_id").alias("id_l"))
    r = keys.select(F.col("block_key"), F.col("_id").alias("id_r"))
    cand = (
        l.join(r, "block_key")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .dropDuplicates(["id_l", "id_r"])
    )
    # Round 6: both verification fetches probe the SAME unaliased token
    # subtree (alias after selection) so runtime exchange reuse builds the
    # broadcast once instead of twice (see features.pair_features).
    tl, tr = base.alias("_tl_side"), base.alias("_tr_side")
    verified = (
        cand.join(tl, cand.id_l == F.col("_tl_side._id"))
        .join(tr, cand.id_r == F.col("_tr_side._id"))
        .select(
            "id_l",
            "id_r",
            S.token_jaccard(
                F.col("_tl_side._toks"), F.col("_tr_side._toks")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash near-dup: 64-bit simhash split into (max_hamming + 1) chunks —
# pigeonhole: a pair within Hamming distance <= max_hamming cannot differ in
# ALL chunks, so it shares at least one chunk key (recall = 1 by
# construction); verify bit_count(xor) <= max_hamming. All built-ins.
# ---------------------------------------------------------------------------


# Pigeonhole blocking needs max_hamming+1 chunks of a 64-bit signature; chunk
# width w = 64/(max_hamming+1) gives 2^w distinct keys per position, and the
# expected candidate volume on n near-uniform signatures is
#   (max_hamming+1) * C(n, 2) / 2^w
# — at max_hamming=4 (w=12..13) that is ~n^2/4000 per position (fine); at
# max_hamming=8 (w=7..8) buckets hold ~n/256 docs and candidate generation
# goes quadratic at corpus scale.
#
# Radii ABOVE 4 (round 4) use the GENERALIZED pigeonhole: split into
# c = max_hamming + m chunks and key on every m-subset of chunks. Any
# max_hamming bit errors can dirty at most max_hamming chunks, leaving >= m
# clean ones, so some m-subset key matches exactly — recall is 100% by
# construction, same guarantee as the single-chunk scheme. The m-subset key
# is m*64/c bits wide; choosing the smallest m with width >= ~12 bits keeps
# expected bucket volume ~ C(c,m) * C(n,2) / 2^12 — sub-quadratic like the
# radius-4 case, at the cost of C(c,m) key rows per doc (45 at k=8, 455 at
# k=12). This was chosen over the sorted/byte-rotated-table neighbor scan
# the round-3 comment sketched because on Spark it is strictly better: no
# global sort (hash-partitioned bucket join instead of a range-partitioned
# window scan with boundary handling), deterministic 100% recall (the
# rotation scan's recall depends on permutation count and window size), and
# a provable volume bound. Above k=12 the key amplification (C(k+4,4) rows
# per doc at the next width step) outweighs the bucket savings — capped.
MAX_SIMHASH_HAMMING = 12


def _simhash_subset_m(max_hamming: int) -> int:
    """Smallest clean-chunk count m whose m-subset key is >= ~12 bits."""
    for m in (1, 2, 3):
        if m * 64 // (max_hamming + m) >= 12:
            return m
    raise ValueError(
        f"max_hamming={max_hamming} > {MAX_SIMHASH_HAMMING}: even 3-subset "
        "keys fall under 12 bits — candidate volume goes quadratic"
    )


def _chunk_value_cols(n_chunks: int) -> list:
    """The 64-bit `_sh` column split into n_chunks bit-slice value columns."""
    widths = [64 // n_chunks + (1 if i < 64 % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    cols = []
    for i in range(n_chunks):
        bits = F.shiftrightunsigned(F.col("_sh"), offsets[i])
        if widths[i] < 64:
            bits = bits.bitwiseAND(F.lit((1 << widths[i]) - 1))
        cols.append(bits)
    return cols


def simhash_chunk_keys(sig: DataFrame, max_hamming: int) -> DataFrame:
    """(_id, _sh, chunk) blocking keys: the 64-bit signature split into
    max_hamming+1 positional chunks (the m=1 pigeonhole; see module comment
    for the volume bound). Exposed so tests can account candidate volume as
    sum over chunk buckets of C(size, 2)."""
    vals = _chunk_value_cols(max_hamming + 1)
    chunk_cols = [
        F.concat_ws(":", F.lit(str(i)), v) for i, v in enumerate(vals)
    ]
    return sig.select("_id", "_sh", F.explode(F.array(*chunk_cols)).alias("chunk"))


def simhash_subset_keys(sig: DataFrame, max_hamming: int, m: int) -> DataFrame:
    """(_id, _sh, chunk) keys over every m-subset of c = max_hamming + m
    chunks: any max_hamming errors leave >= m chunks clean, so a true pair
    always shares at least one subset key (exact pigeonhole recall)."""
    from itertools import combinations

    c = max_hamming + m
    vals = _chunk_value_cols(c)
    subset_cols = [
        F.concat_ws(":", F.lit("-".join(map(str, s))), *[vals[i] for i in s])
        for s in combinations(range(c), m)
    ]
    return sig.select("_id", "_sh", F.explode(F.array(*subset_cols)).alias("chunk"))


def simhash_candidates(sig: DataFrame, max_hamming: int) -> DataFrame:
    """(id_l, id_r, hamming) pairs within max_hamming, from a (_id, _sh)
    signature table. Dispatches on radius: the plain chunk pigeonhole
    (m=1, cheapest) up to 4, the generalized m-subset pigeonhole beyond
    (still 100% recall, sub-quadratic volume — module comment), capped at
    MAX_SIMHASH_HAMMING where key amplification takes over."""
    if not 0 <= max_hamming <= MAX_SIMHASH_HAMMING:
        raise ValueError(
            f"max_hamming={max_hamming} out of range [0, {MAX_SIMHASH_HAMMING}]: "
            "even 3-subset pigeonhole keys fall under ~12 bits there — "
            "expected candidate volume ~ C(c,m)*n^2/2^width goes quadratic "
            "at corpus scale"
        )
    m = _simhash_subset_m(max_hamming)
    if m == 1:
        keys = simhash_chunk_keys(sig, max_hamming)
    else:
        keys = simhash_subset_keys(sig, max_hamming, m)
    l = keys.select("chunk", F.col("_id").alias("id_l"), F.col("_sh").alias("sh_l"))
    r = keys.select("chunk", F.col("_id").alias("id_r"), F.col("_sh").alias("sh_r"))
    return (
        l.join(r, "chunk")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", H.hamming64(F.col("sh_l"), F.col("sh_r")).alias("hamming"))
        .dropDuplicates(["id_l", "id_r"])
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    norm = TX.normalize_text(F.col(text_col), with_nfkc=False)
    base = df.select(
        F.col(id_col).alias("_id"), H.simhash64(TX.tokens(norm)).alias("_sh")
    )
    return simhash_candidates(base, max_hamming)


# ---------------------------------------------------------------------------
# Near-dup GROUPS: near-dup pairs -> transitive closure -> one canonical doc
# per group (what a training-data pipeline actually applies: keep the
# min-id representative, drop the rest). Reuses the large-star/small-star
# connected components of the ER clusterer.
# ---------------------------------------------------------------------------


def near_dup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """(doc_id, group_id, keep): every doc labeled with its near-dup group
    (group_id = min doc_id of the transitive closure; singletons are their
    own group), keep = True for exactly one doc per group."""
    from .cluster import assign_clusters, connected_components

    pairs = minhash_near_dups(df, id_col=id_col, text_col=text_col, threshold=threshold)
    comps = connected_components(pairs.select("id_l", "id_r"))
    ids = df.select(F.col(id_col).alias("record_id"))
    assigned = assign_clusters(ids, comps).select(
        F.col("record_id").alias(id_col), F.col("cluster_id").alias("group_id")
    )
    w = W.partitionBy("group_id").orderBy(F.col(id_col))
    return assigned.withColumn(
        "keep", F.row_number().over(w) == 1
    )


# ---------------------------------------------------------------------------
# Embedding near-dup: cosine >= threshold via multi-table random-hyperplane
# LSH (OR-construction): candidates collide in ANY of L tables, exact cosine
# verification on candidates only. A single 12-plane table (round-1 design)
# missed ~70% of pairs at threshold 0.95 — with L=8 tables x 6 planes the
# per-pair miss probability at cos=0.9 is (1 - p_bit^6)^8 ~ 1.8%
# (p_bit = 1 - acos(0.9)/pi ~ 0.856). One scan, one (table, bucket) join.
# ---------------------------------------------------------------------------


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 8,
    planes_per_table: int = 6,
    dims: int = 64,
) -> DataFrame:
    from . import ann

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # Narrow (table, bucket, id) rows ride the bucket join + pair dedupe;
    # the 64-float vectors are fetched for CANDIDATES only (same shuffle
    # diet as minhash_near_dups — vectors never ride a candidate exchange).
    bucketed = ann.with_table_buckets(
        base, "_v", n_tables=n_tables, planes_per_table=planes_per_table, dims=dims
    ).select("table", "bucket", "_id")
    l = bucketed.select("table", "bucket", F.col("_id").alias("id_l"))
    r = bucketed.select("table", "bucket", F.col("_id").alias("id_r"))
    cand = (
        l.join(r, ["table", "bucket"])
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .dropDuplicates(["id_l", "id_r"])
    )
    vl = base.select(F.col("_id").alias("id_l"), F.col("_v").alias("v_l"))
    vr = base.select(F.col("_id").alias("id_r"), F.col("_v").alias("v_r"))
    return (
        cand.join(vl, "id_l")
        .join(vr, "id_r")
        .select("id_l", "id_r", ann.cosine_sim(F.col("v_l"), F.col("v_r")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
