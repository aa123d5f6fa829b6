"""Pairwise string-similarity features (the heart of the reference pipeline).

The reference computes token-set Jaccard, Levenshtein, Jaro-Winkler and
TF-IDF cosine per labeled/candidate pair with pandas/sklearn on one node.
Here: Jaccard and Levenshtein are Catalyst built-ins (JVM, whole-stage
codegen); Jaro-Winkler and sparse-cosine have no Spark built-in, so they run
in Arrow-batched scalar pandas UDFs (the only Python on the hot path — no
per-row Python UDFs, per the north rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# F1: token-set Jaccard — pure built-ins, codegen'd.
# --------------------------------------------------------------------------


def token_jaccard(tokens_l: Column, tokens_r: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over (already-distinct) token arrays; 0.0 on empty."""
    inter = F.size(F.array_intersect(tokens_l, tokens_r))
    union = F.size(F.array_union(tokens_l, tokens_r))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def jaccard_from_sizes(
    hashes_l: Column, hashes_r: Column, n_l: Column, n_r: Column
) -> Column:
    """Jaccard over pre-hashed distinct token arrays with precomputed set
    sizes: |A∩B| / (|A|+|B|-|A∩B|). One array_intersect instead of
    intersect+union — cheaper in allocation-bound hot loops."""
    inter = F.size(F.array_intersect(hashes_l, hashes_r)).cast("double")
    union = (n_l + n_r).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# F2: Levenshtein similarity — built-in edit distance normalized to [0,1].
# --------------------------------------------------------------------------


def levenshtein_sim(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len); both-empty => 1.0; null-safe => 0.0."""
    denom = F.greatest(F.length(a), F.length(b))
    sim = F.when(denom > 0, 1.0 - F.levenshtein(a, b).cast("double") / denom).otherwise(
        F.lit(1.0)
    )
    return F.coalesce(sim, F.lit(0.0))


# --------------------------------------------------------------------------
# F3: Jaro-Winkler — standard definition (p=0.1, max prefix 4, no boost
# threshold, matching DuckDB's jaro_winkler_similarity so the DuckDB oracle
# can differentially check it). Python implementation executed over Arrow
# batches in a scalar pandas UDF.
# --------------------------------------------------------------------------


def jaro(s: str, t: str) -> float:
    ls, lt = len(s), len(t)
    if ls == 0 and lt == 0:
        return 1.0
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    if window < 0:
        window = 0
    t_taken = [False] * lt
    matches = 0
    s_matched = []
    for i, cs in enumerate(s):
        lo = max(0, i - window)
        hi = min(lt, i + window + 1)
        for j in range(lo, hi):
            if not t_taken[j] and t[j] == cs:
                t_taken[j] = True
                matches += 1
                s_matched.append(cs)
                break
    if matches == 0:
        return 0.0
    t_matched = [t[j] for j in range(lt) if t_taken[j]]
    transpositions = sum(a != b for a, b in zip(s_matched, t_matched)) // 2
    m = float(matches)
    return (m / ls + m / lt + (m - transpositions) / m) / 3.0


def jaro_winkler(
    s: str, t: str, p: float = 0.1, max_prefix: int = 4, boost_threshold: float = 0.7
) -> float:
    """Winkler's original formulation: the common-prefix boost applies only
    when the Jaro similarity exceeds `boost_threshold` (0.7) — the same
    variant DuckDB's jaro_winkler_similarity implements, which keeps this
    feature differentially checkable against the SQL oracle."""
    j = jaro(s, t)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s[:max_prefix], t[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def _pack_chars(strs: list[str], width: int) -> np.ndarray:
    """(N, width) uint32 matrix of codepoints SHIFTED BY +1, zero-padded.

    The shift keeps 0 as an unambiguous padding sentinel even when the text
    contains U+0000 (plausible in scraped web text); all downstream uses are
    equality comparisons between two packed matrices, which the uniform
    shift preserves. Max codepoint 0x10FFFF + 1 still fits in uint32."""
    out = np.zeros((len(strs), width), dtype=np.uint32)
    for k, x in enumerate(strs):
        if x:
            out[k, : len(x)] = (
                np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32) + 1
            )
    return out


def jaro_winkler_batch(
    sa: list[str],
    sb: list[str],
    p: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> np.ndarray:
    """Vectorized Jaro-Winkler over a batch of string pairs.

    Same semantics as the scalar `jaro_winkler` (property-tested equal):
    the greedy match loop runs once per s-position but each step is a
    whole-batch numpy operation over the (N, len_t) char matrix, so the
    per-pair work is C loops instead of interpreted Python — the scalar
    char loop was the single largest Python cost on the 10^8-pair hot path.
    """
    n = len(sa)
    if n == 0:
        return np.zeros(0)
    ls = np.array([len(x) for x in sa], dtype=np.int64)
    lt = np.array([len(x) for x in sb], dtype=np.int64)
    Ls = max(int(ls.max()), max_prefix)
    Lt = max(int(lt.max()), max_prefix)
    S = _pack_chars(sa, Ls)
    T = _pack_chars(sb, Lt)

    window = np.maximum(np.maximum(ls, lt) // 2 - 1, 0)
    j_idx = np.arange(Lt)[None, :]
    lo = np.maximum(0, np.arange(Ls)[:, None] - window[None, :])  # (Ls, N)
    hi = np.minimum(lt[None, :], np.arange(Ls)[:, None] + window[None, :] + 1)

    taken = np.zeros((n, Lt), dtype=bool)
    s_match_char = np.zeros((n, Ls), dtype=np.uint32)
    for i in range(Ls):
        ci = S[:, i][:, None]  # (N, 1); 0 for rows with ls <= i
        mask = (
            (T == ci)
            & (ci != 0)
            & ~taken
            & (j_idx >= lo[i][:, None])
            & (j_idx < hi[i][:, None])
        )
        has = mask.any(axis=1)
        if not has.any():
            continue
        j_star = mask.argmax(axis=1)  # first available j, same greedy order
        taken[has, j_star[has]] = True
        s_match_char[has, i] = S[has, i]

    m = taken.sum(axis=1)
    max_m = int(m.max()) if n else 0
    trans = np.zeros(n, dtype=np.int64)
    if max_m > 0:
        s_flag = s_match_char != 0
        s_rank = np.cumsum(s_flag, axis=1) - 1
        t_rank = np.cumsum(taken, axis=1) - 1
        MS = np.zeros((n, max_m), dtype=np.uint32)
        MT = np.zeros((n, max_m), dtype=np.uint32)
        rows, cols = np.nonzero(s_flag)
        MS[rows, s_rank[rows, cols]] = S[rows, cols]
        rows, cols = np.nonzero(taken)
        MT[rows, t_rank[rows, cols]] = T[rows, cols]
        trans = ((MS != MT) & (MS != 0)).sum(axis=1) // 2

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (
            mf / np.maximum(ls, 1)
            + mf / np.maximum(lt, 1)
            + (mf - trans) / np.maximum(mf, 1.0)
        ) / 3.0
    j = np.where(m > 0, j, 0.0)
    both_empty = (ls == 0) & (lt == 0)
    j = np.where(both_empty, 1.0, j)

    pref_eq = (S[:, :max_prefix] == T[:, :max_prefix]) & (S[:, :max_prefix] != 0)
    prefix = np.cumprod(pref_eq, axis=1).sum(axis=1)
    return np.where(j > boost_threshold, j + prefix * p * (1.0 - j), j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    ok = np.array([x is not None and y is not None for x, y in zip(av, bv)])
    out = np.zeros(len(a))
    if ok.any():
        out[ok] = jaro_winkler_batch(list(av[ok]), list(bv[ok]))
    return pd.Series(out)


# --------------------------------------------------------------------------
# F4: TF-IDF cosine.
# Fit: document frequency by DataFrame aggregation (distributed, one shuffle)
#   -> idf(token) = ln((N+1)/(df+1)) + 1  (smoothed, sklearn-style).
# Vectors: per record, sorted (token-hash int64, l2-normalized weight) arrays
#   built with built-ins only.
# Score: sparse dot product per pair in an Arrow-batched pandas UDF.
# --------------------------------------------------------------------------


def fit_idf(offers: DataFrame, id_col: str = "record_id", tokens_col: str = "tokens") -> DataFrame:
    """Return (token string, idf double). Binary tf over distinct token sets.

    N (the corpus size) is folded in as a broadcast 1-row aggregate instead
    of a driver-side .count() — the whole fit stays one lazy plan with no
    extra action/pass over offers."""
    n_docs = offers.agg(F.count(F.lit(1)).alias("_n"))
    df_tok = (
        offers.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df_tok.crossJoin(F.broadcast(n_docs)).select(
        "token",
        (F.log((F.col("_n").cast("double") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )


def with_tfidf_vector(
    offers: DataFrame,
    idf: DataFrame,
    id_col: str = "record_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Attach sorted sparse tf-idf vectors: tfidf_idx array<bigint>,
    tfidf_val array<double> (L2-normalized). Tokens missing from the idf
    table (unseen at fit time) are dropped. Built-ins only."""
    tok = offers.select(F.col(id_col), F.explode(tokens_col).alias("token"))
    weighted = tok.join(idf, "token")  # inner: drops unseen tokens
    vec = (
        weighted.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.xxhash64("token").alias("h"), F.col("idf").alias("w")))
            ).alias("hw")
        )
        .select(
            id_col,
            F.col("hw.h").alias("tfidf_idx"),
            F.col("hw.w").alias("_raw_val"),
        )
    )
    norm = F.sqrt(
        F.aggregate("_raw_val", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return vec.select(
        id_col,
        "tfidf_idx",
        F.transform("_raw_val", lambda x: x / norm).alias("tfidf_val"),
    )


@F.pandas_udf(T.DoubleType())
def sparse_cosine_udf(
    idx_l: pd.Series, val_l: pd.Series, idx_r: pd.Series, val_r: pd.Series
) -> pd.Series:
    """Dot product of two sorted sparse L2-normalized vectors per row."""
    out = np.zeros(len(idx_l))
    il, vl = idx_l.to_numpy(dtype=object), val_l.to_numpy(dtype=object)
    ir, vr = idx_r.to_numpy(dtype=object), val_r.to_numpy(dtype=object)
    for i in range(len(out)):
        a, b = il[i], ir[i]
        if a is None or b is None or len(a) == 0 or len(b) == 0:
            continue
        a = np.asarray(a, dtype=np.int64)
        b = np.asarray(b, dtype=np.int64)
        _, ia, ib = np.intersect1d(a, b, assume_unique=True, return_indices=True)
        if len(ia):
            wa = np.asarray(vl[i], dtype=np.float64)[ia]
            wb = np.asarray(vr[i], dtype=np.float64)[ib]
            out[i] = float(np.dot(wa, wb))
    return pd.Series(out)


# --------------------------------------------------------------------------
# Fused pair scorer: ONE Arrow round trip for both Python-side features
# (Jaro-Winkler + sparse cosine). Within a batch, repeated string pairs
# (common: same-entity members share titles) are computed once via a
# factorized cache.
# --------------------------------------------------------------------------


_PAIR_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("jw_sim", T.DoubleType()),
        T.StructField("tfidf_cos", T.DoubleType()),
    ]
)


@F.pandas_udf(_PAIR_SCORES_SCHEMA)
def pair_scores_udf(
    a: pd.Series,
    b: pd.Series,
    idx_l: pd.Series,
    val_l: pd.Series,
    idx_r: pd.Series,
    val_r: pd.Series,
) -> pd.DataFrame:
    n = len(a)
    jw = np.zeros(n)
    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    # Factorize to unique pairs (same-entity members share titles, so
    # batches are duplicate-heavy), then one vectorized batch JW call.
    pair_code: dict[tuple, int] = {}
    code = np.full(n, -1, dtype=np.int64)
    ua: list[str] = []
    ub: list[str] = []
    for i in range(n):
        x, y = av[i], bv[i]
        if x is None or y is None:
            continue
        k = (x, y)
        c = pair_code.get(k)
        if c is None:
            c = len(ua)
            pair_code[k] = c
            ua.append(x)
            ub.append(y)
        code[i] = c
    if ua:
        uj = jaro_winkler_batch(ua, ub)
        valid = code >= 0
        jw[valid] = uj[code[valid]]

    # Per-row searchsorted loop, KEPT ON MEASUREMENT over a whole-batch
    # rank-compacted kernel (unique -> (row, rank) int64 keys -> one global
    # searchsorted + bincount): the batch kernel measured 3.1x SLOWER at the
    # real 10k-row Arrow batch shape (0.230s vs 0.074s; 4.6x slower at 100k)
    # because np.unique + rank lookups cost ~23us/row against ~7us/row of
    # numpy dispatch here — the per-row arrays (10-60 elems) are cache-hot.
    cos = np.zeros(n)
    il, vl = idx_l.to_numpy(dtype=object), val_l.to_numpy(dtype=object)
    ir, vr = idx_r.to_numpy(dtype=object), val_r.to_numpy(dtype=object)
    for i in range(n):
        ai, bi = il[i], ir[i]
        if ai is None or bi is None or len(ai) == 0 or len(bi) == 0:
            continue
        ai = np.asarray(ai, dtype=np.int64)
        bi = np.asarray(bi, dtype=np.int64)
        # both sides sorted (built upstream with sort_array): searchsorted
        # membership test beats intersect1d's concat+argsort
        if len(ai) > len(bi):
            ai, bi = bi, ai
            wa_all = np.asarray(vr[i], dtype=np.float64)
            wb_all = np.asarray(vl[i], dtype=np.float64)
        else:
            wa_all = np.asarray(vl[i], dtype=np.float64)
            wb_all = np.asarray(vr[i], dtype=np.float64)
        pos = np.searchsorted(bi, ai)
        pos[pos >= len(bi)] = len(bi) - 1
        hit = bi[pos] == ai
        if hit.any():
            cos[i] = float(np.dot(wa_all[hit], wb_all[pos[hit]]))
    return pd.DataFrame({"jw_sim": jw, "tfidf_cos": cos})


@F.pandas_udf(T.DoubleType())
def jw_pairs_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Factorized batch Jaro-Winkler (same dedupe trick as pair_scores_udf)
    for plans that compute the cosine JVM-side and only need JW from Python."""
    n = len(a)
    jw = np.zeros(n)
    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    pair_code: dict[tuple, int] = {}
    code = np.full(n, -1, dtype=np.int64)
    ua: list[str] = []
    ub: list[str] = []
    for i in range(n):
        x, y = av[i], bv[i]
        if x is None or y is None:
            continue
        k = (x, y)
        c = pair_code.get(k)
        if c is None:
            c = len(ua)
            pair_code[k] = c
            ua.append(x)
            ub.append(y)
        code[i] = c
    if ua:
        uj = jaro_winkler_batch(ua, ub)
        valid = code >= 0
        jw[valid] = uj[code[valid]]
    return pd.Series(jw)


def sparse_cosine_expr(
    idx_l: Column, val_l: Column, idx_r: Column, val_r: Column
) -> Column:
    """Sparse dot product of two sorted (idx, val) vectors as a pure JVM
    expression: array_intersect for the shared indices, then an aggregate
    over the intersection with map lookups for the weights. O(|inter| * n)
    comparisons per pair — but entirely JVM-side, so the KB-wide vectors
    never ride the Arrow transfer into the Python workers. Null/empty
    vectors score 0.0 (same contract as the pandas kernel)."""
    inter = F.array_intersect(idx_l, idx_r)
    # Weight lookup via array_position (linear scan over attribute
    # references): zero per-element allocation. A map_from_arrays lookup
    # table would be O(1) per probe but projection collapse inlines the map
    # construction into the lambda body — rebuilding the map per element.
    # k comes from the intersection so array_position is always >= 1
    # (element_at is 1-based; 0 would throw under ANSI).
    dot = F.aggregate(
        inter,
        F.lit(0.0),
        lambda acc, k: acc
        + F.element_at(val_l, F.array_position(idx_l, k).cast("int"))
        * F.element_at(val_r, F.array_position(idx_r, k).cast("int")),
    )
    return F.when(
        idx_l.isNotNull() & idx_r.isNotNull(), dot
    ).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# F9/F10: exact-equality flags and numeric closeness — built-ins.
# --------------------------------------------------------------------------


def eq_flag(a: Column, b: Column) -> Column:
    return F.when(a.isNotNull() & b.isNotNull() & (a == b), 1.0).otherwise(0.0)


def relative_closeness(a: Column, b: Column) -> Column:
    """1 - |a-b|/greatest(|a|,|b|); 0.0 when either side is null."""
    denom = F.greatest(F.abs(a), F.abs(b))
    sim = F.when(denom > 0, 1.0 - F.abs(a - b) / denom).otherwise(F.lit(1.0))
    return F.coalesce(sim, F.lit(0.0))
