"""Hash-based primitives: MinHash signatures, LSH band keys, SimHash, salt.

MinHash/LSH is implemented as explicit DataFrame operations (not
pyspark.ml.MinHashLSH) so the blocking stage stays a pure, checkpointable
dataflow: explode tokens -> k seeded xxhash64 min-aggregations -> band hash.
One shuffle for the signature, no model object to persist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt(col: Column, buckets: int) -> Column:
    """Deterministic salt bucket in [0, buckets) (F8)."""
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def minhash_signature(
    df: DataFrame,
    id_col: str = "record_id",
    tokens_col: str = "tokens",
    k: int = 64,
) -> DataFrame:
    """(id, sig array<bigint>[k]): sig[i] = min over tokens of
    xxhash64(xxhash64(tok), i).

    Each token STRING is hashed exactly once; the k seeded variants rehash
    the resulting 8-byte long — ~1/3 cheaper than k string hashes per token
    (measured on the 250k-record bench corpus: 3.0s -> 2.1s warm at
    local[8]) and a smaller codegen unit. Rows with empty token arrays are
    dropped (no signature); the pipeline filters empty text upstream. Single
    groupBy shuffle; k min-aggregations run map-side partial so the shuffle
    carries k longs per id.

    Round-6 note: a per-row array_min(transform(...)) form (no shuffle,
    identical values) was implemented and measured-REJECTED: the k nested
    higher-order-function trees cost ~12s of one-time analysis/codegen per
    fresh JVM (vs ~2s for this plan) while the warm walls are equal — the
    codegen'd aggregation stays.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.transform(tokens_col, lambda t: F.xxhash64(t))).alias("_th"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("_th"), F.lit(i))).alias(f"_h{i}") for i in range(k)
    ]
    sig = tok.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(k)]).alias("sig")
    )


def lsh_band_keys(
    sig_df: DataFrame,
    bands: int,
    rows: int,
    id_col: str = "record_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Explode a signature into `bands` block keys: 'mh:{band}:{hash(rows)}'.

    Two records share a band key iff their signature agrees on all `rows`
    positions of that band => P(collision) = 1-(1-J^rows)^bands.
    """
    band_structs = []
    for b in range(bands):
        elems = [F.element_at(sig_col, b * rows + i + 1) for i in range(rows)]
        band_structs.append(F.xxhash64(F.lit(b), *elems).alias(f"_b{b}"))
    wide = sig_df.select(F.col(id_col), *band_structs)
    keys = F.array(
        *[
            F.concat_ws(":", F.lit("mh"), F.lit(str(b)), F.col(f"_b{b}"))
            for b in range(bands)
        ]
    )
    return wide.select(id_col, F.explode(keys).alias("block_key"))


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array, entirely with built-ins.

    For each bit position, sum +1/-1 according to xxhash64(token) bit, then
    take the sign. Expressed as 64 aggregate() reductions folded into one
    column expression tree — JVM-side, no Python.
    """
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))

    def _merge_for(bit: int):
        def _merge(acc, h):
            return acc + F.when(
                F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return _merge

    bit_cols = []
    for bit in range(64):
        contrib = F.aggregate(hashes, F.lit(0), _merge_for(bit))
        bit_cols.append(
            F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes: bit_count(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))
