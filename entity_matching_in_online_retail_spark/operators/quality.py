"""Corpus-quality dataflows for training-data pipelines: top-n-gram
repetition fraction (Gopher-rule analogue) and benchmark decontamination
(n-gram overlap against an eval set).

Shapes chosen for 10^12-doc scale:

- `top_ngram_fraction` is a pure per-document expression: sort the hashed
  gram identities, fold once for the longest equal run — O(L log L) per
  doc, zero shuffles. (The naive expression form — array_distinct +
  per-gram filter — is O(distinct x total), quadratic, and was never an
  option.) `top_ngram_fraction_agg` keeps the explode -> two keyed
  aggregations shape, linear and insensitive to single-document size, for
  corpora with >10^8-token outlier documents; both shuffles key on doc_id
  (+gram), near-uniform — no skew handling needed.
- `decontaminate` keys on the n-gram: the benchmark side is tiny (an eval
  set, thousands of docs) so its distinct n-gram set is broadcast; the
  corpus side streams map-side through the broadcast join — ONE shuffle
  total (the final per-doc count), zero for the flag-only variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.functions import text as TX
from entity_matching_in_online_retail_spark.functions import textstats as TS


def _doc_grams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) with gram = xxhash64 of the n adjacent tokens: identical
    group/join/distinct behavior to string grams (tokens contain no
    separator, so the mapping is injective up to 64-bit collisions) while
    the exploded rows and every downstream shuffle carry an 8-byte long
    instead of a concatenated string (measured 9.5s -> 4s on the 100k-doc
    top-gram agg; at corpus scale the gram exchange is the stage's bytes).
    """
    norm = TX.normalize_text(F.col(text_col), with_nfkc=False)
    # Tokens are projected as a REAL column first: the explode (Generate)
    # below blocks CollapseProject, so the normalize+split tree evaluates
    # once per document instead of once per element_at reference inside the
    # gram transform (which is O(len^2) re-evaluation — measured 8.0s ->
    # 1.5s on the 100k-doc top-gram agg).
    with_toks = docs.select(F.col(id_col), TX.tokens_seq(norm).alias("_toks"))
    return with_toks.select(
        F.col(id_col), F.explode(TS.hashed_ngrams(F.col("_toks"), n)).alias("gram")
    )


def top_ngram_fraction(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document fraction of n-gram occurrences taken by the single most
    frequent n-gram (Gopher top-n-gram filter signal).

    Returns (id_col, top_frac double). Documents with fewer than n tokens
    get top_frac = 0.0 (no n-grams — nothing to repeat).

    Pure per-document expression (sort hashed grams + fold for the longest
    equal run — functions/textstats.top_ngram_fraction_expr): zero
    shuffles, zero joins. The explode + two-keyed-aggs dataflow this
    replaced survives as top_ngram_fraction_agg for single documents whose
    gram array exceeds one task's memory (>10^8 tokens at 8 B/gram).
    """
    norm = TX.normalize_text(F.col(text_col), with_nfkc=False)
    with_toks = docs.select(F.col(id_col), TX.tokens_seq(norm).alias("_toks"))
    return with_toks.select(
        F.col(id_col),
        F.round(TS.top_ngram_fraction_expr(F.col("_toks"), n), 6).alias("top_frac"),
    )


def top_ngram_fraction_agg(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The distributed-aggregation form of top_ngram_fraction: explode ->
    per-(doc, gram) count -> per-doc max/sum -> left join back (0.0 fill).
    Linear per document and insensitive to single-document size — the shape
    to use when individual documents are too large to sort in one task.
    """
    per_gram = (
        _doc_grams(docs, id_col, text_col, n)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    frac = per_gram.groupBy(id_col).agg(
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_frac")
    )
    # Left join back so gram-less (short) documents still appear with 0.0.
    return docs.select(id_col).join(frac, id_col, "left").select(
        F.col(id_col), F.coalesce(F.round("top_frac", 6), F.lit(0.0)).alias("top_frac")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: documents sharing at least one token
    n-gram with the benchmark set, with the count of distinct shared grams.

    Returns (id_col, n_shared bigint) for contaminated documents only.
    The benchmark's distinct n-gram set is broadcast (eval sets are small
    by construction); the corpus never shuffles on the gram key.
    """
    bench_grams = _doc_grams(benchmark, id_col, text_col, n).select("gram").distinct()
    hits = _doc_grams(docs, id_col, text_col, n).join(
        F.broadcast(bench_grams), "gram", "inner"
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_shared")
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The EXISTENCE form of decontaminate: (id_col) of documents sharing
    at least one token n-gram with the benchmark set. A left-semi join
    against the broadcast benchmark gram set + one distinct — ONE
    corpus-wide exchange, versus two for decontaminate's per-doc distinct
    count ((id, gram) then (id)). Use when only the contaminated/clean
    verdict matters (min_shared == 1, the common funnel case)."""
    bench_grams = _doc_grams(benchmark, id_col, text_col, n).select("gram").distinct()
    return (
        _doc_grams(docs, id_col, text_col, n)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
