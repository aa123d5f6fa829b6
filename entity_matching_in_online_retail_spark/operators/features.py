"""Pairwise feature computation over candidate-pair DataFrames.

J3 pair-attribute fetch: the pair table joins `offers` twice (once per side).
At cluster scale `offers` is bucketed/repartitioned by record_id so these are
co-partitioned shuffles (storage-partitioned joins on Iceberg in prod).

Features (ScoringConfig.feature_cols order):
  jaccard    token-set Jaccard            — built-in (codegen)
  lev_sim    normalized Levenshtein on title_norm — built-in (codegen)
  jw_sim     Jaro-Winkler on title_norm   — Arrow-batched pandas UDF
  tfidf_cos  TF-IDF cosine on full text   — sparse vectors + pandas UDF
  price_sim  relative price closeness     — built-in
  brand_eq   exact brand equality flag    — built-in
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as S

ATTR_COLS = ["record_id", "tokens", "title_norm", "brand", "price", "tfidf_idx", "tfidf_val"]


def offers_with_vectors(offers: DataFrame, idf: DataFrame) -> DataFrame:
    """Attach tf-idf sparse vectors; select only what scoring needs."""
    vec = S.with_tfidf_vector(offers, idf)
    return offers.select(
        "record_id", "tokens", "title_norm", "brand", "price"
    ).join(vec, "record_id", "left")


def pair_features(pairs: DataFrame, attrs: DataFrame) -> DataFrame:
    """(id_l, id_r) -> feature columns. attrs = offers_with_vectors output."""
    left = attrs.select([F.col(c).alias(f"l_{c}") for c in ATTR_COLS])
    right = attrs.select([F.col(c).alias(f"r_{c}") for c in ATTR_COLS])
    df = (
        pairs.join(left, pairs.id_l == left.l_record_id)
        .join(right, pairs.id_r == right.r_record_id)
    )
    return df.select(
        "id_l",
        "id_r",
        S.token_jaccard(F.col("l_tokens"), F.col("r_tokens")).alias("jaccard"),
        S.levenshtein_sim(F.col("l_title_norm"), F.col("r_title_norm")).alias("lev_sim"),
        S.jaro_winkler_udf(F.col("l_title_norm"), F.col("r_title_norm")).alias("jw_sim"),
        S.sparse_cosine_udf(
            F.col("l_tfidf_idx"), F.col("l_tfidf_val"), F.col("r_tfidf_idx"), F.col("r_tfidf_val")
        ).alias("tfidf_cos"),
        S.relative_closeness(F.col("l_price"), F.col("r_price")).alias("price_sim"),
        S.eq_flag(F.col("l_brand"), F.col("r_brand")).alias("brand_eq"),
    )
