"""Unit tests for the round-5 corpus-quality surface: repetition signals
(token n-grams, dup-/top-n-gram fractions), benchmark decontamination, PII
redaction, and deterministic hash sampling. The cross-engine value checks
live in the DuckDB oracle sweep (test_entry_oracle.py); these pin the
SEMANTICS on constructed documents where the right answer is known by hand.
"""

import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.functions import text as TX
from entity_matching_in_online_retail_spark.functions import textstats as TS
from entity_matching_in_online_retail_spark.operators import quality as Q


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- n-grams


def test_token_ngrams_basic_and_short(spark):
    df = _docs(spark, ["a b c d", "a b", "a", ""])
    toks = TX.tokens_seq(TX.normalize_text(F.col("text"), with_nfkc=False))
    rows = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", TS.token_ngrams(toks, 3).alias("g")).collect()
    }
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []  # shorter than n -> empty, NOT a descending sequence
    assert rows[2] == []
    assert rows[3] == []


def test_token_ngrams_preserves_duplicates_and_order(spark):
    # tokens() dedups (set semantics); tokens_seq must not.
    df = _docs(spark, ["x y x y x"])
    toks = TX.tokens_seq(TX.normalize_text(F.col("text"), with_nfkc=False))
    [r] = df.select(TS.token_ngrams(toks, 2).alias("g")).collect()
    assert r["g"] == ["x y", "y x", "x y", "y x"]


def test_token_ngrams_rejects_bad_n():
    with pytest.raises(ValueError):
        TS.token_ngrams(F.col("t"), 0)


def test_dup_ngram_fraction_hand_values(spark):
    # "x y x y x": bigrams [x y, y x, x y, y x] -> 4 total, 2 distinct -> 0.5
    # "a b c d": all distinct -> 0.0; "a": no bigrams -> 0.0
    df = _docs(spark, ["x y x y x", "a b c d", "a"])
    toks = TX.tokens_seq(TX.normalize_text(F.col("text"), with_nfkc=False))
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", TS.dup_ngram_fraction(toks, 2).alias("f")
        ).collect()
    }
    assert got == {0: 0.5, 1: 0.0, 2: 0.0}


def test_top_ngram_fraction_hand_values(spark):
    # "x y x y x": "x y" appears 2 of 4 bigrams -> 0.5
    # "a b c d": max freq 1 of 3 -> 1/3; "a": no bigrams -> 0.0 via left join
    df = _docs(spark, ["x y x y x", "a b c d", "a"])
    got = {r["doc_id"]: r["top_frac"] for r in Q.top_ngram_fraction(df, n=2).collect()}
    assert got[0] == 0.5
    assert got[1] == round(1 / 3, 6)
    assert got[2] == 0.0


# ------------------------------------------------------- decontamination


def test_decontaminate_flags_exactly_overlapping_docs(spark):
    bench = _docs(spark, ["alpha beta gamma delta"])
    corpus = spark.createDataFrame(
        [
            (10, "zzz alpha beta gamma yyy"),   # shares 1 distinct 3-gram
            (11, "beta gamma delta and alpha beta gamma too"),  # shares 2
            (12, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_shared"] for r in Q.decontaminate(corpus, bench, n=3).collect()}
    assert got == {10: 1, 11: 2}  # doc 12 absent: clean


def test_decontaminate_benchmark_side_is_broadcast(spark):
    bench = _docs(spark, ["alpha beta gamma"])
    corpus = _docs(spark, ["alpha beta gamma x"])
    plan = Q.decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------------- PII


def test_pii_redact_and_counts(spark):
    df = _docs(
        spark,
        [
            "mail me at a.b+c@ex-ample.org or x@y.io today",
            "call +1 555 123 4567 now",
            "no pii here 123 456",
        ],
    )
    out = df.select(
        "doc_id",
        TS.pii_email_count(F.col("text")).alias("ne"),
        TS.pii_phone_count(F.col("text")).alias("np"),
        TS.pii_redact(F.col("text")).alias("red"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["ne"] == 2 and by_id[0]["np"] == 0
    assert by_id[0]["red"] == "mail me at <EMAIL> or <EMAIL> today"
    assert by_id[1]["ne"] == 0 and by_id[1]["np"] == 1
    assert by_id[1]["red"] == "call <PHONE> now"
    # plain numbers in prose are NOT phones (no leading +)
    assert by_id[2]["ne"] == 0 and by_id[2]["np"] == 0
    assert by_id[2]["red"] == "no pii here 123 456"


# ------------------------------------------------- deterministic sampling


def test_deterministic_keep_is_stable_and_rate_accurate(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    kept = df.where(TS.deterministic_keep(F.col("doc_id"), 200))
    n1, n2 = kept.count(), kept.count()  # recompute -> identical (no rand())
    assert n1 == n2
    assert abs(n1 / 10_000 - 0.2) < 0.02  # LCG uniformity at permille=200
    # keep decision is a pure function of the id: same ids survive both runs
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in kept.collect())
    assert ids1 == ids2


def test_deterministic_keep_monotone_in_rate(spark):
    df = spark.range(0, 2_000).withColumnRenamed("id", "doc_id")
    k100 = {r["doc_id"] for r in df.where(TS.deterministic_keep(F.col("doc_id"), 100)).collect()}
    k500 = {r["doc_id"] for r in df.where(TS.deterministic_keep(F.col("doc_id"), 500)).collect()}
    assert k100 <= k500  # threshold semantics nest: raising the rate only adds ids


def test_top_ngram_fraction_expr_equals_agg(spark):
    # The zero-shuffle expression form and the distributed explode+agg form
    # must agree document-for-document, including gram-less docs (0.0 fill)
    # and heavy-repetition docs.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expr = {r["doc_id"]: r["top_frac"] for r in Q.top_ngram_fraction(docs, n=2).collect()}
    agg = {r["doc_id"]: r["top_frac"] for r in Q.top_ngram_fraction_agg(docs, n=2).collect()}
    assert expr == agg and len(expr) > 0


def test_contaminated_ids_matches_decontaminate_existence(spark):
    # The one-exchange existence form must flag exactly the docs the counted
    # form reports with n_shared >= 1.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    corpus = docs.where(F.pmod(F.col("doc_id"), F.lit(97)) != 0)
    counted = {r["doc_id"] for r in Q.decontaminate(corpus, bench, n=3).collect()}
    exists = {r["doc_id"] for r in Q.contaminated_ids(corpus, bench, n=3).collect()}
    assert exists == counted and counted
