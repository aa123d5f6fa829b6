"""SURVEY §2 X2 (SCALAR_ITER scalar UDF) and X5 (GROUPED_AGG UDAF):
semantics vs the JVM path / closed form, and plan shape (Arrow nodes, no
row-wise Python)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.functions import pandas_udfs as PU
from entity_matching_in_online_retail_spark.functions import text as TX
from entity_matching_in_online_retail_spark.functions import textstats as TS

SF_DIR = "/root/testdata/sf0.001"


def test_iter_lang_id_matches_jvm(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = TX.tokens(F.lower(F.col("text")))
    both = docs.select(
        "doc_id",
        TS.lang_id(toks).alias("jvm"),
        PU.iter_lang_id_udf()(F.col("text")).alias("py"),
    )
    diff = both.where(F.col("jvm") != F.col("py")).count()
    assert diff == 0
    # null / empty / tie inputs
    extra = spark.createDataFrame(
        [(None,), ("",), ("zzz qqq",), ("the und der la el de",)], "text: string"
    )
    rows = extra.select(
        TS.lang_id(TX.tokens(F.lower(F.col("text")))).alias("jvm"),
        PU.iter_lang_id_udf()(F.col("text")).alias("py"),
    ).collect()
    for r in rows:
        assert r.jvm == r.py


def _gini_ref(vals):
    v = np.sort(np.asarray(vals, dtype="float64"))
    n, tot = v.size, v.sum()
    if n == 0 or tot == 0.0:
        return 0.0
    i = np.arange(1.0, n + 1.0)
    return float(2.0 * float(np.dot(i, v)) / (n * tot) - (n + 1.0) / n)


@pytest.mark.parametrize(
    "vals,expect",
    [
        ([1.0, 1.0, 1.0, 1.0], 0.0),  # perfect equality
        ([0.0, 0.0, 0.0, 1.0], 0.75),  # one holder of everything
        ([0.0, 0.0, 0.0, 0.0], 0.0),  # all-zero guard
    ],
)
def test_gini_closed_form(spark, vals, expect):
    df = spark.createDataFrame([(v,) for v in vals], "x: double")
    got = df.agg(PU.gini_udaf()(F.col("x")).alias("g")).collect()[0].g
    assert got == pytest.approx(expect, abs=1e-12)
    assert _gini_ref(vals) == pytest.approx(expect, abs=1e-12)


def test_gini_partitioning_invariant(spark):
    """Whole-group UDAF result must not depend on input partitioning."""
    vals = [(i % 7, float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(vals, "k: int, x: double")
    a = {
        r.k: r.g
        for r in df.repartition(1)
        .groupBy("k")
        .agg(PU.gini_udaf()(F.col("x")).alias("g"))
        .collect()
    }
    b = {
        r.k: r.g
        for r in df.repartition(16, "x")
        .groupBy("k")
        .agg(PU.gini_udaf()(F.col("x")).alias("g"))
        .collect()
    }
    assert a == b
    ref = {}
    for k, x in vals:
        ref.setdefault(k, []).append(x)
    for k, xs in ref.items():
        assert a[k] == pytest.approx(_gini_ref(xs), abs=1e-12)


def test_udaf_plan_is_arrow_grouped_agg(spark):
    df = spark.createDataFrame([(1, 2.0)], "k: int, x: double")
    plan = (
        df.groupBy("k")
        .agg(PU.gini_udaf()(F.col("x")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Spark 4 names the node ArrowAggregatePython (3.x: AggregateInPandas)
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-wise Python fallback
