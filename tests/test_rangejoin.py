"""Binned range join (operators/rangejoin.py): set equivalence to the
naive theta join (including narrow bins, empty/inverted intervals, nulls,
negatives), and the plan guarantee that no nested-loop/cartesian node
appears."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.operators import rangejoin as RJ


def _theta(intervals, points, lo, hi, v):
    return intervals.join(
        points, (F.col(v) >= F.col(lo)) & (F.col(v) <= F.col(hi))
    )


def _pairs(df, a="ia", b="ip"):
    return sorted((r[a], r[b]) for r in df.collect())


@pytest.fixture(scope="module")
def frames(spark):
    intervals = spark.createDataFrame(
        [
            Row(ia=1, lo=0.0, hi=10.0),
            Row(ia=2, lo=-5.5, hi=-1.0),    # all-negative interval
            Row(ia=3, lo=9.9, hi=9.9),      # degenerate point interval
            Row(ia=4, lo=5.0, hi=4.0),      # inverted: never matches
            Row(ia=5, lo=None, hi=3.0),     # null bound: never matches
            Row(ia=6, lo=-2.0, hi=2.0),     # straddles zero
        ]
    )
    points = spark.createDataFrame(
        [Row(ip=10, v=0.0), Row(ip=11, v=9.9), Row(ip=12, v=-1.0),
         Row(ip=13, v=-5.5), Row(ip=14, v=None), Row(ip=15, v=10.0001)]
    )
    return intervals, points


@pytest.mark.parametrize("w", [0.5, 3.0, 11.0, 1000.0])
def test_interval_join_equals_theta_any_bin_width(spark, frames, w):
    intervals, points = frames
    got = _pairs(RJ.interval_join(intervals, points, "lo", "hi", "v", w))
    want = _pairs(_theta(intervals, points, "lo", "hi", "v"))
    assert got == want and want  # non-empty by construction


def test_no_pair_meets_twice(spark, frames):
    intervals, points = frames
    out = RJ.interval_join(intervals, points, "lo", "hi", "v", 0.5)
    assert out.count() == out.dropDuplicates(["ia", "ip"]).count()


def test_band_join_equals_theta(spark):
    left = spark.createDataFrame([Row(il=i, x=float(i)) for i in range(20)])
    right = spark.createDataFrame(
        [Row(ir=i, y=float(i) * 1.5 - 3.0) for i in range(20)]
    )
    got = sorted(
        (r["il"], r["ir"]) for r in RJ.band_join(left, right, "x", "y", 2.0).collect()
    )
    want = sorted(
        (r["il"], r["ir"])
        for r in left.join(
            right, F.abs(F.col("x") - F.col("y")) <= 2.0
        ).collect()
    )
    assert got == want and want
    # band_join output drops its synthetic bound columns
    assert set(RJ.band_join(left, right, "x", "y", 2.0).columns) == {
        "il", "x", "ir", "y"
    }


def test_binned_plan_has_no_nested_loop(spark, frames):
    intervals, points = frames
    binned = RJ.interval_join(intervals, points, "lo", "hi", "v", 3.0)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # The theta form of the same predicate IS a nested loop — the operator
    # exists precisely to remove this node.
    theta_plan = (
        _theta(intervals, points, "lo", "hi", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in theta_plan or "CartesianProduct" in theta_plan


def test_bad_bin_width_rejected(spark, frames):
    intervals, points = frames
    with pytest.raises(ValueError, match="bin_width"):
        RJ.interval_join(intervals, points, "lo", "hi", "v", 0.0)


@pytest.fixture(scope="module")
def interval_frames(spark):
    left = spark.createDataFrame(
        [Row(ia=1, la=0.0, ha=5.0), Row(ia=2, la=4.9, ha=4.9),
         Row(ia=3, la=-10.0, ha=-2.0), Row(ia=4, la=100.0, ha=90.0),  # inverted
         Row(ia=5, la=-3.0, ha=3.0)]
    )
    right = spark.createDataFrame(
        [Row(ib=10, lb=5.0, hb=8.0), Row(ib=11, lb=-2.5, hb=-2.5),
         Row(ib=12, lb=-100.0, hb=200.0), Row(ib=13, lb=6.0, hb=7.0)]
    )
    return left, right


@pytest.mark.parametrize("w", [0.5, 4.0, 50.0, 1000.0])
def test_overlap_join_equals_theta_any_bin_width(spark, interval_frames, w):
    left, right = interval_frames
    got = sorted(
        (r["ia"], r["ib"])
        for r in RJ.overlap_join(left, right, "la", "ha", "lb", "hb", w).collect()
    )
    want = sorted(
        (r["ia"], r["ib"])
        for r in left.join(
            right,
            F.greatest(F.col("la"), F.col("lb"))
            <= F.least(F.col("ha"), F.col("hb")),
        ).collect()
    )
    assert got == want and want


def test_overlap_join_no_pair_meets_twice(spark, interval_frames):
    left, right = interval_frames
    # Narrow bins: wide intervals cover MANY shared bins; the meet-bin
    # refine must still emit each pair exactly once with no dedupe.
    out = RJ.overlap_join(left, right, "la", "ha", "lb", "hb", 0.5)
    assert out.count() == out.dropDuplicates(["ia", "ib"]).count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_band_join_eps_zero_is_equality(spark):
    left = spark.createDataFrame([Row(il=1, x=3.0), Row(il=2, x=4.5)])
    right = spark.createDataFrame([Row(ir=10, y=3.0), Row(ir=11, y=4.0)])
    got = sorted(
        (r["il"], r["ir"]) for r in RJ.band_join(left, right, "x", "y", 0.0).collect()
    )
    assert got == [(1, 10)]
    with pytest.raises(ValueError, match="eps"):
        RJ.band_join(left, right, "x", "y", -1.0)


def test_reserved_bin_column_rejected(spark, frames):
    intervals, points = frames
    poisoned = points.withColumn("_bin", F.lit(0))
    with pytest.raises(ValueError, match="_bin"):
        RJ.interval_join(intervals, poisoned, "lo", "hi", "v", 1.0)
