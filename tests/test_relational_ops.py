"""Unit tests for candia_spark.operators.relational with hand-computed
expectations (SURVEY §5 strategy: small golden fixtures per operator)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from candia_spark.operators import (
    adjust_overlapping_windows,
    band_join,
    bucketize,
    cross_index,
    deterministic_id,
    explode_index,
    groupwise_argmax,
    histogram_cutoff_filter,
    interval_anti_join,
    interval_join,
    two_level_count_filter,
)


def test_interval_join_first_window_wins(spark):
    points = spark.createDataFrame(
        [Row(pid=1, v=5.0), Row(pid=2, v=15.0), Row(pid=3, v=12.0), Row(pid=4, v=12.0)]
    )
    # overlapping windows: [0,13) and [10,20)
    windows = spark.createDataFrame([Row(lo=0.0, hi=13.0), Row(lo=10.0, hi=20.0)])
    out = interval_join(points, windows, "v").select("pid", "lo").collect()
    got = {(r.pid, r.lo) for r in out}
    # v=12 overlaps both; first (lo=0) wins; duplicate rows both preserved
    assert got == {(1, 0.0), (2, 10.0), (3, 0.0), (4, 0.0)}
    assert len(out) == 4


def test_interval_join_half_open(spark):
    points = spark.createDataFrame([Row(v=10.0)])
    windows = spark.createDataFrame([Row(lo=0.0, hi=10.0), Row(lo=10.0, hi=20.0)])
    out = interval_join(points, windows, "v").collect()
    assert len(out) == 1 and out[0].lo == 10.0  # [lo, hi): boundary -> upper window


def test_interval_anti_join(spark):
    points = spark.createDataFrame([Row(v=5.0), Row(v=25.0)])
    windows = spark.createDataFrame([Row(lo=0.0, hi=10.0)])
    out = interval_anti_join(points, windows, "v").collect()
    assert [r.v for r in out] == [25.0]


@pytest.mark.slow
def test_band_join_matches_naive(spark):
    left = spark.createDataFrame([Row(a=float(i)) for i in range(0, 100, 7)])
    right = spark.createDataFrame([Row(b=float(i) + 0.5) for i in range(0, 100, 11)])
    fast = band_join(left, right, "a", "b", tol=5.0, bucketed=True)
    naive = band_join(left, right, "a", "b", tol=5.0, bucketed=False)
    assert sorted((r.a, r.b) for r in fast.collect()) == sorted(
        (r.a, r.b) for r in naive.collect()
    )


def test_adjust_overlapping_windows(spark):
    # Reference rule (adjust_swaths.R:26-41): upper = round(mean(lead(lo), hi), 2)
    w = spark.createDataFrame(
        [Row(lo=10.0, hi=21.0), Row(lo=20.0, hi=31.0), Row(lo=30.0, hi=41.0)]
    )
    rows = {r.lo: r for r in adjust_overlapping_windows(w).collect()}
    assert rows[10.0].lower_adj == 10.0 and rows[10.0].upper_adj == 20.5
    assert rows[20.0].lower_adj == 20.5 and rows[20.0].upper_adj == 30.5
    assert rows[30.0].lower_adj == 30.5 and rows[30.0].upper_adj == 41.0


def test_bucketize(spark):
    df = spark.createDataFrame([Row(x=0.0), Row(x=59.9), Row(x=60.0), Row(x=125.0)])
    out = [r.bucket for r in bucketize(df, "x", 60.0).orderBy("x").collect()]
    assert out == [0, 0, 1, 2]


def test_groupwise_argmax_keeps_ties(spark):
    df = spark.createDataFrame(
        [Row(g=1, v=5.0), Row(g=1, v=5.0), Row(g=1, v=3.0), Row(g=2, v=1.0)]
    )
    out = groupwise_argmax(df, ["g"], "v").collect()
    assert sorted((r.g, r.v) for r in out) == [(1, 5.0), (1, 5.0), (2, 1.0)]


def test_two_level_count_filter(spark):
    # part 1: sample a has 3 points (qualifies); part 2: max 2 (dropped)
    df = spark.createDataFrame(
        [Row(part=1, s="a")] * 3
        + [Row(part=1, s="b")]
        + [Row(part=2, s="a")] * 2
    )
    out = two_level_count_filter(df, ["part", "s"], ["part"], min_count=3)
    assert {r.part for r in out.collect()} == {1}
    assert out.count() == 4


def test_cross_index_product_order(spark):
    # Parity with models.py:61-78 golden grid: ids follow product order
    a = spark.createDataFrame([Row(x=0), Row(x=1)])
    b = spark.createDataFrame([Row(y=0), Row(y=1)])
    c = spark.createDataFrame([Row(ncomp=1), Row(ncomp=2)])
    idx = cross_index([a, b, c], id_col="model_id")
    got = {(r.x, r.y, r.ncomp): r.model_id for r in idx.collect()}
    assert got == {
        (0, 0, 1): 0, (0, 0, 2): 1, (0, 1, 1): 2, (0, 1, 2): 3,
        (1, 0, 1): 4, (1, 0, 2): 5, (1, 1, 1): 6, (1, 1, 2): 7,
    }


def test_explode_index_scan_ids(spark):
    # Parity with models.py:81-117: per-model ordinals + global scan ids
    a = spark.createDataFrame([Row(x=0), Row(x=1)])
    c = spark.createDataFrame([Row(ncomp=1), Row(ncomp=2)])
    idx = cross_index([a, c], id_col="model_id")
    out = explode_index(idx, "ncomp", order_cols=["model_id"])
    rows = sorted(
        ((r.model_id, r.spectrum_num, r.scan) for r in out.collect())
    )
    # model 0: ncomp=1 -> 1 spectrum; model 1: ncomp=2 -> 2; etc.
    assert rows == [(0, 0, 0), (1, 0, 1), (1, 1, 2), (2, 0, 3), (3, 0, 4), (3, 1, 5)]


def test_deterministic_id_stable(spark):
    df = spark.createDataFrame([Row(k="b"), Row(k="a"), Row(k="c")])
    out = {r.k: r.id for r in deterministic_id(df, ["k"]).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_histogram_cutoff_filter(spark):
    # values 0..100, nbins=100 -> bin width 1, edges[50] = 50 -> keep v > 50
    df = spark.createDataFrame([Row(g=1, v=float(i)) for i in range(101)])
    out = histogram_cutoff_filter(df, ["g"], "v", nbins=100, cutoff_bin=50)
    vals = sorted(r.v for r in out.collect())
    assert vals[0] == 51.0 and vals[-1] == 100.0
    # reference k=0 semantics: cutoff = lower edge of bin 0 = group min,
    # so only exact-minimum values drop (msproc.py:678-685)
    df0 = spark.createDataFrame([Row(g=1, v=v) for v in [1.0, 1.0, 2.0, 3.0]])
    assert sorted(
        r.v for r in histogram_cutoff_filter(df0, ["g"], "v").collect()
    ) == [2.0, 3.0]
    # constant group mirrors numpy's (v-0.5, v+0.5) implicit range: all kept
    const = spark.createDataFrame([Row(g=1, v=5.0)] * 3)
    assert histogram_cutoff_filter(const, ["g"], "v").count() == 3


def test_histogram_cutoff_filter_subset(spark):
    # histogram over level==2 rows only; level==1 rows always kept
    rows = [Row(g=1, level=1, v=0.001)] + [
        Row(g=1, level=2, v=float(i)) for i in range(101)
    ]
    out = histogram_cutoff_filter(
        spark.createDataFrame(rows),
        ["g"],
        "v",
        nbins=100,
        cutoff_bin=0,
        subset=F.col("level") == 2,
    )
    got = sorted((r.level, r.v) for r in out.collect())
    # MS1 row survives despite v below the MS2 cutoff; MS2 v=0.0 (the exact
    # minimum) is the only dropped row
    assert got[0] == (1, 0.001)
    assert [v for lv, v in got if lv == 2][0] == 1.0
    assert len(got) == 101
