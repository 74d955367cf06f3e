"""Golden tests for the order-dependent operators (W4 greedy ppm
partitioning, W3 cycle binning) and the as-of join they build on.

Expectations are hand-computed from the greedy rule / cycle semantics
(parity spec: SURVEY §2.5 W3/W4), not copied from the reference tests.
"""

from __future__ import annotations

from pyspark.sql import Row

from candia_spark.operators import (
    asof_join,
    assign_scan_cycles,
    greedy_partition_starts,
    greedy_ppm_partition,
)


def test_greedy_partition_starts_rule():
    # tol 100000 ppm = 10%: start=100; 105<=110 stays; 111>110 -> new start;
    # 120<=122.1 stays; 200 new.
    vals = [100.0, 105.0, 111.0, 120.0, 200.0]
    assert greedy_partition_starts(vals, 100000.0) == [
        100.0, 100.0, 111.0, 111.0, 200.0,
    ]


def test_greedy_partition_starts_order_dependence():
    # Removing the middle value changes downstream boundaries — the property
    # that makes W4 non-parallelizable (SURVEY §7.3(1)).
    with_mid = greedy_partition_starts([100.0, 112.0, 121.0, 135.0], 100000.0)
    without_mid = greedy_partition_starts([100.0, 121.0, 135.0], 100000.0)
    # with 112 present: 112 starts a partition and captures 121
    assert with_mid == [100.0, 112.0, 112.0, 135.0]
    # without it: 121 starts its own partition — same value, different label
    assert without_mid == [100.0, 121.0, 135.0]


def test_greedy_ppm_partition_distributed(spark):
    rows = [Row(g="a", v=float(v)) for v in (100, 105, 111, 120, 200)] + [
        Row(g="b", v=float(v)) for v in (100, 200)
    ]
    df = spark.createDataFrame(rows * 2)  # duplicates must be preserved
    out = greedy_ppm_partition(df, "v", ["g"], tol_ppm=100000.0)
    got = sorted((r.g, r.v, r.partition_start) for r in out.collect())
    expected = sorted(
        [("a", 100.0, 100.0), ("a", 105.0, 100.0), ("a", 111.0, 111.0),
         ("a", 120.0, 111.0), ("a", 200.0, 200.0),
         ("b", 100.0, 100.0), ("b", 200.0, 200.0)] * 2
    )
    assert got == expected


def test_asof_join_backward(spark):
    pts = spark.createDataFrame(
        [Row(k=1, t=5.0, x="p5"), Row(k=1, t=15.0, x="p15"), Row(k=1, t=2.0, x="p2"),
         Row(k=2, t=7.0, x="q7")]
    )
    anchors = spark.createDataFrame(
        [Row(k=1, t=3.0, tag="a3"), Row(k=1, t=10.0, tag="a10"), Row(k=2, t=9.0, tag="a9")]
    )
    out = {r.x: r.tag for r in asof_join(pts, anchors, on="t", by=["k"]).collect()}
    assert out == {"p2": None, "p5": "a3", "p15": "a10", "q7": None}


def test_asof_join_tie_semantics(spark):
    pts = spark.createDataFrame([Row(k=1, t=3.0, x="p")])
    anchors = spark.createDataFrame([Row(k=1, t=3.0, tag="same_t")])
    assert asof_join(pts, anchors, on="t", by=["k"]).collect()[0].tag == "same_t"
    assert (
        asof_join(pts, anchors, on="t", by=["k"], strict=True).collect()[0].tag is None
    )


def test_asof_join_forward(spark):
    pts = spark.createDataFrame([Row(k=1, t=5.0, x="p")])
    anchors = spark.createDataFrame(
        [Row(k=1, t=3.0, tag="past"), Row(k=1, t=8.0, tag="next"), Row(k=1, t=9.0, tag="later")]
    )
    out = asof_join(pts, anchors, on="t", by=["k"], direction="forward").collect()
    assert out[0].tag == "next"


def test_assign_scan_cycles(spark):
    # markers at t=10,20,30 for sample s; cycle k = [marker_k, marker_{k+1})
    pts = spark.createDataFrame(
        [Row(s="s", t=float(t)) for t in (5, 10, 12, 20, 29, 30, 31)]
    )
    markers = spark.createDataFrame([Row(s="s", t=10.0), Row(s="s", t=20.0), Row(s="s", t=30.0)])
    out = assign_scan_cycles(pts, "t", ["s"], markers, tail=0.5)
    got = sorted((r.t, r.cycle) for r in out.collect())
    # t=5 before first marker -> dropped; t=31 > 30+0.5 tail -> dropped
    assert got == [(10.0, 0), (12.0, 0), (20.0, 1), (29.0, 1), (30.0, 2)]
