"""Distributed Lloyd's k-means (operators.clustering). Query-level
cross-engine parity for the full 3-iteration trajectory is q57's oracle
gate; these pin the semantics (convergence on separated data, determinism,
tie rules) and the scale-critical plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from candia_spark.operators.clustering import kmeans_assign


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmeans_recovers_planted_clusters(spark):
    # two tight blobs; ids 0 and 1 land in different blobs so the
    # smallest-id seeding starts one centroid in each
    blob_a = [(0, [1.0, 0.0]), (2, [0.9, 0.1]), (4, [1.1, -0.1]), (6, [0.95, 0.0])]
    blob_b = [(1, [-1.0, 0.0]), (3, [-0.9, 0.2]), (5, [-1.1, 0.1])]
    out = {
        r["vec_id"]: r
        for r in kmeans_assign(_vecs(spark, blob_a + blob_b), k=2, iters=3).collect()
    }
    a_clusters = {out[i]["cluster"] for i, _ in blob_a}
    b_clusters = {out[i]["cluster"] for i, _ in blob_b}
    assert a_clusters == {0} and b_clusters == {1}
    assert out[0]["cluster_size"] == 4 and out[1]["cluster_size"] == 3


def test_kmeans_deterministic_and_total(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11) / 11 for j in range(4)]) for i in range(20)]
    df = _vecs(spark, rows)
    r1 = sorted(map(tuple, kmeans_assign(df, k=3, iters=2).collect()))
    r2 = sorted(map(tuple, kmeans_assign(df, k=3, iters=2).collect()))
    assert r1 == r2
    # every vector is assigned exactly once
    assert len(r1) == 20 and len({t[0] for t in r1}) == 20
    with pytest.raises(ValueError, match="positive"):
        kmeans_assign(df, k=0)


def test_kmeans_plan_shape(spark):
    """Scale contract: assignment is a broadcast nested-loop over the k-row
    centroid table (never a CartesianProduct of two big sides), distance
    math stays JVM-side (no Python), and re-centering aggregates partially
    before its exchange (map-side combine on (cluster, pos))."""
    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(30)]
    plan = _plan_of(kmeans_assign(_vecs(spark, rows), k=2, iters=2))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # partial min-struct aggregation before the per-vector argmin exchange
    assert "partial_min" in plan or "partial min" in plan.lower()
