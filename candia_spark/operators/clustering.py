"""Distributed Lloyd's k-means over an embedding column — the corpus
clustering step of a curation pipeline (domain discovery, cluster-balanced
sampling, semantic dedup pre-bucketing).

Design for scale — the textbook Spark k-means shape:

- Assignment is a MAP: the k x dim centroid table joins in as a broadcast
  (k rows), each vector computes k distances with array higher-order
  functions (JVM codegen, no UDF) and keeps the argmin. No shuffle of the
  corpus, ever.
- Re-centering is one partial-aggregated shuffle keyed by (cluster, pos):
  map-side combine reduces each partition to <= k x dim rows before the
  exchange, so the shuffle volume is O(partitions x k x dim), independent
  of corpus size.
- The driver never holds data; centroids live in the plan as a (tiny)
  aggregate subtree that Spark materializes into each broadcast.

Determinism for the oracle gate (the reason this is not MLlib's KMeans):
vectors are quantized to integers (round(x * scale)), centroids are kept
as EXACT integer sums plus counts (never divided), and the distance to
centroid c is compared via the integer-exact cross-multiplied form

    d_c = sum_i (n_c * x_i - S_ci)^2   (bigint, exact)
    key_c = double(d_c) / double(n_c^2)

Both factors of key_c are exactly representable doubles (d_c < 2^53 for
|x| <= 1, scale <= 1e3, n <= ~5e4) and IEEE division is correctly rounded,
so every engine computes the identical key and the identical argmin — the
whole fixed-iteration trajectory is hash-exact cross-engine, which is what
lets DuckDB recompute it (q57's unrolled-CTE oracle). Ties break on the
smallest cluster id. Empty clusters simply drop out of the centroid table
(same rule on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means; returns (id, cluster, cluster_size).

    Init is deterministic: the k smallest ids seed clusters 0..k-1 in id
    order (SQL-expressible, unlike k-means++ RNG draws). ``iters``
    assignment passes run with ``iters - 1`` re-centering steps between
    them, i.e. the output is the assignment AFTER the last re-centering.
    """
    if k <= 0 or iters <= 0:
        raise ValueError(f"k and iters must be positive, got k={k} iters={iters}")
    q = df.select(
        F.col(id_col).alias("__vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale, 0).cast("long"),
        ).alias("qv"),
    )
    # seed: k smallest ids, cluster = rank - 1. The window runs on a k-row
    # frame (post-limit), not the corpus.
    seeds = (
        q.orderBy("__vid")
        .limit(k)
        .select(
            F.col("qv").alias("sv"),
            (F.row_number().over(Window.orderBy("__vid")) - 1)
            .cast("bigint")
            .alias("cluster"),
            F.lit(1).cast("bigint").alias("n"),
        )
    )
    cent = seeds  # (cluster, sv: array<long> integer sums, n: member count)
    assign = None
    for it in range(iters):
        joined = q.crossJoin(F.broadcast(cent))  # deliberate N x k product
        d = F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.col("sv"),
                lambda x, s: (F.col("n") * x - s) * (F.col("n") * x - s),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        key = d.cast("double") / (F.col("n") * F.col("n")).cast("double")
        # min over a (key, cluster) struct = lexicographic argmin with the
        # smallest-cluster tie-break; commutative, so partial aggs are safe
        assign = (
            joined.select(
                "__vid", F.struct(key.alias("k"), F.col("cluster")).alias("kc")
            )
            .groupBy("__vid")
            .agg(F.min("kc").alias("kc"))
            .select("__vid", F.col("kc.cluster").alias("cluster"))
        )
        if it < iters - 1:
            long_form = assign.join(q, "__vid").select(
                "cluster", F.posexplode("qv").alias("pos", "v")
            )
            sums = long_form.groupBy("cluster", "pos").agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).cast("bigint").alias("n")
            )
            cent = sums.groupBy("cluster").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda t: t["s"],
                ).alias("sv"),
                F.max("n").alias("n"),
            )
    sizes = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return assign.join(F.broadcast(sizes), "cluster").select(
        F.col("__vid").alias(id_col), F.col("cluster"), F.col("cluster_size")
    )
