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
    materialize: bool = True,
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means; returns (id, cluster, cluster_size).

    Init is deterministic: the k smallest ids seed clusters 0..k-1 in id
    order (SQL-expressible, unlike k-means++ RNG draws). ``iters``
    assignment passes run with ``iters - 1`` re-centering steps between
    them, i.e. the output is the assignment AFTER the last re-centering.

    ``materialize`` (default True) checkpoints each iteration's k-row
    centroid table and the final assignment, making the loop ONE corpus
    pass per iteration — without the cuts, iteration i's centroid
    broadcast re-derives every earlier iteration from lineage (O(iters^2)
    corpus scans). ``materialize=False`` keeps the whole plan lazy (used
    by plan-shape tests to inspect the assignment map's physical shape).
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
    from candia_spark.operators.dedup import _materialize

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
            if materialize:
                # checkpointing k x dim integers is free and caps the
                # loop at one corpus pass per iteration
                cent = _materialize(cent)
    if materialize:
        # the final assignment feeds the size aggregate, the output join,
        # and callers' self-joins (cluster_closest_pairs) — cut once
        assign = _materialize(assign)
    sizes = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return assign.join(F.broadcast(sizes), "cluster").select(
        F.col("__vid").alias(id_col), F.col("cluster"), F.col("cluster_size")
    )


def _quantized(df: DataFrame, scale: int, vec_col: str, id_col: str) -> DataFrame:
    """(id, qv: array<long>, n2: bigint squared norm) — the integer-exact
    vector form shared by the semantic-dedup family (same quantization as
    kmeans_assign, so cluster assignments and pair math line up)."""
    return df.select(
        F.col(id_col).alias("__vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale, 0).cast("long"),
        ).alias("qv"),
    ).withColumn(
        "n2",
        F.aggregate(
            F.transform(F.col("qv"), lambda v: v * v),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ),
    )


def _in_cluster_pairs(
    df: DataFrame, k: int, iters: int, scale: int, vec_col: str, id_col: str
) -> DataFrame:
    """All within-cluster vector pairs with exact integer dot products and
    the deterministic double cosine (see module docstring for why double
    division/sqrt of exactly-representable integers is engine-invariant).

    This is the SemDeDup scale trick (Abbas et al.): k-means pre-bucketing
    shrinks the pair space from O(N^2) to sum |cluster|^2 — at corpus
    scale k grows with N (k ~ N / target_cluster_size) so the per-cluster
    quadratic term stays bounded. The self-join shuffles on the cluster
    key only; skew is bounded by the largest cluster.
    """
    # kmeans_assign returns a materialized assignment (see its final cut),
    # so the x/y aliases of the pair self-join reuse the stored rows
    # instead of re-deriving the k-means DAG twice
    assign = kmeans_assign(
        df, k=k, iters=iters, scale=scale, vec_col=vec_col, id_col=id_col
    )
    q = _quantized(df, scale, vec_col, id_col)
    a = assign.withColumnRenamed(id_col, "__vid").join(q, "__vid")
    x, y = a.alias("x"), a.alias("y")
    dot = F.aggregate(
        F.zip_with(F.col("x.qv"), F.col("y.qv"), lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        x.join(
            y,
            (F.col("x.cluster") == F.col("y.cluster"))
            & (F.col("x.__vid") < F.col("y.__vid")),
        )
        .select(
            F.col("x.cluster").alias("cluster"),
            F.col("x.__vid").alias("id_a"),
            F.col("y.__vid").alias("id_b"),
            dot.alias("dot"),
            F.col("x.n2").alias("n2_a"),
            F.col("y.n2").alias("n2_b"),
        )
        .withColumn(
            "cos",
            F.col("dot").cast("double")
            / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double")),
        )
    )


def cluster_closest_pairs(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per cluster: the most-similar vector pair (argmax cosine, ties to
    the smallest ids) and the number of pairs scanned. A thin output that
    certifies the WHOLE in-cluster pair computation — the argmax depends
    on every pair, so a single wrong dot product anywhere moves it —
    which is what makes it the oracle gate for the semantic-dedup family
    (q58). Clusters with fewer than two members drop out.
    """
    prs = _in_cluster_pairs(df, k, iters, scale, vec_col, id_col)
    w = Window.partitionBy("cluster").orderBy(
        F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
    wc = Window.partitionBy("cluster")
    return (
        prs.withColumn("n_pairs", F.count(F.lit(1)).over(wc).cast("bigint"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("cluster", "id_a", "id_b", "dot", "cos", "n_pairs")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    k: int = 8,
    iters: int = 3,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al.): embedding near-duplicates found INSIDE
    k-means clusters only, with the larger-id member of each pair marked
    for removal. Returns (cluster, id_a, id_b, cos, drop_id) for pairs
    with cosine >= threshold.

    The threshold test is integer-exact: cos >= t is evaluated as
    dot > 0 AND den * dot^2 >= num * n2_a * n2_b with t^2 = num/den taken
    from the decimal literal — no floating-point boundary anywhere, so
    the kept set is reproducible across engines, partitionings and runs.
    """
    from fractions import Fraction

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t2 = Fraction(str(threshold)) ** 2
    num, den = t2.numerator, t2.denominator
    prs = _in_cluster_pairs(df, k, iters, scale, vec_col, id_col)
    return prs.filter(
        (F.col("dot") > 0)
        & (
            F.lit(den) * F.col("dot") * F.col("dot")
            >= F.lit(num) * F.col("n2_a") * F.col("n2_b")
        )
    ).select(
        "cluster", "id_a", "id_b", "cos", F.col("id_b").alias("drop_id")
    )
