"""Iterative graph scoring over pair-list graphs (dedup/similarity output).

The dedup family produces GRAPHS — near-dup pairs, shared-fingerprint
pairs, embedding-neighbor edges — and downstream curation wants more than
their connected components: which document is the CENTER of a duplication
cluster (keep it, drop satellites), which node is a hub stitching many
near-communities together (suspicious boilerplate), how much "authority"
flows to each doc under repeated neighborhood averaging. This module adds
the canonical fixed-point iteration for that — a damped PageRank-style
authority score — in the repo's oracle-exact style: every quantity is a
BIGINT in "micro-mass" units and every update uses integer floor
division, so the entire unrolled trajectory is bit-reproducible in any
engine (the k-means trick applied to graph iteration; no doubles, no
order-dependent float sums).

Update rule (per iteration, damping d = num/den, e.g. 17/20 = 0.85):

    S'(v) = B + Σ_{u -> v} (num * S(u)) // (den * deg(u))
    B     = ((den - num) * init) // den        (per-node base mass)

Scale design: degrees are computed once and riding joins are keyed by
node id — each iteration is ONE hash join (scores ⋈ edges) plus ONE
keyed aggregation, the textbook distributed PageRank shape. Scores are
k-row-per-node tables materialized per iteration (the `_materialize`
doctrine: without the cut, iteration i replays every earlier iteration
from lineage — O(iters²) corpus passes). Overflow margins: with
``init = 1e12`` and damping < 1 the per-node score is bounded by
``B + d * maxdeg * maxS``; the bigint product ``num * S`` stays under
2^63 for any realistic degree (documented bound ~5e17 at maxdeg 10^4),
and unlike float PageRank there is no convergence-tolerance ambiguity —
``iters`` is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def authority_scores(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping: tuple[int, int] = (17, 20),
    init: int = 10**12,
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Damped integer-exact authority iteration over a directed edge list.

    ``edges`` has columns (src, dst) — symmetrize near-dup pairs before
    calling if undirected semantics are wanted. ``nodes`` carries one
    ``id_col`` row per node (isolated nodes keep the base mass). Returns
    (id, degree, score) after ``iters`` unrolled iterations — all BIGINT,
    so the result hash-compares across engines with no tolerance.

    ``weight_col`` names an INTEGER edge-weight column (e.g. the
    near-dup pair's ``n_common`` shingle overlap): each source then
    splits its damped mass proportionally to edge weight —
    ``(num * S * w) // (den * W_u)`` with W_u the source's total
    out-weight — so a strong near-dup tie carries more authority than a
    marginal one. ``degree`` in the output stays the edge COUNT either
    way. The extra bigint factor narrows the overflow margin to
    ``num * maxS * maxw < 2^63`` (~5e17 of S·w headroom at num = 17):
    fine for shingle-overlap weights (bounded by document length), not
    for unbounded weights — rescale those first."""
    num, den = damping
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    if init <= 0:
        raise ValueError(f"init must be positive, got {init}")
    from candia_spark.operators.dedup import _materialize

    base = ((den - num) * init) // den
    cols = [F.col("src"), F.col("dst")]
    if weight_col is not None:
        # loud per-row guard: a non-positive weight would make some
        # source's total out-weight zero, and the (.. div 0) term is a
        # cross-engine DIVERGENCE — Spark's non-ANSI div yields null
        # (silently absorbed by the coalesce) while an ANSI engine
        # errors. Same raise_error doctrine as score_percentiles.
        w = F.col(weight_col).cast("bigint")
        cols.append(
            F.when(
                w > 0, w
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "authority_scores: edge weights must be "
                            "positive, got "
                        ),
                        F.coalesce(w.cast("string"), F.lit("null")),
                    )
                ).cast("bigint")
            ).alias("__w")
        )
    e = _materialize(edges.select(*cols))
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg"),
        *(
            [F.sum("__w").cast("bigint").alias("__wsum")]
            if weight_col is not None
            else []
        ),
    )
    # (src, dst[, __w], deg[, __wsum]) ready for every iteration's join
    ed = _materialize(e.join(deg, "src"))
    n = nodes.select(F.col(id_col)).distinct()
    scores = n.select(
        F.col(id_col), F.lit(int(init)).cast("bigint").alias("score")
    )
    contrib_expr = (
        f"({num} * score * __w) div ({den} * __wsum)"
        if weight_col is not None
        else f"({num} * score) div ({den} * deg)"
    )
    for _ in range(iters):
        contrib = ed.join(
            scores.select(F.col(id_col).alias("src"), "score"), "src"
        ).select(
            F.col("dst").alias(id_col),
            F.expr(contrib_expr).alias("c"),
        )
        sums = contrib.groupBy(id_col).agg(F.sum("c").alias("in_mass"))
        scores = _materialize(
            n.join(sums, id_col, "left").select(
                F.col(id_col),
                (
                    F.lit(int(base)).cast("bigint")
                    + F.coalesce(F.col("in_mass"), F.lit(0)).cast("bigint")
                ).alias("score"),
            )
        )
    out_deg = deg.select(F.col("src").alias(id_col), "deg")
    return scores.join(out_deg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("deg"), F.lit(0).cast("bigint")).alias("degree"),
        F.col("score"),
    )
