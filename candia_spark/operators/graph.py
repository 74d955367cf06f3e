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
from lineage — O(iters²) corpus passes). Unlike float PageRank there is
no convergence-tolerance ambiguity — ``iters`` is part of the contract.

Overflow margins (GUARDED, not just documented — advice r7 #1): the
right bound reasons from MASS CONCENTRATION, not degree. Total damped
mass converges to ~``N * init`` (each iteration holds Σ S' <=
N*B + d*Σ S, whose fixed point is N*init), and a hub can concentrate
most of it — a star of ~5.4e5 degree-1 in-neighbors at the defaults
(num=17, init=1e12) already pushes the hub past ``2^63 / num``, where
the per-iteration bigint product ``num * score`` wraps SILENTLY under
Spark's non-ANSI arithmetic. So, mirroring the k-means margin doctrine
(clustering._validate_quantization_margins):

- up front (one count over the materialized node table): require
  ``N * init < 2^63`` unconditionally (this bounds every in-mass SUM),
  and when the static whole-trajectory bound
  ``num * N * init * maxw < 2^63`` holds, every iteration is provably
  safe and no further checks run (the common case at defaults:
  N < 5.4e5 unweighted);
- otherwise (huge graphs / large init / weighted mode), a dynamic
  check before EACH iteration: one max() aggregate over the already-
  materialized score table must satisfy
  ``num * max(score) * maxw < 2^63``, raising loudly instead of
  wrapping. ``maxw`` is 1 unweighted, else one max() over the
  materialized edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIGINT_LIMIT = 2**63

# Telemetry from the most recent authority_scores call on this driver
# (the LAST_CC_TELEMETRY pattern): {"calls": monotone counter,
# "n_nodes": int, "n_edges": int, "static_safe": bool, "dynamic_checks":
# int} — bench.py attributes it per query so a graph-size or guard-mode
# regression shows up as a number in the official artifact.
LAST_AUTHORITY_TELEMETRY: dict = {}


def _check_score_margin(
    max_score: int, num: int, maxw: int, n_nodes: int, init: int
) -> None:
    """Raise before a silent non-ANSI wrap: the next iteration computes
    ``num * score * w`` per edge, so the current maximum score must keep
    that product in bigint. All exact Python ints."""
    if num * max_score * maxw >= _BIGINT_LIMIT:
        safe_init = _BIGINT_LIMIT // (num * maxw * max(n_nodes, 1))
        raise ValueError(
            "authority_scores overflow margin exceeded: max score "
            f"{max_score} with damping numerator {num} and max edge "
            f"weight {maxw} puts the per-edge bigint product at "
            f"{num * max_score * maxw} (limit 2^63); the non-ANSI "
            "multiply would wrap silently into wrong (possibly "
            f"negative) scores. Reduce init (<= {max(safe_init, 0)} is "
            f"statically safe for this graph's {n_nodes} nodes) or "
            "rescale edge weights."
        )


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
    ``num * maxS * maxw < 2^63`` — which, like the unweighted margin,
    is now ENFORCED rather than assumed: statically when
    ``num * N * init * maxw < 2^63`` (scores never exceed total mass
    N*init), else by a per-iteration max() check over the materialized
    score table that raises loudly before the non-ANSI product can wrap
    (see the module docstring; mirrors the k-means margin doctrine)."""
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
    # materialized: every iteration's left-join rebuilds from this node
    # set, and the margin guard needs its count anyway
    n = _materialize(nodes.select(F.col(id_col)).distinct())
    # --- overflow margin guard (advice r7 #1; module docstring) --------
    n_nodes = n.count()
    if weight_col is not None:
        row = e.agg(
            F.count(F.lit(1)).alias("ne"), F.max("__w").alias("mw")
        ).collect()[0]
        n_edges, maxw = int(row["ne"]), int(row["mw"] or 1)
    else:
        n_edges, maxw = e.count(), 1
    if n_nodes * init >= _BIGINT_LIMIT:
        raise ValueError(
            "authority_scores overflow margin exceeded before the first "
            f"iteration: {n_nodes} nodes * init {init} is total mass "
            f"{n_nodes * init} (limit 2^63) — the per-node in-mass SUM "
            "could wrap silently under non-ANSI arithmetic. Reduce init "
            f"(<= {_BIGINT_LIMIT // (num * maxw * max(n_nodes, 1))} is "
            "statically safe for this graph)."
        )
    # static whole-trajectory bound: every score is <= total mass
    # N*init (floor division only sheds mass), so this one inequality
    # makes all `iters` products provably safe with zero per-iteration
    # cost — the common case at defaults (N < ~5.4e5 unweighted).
    static_safe = num * n_nodes * init * maxw < _BIGINT_LIMIT
    dynamic_checks = 0
    LAST_AUTHORITY_TELEMETRY.update(
        calls=LAST_AUTHORITY_TELEMETRY.get("calls", 0) + 1,
        n_nodes=n_nodes,
        n_edges=n_edges,
        static_safe=static_safe,
    )
    scores = n.select(
        F.col(id_col), F.lit(int(init)).cast("bigint").alias("score")
    )
    max_score = init  # exact before the first iteration
    contrib_expr = (
        f"({num} * score * __w) div ({den} * __wsum)"
        if weight_col is not None
        else f"({num} * score) div ({den} * deg)"
    )
    for it in range(iters):
        if not static_safe:
            # one max() aggregate over the materialized score table
            # (iteration 0 reuses the exact init bound for free)
            if it > 0:
                max_score = int(
                    scores.agg(F.max("score")).collect()[0][0] or 0
                )
                dynamic_checks += 1
            _check_score_margin(max_score, num, maxw, n_nodes, init)
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
    LAST_AUTHORITY_TELEMETRY["dynamic_checks"] = dynamic_checks
    out_deg = deg.select(F.col("src").alias(id_col), "deg")
    return scores.join(out_deg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("deg"), F.lit(0).cast("bigint")).alias("degree"),
        F.col("score"),
    )
