"""Round-17 optimization equivalence/contract pins.

- verdict r17 next #1: the pair engines' probe-side parallelism pin is
  bounded by DATA when row statistics are in hand (guide §2.2), never
  below the core count, and scales UP with census join mass at corpus
  scale.
- verdict r17 next #3: authority_scores' edge table switches to a
  src-keyed, sorted persist() in the non-broadcast regime (guide §2.4
  exchange-free iteration) — the per-iteration join must NOT re-exchange
  the edge side — while the broadcast regime keeps the historical
  zero-collect/count contract (test_graph pins that side). Results are
  identical across regimes.
- verdict r17 next #4: containment_candidate_pairs' routing gate rides
  the row count the index materialization already observed — no count()
  action inside the call when the index came from shingle_index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from candia_spark.tables import load_table


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_probe_parallelism_data_bounds(spark):
    """The 2x-cores pin is the FLOOR (the measured-winning local value —
    the probe-rows down-bound was A/B-refuted this round, q81 15.9 s vs
    5.4 s); the census join mass raises par at corpus scale, capped."""
    from candia_spark.operators import dedup

    cores = spark.sparkContext.defaultParallelism
    df = spark.range(1)
    # no statistics: the historical 2x-cores pin
    assert dedup._probe_parallelism(df) == 2 * cores
    # small expansions never shrink the pin below 2x cores
    assert dedup._probe_parallelism(df, expanded_rows=0) == 2 * cores
    assert dedup._probe_parallelism(df, expanded_rows=10**6) == 2 * cores
    # corpus-scale expansion bounds par UP past the cores pin
    big = (
        10
        * 2
        * cores
        * dedup._PROBE_TARGET_EXPANDED_BYTES_PER_TASK
        // dedup._PROBE_EXPANDED_ROW_BYTES
    )
    assert dedup._probe_parallelism(df, expanded_rows=big) > 2 * cores
    assert (
        dedup._probe_parallelism(df, expanded_rows=10**18)
        == dedup._PROBE_MAX_PARTITIONS
    )


def test_materialize_counted_stashes_exact_rowcount(spark):
    from candia_spark.operators.dedup import _materialize_counted

    out = _materialize_counted(spark.range(137).selectExpr("id as doc_id"))
    assert getattr(out, "_candia_rows", None) == 137
    assert out.count() == 137


def test_containment_gate_rides_carried_rowcount(spark, sf_smoke, monkeypatch):
    """The routing gate must read the index's carried row count instead of
    paying a count() job (verdict r16 next #4) — and an index built
    outside shingle_index (no attribute) still routes identically via the
    explicit-count fallback."""
    from candia_spark.operators import dedup

    docs = load_table(spark, sf_smoke, "documents").limit(300)
    idx = dedup.shingle_index(docs, 2)
    assert isinstance(getattr(idx, "_candia_rows", None), int)

    cls = type(idx)
    calls = {"count": 0}
    real_count = cls.count

    def spy_count(self):
        calls["count"] += 1
        return real_count(self)

    monkeypatch.setattr(cls, "count", spy_count)
    fast = dedup.containment_candidate_pairs(
        docs, num_hashes=16, index=idx, min_hits=4
    )
    assert calls == {"count": 0}  # routing paid no action
    monkeypatch.undo()
    fast_rows = _rows(fast, ["id_a", "id_b"])

    # strip the attribute: the fallback count must route identically
    bare = idx.select("*")
    assert not hasattr(bare, "_candia_rows")
    slow = dedup.containment_candidate_pairs(
        docs, num_hashes=16, index=bare, min_hits=4
    )
    assert _rows(slow, ["id_a", "id_b"]) == fast_rows
    assert fast_rows, "fixture must produce candidates"


def test_authority_exchange_free_regime_plan_and_equivalence(
    spark, monkeypatch
):
    """Under a disabled broadcast threshold (the at-scale regime) the
    edge table must come back from a persisted, src-partitioned relation
    — the per-iteration join reads InMemoryTableScan on the edge side
    and re-exchanges ONLY the score side — and the scores must be
    bit-identical to the broadcast regime's. This is the renegotiated
    r16 change-#6 contract: the zero-collect/count pin applies to the
    BROADCAST regime (test_authority_upfront_margins_fire_no_scalar_agg_
    actions); the exchange-free regime is allowed its one
    cache-materializing count per call."""
    from candia_spark.operators import dedup
    from candia_spark.operators.graph import authority_scores

    edges = spark.createDataFrame(
        [(i % 50, (i * 7 + 1) % 50) for i in range(300)],
        "src bigint, dst bigint",
    ).distinct()
    nodes = spark.range(50).selectExpr("id as doc_id")

    # spy on the per-round score materializations: the iteration join
    # (scores ⋈ edges) lives in the plan of each materialized round
    iter_plans: list[str] = []
    real_materialize = dedup._materialize

    def spy(df, eager=True):
        if set(df.columns) == {"doc_id", "score"}:
            iter_plans.append(
                df._jdf.queryExecution().executedPlan().toString()
            )
        return real_materialize(df, eager)

    monkeypatch.setattr(dedup, "_materialize", spy)

    base = _rows(
        authority_scores(edges, nodes, iters=2),
        ["doc_id", "degree", "score"],
    )
    assert iter_plans and all(
        "InMemoryTableScan" not in p for p in iter_plans
    ), "broadcast regime must keep the localCheckpoint edge table"

    iter_plans.clear()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = authority_scores(edges, nodes, iters=2)
        got = _rows(out, ["doc_id", "degree", "score"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert iter_plans and all(
        "InMemoryTableScan" in p for p in iter_plans
    ), "\n---\n".join(iter_plans)
    assert got == base
    assert base, "fixture must produce scores"
