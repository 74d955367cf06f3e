"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

``--runs N`` (default 1) times every query N times and reports the
per-query MINIMUM — the stable statistic on a box with ±20% run-to-run
noise (the round-4 local-evidence methodology, folded into the one
harness so driver evidence and local evidence share a code path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q02_interval_join",
    "q04_time_buckets",
    "q06_two_level_count_filter",
    "q08_histogram_cutoff",
    "q09_band_join",
    "q12_star_join_revenue",
    "q15_count_distinct_argmax",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--runs",
        type=int,
        default=1,
        help="time each query this many times, report the per-query minimum",
    )
    cli = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from candia_spark.session import get_spark
    from candia_spark.plans.queries import QUERY_REGISTRY

    spark = get_spark(app_name="candia_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERY_REGISTRY]
    extra = [n for n in QUERY_REGISTRY if n not in names]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    # Warm the JVM/codegen once per execution family so the measured runs
    # reflect steady-state execution, not session startup: one relational
    # query; a tiny higher-order-function job (the dedup/similarity family
    # JITs array/lambda expressions the relational path never touches); and
    # a tiny mapInPandas job (forks the Python worker pool and initializes
    # the Arrow serialization path, which otherwise lands on whichever
    # pandas-UDF query runs first — measured ~2.5s attributed to q36).
    try:
        QUERY_REGISTRY[names[0]].spark(spark, sf_dir).count()
    except Exception:
        pass
    try:
        from pyspark.sql import functions as F

        from candia_spark.operators.dedup import word_ngram_hashes
        from candia_spark.operators.multimodal import extract_features
        from candia_spark.tables import load_table

        docs200 = load_table(spark, sf_dir, "documents").limit(200)
        word_ngram_hashes(docs200).count()
        extract_features(
            docs200.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        ).count()
        # the clustering family JITs its own shapes (nested decimal HOF
        # lambdas, collect_list-of-struct broadcasts, localCheckpoint) —
        # a 64-row one-iteration pass compiles them all
        from candia_spark.operators.clustering import kmeans_assign

        kmeans_assign(
            load_table(spark, sf_dir, "embeddings").limit(64), k=2, iters=1
        ).count()
        # the graph family (q73/q77) JITs its own shapes — keyed join +
        # keyed agg + the bigint div expression; measured ~8s of codegen
        # landing on the first authority query without this (the driver
        # bench is single-run, so warmup is the only protection)
        from candia_spark.operators.graph import authority_scores

        warm_edges = spark.range(200).selectExpr(
            "id as src", "(id + 1) % 200 as dst"
        )
        authority_scores(
            warm_edges,
            spark.range(200).selectExpr("id as doc_id"),
            iters=1,
        ).count()
        # the CC family (q43/q50/q87/q88-class star contraction) JITs
        # its own iterative min-agg + self-join shapes; without this the
        # first collapsing query in a single-run driver bench carries
        # ~2s of codegen (verdict r9 next #8 — q43 swung 1.5->3.6s with
        # cc_rounds=0 and no code change on its path)
        from candia_spark.operators.dedup import connected_components

        connected_components(
            spark.range(200).selectExpr(
                "id as id_a", "(id + 1) % 200 as id_b"
            )
        ).count()
        # first-touch the CORPUS-scale shuffle path once (verdict r10
        # next #7): the residual ±2-4s single-run scatter on the
        # graph/dedup families is the first big shuffle's FILE creation
        # (spill dirs, OS page cache for documents.parquet, shuffle
        # write buffers), which the tiny synthetic warmups above never
        # touch. One full-corpus shingle census pays that cost outside
        # the timed window; per-query timings then start from a warm
        # shuffle layer like every later query already does.
        word_ngram_hashes(
            load_table(spark, sf_dir, "documents")
        ).groupBy("shingle").count().write.format("noop").mode(
            "overwrite"
        ).save()
        # r12 families: the exact-substring rewrite (gram explode +
        # anti join + ordered rebuild), the pHash band join
        # (xor/bit_count + checkpoint-cut Arrow hash), and the
        # multiclass dense-model algebra each JIT shapes no earlier
        # warmup touches
        from candia_spark.operators.curation import (
            multiclass_classifier_predict,
            multiclass_classifier_weights,
        )
        from candia_spark.operators.dedup import exact_substring_dedup
        from candia_spark.operators.multimodal import phash_near_dups

        exact_substring_dedup(docs200, k=6).count()
        phash_near_dups(
            docs200.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        ).count()
        wl = docs200.select(
            "doc_id", F.lit("a").alias("label"), "text"
        )
        multiclass_classifier_predict(
            wl, multiclass_classifier_weights(wl, label_col="label")
        ).count()
    except Exception:
        pass

    try:
        from candia_spark.operators.dedup import (
            LAST_CC_TELEMETRY,
            LAST_JACCARD_TELEMETRY,
            LAST_WINNOW_TELEMETRY,
        )
    except Exception:
        LAST_CC_TELEMETRY = {}
        LAST_JACCARD_TELEMETRY = {}
        LAST_WINNOW_TELEMETRY = {}
    try:
        from candia_spark.operators.graph import LAST_AUTHORITY_TELEMETRY
    except Exception:
        LAST_AUTHORITY_TELEMETRY = {}
    cc_rounds_by_query: dict[str, int] = {}
    jaccard_mode_by_query: dict[str, str] = {}
    winnow_by_query: dict[str, list[int]] = {}
    authority_by_query: dict[str, list] = {}

    # Per-query fault isolation: one broken query must never cost the
    # round its timings (round 3 lost ALL perf evidence to a single
    # AnalysisException). Errors are recorded in the JSON instead.
    for name in names + extra:
        for _run in range(max(1, cli.runs)):
            cc_calls_before = LAST_CC_TELEMETRY.get("calls", 0)
            jac_calls_before = LAST_JACCARD_TELEMETRY.get("calls", 0)
            win_calls_before = LAST_WINNOW_TELEMETRY.get("calls", 0)
            auth_calls_before = LAST_AUTHORITY_TELEMETRY.get("calls", 0)
            t0 = time.perf_counter()
            try:
                df = QUERY_REGISTRY[name].spark(spark, sf_dir)
                # Force full evaluation of every output column, not just
                # a count.
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, elapsed), elapsed)
            except Exception as exc:  # noqa: BLE001 — isolate, record, continue
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            # Attribute connected-components convergence telemetry to the
            # query whose run advanced the call counter (several queries
            # collapse pair graphs; a single last-value field would
            # misassign them all to whichever ran last).
            if LAST_CC_TELEMETRY.get("calls", 0) != cc_calls_before:
                cc_rounds_by_query[name] = LAST_CC_TELEMETRY.get("rounds", -1)
            # Same attribution for the standalone exact-Jaccard routing
            # decision (verdict r5 #7): a future mode regression shows up
            # as a string diff in the official bench artifact.
            if LAST_JACCARD_TELEMETRY.get("calls", 0) != jac_calls_before:
                jaccard_mode_by_query[name] = LAST_JACCARD_TELEMETRY.get(
                    "mode", "?"
                )
            # Winnowing index density + hot-fingerprint cap bite, and
            # authority graph geometry + guard mode (verdict r7 #8):
            # regressions in either surface as numbers in the official
            # artifact instead of as silent wall-time.
            if LAST_WINNOW_TELEMETRY.get("calls", 0) != win_calls_before:
                winnow_by_query[name] = [
                    LAST_WINNOW_TELEMETRY.get("fp_rows", -1),
                    LAST_WINNOW_TELEMETRY.get("hot_fps", -1),
                ]
            if LAST_AUTHORITY_TELEMETRY.get("calls", 0) != auth_calls_before:
                authority_by_query[name] = [
                    LAST_AUTHORITY_TELEMETRY.get("n_nodes", -1),
                    LAST_AUTHORITY_TELEMETRY.get("n_edges", -1),
                    int(bool(LAST_AUTHORITY_TELEMETRY.get("static_safe"))),
                ]

    total = round(sum(timings.values()), 3)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    # The driver keeps only the LAST 2000 bytes of bench stdout; with 67
    # registered queries the full-name JSON line is ~2600 bytes, so the
    # driver's tail parse fails (`parsed: null` in BENCH_r05/r06). Emit
    # the unique qNN prefixes instead — the full registry names live in
    # plans/queries.py and BENCH_local artifacts keep the long form.
    def short(qname: str) -> str:
        return qname.split("_", 1)[0]

    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {short(k): v for k, v in timings.items()},
        "sf": sf,
    }
    if cli.runs > 1:
        out["runs"] = cli.runs  # per-query minima over this many runs
    if errors:
        out["errors"] = {short(k): v for k, v in errors.items()}
    # Convergence telemetry per collapsing query — a convergence
    # regression shows up as a number rather than as silent wall-time.
    if cc_rounds_by_query:
        out["cc_rounds"] = {short(k): v for k, v in cc_rounds_by_query.items()}
    if jaccard_mode_by_query:
        out["jaccard_mode"] = {
            short(k): v for k, v in jaccard_mode_by_query.items()
        }
    if winnow_by_query:
        # [fp index rows, fingerprints dropped by the hot cap]
        out["winnow"] = {short(k): v for k, v in winnow_by_query.items()}
    if authority_by_query:
        # [nodes, edges, 1 if the static overflow bound held]
        out["authority"] = {
            short(k): v for k, v in authority_by_query.items()
        }
    # Byte-budget guard (the r5 `parsed: null` hygiene item, proactive
    # form): the driver keeps only the LAST 2000 bytes of stdout. At
    # 107 queries the full line crosses ~1900 bytes, so two defenses
    # run in order: (1) COMPRESS uniform telemetry maps — when every
    # query reports the same value (the steady state: jaccard_mode all
    # "plain", authority triplets identical), collapse the map to
    # {"*": value} instead of dropping it; (2) only then shed whole
    # keys, least-valuable first (jaccard_mode last — it is the
    # routing-regression tripwire the verdicts read). Full telemetry
    # always lives in BENCH_local artifacts.
    def _compress(key: str) -> None:
        m = out.get(key)
        if isinstance(m, dict) and len(m) > 1:
            vals = {json.dumps(v) for v in m.values()}
            if len(vals) == 1:
                out[key] = {"*": next(iter(m.values()))}

    if len(json.dumps(out).encode()) > 1900:
        for key in ("jaccard_mode", "authority", "cc_rounds", "winnow"):
            _compress(key)
    for shed in ("cc_rounds", "winnow", "authority", "jaccard_mode"):
        if len(json.dumps(out).encode()) <= 1900:
            break
        out.pop(shed, None)
    # Stop Spark BEFORE emitting the JSON so the one JSON line is the
    # very last stdout the harness produces — nothing (shutdown chatter
    # included) can trail it and trip the driver's tail parse (the r5
    # `parsed: null` hygiene item).
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out), flush=True)
    # Exit 0 as long as at least one query produced a timing; rc=1 only
    # when the harness measured nothing at all.
    return 0 if timings else 1


if __name__ == "__main__":
    sys.exit(main())
