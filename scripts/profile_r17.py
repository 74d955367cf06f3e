"""Round-17 profiling harness: time a subset of registry queries with the
EXACT bench.py methodology (same session config, same warmups, one noop-sink
run per query, cold process) so variants are comparable to the driver's
single-run numbers. Usage:

    SPARK_GRAFT_CPUS=32 python scripts/profile_r17.py q26 q71 q73

Prints one JSON line {"cpus": N, "queries": {...}, "order": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    want = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "1"))
    from candia_spark.session import get_spark
    from candia_spark.plans.queries import QUERY_REGISTRY

    spark = get_spark(app_name="candia_spark_profile_r17")
    spark.sparkContext.setLogLevel("ERROR")

    # Experiment hook: arbitrary python run before warmup, e.g.
    #   PROFILE_PATCH='import candia_spark.operators.dedup as dd;
    #                  dd._PAIR_PROBE_DOC_PARTITION_ROWS = -1'
    patch = os.environ.get("PROFILE_PATCH")
    if patch:
        exec(patch)  # noqa: S102 — local measurement harness only

    # bench.py's warmup block, verbatim subset (relational + dedup/HOF +
    # pandas + clustering + graph + CC + corpus shuffle first-touch)
    from pyspark.sql import functions as F

    from candia_spark.operators.dedup import (
        connected_components,
        word_ngram_hashes,
    )
    from candia_spark.operators.graph import authority_scores
    from candia_spark.operators.multimodal import extract_features
    from candia_spark.operators.clustering import kmeans_assign
    from candia_spark.tables import load_table

    names = [
        full
        for q in want
        for full in QUERY_REGISTRY
        if full.split("_", 1)[0] == q
    ]
    try:
        QUERY_REGISTRY["q01_pricing_summary"].spark(spark, sf_dir).count()
        docs200 = load_table(spark, sf_dir, "documents").limit(200)
        word_ngram_hashes(docs200).count()
        extract_features(
            docs200.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        ).count()
        kmeans_assign(
            load_table(spark, sf_dir, "embeddings").limit(64), k=2, iters=1
        ).count()
        warm_edges = spark.range(200).selectExpr(
            "id as src", "(id + 1) % 200 as dst"
        )
        authority_scores(
            warm_edges, spark.range(200).selectExpr("id as doc_id"), iters=1
        ).count()
        connected_components(
            spark.range(200).selectExpr("id as id_a", "(id + 1) % 200 as id_b")
        ).count()
        word_ngram_hashes(
            load_table(spark, sf_dir, "documents")
        ).groupBy("shingle").count().write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = QUERY_REGISTRY[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            key = name.split("_", 1)[0]
            timings[key] = min(timings.get(key, el), el)
        spark.sparkContext.setJobDescription(None)

    spark.stop()
    print(
        json.dumps(
            {
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "runs": runs,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
