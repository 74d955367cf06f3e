"""Scaling curves for the round-5 curation/clustering family (q55-q58)
on the same tiled corpora as scale_stress.py, APPENDED to SCALING_r05.json
under the ``curation_family`` key (the dedup/ANN sections are expensive to
regenerate and are left untouched).

k-means/SemDeDup follow their documented scale contract: k grows with the
corpus (k = max(8, n_vecs // 250)), which keeps the in-cluster pair mass
~linear (N x target_cluster_size / 2) while the assignment map cost is
N x k x dim per iteration — the standard Lloyd's bill, recorded per size.

Usage: python scripts/scale_stress_curation.py [--sizes 10 25 50] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scale_stress as ss  # noqa: E402  (sibling harness: builders + timer)


def run_family(spark, sf_dir: str, n_vecs: int, runs: int) -> dict:
    from candia_spark.operators.clustering import (
        cluster_closest_pairs,
        kmeans_assign,
    )
    from candia_spark.operators.curation import normalized_exact_dups
    from candia_spark.operators.dedup import substring_duplication
    from candia_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    k = max(8, n_vecs // 250)
    out = {"kmeans_k": k}
    out["q55_substring_dups"] = ss.timed(
        lambda: substring_duplication(docs, gram_chars=40), runs=runs
    )
    out["q56_normalized_dedup"] = ss.timed(
        lambda: normalized_exact_dups(docs), runs=runs
    )
    out["q57_kmeans_clusters"] = ss.timed(
        lambda: kmeans_assign(emb, k=k, iters=3), runs=runs
    )
    out["q58_semantic_closest_pairs"] = ss.timed(
        lambda: cluster_closest_pairs(emb, k=k, iters=3), runs=runs
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--keep-data", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r05.json"))
    args = ap.parse_args()

    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_scale_stress_curation")
    spark.sparkContext.setLogLevel("ERROR")
    ss._SPARK_FOR_RECLAIM = spark

    from candia_spark.tables import load_table

    # warm codegen/HOF paths so size-1 timings aren't startup
    load_table(spark, ss.BASE_SF, "documents").limit(200).count()

    section: dict = {
        "note": (
            "q55/q56 on the tiled documents corpus; q57/q58 on tiled "
            "embeddings with k = max(8, n_vecs // 250) (the SemDeDup "
            "contract: cluster count grows with the corpus so in-cluster "
            "pair mass stays linear); minima over --runs"
        ),
        "runs_per_query": args.runs,
        "sizes": [],
    }
    for k in args.sizes:
        out_dir = os.path.join(ss.OUT_ROOT, f"cur_x{k}")
        t0 = time.perf_counter()
        n_docs = ss.build_documents(spark, k, out_dir)
        n_vecs = ss.build_embeddings(spark, k, out_dir)
        gen_sec = round(time.perf_counter() - t0, 3)
        entry = {
            "mult": k,
            "n_docs": n_docs,
            "n_vecs": n_vecs,
            "gen_sec": gen_sec,
            "queries": run_family(spark, out_dir, n_vecs, args.runs),
        }
        section["sizes"].append(entry)
        print(json.dumps({"progress": f"cur_x{k} done", **entry}), flush=True)
        if not args.keep_data:
            shutil.rmtree(out_dir, ignore_errors=True)

    if len(section["sizes"]) >= 2:
        norm = {}
        for q in ("q55_substring_dups", "q56_normalized_dedup"):
            norm[q + "_usec_per_doc"] = [
                round(s["queries"][q] / s["n_docs"] * 1e6, 3)
                for s in section["sizes"]
            ]
        for q in ("q57_kmeans_clusters", "q58_semantic_closest_pairs"):
            norm[q + "_usec_per_vec"] = [
                round(s["queries"][q] / s["n_vecs"] * 1e6, 3)
                for s in section["sizes"]
            ]
        section["normalized"] = norm

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["curation_family"] = section
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "scale_stress_curation", "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
