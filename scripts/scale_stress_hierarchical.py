"""Head-to-head scaling: flat k-means vs two-level hierarchical k-means at
the SAME leaf count on the same tiled corpora (appended to SCALING_r05.json
under ``hierarchical_kmeans``).

The claim under test (operators/clustering.kmeans_hierarchical, SCALING.md):
with leaves ~ N/250 (the SemDeDup contract), flat assignment is
N x leaves x dim per iteration — quadratic in N — while hierarchical is
N x (k1 + k2) x dim with k1 = k2 = sqrt(leaves), i.e. N^1.5-ish total.
Iteration budgets: flat runs its q57 default of 3 assignment passes;
hierarchical runs 2 super + 2 sub = 4 passes. The hierarchy does MORE
passes and still wins, so the budget asymmetry is conservative for the
speedup claim — the comparison measures work-shape, not tuning.

Usage: python scripts/scale_stress_hierarchical.py [--sizes 10 25 50]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scale_stress as ss  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--keep-data", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r05.json"))
    args = ap.parse_args()

    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_scale_stress_hier")
    spark.sparkContext.setLogLevel("ERROR")
    ss._SPARK_FOR_RECLAIM = spark

    from candia_spark.operators.clustering import kmeans_assign, kmeans_hierarchical
    from candia_spark.tables import load_table

    load_table(spark, ss.BASE_SF, "embeddings").limit(64).count()  # warm

    section: dict = {
        "note": (
            "same corpus, same leaf count (k1*k2 ~ n_vecs/250): flat "
            "kmeans_assign(k=k1*k2, iters=3) vs kmeans_hierarchical("
            "k1, k2, 2+2 iters); minima over --runs; assignment work is "
            "N*k*dim/iter flat vs N*(k1+k2)*dim/iter hierarchical"
        ),
        "runs_per_query": args.runs,
        "sizes": [],
    }
    for k in args.sizes:
        out_dir = os.path.join(ss.OUT_ROOT, f"hier_x{k}")
        t0 = time.perf_counter()
        n_vecs = ss.build_embeddings(spark, k, out_dir)
        gen_sec = round(time.perf_counter() - t0, 3)
        emb = load_table(spark, out_dir, "embeddings")
        k1 = k2 = max(3, math.ceil(math.sqrt(n_vecs / 250)))
        flat_k = k1 * k2
        entry = {
            "mult": k,
            "n_vecs": n_vecs,
            "gen_sec": gen_sec,
            "k1": k1,
            "k2": k2,
            "flat_k": flat_k,
            "flat_sec": ss.timed(
                lambda: kmeans_assign(emb, k=flat_k, iters=3), runs=args.runs
            ),
            "hier_sec": ss.timed(
                lambda: kmeans_hierarchical(
                    emb, k1=k1, k2=k2, iters1=2, iters2=2
                ),
                runs=args.runs,
            ),
        }
        entry["speedup"] = round(entry["flat_sec"] / entry["hier_sec"], 2)
        section["sizes"].append(entry)
        print(json.dumps({"progress": f"hier_x{k} done", **entry}), flush=True)
        if not args.keep_data:
            shutil.rmtree(out_dir, ignore_errors=True)

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report["hierarchical_kmeans"] = section
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "scale_stress_hierarchical", "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
