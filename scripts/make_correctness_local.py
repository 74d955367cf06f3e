"""Produce CORRECTNESS_local_r{N}.json: plans/compare.py compare_all over
ALL registered queries at three scales (sf0.001 / sf0.01 / sf0.1). The
driver's CORRECTNESS_r{N} certifies only the first 50 registry entries;
this artifact certifies the full registry, including the tail-rotated
stable queries, each round.

Usage: python scripts/make_correctness_local.py --round 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--scales", nargs="+",
        default=["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                 "/root/testdata/sf0.1"],
    )
    args = ap.parse_args()

    from candia_spark.plans.compare import compare_all
    from candia_spark.plans.queries import QUERY_REGISTRY
    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_correctness_local")
    spark.sparkContext.setLogLevel("ERROR")

    n = len(QUERY_REGISTRY)
    out = {
        "note": (
            "Local belt-and-braces correctness artifact: plans/compare.py "
            "compare_all over ALL registered queries at three scales. The "
            f"driver CORRECTNESS_r{args.round} certifies the first 50 "
            f"registry entries; this file certifies the full {n}-query "
            "registry, including the tail-rotated stable queries."
        ),
        "scales": {},
    }
    ok = True
    for sf_dir in args.scales:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        t0 = time.perf_counter()
        results = compare_all(spark, sf_dir)
        wall = round(time.perf_counter() - t0, 1)
        bad = [r["name"] for r in results if not r["match"]]
        ok = ok and not bad
        out["scales"][sf] = {
            "queries": len(results),
            "all_match": not bad,
            "mismatches": bad,
            "wall_sec": wall,
            "results": results,
        }
        print(json.dumps({"scale": sf, "all_match": not bad,
                          "mismatches": bad, "wall_sec": wall}), flush=True)

    path = os.path.join(REPO, f"CORRECTNESS_local_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "correctness_local", "out": path,
                      "all_match": ok}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
