"""Capture .explain('formatted') output for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> q26 q73 ...
Writes plans/<tag>/<qname>_<suffix>.txt for each query (full registry name).

Building some query DataFrames runs driver-side jobs (materialized
census/margin passes), so this executes a slice of each query — run it on
an otherwise idle box when the wall time of the capture matters.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from candia_spark.session import get_spark
    from candia_spark.plans.queries import QUERY_REGISTRY

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        full = next((n for n in QUERY_REGISTRY if n == name or n.split("_")[0] == name), None)
        if full is None:
            print(f"SKIP unknown query {name}")
            continue
        df = QUERY_REGISTRY[full].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{full}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
