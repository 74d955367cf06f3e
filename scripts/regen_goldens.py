"""Regenerate the q23/q24 PARAFAC golden tables after a legitimate data or
numpy-lineage refresh: recomputes both gate scales and prints the Python
literals to paste into candia_spark/plans/queries.py (Q23_GOLDENS /
Q24_GOLDENS / GOLDEN_SCALE_KEYS / GOLDEN_NUMPY_VERSION).

Run ONLY after confirming the movement is a refresh (new testdata, new
numpy), not an algorithm regression — the recompute pytest's message says
how to tell the two apart.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

SCALES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    from candia_spark.plans.queries import QUERY_REGISTRY
    from candia_spark.session import get_spark

    spark = get_spark(app_name="regen_goldens", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    scale_keys = {}
    q23, q24 = {}, {}
    for tag, sf_dir in enumerate(SCALES):
        n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        scale_keys[n] = tag
        for r in (
            QUERY_REGISTRY["q23_parafac_decompose"].spark(spark, sf_dir).collect()
        ):
            q23[(tag, r["slice_key"], r["ncomp"])] = (
                r["iterations"],
                round(r["rsq"], 2),
            )
        for r in (
            QUERY_REGISTRY["q24_time_mode_peaks"].spark(spark, sf_dir).collect()
        ):
            q24[(tag, r["slice_key"], r["comp"])] = r["npeaks"]

    print(f"GOLDEN_SCALE_KEYS = {scale_keys!r}")
    major_minor = ".".join(np.__version__.split(".")[:2])
    print(f'GOLDEN_NUMPY_VERSION = "{major_minor}"')
    print("Q23_GOLDENS = {")
    for k in sorted(q23):
        print(f"    {k!r}: {q23[k]!r},")
    print("}")
    print("Q24_GOLDENS = {")
    for k in sorted(q24):
        print(f"    {k!r}: {q24[k]!r},")
    print("}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
