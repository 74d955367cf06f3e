"""Regenerate the committed MS-pipeline stage goldens
(tests/goldens/pipeline/): the stage-3 slice store and the stage-5
decomposition factors from the reference's own toy experiment, with the
same parameters the e2e test fixture uses (tests/test_pipeline.py).

Run ONLY after confirming a movement is a legitimate refresh (reference
fixture change, numpy lineage change), not a pipeline regression — the
comparison tests' failure messages say how to tell.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens", "pipeline")
MZML = [
    "/root/reference/test/test_experiment/samples/scans_mzml/scan1.mzML",
    "/root/reference/test/test_experiment/samples/scans_mzml/scan2.mzML",
]
CFG_YAML = "/root/reference/test/test_experiment/config/candia.yaml"


def main() -> int:
    import tempfile

    from candia_spark.pipeline import CandiaConfig, run_pipeline
    from candia_spark.session import get_spark

    spark = get_spark(app_name="regen_pipeline_goldens", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CandiaConfig.from_yaml(CFG_YAML)
    with tempfile.TemporaryDirectory() as d:
        out = run_pipeline(
            spark,
            MZML,
            cfg,
            ncomp_range=[2, 3],
            max_iter=50,
            slice_store_path=os.path.join(d, "slices"),
        )
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        sliced = out["sliced"].toPandas()
        sliced = sliced.sort_values(list(sliced.columns)).reset_index(drop=True)
        sliced.to_parquet(os.path.join(GOLDEN_DIR, "sliced.parquet"), index=False)
        factors = out["factors"].toPandas()
        factors = factors.sort_values(
            ["swath_lower_adjusted", "rt_window", "ncomp", "mode", "comp", "row_idx"]
        ).reset_index(drop=True)
        factors.to_parquet(
            os.path.join(GOLDEN_DIR, "factors.parquet"), index=False
        )
        print(f"sliced: {len(sliced)} rows; factors: {len(factors)} rows")
        print(f"written to {GOLDEN_DIR}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
