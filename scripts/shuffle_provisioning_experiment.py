"""Probe the q26 x50 super-linear step: reducer count vs memory.

SCALING_r05.json shows exact all-pairs Jaccard (q26 form) growing 3.35x
for the 2x step x25 -> x50 while every other curve stays linear. The
join mass is linear in tile count by construction, so two one-box
suspects remain: (a) reducer starvation — 32 shuffle partitions for a
~5e9-row pair stream — or (b) the pair stream's working set crossing the
box's physical memory (strong-scaling wall). This probe reruns the SAME
two corpora at shuffle.partitions=256 to separate them: a x50/x25 ratio
near 2 means (a) — more reducers fixed it; a ratio still near 3 means
(b) — partitions don't add memory on one box, only executors do.

MEASURED (this box, 128 GiB): 228 s -> 684 s, ratio 2.99 — outcome (b).
The ~120 GB pair stream at x50 exceeds RAM where x25's ~60 GB did not;
per-reducer data share doubles on a fixed box, which a real cluster
prevents by scaling executors with data (weak scaling). The sub-linear
LSH-then-verify family (q27/q49) — the actual 100 TB dedup path — never
crosses that boundary at any measured size.

Appends results under "shuffle_provisioning" in SCALING_r05.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import scale_stress  # noqa: E402
from scale_stress import OUT_ROOT, build_documents, reclaim  # noqa: E402


def main() -> int:
    from candia_spark.session import get_spark
    from candia_spark.operators.dedup import ngram_jaccard_pairs
    from candia_spark.tables import load_table

    spark = get_spark(app_name="candia_shuffle_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    scale_stress._SPARK_FOR_RECLAIM = spark

    out = {"shuffle_partitions": 256, "sizes": []}
    for k in (25, 50):
        d = os.path.join(OUT_ROOT, f"sp_x{k}")
        n_docs = build_documents(spark, k, d)
        docs = load_table(spark, d, "documents")
        reclaim()
        spark.conf.set("spark.sql.shuffle.partitions", "256")
        t0 = time.perf_counter()
        ngram_jaccard_pairs(
            docs, n=2, threshold=0.35, max_shingle_frac=0.5, prefix_filter=False
        ).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        out["sizes"].append({"mult": k, "n_docs": n_docs, "cap_default_sec": dt})
        print(json.dumps({"progress": f"sp_x{k}", "sec": dt}), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    a, b = out["sizes"][0]["cap_default_sec"], out["sizes"][1]["cap_default_sec"]
    out["x50_over_x25_ratio"] = round(b / a, 3)

    path = os.path.join(REPO, "SCALING_r05.json")
    with open(path) as f:
        report = json.load(f)
    report["shuffle_provisioning"] = out
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "shuffle_provisioning", **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
