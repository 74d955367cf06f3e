"""Phase breakdown for q27 (minhash LSH + verify) and q81 (containment
witness LSH) at sf0.1 — cold process, noop-sink per phase."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    which = sys.argv[1] if len(sys.argv) > 1 else "q27"
    from candia_spark.session import get_spark
    from candia_spark.tables import load_table

    spark = get_spark(app_name="phase_profile_r17")
    spark.sparkContext.setLogLevel("ERROR")

    from candia_spark.operators.dedup import (
        containment_candidate_pairs,
        minhash_lsh_pairs,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        shingle_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    if which == "q27":
        idx = shingle_index(docs, n=2)
        print(f"index build+materialize: {time.perf_counter()-t0:.2f}s")
        t("index noop re-read", idx)
        cands = minhash_lsh_pairs(
            docs, num_hashes=32, bands=16, n=2, index=idx,
            with_est_jaccard=False,
        )
        t("minhash lsh candidates", cands)
        out = ngram_jaccard_pairs(
            docs, n=2, threshold=0.7, candidates=cands, index=idx
        )
        t("verify (candidates mode, incl cand recompute)", out)
    elif which == "q81":
        from candia_spark.plans.queries import _q71_aug_corpus

        aug = _q71_aug_corpus(spark, sf_dir)
        idx = shingle_index(aug, 2)
        print(f"aug index build+materialize: {time.perf_counter()-t0:.2f}s")
        print("index rows:", idx.count())
        cands = containment_candidate_pairs(
            aug, num_hashes=64, index=idx, min_hits=24
        )
        t("witness candidates", cands)
        out = ngram_containment_pairs(
            aug, n=2, threshold=0.9, candidates=cands, index=idx
        )
        t("verify (incl cand recompute)", out)
    spark.stop()


if __name__ == "__main__":
    main()
