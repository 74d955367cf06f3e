"""q81 candidate-stage sub-phase breakdown at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    el = time.perf_counter() - t0
    print(f"{label}: {el:.2f}s", flush=True)
    return el


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from candia_spark.session import get_spark

    spark = get_spark(app_name="phase_q81_r17")
    spark.sparkContext.setLogLevel("ERROR")

    import candia_spark.operators.dedup as dd
    from candia_spark.plans.queries import _q71_aug_corpus

    num_hashes, min_hits, id_col = 64, 24, "doc_id"
    aug = _q71_aug_corpus(spark, sf_dir)
    t0 = time.perf_counter()
    index = dd.shingle_index(aug, 2)
    print(f"index: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    n = index.count()
    print(f"index.count() routing job: {time.perf_counter()-t0:.2f}s ({n})")

    witnesses = index.groupBy(id_col).agg(
        *[
            F.min_by("shingle", F.xxhash64(F.col("shingle"), F.lit(i))).alias(
                f"__w{i}"
            )
            for i in range(num_hashes)
        ]
    )
    t("witness agg (64 min_by)", witnesses)

    par = dd._probe_parallelism(index)
    warr = F.array(*[F.col(f"__w{i}") for i in range(num_hashes)])

    def _seed_count(d):
        return F.size(F.filter(warr, lambda x: x == d))

    probe = witnesses.select(
        F.col(id_col).alias("__wid"),
        F.explode(
            F.transform(
                F.array_distinct(warr),
                lambda d: F.struct(
                    d.alias("shingle"),
                    _seed_count(d).cast("int").alias("__seeds"),
                ),
            )
        ).alias("__p"),
    ).select(
        "__wid",
        F.col("__p.shingle").alias("shingle"),
        F.col("__p.__seeds").alias("__seeds"),
    ).repartition(par, "__wid")
    t("probe build (witness agg + explode + repartition)", probe)

    hits = probe.join(F.broadcast(index), "shingle").filter(
        F.col("__wid") != F.col(id_col)
    )
    t("hits join (broadcast, no agg)", hits)

    fwd = F.col("__wid") < F.col(id_col)
    cands = (
        hits.groupBy(
            F.least("__wid", id_col).alias("id_a"),
            F.greatest("__wid", id_col).alias("id_b"),
        )
        .agg(
            F.sum(F.when(fwd, F.col("__seeds")).otherwise(0)).alias("__ab"),
            F.sum(F.when(~fwd, F.col("__seeds")).otherwise(0)).alias("__ba"),
        )
        .filter(F.greatest("__ab", "__ba") >= min_hits)
        .select("id_a", "id_b")
    )
    t("full candidates (join + pair agg)", cands)
    spark.stop()


if __name__ == "__main__":
    main()
