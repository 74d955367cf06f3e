"""Load the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an ``sf`` directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables whose queries do heavy per-row expression work (tokenize /
# shingle / hash / vector math). The driver's test parquet is ONE row
# group per table -> one scan task, so without a fan-out all of that work
# runs on a single core until the first shuffle. For these tables one
# round-robin repartition after the scan is a 2-4x cold-run win (measured:
# ngram-jaccard 19.8s -> ~10s, minhash 18s -> ~4s at sf0.1). The
# relational tables (lineitem/orders/...) are agg/join-bound with light
# per-row work — there the extra exchange + AQE round costs more than the
# parallelism buys at this scale, so they are left alone. On a real
# multi-file dataset the scan splits by itself and this is a no-op.
FANOUT_TABLES = frozenset({"documents", "embeddings"})


def load_table(
    spark: SparkSession, sf_dir: str, name: str, min_parallelism: int | None = None
) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name not in FANOUT_TABLES:
        return df
    if min_parallelism is None:
        min_parallelism = spark.sparkContext.defaultParallelism
    # file count as the parallelism proxy: inputFiles() is a metadata-only
    # listing (no RDD conversion plan per load, unlike rdd.getNumPartitions).
    # Single-file driver parquet fans out to core count for the heavy
    # per-row expressions; a many-file corpus at scale is left untouched.
    if len(df.inputFiles()) < min_parallelism:
        df = df.repartition(min_parallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}
