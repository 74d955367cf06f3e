"""Bucketed (pre-shuffled, co-located) table storage — the join lever for
repeated large-fact joins at 100 TB.

The slice store (SURVEY §2.1 S5) partitions by slice key, which prunes
whole directories; bucketing additionally pre-hashes rows into a fixed
number of buckets per file so a join or aggregation on the bucket key
needs NO exchange at read time: Spark matches bucket spec to the join's
required distribution. The reference never needs this (its joins are all
dimension-sized broadcasts), but a training-data pipeline joining two
corpus-scale tables (documents x annotations, embeddings x labels) on
every run amortizes one write-time shuffle across every subsequent join.

Mechanics: ``bucketBy`` requires a managed table (``saveAsTable``) — plain
``parquet(path)`` writers cannot carry the bucket metadata. Readers get
the no-exchange plan only while ``spark.sql.sources.bucketing.enabled``
(default true) and bucket counts match (or one is a multiple under
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed bucketed table. ``sort_cols`` (defaults
    to the bucket columns) additionally sorts within buckets, letting a
    later sort-merge join skip its sorts too."""
    cols = list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, cols[0], *cols[1:])
        .sortBy(*(list(sort_cols) if sort_cols else cols))
    )
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed bucketed table (bucket metadata travels with the
    catalog entry, so this is just ``spark.table``)."""
    return spark.table(table)


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key as a sort-merge
    join. With matching bucket specs the physical plan contains no
    Exchange on either side — pinned by tests/test_bucketing.py.

    The ``merge`` hint is deliberate: this helper exists for the
    corpus x corpus case where both sides are too big to broadcast (the
    planner would otherwise prefer a broadcast join for a small side and
    drop the bucketed read, which is fine — but then you didn't need
    bucketing at all)."""
    return read_bucketed(spark, left_table).hint("merge").join(
        read_bucketed(spark, right_table), on=list(on), how=how
    )
