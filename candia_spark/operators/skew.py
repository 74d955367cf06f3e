"""Skew-handling primitives for hot keys at scale.

AQE's skew-join splitting handles moderate skew at runtime; these helpers
cover the cases it cannot: skewed *aggregations* (one giant group) and
skewed joins where the hot side must pre-split before a non-AQE-eligible
operation (e.g. a grouped-map UDF over a hot slice key).

Pattern: salt = deterministic hash-mod bucket, NOT rand() — identical
input always lands in the same salt bucket, so retries/re-runs are
deterministic and the two-phase aggregate stays exactly mergeable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    cols: Sequence[str],
    buckets: int,
    salt_col: str = "__salt",
) -> DataFrame:
    """Deterministic salt bucket from xxhash64 over ``cols`` (use row-
    unique cols, e.g. the row id) — spreads one hot group over ``buckets``
    reducers."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))
    )


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_cols: dict[str, str],
    buckets: int = 16,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed groups: sum/count per
    (group, salt) first — ``buckets`` parallel partial aggregates for the
    hottest key — then merge per group. ``agg_cols`` maps input column ->
    'sum' | 'count'.

    Spark's hash aggregate already does map-side partial aggregation, so
    only reach for this when a single group's *merged* state still
    overwhelms one reducer (huge distinct-heavy states, grouped-map UDFs).
    """
    group_cols = list(group_cols)
    salt_from = list(salt_from or df.columns)
    salted = with_salt(df, salt_from, buckets)

    partial_aggs: list[Column] = []
    final_aggs: list[Column] = []
    for col, how in agg_cols.items():
        if how == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{col}"))
            final_aggs.append(F.sum(f"__p_{col}").alias(f"sum_{col}"))
        elif how == "count":
            partial_aggs.append(F.count(col).alias(f"__p_{col}"))
            final_aggs.append(F.sum(f"__p_{col}").alias(f"count_{col}"))
        else:
            raise ValueError(f"unsupported agg: {how}")

    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def replicate_broadcast_side(
    small: DataFrame, buckets: int, salt_col: str = "__salt"
) -> DataFrame:
    """Explode the small side of a salted join: one copy per salt bucket.
    Join keys become (original keys + salt_col) against a ``with_salt``-ed
    big side — each hot key's rows split over ``buckets`` tasks while the
    small side stays broadcastable (size x buckets)."""
    return small.withColumn(
        salt_col,
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(buckets)])),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side deterministically, replicate
    the small side per bucket, join on (keys + salt). Semantically
    identical to ``big.join(small, on, how)`` for inner/left joins."""
    on = list(on)
    salt_from = list(salt_from or big.columns)
    b = with_salt(big, salt_from, buckets)
    s = replicate_broadcast_side(small, buckets)
    return b.join(F.broadcast(s), on + ["__salt"], how).drop("__salt")
