"""As-of join — an operator Spark lacks natively, built shuffle-efficiently
from a union + ordered window (no UDF, no cartesian expansion).

Used by scan-cycle binning (W3): each scan point joins to the latest MS1
acquisition time at or before it. Generic enough for any event-alignment
workload (latest config before a reading, last login before an event).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the columns of the closest right row with
    ``right.on <= left.on`` (direction='backward') or ``>=`` ('forward'),
    matching on the ``by`` keys. Left rows with no match keep nulls.

    Scale: ONE shuffle — both sides union and sort within ``by`` partitions;
    the match is a running ``last(..., ignorenulls)`` (or ``first`` for
    forward) over the ordered union. No range join, no per-group Python.
    Skewed ``by`` keys are handled by AQE; a per-key salt is unnecessary
    because the window is a linear scan, not a product.

    Ties (equal ``on``): the right row sorts before (backward) / after
    (forward) the left row, so an exactly-simultaneous right row matches
    unless ``strict`` (then it doesn't).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    rcols = [c for c in (right_cols or right.columns) if c != on and c not in by]
    lcols = [c for c in left.columns if c != on and c not in by]

    # Tag sides. Right rows carry their payload; left rows carry nulls there.
    r_tag = 0 if direction == "backward" else 1
    l_tag = 1 - r_tag
    if strict:
        r_tag, l_tag = l_tag, r_tag

    r = right.select(
        *[F.col(b) for b in by],
        F.col(on).alias("__t"),
        F.lit(r_tag).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    lft = left.select(
        *[F.col(b) for b in by],
        F.col(on).alias("__t"),
        F.lit(l_tag).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = r.unionByName(lft)

    if direction == "backward":
        w = (
            Window.partitionBy(*[F.col(b) for b in by])
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = [F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(c) for c in rcols]
    else:
        w = (
            Window.partitionBy(*[F.col(b) for b in by])
            .orderBy(F.col("__t").desc(), F.col("__side").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = [F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(c) for c in rcols]

    is_left = F.col("__side") == F.lit(l_tag)
    out = (
        u.select(
            *[F.col(b) for b in by],
            F.col("__t"),
            F.col("__side"),
            *[F.col(f"__l_{c}") for c in lcols],
            *matched,
        )
        .filter(is_left)
        .select(
            *[F.col(b) for b in by],
            F.col("__t").alias(on),
            *[F.col(f"__l_{c}").alias(c) for c in lcols],
            *[F.col(c) for c in rcols],
        )
    )
    return out
