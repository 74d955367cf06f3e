"""Named query plans + DuckDB oracle SQL — the driver correctness surface.

Every operator in SURVEY §2 gets at least one named query here, expressed on
the driver's TPC-H-ish tables (TESTDATA.md). Each entry pairs:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` built from
  ``candia_spark.operators`` / ``functions``, and
- an equivalent ANSI-SQL oracle string for DuckDB (omitted only for
  genuinely non-SQL-expressible operators — greedy sequential partitioning,
  iterative tensor decomposition — which get rows-only checks plus golden
  pytest fixtures).

Hash-exactness rules (see candia_spark.functions.numeric): double sums go
through decimal; scalar double math is written identically on both engines;
integer outputs are cast to BIGINT on both; no raw timestamps in outputs
(the events table is nanosecond-timestamped parquet — Spark reads it as
nanos longs, DuckDB as microsecond timestamps; convention
``ts div 1000 == epoch_us(ts)``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from candia_spark.functions.numeric import (
    cv_expr,
    davg,
    dsum,
    oracle_cv,
    oracle_davg,
    oracle_dsum,
)
from candia_spark.operators import (
    adjust_overlapping_windows,
    asof_join,
    assign_scan_cycles,
    band_join,
    bucketize,
    cross_index,
    explode_index,
    greedy_ppm_partition,
    groupwise_argmax,
    histogram_cutoff_filter,
    interval_anti_join,
    interval_join,
    two_level_count_filter,
)
from candia_spark.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY §2 operator ids this query certifies


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERY_REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ref)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark for n, s in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERY_REGISTRY.items() if s.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# q01 — pricing summary (flagship; A1/A2/A3 group-by sums & means, F1 filter)
# ===========================================================================

@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
           {oracle_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_extendedprice')} AS avg_price,
           {oracle_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="A1,A2,A3,F1",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped scan→filter→aggregate.

    Scale: filter + projection push to the parquet scan; partial aggregation
    (map-side combine) means the shuffle carries one row per
    (flag, status, partition) — a few hundred rows regardless of input size.
    """
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ===========================================================================
# q02 — interval (point-in-range) join, first-window-wins (J1)
# ===========================================================================

_BANDS_SQL = """
    SELECT CAST(r * 9000 AS DOUBLE) AS lo, CAST(r * 9000 + 10000 AS DOUBLE) AS hi
    FROM range(0, 12) t(r)
"""


def _price_bands(spark: SparkSession) -> DataFrame:
    """Overlapping price bands [k*9000, k*9000+10000) — the shape of SWATH
    isolation windows (consecutive windows overlap, FIXTURES.md T2)."""
    return spark.range(0, 12).select(
        (F.col("id") * 9000).cast("double").alias("lo"),
        (F.col("id") * 9000 + 10000).cast("double").alias("hi"),
    )


@register(
    "q02_interval_join",
    oracle=f"""
    WITH bands AS ({_BANDS_SQL}),
    assigned AS (
        SELECT l.l_extendedprice, l.l_quantity, b.lo,
               MIN(b.lo) OVER (PARTITION BY l.l_extendedprice) AS minlo
        FROM lineitem l JOIN bands b
          ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    )
    SELECT CAST(lo AS BIGINT) AS band_lo,
           COUNT(*) AS n_points,
           {oracle_dsum('l_quantity')} AS sum_qty
    FROM assigned WHERE lo = minlo
    GROUP BY lo
    """,
    survey_ref="J1",
)
def q02_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each lineitem price to its first containing overlapping band
    (parity: SWATH window assignment, msproc.py:89-91,164-170).

    Scale: broadcast range join — the 12-row band table broadcasts, the
    fact table never shuffles for the join; only the final small groupBy
    shuffles pre-aggregated rows.
    """
    l = _t(spark, sf_dir, "lineitem")
    assigned = interval_join(l, _price_bands(spark), point_col="l_extendedprice")
    return assigned.groupBy(F.col("lo").cast("bigint").alias("band_lo")).agg(
        F.count(F.lit(1)).alias("n_points"),
        dsum("l_quantity").alias("sum_qty"),
    )


# ===========================================================================
# q03 — overlapping-window adjustment via lead/lag (W1, W7)
# ===========================================================================

@register(
    "q03_window_adjust",
    oracle="""
    WITH w AS (SELECT DISTINCT lo, hi FROM (
        SELECT CAST(r * 9000 AS DOUBLE) AS lo, CAST(r * 9000 + 10000 AS DOUBLE) AS hi
        FROM range(0, 12) t(r))),
    adj AS (
        SELECT lo, hi,
               CAST(ROUND(COALESCE((LEAD(lo) OVER (ORDER BY lo) + hi) / 2.0, hi), 2) AS DOUBLE) AS upper_adj
        FROM w)
    SELECT lo, hi, upper_adj,
           COALESCE(LAG(upper_adj) OVER (ORDER BY lo), CAST(ROUND(lo, 2) AS DOUBLE)) AS lower_adj
    FROM adj
    """,
    survey_ref="W1,W7",
)
def q03_window_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split overlap between consecutive windows at the midpoint (parity:
    adjust_swaths.R:26-41). Dimension-sized input; single-partition window
    by design."""
    return adjust_overlapping_windows(_price_bands(spark), "lo", "hi", digits=2)


# ===========================================================================
# q04 — fixed-width time bucketization over the events stream table (W2)
# ===========================================================================

@register(
    "q04_time_buckets",
    oracle=f"""
    SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="W2,S2",
)
def q04_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling buckets of the event stream (parity: RT-window
    bucketization, split_csv_maps_to_slices.py:69-78). ``ts`` arrives as
    nanosecond longs; ``div`` keeps everything integral and codegen'd."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("hour_bucket", F.expr("(ts div 1000) div 3600000000").cast("bigint"))
        .groupBy("hour_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
    )


# ===========================================================================
# q05 — group-wise argmax keeping ties (W5)
# ===========================================================================

@register(
    "q05_groupwise_argmax",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM (SELECT c_custkey, c_nationkey, c_acctbal,
                 MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
          FROM customer)
    WHERE c_acctbal = mx
    """,
    survey_ref="W5",
)
def q05_groupwise_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation best customers, ties kept (parity: best-model selection,
    select_best_models.R:31-36)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return groupwise_argmax(c, ["c_nationkey"], "c_acctbal")


# ===========================================================================
# q06 — two-level max-count filter + left-semi join (A5, J4)
# ===========================================================================

@register(
    "q06_two_level_count_filter",
    oracle=f"""
    WITH counts AS (
        SELECT l_partkey, l_suppkey, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    qualifying AS (
        SELECT l_partkey FROM counts GROUP BY l_partkey HAVING MAX(cnt) >= 3)
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {oracle_dsum('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_partkey IN (SELECT l_partkey FROM qualifying)
    GROUP BY l_returnflag
    """,
    survey_ref="A5,J4",
)
def q06_two_level_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep lineitems of parts where some supplier ships >= 3 lines (parity:
    m/z partitions qualifying via >=5 points in some sample,
    generate_slice_tensor.py:154-167)."""
    l = _t(spark, sf_dir, "lineitem")
    kept = two_level_count_filter(
        l, inner_key=["l_partkey", "l_suppkey"], outer_key=["l_partkey"], min_count=3
    )
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


# ===========================================================================
# q07 — cartesian model index + spectrum explode + deterministic ids
#        (J7, W9, W10)
# ===========================================================================

@register(
    "q07_model_spectrum_index",
    oracle="""
    WITH rf AS (SELECT DISTINCT l_returnflag FROM lineitem),
         ls AS (SELECT DISTINCT l_linestatus FROM lineitem),
         nc AS (SELECT CAST(r AS INT) AS ncomp FROM range(2, 5) t(r)),
    idx AS (
        SELECT l_returnflag, l_linestatus, ncomp,
               ROW_NUMBER() OVER (ORDER BY l_returnflag, l_linestatus, ncomp) - 1 AS model_id
        FROM rf CROSS JOIN ls CROSS JOIN nc),
    expanded AS (
        SELECT l_returnflag, l_linestatus, ncomp, model_id,
               UNNEST(generate_series(0, ncomp - 1)) AS spectrum_num
        FROM idx)
    SELECT l_returnflag, l_linestatus,
           CAST(ncomp AS BIGINT) AS ncomp,
           CAST(model_id AS BIGINT) AS model_id,
           CAST(spectrum_num AS BIGINT) AS spectrum_num,
           CAST(ROW_NUMBER() OVER (ORDER BY model_id, spectrum_num) - 1 AS BIGINT) AS scan
    FROM expanded
    """,
    survey_ref="J7,W9,W10",
)
def q07_model_spectrum_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model index = cartesian product of dimensions with dense product-order
    ids; spectrum index = per-model explode with global scan ids (parity:
    models.py:61-117, golden grid models.py:206-225)."""
    l = _t(spark, sf_dir, "lineitem")
    rf = l.select("l_returnflag").distinct()
    ls = l.select("l_linestatus").distinct()
    nc = spark.range(2, 5).select(F.col("id").cast("int").alias("ncomp"))
    idx = cross_index([rf, ls, nc], id_col="model_id")
    out = explode_index(
        idx,
        count_col="ncomp",
        ordinal_col="spectrum_num",
        global_col="scan",
        order_cols=["model_id"],
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("ncomp").cast("bigint").alias("ncomp"),
        F.col("model_id").cast("bigint").alias("model_id"),
        F.col("spectrum_num").cast("bigint").alias("spectrum_num"),
        F.col("scan").cast("bigint").alias("scan"),
    )


# ===========================================================================
# q08 — per-group histogram cutoff filter (F6, A12)
# ===========================================================================

@register(
    "q08_histogram_cutoff",
    oracle=f"""
    WITH b AS (
        SELECT l_orderkey, l_extendedprice,
               MIN(l_extendedprice) OVER (PARTITION BY l_orderkey) AS mn,
               MAX(l_extendedprice) OVER (PARTITION BY l_orderkey) AS mx
        FROM lineitem)
    SELECT COUNT(*) AS n_kept,
           {oracle_dsum('l_extendedprice')} AS sum_price
    FROM b
    WHERE l_extendedprice > (CASE WHEN mx = mn THEN mn - 0.5 + 50 / 100.0
                                  ELSE mn + 50 * (mx - mn) / 100.0 END)
    """,
    survey_ref="F6,A12",
)
def q08_histogram_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order 100-bin histogram background removal (parity: per-spectrum
    intensity cutoff, msproc.py:660-685 — cutoff is the LOWER edge of bin k,
    ``np.histogram(...)[1][cutoff_bin]``, and the kept predicate is strict
    ``value > cutoff``)."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    kept = histogram_cutoff_filter(
        l, ["l_orderkey"], "l_extendedprice", nbins=100, cutoff_bin=50
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"), dsum("l_extendedprice").alias("sum_price")
    )


# ===========================================================================
# q09 — tolerance band join, bucketed (J5, F8)
# ===========================================================================

@register(
    "q09_band_join",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_close_customers
    FROM supplier s JOIN customer c ON ABS(c.c_acctbal - s.s_acctbal) <= 50.0
    GROUP BY s.s_suppkey
    """,
    survey_ref="J5,F8",
)
def q09_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|a-b| <= tol join (parity: np.isclose matching, msproc.py:730-743)
    executed as a bucketed equi-join (O(N+M), broadcast-able) instead of a
    cartesian theta-join."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    joined = band_join(c, s, "c_acctbal", "s_acctbal", tol=50.0)
    return joined.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_close_customers"))


# ===========================================================================
# q10 — anti join (J6, F2) and q11 — semi join (J4)
# ===========================================================================

@register(
    "q10_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    survey_ref="J6,F2",
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (parity: points in no SWATH window,
    msproc.py:168-170). Broadcast-able anti join on the key set."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


@register(
    "q11_semi_join",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS sum_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
    survey_ref="J4",
)
def q11_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having a deep-discount line (left-semi; parity: `isin`
    frequency filter, generate_slice_tensor.py:162-167)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_totalprice"),
        )
    )


# ===========================================================================
# q12 — multi-way broadcast join chain (J2, J3) — revenue per region
# ===========================================================================

@register(
    "q12_star_join_revenue",
    oracle=f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_lines,
           {oracle_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    survey_ref="J2,J3",
)
def q12_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join chain with explicit broadcast of every dimension
    (parity: the reference's small-table equi joins, SURVEY §2.3 J2/J3).

    Scale: lineitem⨝orders is the only real shuffle (both sides huge,
    hash-partitioned on orderkey — at 100 TB this is where bucketing both
    tables on orderkey removes the shuffle entirely); customer/nation/region
    broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum(revenue).alias("revenue"))
    )


# ===========================================================================
# q13 — unimodal-fraction style conditional mean (A6)
# ===========================================================================

@register(
    "q13_conditional_fraction",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CASE WHEN l_quantity <= 5.0 THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*) AS DOUBLE) AS small_qty_fraction,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="A6",
)
def q13_conditional_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fraction(predicate) per group (parity: unimodal fraction
    count(npeaks==1)/count(*), select_best_models.R:16-29). Integer
    count ratio — exact on both engines."""
    l = _t(spark, sf_dir, "lineitem")
    frac = (
        F.sum(F.when(F.col("l_quantity") <= 5.0, 1).otherwise(0)).cast("double")
        / F.count(F.lit(1))
    ).cast("double")
    return l.groupBy("l_returnflag").agg(
        frac.alias("small_qty_fraction"), F.count(F.lit(1)).alias("n_rows")
    )


# ===========================================================================
# q14 — coefficient of variation per group (A7)
# ===========================================================================

@register(
    "q14_cv_per_group",
    oracle=f"""
    SELECT o_orderpriority,
           {oracle_cv('o_totalprice')} AS cv_totalprice,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    survey_ref="A7",
)
def q14_cv_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CV = pop-std/mean over exact decimal sums (parity: scipy.stats
    variation per component, collect_sample_modes.py:92-95)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        cv_expr("o_totalprice").alias("cv_totalprice"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ===========================================================================
# q15 — count-distinct + max_by (A4, F9)
# ===========================================================================

@register(
    "q15_count_distinct_argmax",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
        FROM events GROUP BY user_id)
    SELECT user_id, CAST(n_types AS BIGINT) AS n_types, n_events
    FROM per_user
    QUALIFY ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id ASC) <= 5
    """,
    survey_ref="A4,F9",
)
def q15_count_distinct_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count per key + deterministic top-k (parity: distinct rt per
    file + longest-sample pick, msproc.py:692-706).

    Top-k device: orderBy + limit compiles to TakeOrderedAndProject —
    each partition keeps its own k rows and the driver merges k*P, so
    the distinct-user census never shuffles to one task (the r13-flagged
    unpartitioned-row_number plan did exactly that)."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_user.orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    ).limit(5)


# ===========================================================================
# q16 — exact median / percentile (A9)
# ===========================================================================

@register(
    "q16_median",
    oracle="""
    SELECT source,
           CAST(ROUND(MEDIAN(n_chars), 4) AS DOUBLE) AS median_chars,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
    survey_ref="A9",
)
def q16_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of document lengths per source (parity: median sequence
    length for the e-value threshold, seqproc.py:61-77)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).cast("double").alias("median_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ===========================================================================
# q17 — column-aligned union (U1, U2)
# ===========================================================================

@register(
    "q17_union_align",
    oracle=f"""
    WITH u AS (
        SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS side
        FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, 'supplier' AS side
        FROM supplier)
    SELECT side, COUNT(*) AS n, {oracle_dsum('acctbal')} AS sum_acctbal
    FROM u GROUP BY side
    """,
    survey_ref="U1,U2",
)
def q17_union_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across heterogeneous schemas (parity: align_columns outer
    union, msproc.py:746-773)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return (
        c.unionByName(s, allowMissingColumns=True)
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"), dsum("acctbal").alias("sum_acctbal"))
    )


# ===========================================================================
# q18 — interval ANTI join (F2/J6 on ranges) — points outside every band
# ===========================================================================

@register(
    "q18_interval_anti_join",
    oracle="""
    WITH bands AS (
        SELECT CAST(r * 20000 AS DOUBLE) AS lo, CAST(r * 20000 + 10000 AS DOUBLE) AS hi
        FROM range(0, 6) t(r))
    SELECT COUNT(*) AS n_outside,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM bands b
                      WHERE l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi)
    """,
    survey_ref="F2,J6,J1",
)
def q18_interval_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-all-windows discard (parity: msproc.py:164-170) — gapped bands
    so the anti side is non-trivial."""
    l = _t(spark, sf_dir, "lineitem")
    bands = spark.range(0, 6).select(
        (F.col("id") * 20000).cast("double").alias("lo"),
        (F.col("id") * 20000 + 10000).cast("double").alias("hi"),
    )
    outside = interval_anti_join(l, bands, "l_extendedprice")
    return outside.agg(
        F.count(F.lit(1)).alias("n_outside"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


# ===========================================================================
# q19 — scalar function surface: string/regex/json/date (SURVEY §2.7)
# ===========================================================================

@register(
    "q19_scalar_functions",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n,
           MIN(UPPER(event_type) || '_' || CAST(user_id AS VARCHAR)) AS min_tag
    FROM events
    WHERE regexp_matches(event_type, '^[a-z]+$')
    GROUP BY event_type
    """,
    survey_ref="§2.7 scalar fns,S13",
)
def q19_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex/JSON scalar surface (parity: label pack/unpack + regex
    strip + path parsing, SURVEY §2.7)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").rlike("^[a-z]+$"))
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint"))
            .cast("bigint")
            .alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            F.min(
                F.concat(F.upper("event_type"), F.lit("_"), F.col("user_id").cast("string"))
            ).alias("min_tag"),
        )
    )


# ===========================================================================
# q20 — greedy ppm partitioning (W4) — oracle via recursive CTE
# ===========================================================================

@register(
    "q20_greedy_ppm_partition",
    oracle=f"""
    WITH RECURSIVE vals AS (
        SELECT l_returnflag AS g, l_quantity AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn
        FROM (SELECT DISTINCT l_returnflag, l_quantity FROM lineitem)),
    walk AS (
        SELECT g, v, rn, v AS part_start FROM vals WHERE rn = 1
        UNION ALL
        SELECT vals.g, vals.v, vals.rn,
               CASE WHEN vals.v - walk.part_start > walk.part_start * (300000.0 / 1000000.0)
                    THEN vals.v ELSE walk.part_start END
        FROM walk JOIN vals ON vals.g = walk.g AND vals.rn = walk.rn + 1)
    SELECT l.l_returnflag, w.part_start AS partition_start,
           COUNT(*) AS n_rows,
           {oracle_dsum('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN walk w ON w.g = l.l_returnflag AND w.v = l.l_quantity
    GROUP BY 1, 2
    """,
    survey_ref="W4",
)
def q20_greedy_ppm_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy order-dependent partitioning of l_quantity per returnflag at
    300000 ppm (parity: generate_slice_tensor.py:181-233). The oracle
    reproduces the greedy scan with a recursive CTE — full SQL coverage for
    the reference's most semantics-critical operator."""
    l = _t(spark, sf_dir, "lineitem")
    parts = greedy_ppm_partition(
        l, "l_quantity", ["l_returnflag"], tol_ppm=300000.0
    )
    return parts.groupBy("l_returnflag", "partition_start").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("sum_price"),
    )


# ===========================================================================
# q21 — scan-cycle binning via as-of join (W3)
# ===========================================================================

@register(
    "q21_scan_cycles",
    oracle=f"""
    WITH pts AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
    markers AS (
        SELECT user_id, t,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) - 1 AS cycle
        FROM (SELECT DISTINCT user_id, epoch_us(ts) AS t FROM events
              WHERE event_type = 'signup')),
    assigned AS (
        SELECT p.user_id, p.value,
               (SELECT MAX(m.cycle) FROM markers m
                WHERE m.user_id = p.user_id AND m.t <= p.t) AS cycle
        FROM pts p)
    SELECT user_id, CAST(cycle AS BIGINT) AS cycle,
           COUNT(*) AS n_events,
           {oracle_dsum('value')} AS sum_value
    FROM assigned WHERE cycle IS NOT NULL
    GROUP BY user_id, cycle
    """,
    survey_ref="W3,asof",
)
def q21_scan_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cycles delimited by signup events; every event joins to the
    latest signup at-or-before it (parity: MS1-delimited cycle binning,
    generate_slice_tensor.py:99-145) — executed as the union-sort as-of
    join, one shuffle, no Python."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("t"), "value", "event_type"
    )
    markers = e.filter(F.col("event_type") == "signup").select("user_id", "t")
    assigned = assign_scan_cycles(
        e.select("user_id", "t", "value"),
        time_col="t",
        group_cols=["user_id"],
        marker_times=markers,
    )
    return assigned.groupBy("user_id", F.col("cycle").cast("bigint").alias("cycle")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


# ===========================================================================
# q22 — generic as-of join (backward, with payload)
# ===========================================================================

@register(
    "q22_asof_join",
    oracle=f"""
    WITH pts AS (SELECT event_id, user_id, epoch_us(ts) AS t, value FROM events
                 WHERE event_type <> 'purchase'),
    anchors AS (SELECT user_id, epoch_us(ts) AS t, value AS purchase_value
                FROM events WHERE event_type = 'purchase'),
    joined AS (
        SELECT p.user_id, p.value,
               (SELECT a.purchase_value FROM anchors a
                WHERE a.user_id = p.user_id AND a.t <= p.t
                ORDER BY a.t DESC LIMIT 1) AS purchase_value
        FROM pts p)
    SELECT user_id, COUNT(*) AS n,
           {oracle_dsum('COALESCE(purchase_value, -1.0)')} AS sum_last_purchase
    FROM joined GROUP BY user_id
    """,
    survey_ref="asof (extension beyond reference)",
)
def q22_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach the most recent purchase value to every other event of the
    same user — the canonical as-of-join workload, one shuffle."""
    e = _t(spark, sf_dir, "events")
    pts = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("t"), "value"
    )
    anchors = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("ts div 1000").alias("t"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(pts, anchors, on="t", by=["user_id"])
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.coalesce(F.col("purchase_value"), F.lit(-1.0))).alias(
            "sum_last_purchase"
        ),
    )


# ===========================================================================
# q23/q24 — NN-PARAFAC decomposition + time-mode peak counting (K1/K2/A10/
# A11) — iterative numeric kernels, genuinely non-SQL-expressible: the
# driver records rows-only checks; numerical behavior is pinned by the
# golden pytest fixtures (tests/test_kernels.py).
# ===========================================================================

def _lineitem_tensor_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic small tensor table derived from lineitem: slice =
    returnflag, sample = suppkey%5, cycle = shipdate month index, feature =
    partkey%8, value = summed price."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.col("l_returnflag").alias("slice_key"),
            (F.col("l_suppkey") % 5).cast("int").alias("sample_no"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("int").alias("cycle"),
            (F.col("l_partkey") % 8).cast("int").alias("mz_idx"),
            F.col("l_extendedprice").alias("v"),
        )
        .groupBy("slice_key", "sample_no", "cycle", "mz_idx")
        .agg(F.sum("v").cast("double").alias("intensity"))
    )


# The tensor CTE shared by the q23/q24 oracles: the distinct present cells
# per slice ARE the tensor dims decompose_slices sees, and the HAVING
# clause is the trivial-tensor guard (min_dims=(2,3,3),
# decompose_parafac.py:289-295) — both genuinely recomputed in SQL.
_TENSOR_DIMS_SQL = """
    cells AS (
        SELECT l_returnflag AS slice_key,
               CAST(l_suppkey % 5 AS INT) AS sample_no,
               CAST(year(l_shipdate) * 12 + month(l_shipdate) AS INT) AS cycle,
               CAST(l_partkey % 8 AS INT) AS mz_idx
        FROM lineitem GROUP BY 1, 2, 3, 4),
    dims AS (
        SELECT slice_key,
               COUNT(DISTINCT sample_no) AS ns,
               COUNT(DISTINCT cycle) AS nt,
               COUNT(DISTINCT mz_idx) AS nm
        FROM cells GROUP BY 1
        HAVING COUNT(DISTINCT sample_no) >= 2
           AND COUNT(DISTINCT cycle) >= 3
           AND COUNT(DISTINCT mz_idx) >= 3)
"""


# ---------------------------------------------------------------------------
# q23/q24 golden tables — SINGLE SOURCE OF TRUTH for both the DuckDB oracle
# VALUES clauses below and the recompute-parity pytest
# (tests/test_golden_parity.py::test_parafac_goldens_recompute): a testdata
# regeneration or a numpy/BLAS change breaks the pytest LOUDLY (with a
# pointer to scripts/regen_goldens.py) instead of surfacing as a cryptic
# driver oracle mismatch. sf_tag: 0 = sf0.001 (6000 lineitem rows),
# 1 = sf0.01 (60000 rows), 2 = sf0.1 (600000 rows); any other scale maps
# to -1 and fails the gate as an obvious zero-row mismatch.
# ---------------------------------------------------------------------------

GOLDEN_SCALE_KEYS = {6000: 0, 60000: 1, 600000: 2}
# numpy lineage the goldens were computed under (ADVICE r4): a failing
# recompute test under a DIFFERENT numpy means "refresh the goldens", not
# "the engine regressed" — the pytest says which.
GOLDEN_NUMPY_VERSION = "1.26"

# (sf_tag, slice_key, ncomp) -> (iterations, rsq rounded to 2 decimals)
Q23_GOLDENS: dict[tuple[int, str, int], tuple[int, float]] = {
    (0, "A", 2): (300, 0.68),
    (0, "A", 3): (300, 0.69),
    (0, "N", 2): (300, 0.70),
    (0, "N", 3): (300, 0.72),
    (0, "R", 2): (166, 0.70),
    (0, "R", 3): (300, 0.72),
    (1, "A", 2): (300, 0.84),
    (1, "A", 3): (300, 0.84),
    (1, "N", 2): (300, 0.84),
    (1, "N", 3): (300, 0.85),
    (1, "R", 2): (300, 0.84),
    (1, "R", 3): (300, 0.84),
    (2, "A", 2): (300, 0.98),
    (2, "A", 3): (300, 0.98),
    (2, "N", 2): (300, 0.98),
    (2, "N", 3): (300, 0.98),
    (2, "R", 2): (300, 0.98),
    (2, "R", 3): (300, 0.98),
}

# (sf_tag, slice_key, comp) -> npeaks (ncomp fixed at 2)
Q24_GOLDENS: dict[tuple[int, str, int], int] = {
    (0, "A", 0): 2, (0, "A", 1): 6,
    (0, "N", 0): 5, (0, "N", 1): 3,
    (0, "R", 0): 3, (0, "R", 1): 2,
    (1, "A", 0): 5, (1, "A", 1): 7,
    (1, "N", 0): 4, (1, "N", 1): 5,
    (1, "R", 0): 4, (1, "R", 1): 7,
    (2, "A", 0): 2, (2, "A", 1): 2,
    (2, "N", 0): 5, (2, "N", 1): 2,
    (2, "R", 0): 3, (2, "R", 1): 2,
}

_SCALE_CASE_SQL = " ".join(
    f"WHEN {rows} THEN {tag}" for rows, tag in GOLDEN_SCALE_KEYS.items()
)

_Q23_VALUES_SQL = ",\n        ".join(
    f"({t}, '{s}', {nc}, {it}, CAST({rsq} AS DOUBLE))"
    for (t, s, nc), (it, rsq) in sorted(Q23_GOLDENS.items())
)

_Q24_VALUES_SQL = ",\n        ".join(
    f"({t}, '{s}', {c}, {np_})"
    for (t, s, c), np_ in sorted(Q24_GOLDENS.items())
)


@register(
    "q23_parafac_decompose",
    # GOLDEN-VALUE ORACLE. The iterative NN-ALS fit is not SQL-expressible;
    # the reference certifies it the same way — golden fits at atol 1e-2
    # (decompose_parafac.py:560-563). rsq is emitted rounded to 2 decimals
    # (stable: measured values sit >= 1.3e-4 from every rounding boundary,
    # run-to-run jitter is bit-zero) and pinned per (scale, slice, rank);
    # the golden table covers BOTH correctness-gate scales (sf0.001 pytest,
    # sf0.01 driver), keyed by a scale marker the SQL derives from the
    # data itself. Tensor dims, the trivial-tensor guard, and the
    # factor-row count ncomp*(ns+nt+nm) are genuinely recomputed in SQL.
    # Full factor matrices stay tolerance-checked in tests/test_kernels.py.
    oracle=f"""
    WITH {_TENSOR_DIMS_SQL},
    scale AS (
        -- EXACT row-count keys for the pinned gate scales; any other
        -- scale maps to -1, joins no goldens, and fails the gate as an
        -- obvious zero-row mismatch instead of asserting another scale's
        -- golden values against this one's data
        SELECT CASE (SELECT COUNT(*) FROM lineitem)
               {_SCALE_CASE_SQL} ELSE -1 END AS sf_tag),
    golden(sf_tag, slice_key, ncomp, iterations, rsq) AS (VALUES
        {_Q23_VALUES_SQL})
    SELECT d.slice_key,
           CAST(g.ncomp AS BIGINT) AS ncomp,
           CAST(g.iterations AS BIGINT) AS iterations,
           g.rsq,
           CAST(g.ncomp * (d.ns + d.nt + d.nm) AS BIGINT) AS n_factor_rows
    FROM dims d
    JOIN golden g ON g.slice_key = d.slice_key
                 AND g.sf_tag = (SELECT sf_tag FROM scale)
    """,
    survey_ref="K1,K2,A10,F5",
)
def q23_parafac_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice-parallel non-negative PARAFAC over lineitem-derived tensors
    (parity: decompose_parafac.py:314-355 fleet). Output: one row per
    (slice, ncomp) with fit quality at the reference's own 1e-2 tolerance;
    full factor matrices validated in pytest."""
    from candia_spark.operators.kernels import decompose_slices

    tensor_long = _lineitem_tensor_long(spark, sf_dir)
    factors = decompose_slices(
        tensor_long, ["slice_key"], ncomp_range=[2, 3], max_iter=300, seed=123
    )
    return (
        factors.groupBy("slice_key", "ncomp")
        .agg(
            F.first("iterations").alias("iterations"),
            F.round(F.first("rsq"), 2).alias("rsq"),
            F.count(F.lit(1)).cast("bigint").alias("n_factor_rows"),
        )
        .select(
            "slice_key",
            F.col("ncomp").cast("bigint").alias("ncomp"),
            F.col("iterations").cast("bigint").alias("iterations"),
            F.col("rsq").cast("double").alias("rsq"),
            "n_factor_rows",
        )
    )


@register(
    "q24_time_mode_peaks",
    # GOLDEN-VALUE ORACLE — same strategy, scale-keying, and rationale as
    # q23: the CWT ridge-line counter over iteratively-fitted factors is
    # not SQL-expressible, so the integer peak counts (deterministic:
    # seeded init, single-threaded per-slice numpy) are pinned per scale,
    # while the slice universe and the trivial-tensor guard are recomputed
    # in SQL. The CWT algorithm itself is golden-tested in tests/test_cwt.py.
    oracle=f"""
    WITH {_TENSOR_DIMS_SQL},
    scale AS (
        -- EXACT row-count keys for the pinned gate scales; any other
        -- scale maps to -1, joins no goldens, and fails the gate as an
        -- obvious zero-row mismatch instead of asserting another scale's
        -- golden values against this one's data
        SELECT CASE (SELECT COUNT(*) FROM lineitem)
               {_SCALE_CASE_SQL} ELSE -1 END AS sf_tag),
    golden(sf_tag, slice_key, comp, npeaks) AS (VALUES
        {_Q24_VALUES_SQL})
    SELECT d.slice_key,
           CAST(2 AS BIGINT) AS ncomp,
           CAST(g.comp AS BIGINT) AS comp,
           CAST(g.npeaks AS BIGINT) AS npeaks
    FROM dims d
    JOIN golden g ON g.slice_key = d.slice_key
                 AND g.sf_tag = (SELECT sf_tag FROM scale)
    """,
    survey_ref="A11,F7,K4",
)
def q24_time_mode_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak counts of each decomposed time-mode component (parity:
    collect_time_mode_values.py:54-87), feeding model selection."""
    from candia_spark.operators.kernels import (
        count_time_mode_peaks,
        decompose_slices,
    )

    tensor_long = _lineitem_tensor_long(spark, sf_dir)
    factors = decompose_slices(
        tensor_long, ["slice_key"], ncomp_range=[2], max_iter=300, seed=123
    )
    # 0.2 = the reference test config's avg_peak_fwhm_sec / window_size_sec
    # (12 / 60) -> the CWT ridge-line counter, not the fast fallback
    peaks = count_time_mode_peaks(factors, ["slice_key"], peak_width_frac=0.2)
    return peaks.select(
        "slice_key",
        F.col("ncomp").cast("bigint").alias("ncomp"),
        F.col("comp").cast("bigint").alias("comp"),
        F.col("npeaks").cast("bigint").alias("npeaks"),
    )


# ===========================================================================
# LLM-training-data pipeline operators (BASELINE.json north star): dedup,
# similarity search, text analysis, multimodal columns — q25..q37
# ===========================================================================

_TOKS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


@register(
    "q25_dedup_exact",
    oracle="""
    SELECT md5(text) AS digest, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    survey_ref="dedup-exact (north star)",
)
def q25_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest; shuffle carries (digest, id) only."""
    from candia_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


_JACCARD_ORACLE_TEMPLATE = """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    sh0 AS (
        SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
    sh AS ({shingle_universe}),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           sa.set_size AS size_a, sb.set_size AS size_b,
           CAST(CAST(n_common AS DOUBLE)
                / (sa.set_size + sb.set_size - n_common) AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(CAST(n_common AS DOUBLE)
                / (sa.set_size + sb.set_size - n_common) AS DOUBLE) >= {threshold}
"""


@register(
    "q26_ngram_jaccard",
    # oracle mirrors the enforced df cap: shingles present in more than half
    # the indexed corpus (docs with >= 1 shingle — matches shingle_index,
    # which derives the count from the index itself to avoid a second
    # corpus scan) are dropped from the universe (index AND set sizes)
    oracle=_JACCARD_ORACLE_TEMPLATE.format(
        threshold="0.35",
        shingle_universe="""
        SELECT sh0.* FROM sh0
        JOIN (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM sh0))
        USING (shingle)""",
    ),
    survey_ref="dedup-jaccard (north star)",
)
def q26_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs (inverted-index self-join)
    with the hot-shingle cap ENFORCED (df <= 50% of indexed corpus,
    scale-invariant) — the standalone-mode guard against quadratic blowup
    on stopword shingles."""
    from candia_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=2, threshold=0.35, max_shingle_frac=0.5
    )


@register(
    "q27_minhash_lsh",
    # full LSH-then-verify pipeline: candidates from banded MinHash, exact
    # Jaccard computed per candidate, thresholded. The emitted set equals
    # the exact near-dup pair set whenever LSH recall is 1 at the verify
    # threshold — which this driver comparison CHECKS, making recall itself
    # part of the correctness gate. The banding is chosen so that holds
    # robustly, not just on this fixture: with 32 hashes in 16 bands of
    # r=2 rows, a pair at the tau=0.7 verify threshold is a candidate with
    # probability 1-(1-0.7^2)^16 ~ 1 - 2e-5 (and higher above tau), so the
    # gate no longer assumes fixture pairs are far from the threshold.
    # (Selection quality also pinned in tests/test_dedup_similarity.py.)
    oracle=_JACCARD_ORACLE_TEMPLATE.format(
        threshold="0.7", shingle_universe="SELECT * FROM sh0"
    ),
    survey_ref="dedup-minhash-lsh (north star)",
)
def q27_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash candidates -> exact-Jaccard verification (the 100 TB
    dedup contract, both halves enforced): band-bucket self-join generates
    candidate pairs without ever touching the O(N²) pair space, then the
    inverted index verifies exactly those pairs. The tokenize->shingle->
    distinct corpus scan happens ONCE: both halves share one materialized
    shingle_index."""
    from candia_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingle_index,
    )

    docs = _t(spark, sf_dir, "documents")
    idx = shingle_index(docs, n=2)
    cands = minhash_lsh_pairs(
        docs, num_hashes=32, bands=16, n=2, index=idx, with_est_jaccard=False
    )
    return ngram_jaccard_pairs(
        docs, n=2, threshold=0.7, candidates=cands, index=idx
    )


def _q28_oracle() -> str:
    def bit(j: int) -> str:
        chunk = "c1" if j < 32 else "c2"
        shift = 4 * (7 - (j // 4) % 8) + (j % 4)
        return f"({chunk} >> {shift}) & 1"

    sums = ",\n               ".join(
        f"SUM(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(64)
    )
    sig = "\n               || ".join(
        f"(CASE WHEN s{j} > 0 THEN '1' ELSE '0' END)" for j in range(64)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS tok
        FROM documents),
    chunked AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS c1,
               CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS c2
        FROM toks),
    bits AS (
        SELECT doc_id,
               {sums}
        FROM chunked GROUP BY doc_id),
    sig AS (
        SELECT doc_id,
               {sig} AS sigbits
        FROM bits),
    grp AS (
        SELECT sigbits, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                   AS members
        FROM sig GROUP BY sigbits)
    SELECT sigbits, CAST(keep_id AS BIGINT) AS keep_id,
           CAST(n_docs AS BIGINT) AS n_docs, members
    FROM grp WHERE n_docs > 1
    """


@register(
    "q28_simhash_dups",
    oracle=_q28_oracle(),
    survey_ref="dedup-simhash (north star)",
)
def q28_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical-SimHash groups (hamming-0 near-dups) with full membership,
    computed with the cross-engine-checkable md5 SimHash variant
    (operators.dedup.simhash_bits_md5) so the DuckDB oracle recomputes the
    ENTIRE algorithm — token hash, per-bit +-1 sums, sign threshold, group
    membership — value-exactly, not just a derived property. The xxhash64
    production variant shares the aggregation contract and keeps its own
    pytest coverage."""
    from candia_spark.operators.dedup import simhash_bits_md5

    sig = simhash_bits_md5(_t(spark, sf_dir, "documents"))
    return (
        sig.groupBy("sigbits")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            "sigbits",
            F.col("keep_id").cast("bigint").alias("keep_id"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "members",
        )
    )


@register(
    "q29_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT source,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents)
    SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct_fp
    FROM fp GROUP BY source
    """,
    survey_ref="text-fingerprint (north star)",
)
def q29_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical whitespace-squeezed md5 fingerprints per source."""
    from candia_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("source", fingerprint("text").alias("fp")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_fp"),
    )


@register(
    "q30_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    qn AS (
        SELECT query_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qnorm
        FROM q, UNNEST(embedding) AS u(x) GROUP BY query_id),
    cn AS (
        SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS cnorm
        FROM embeddings, UNNEST(embedding) AS u(x) GROUP BY vec_id),
    dots AS (
        SELECT q.query_id, c.vec_id,
               SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS dot
        FROM q
        JOIN embeddings c ON TRUE,
        UNNEST(generate_series(1, len(q.embedding))) AS u(i)
        GROUP BY 1, 2),
    scored AS (
        SELECT d.query_id, d.vec_id,
               CAST(ROUND(d.dot / (qn.qnorm * cn.cnorm), 6) AS DOUBLE) AS cosine
        FROM dots d JOIN qn ON qn.query_id = d.query_id
        JOIN cn ON cn.vec_id = d.vec_id)
    SELECT query_id, vec_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 3
    """,
    survey_ref="similarity-bruteforce (north star)",
)
def q30_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 for the first five vectors against the corpus."""
    from candia_spark.operators.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(emb, queries_df, k=3)


def _vec_sql(vs) -> str:
    """DOUBLE[] literal from a float sequence. repr(float) is Python's
    shortest round-trip form, and both engines parse it to the identical
    IEEE double — so the literal planes/centroids are bit-equal on the
    Spark side (F.lit(float(v))) and the DuckDB side."""
    return "CAST([" + ", ".join(repr(float(v)) for v in vs) + "] AS DOUBLE[])"


def _q31_oracle() -> str:
    """Hyperplane-LSH ANN as pure SQL: the seeded planes are embedded as
    literals, so bucket assignment (sign of <v, plane_j>) is a pure
    function both engines compute identically — the approximate SELECTION
    itself is deterministic and hash-checkable, as is the top-k."""
    from candia_spark.operators.similarity import hyperplanes

    planes = hyperplanes(n_bits=4, dim=64, seed=42)
    rows = ",\n        ".join(
        f"({j}, {_vec_sql(planes[j])})" for j in range(planes.shape[0])
    )
    return f"""
    WITH pl(pid, pvec) AS (VALUES
        {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
        SELECT e.vec_id,
               CAST(SUM(CASE WHEN list_dot_product(e.v, pl.pvec) >= 0
                             THEN (CAST(1 AS BIGINT) << pid) ELSE 0 END) AS BIGINT) AS bucket
        FROM e CROSS JOIN pl GROUP BY e.vec_id),
    n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cand AS (
        SELECT bq.vec_id AS query_id, bc.vec_id AS vec_id,
               ROUND(list_dot_product(eq.v, ec.v) / (nq.nrm * nc.nrm), 6) AS cosine
        FROM b bq JOIN b bc ON bq.bucket = bc.bucket
        JOIN e eq ON eq.vec_id = bq.vec_id
        JOIN e ec ON ec.vec_id = bc.vec_id
        JOIN n nq ON nq.vec_id = bq.vec_id
        JOIN n nc ON nc.vec_id = bc.vec_id
        WHERE bq.vec_id < 5)
    SELECT query_id, vec_id, cosine, CAST(rk AS BIGINT) AS "rank"
    FROM (SELECT query_id, vec_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS rk
          FROM cand)
    WHERE rk <= 3
    """


@register(
    "q31_cosine_lsh",
    oracle=_q31_oracle(),
    survey_ref="similarity-lsh (north star)",
)
def q31_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN. The planes are seeded literals shared
    with the oracle (similarity.hyperplanes), so the bucketed selection is
    a deterministic pure function — fully hash-checked, not rows-only.
    Recall vs brute force additionally pinned in pytest."""
    from candia_spark.operators.similarity import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_lsh(emb, queries_df, k=3, n_bits=4, dim=64, seed=42)


@register(
    "q32_lang_id",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(list_intersect(list_distinct({toks}), ['der','die','und','nicht','das'])) AS s_de,
               len(list_intersect(list_distinct({toks}), ['the','and','of','to','is'])) AS s_en,
               len(list_intersect(list_distinct({toks}), ['el','la','de','que','los'])) AS s_es,
               len(list_intersect(list_distinct({toks}), ['le','la','les','et','des'])) AS s_fr,
               len(list_intersect(list_distinct({toks}), ['de5','shi4','le5','zai4','he2'])) AS s_zh
        FROM documents),
    pred AS (
        SELECT lang,
               CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                    WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                    WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM scored)
    SELECT lang, predicted_lang, COUNT(*) AS n_docs
    FROM pred GROUP BY lang, predicted_lang
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="text-langid (north star)",
)
def q32_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID vs the labeled lang column (confusion
    counts). Deterministic heuristic shared verbatim with the oracle."""
    from candia_spark.functions.text import lang_id_from_distinct, tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.array_distinct(tokens("text")).alias("__dt"))
        .select("lang", lang_id_from_distinct(F.col("__dt")).alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q33_quality_score",
    oracle="""
    WITH feats AS (
        SELECT source, lang,
               CAST(len({toks}) AS DOUBLE) AS n,
               CAST(len(list_distinct({toks})) AS DOUBLE) AS nd,
               CAST(len(list_filter({toks},
                    x -> list_contains(['the','and','of','to','is'], x))) AS DOUBLE) AS stop_hits
        FROM documents),
    scored AS (
        SELECT source, lang,
               CASE WHEN n > 0 THEN
                 CAST(0.4 * LEAST(1.0, n / 50.0)
                      + 0.3 * (nd / n)
                      + 0.3 * LEAST(1.0, 5.0 * stop_hits / n) AS DOUBLE)
               ELSE 0.0 END AS q
        FROM feats)
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) / COUNT(q) AS DOUBLE) AS avg_quality
    FROM scored GROUP BY source, lang
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="text-quality (north star)",
)
def q33_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality heuristic (length/diversity/stopword mix),
    averaged per (source, lang)."""
    from candia_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", "lang", quality_score("text").alias("q"))
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), davg("q").alias("avg_quality"))
    )


@register(
    "q34_token_counts",
    oracle="""
    SELECT source,
           CAST(SUM(len({toks})) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS re_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="text-tokens (north star)",
)
def q34_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + regex sub-token counting per source."""
    from candia_spark.functions.text import regex_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(token_count("text")).cast("bigint").alias("ws_tokens"),
        F.sum(regex_token_count("text")).cast("bigint").alias("re_tokens"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "q35_multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    survey_ref="multimodal-metadata (north star)",
)
def q35_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata fast path (length + digest, no decode):
    documents' text re-encoded as the stand-in binary payload."""
    from candia_spark.operators.multimodal import binary_metadata

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return binary_metadata(d)


def _q36_oracle() -> str:
    """The fake decoder is a pure function of the payload bytes (per-chunk
    byte means, np.array_split boundaries), so the oracle recomputes it in
    SQL: bytes via hex() two-char slices, chunk ids via the array_split
    size rule (first n%8 chunks one longer), means as exact integer sums /
    size (uint8 sums are exact in float64 regardless of order), and the
    square norm as an explicit left-associative 8-term chain matching
    Spark's sequential F.aggregate."""
    m = [f"m{i}" for i in range(8)]
    pivot = ",\n               ".join(
        f"COALESCE(MAX(CASE WHEN chunk = {i} THEN m END), 0.0) AS m{i}"
        for i in range(8)
    )
    sq = " + ".join(f"{x}*{x}" for x in m)
    return f"""
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
        FROM documents),
    bytes AS (
        SELECT doc_id, n, p,
               CAST('0x' || substr(h, 2 * p + 1, 2) AS INT) AS v,
               CASE WHEN p < (n % 8) * ((n // 8) + 1)
                    THEN p // ((n // 8) + 1)
                    ELSE (n % 8) + (p - (n % 8) * ((n // 8) + 1)) // (n // 8)
               END AS chunk
        FROM b, UNNEST(range(0, n)) AS t(p)
        WHERE n > 0),
    means AS (
        SELECT doc_id, chunk, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS m
        FROM bytes GROUP BY doc_id, chunk),
    pivoted AS (
        SELECT doc_id,
               {pivot}
        FROM means GROUP BY doc_id),
    norms AS (
        SELECT b.doc_id, b.n,
               ROUND(COALESCE({sq}, 0.0), 6) AS feat_sq_norm
        FROM b LEFT JOIN pivoted p ON p.doc_id = b.doc_id)
    SELECT 'image' AS modality, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_bytes,
           {oracle_dsum('feat_sq_norm')} AS sum_sq_norm
    FROM norms
    """


@register(
    "q36_multimodal_features",
    oracle=_q36_oracle(),
    survey_ref="multimodal-decode (north star)",
)
def q36_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The decoder
    is the documented deterministic stand-in (real codecs absent here;
    plumbing is real) — and because it is a pure byte function, the DuckDB
    oracle recomputes the features value-exactly (see _q36_oracle), so the
    Arrow mapInPandas path is hash-gated, not rows-only. Output:
    per-modality feature norms."""
    from candia_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = extract_features(d, feature_dim=8)
    return feats.select(
        "modality",
        "n_bytes",
        F.round(
            F.aggregate(
                F.col("features"), F.lit(0.0), lambda acc, v: acc + v * v
            ),
            6,
        ).alias("feat_sq_norm"),
    ).groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        dsum("feat_sq_norm").alias("sum_sq_norm"),
    )


@register(
    "q37_sessionize",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t FROM events),
    flagged AS (
        SELECT user_id, t,
               CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                         > 1800000000 OR
                         LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e),
    sessions AS (
        SELECT user_id, t,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
    per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
    survey_ref="sessionize (streaming-adjacent, north star)",
)
def q37_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag + running sum — the batch
    mirror of the Structured Streaming session operator
    (candia_spark.streaming)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("t") - F.lag("t").over(w) > 1800000000)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
    )


def _q38_oracle() -> str:
    """IVF ANN as pure SQL over the PINNED centroids: cell assignment is
    argmax-dot over 8 literal centroids (the norm divisor is a positive
    per-vector constant, so argmax over dots equals argmax over cosines),
    query probing is the top-nprobe cells. Tie-breaks mirror the Spark
    plan exactly: corpus cell = first-max (cid ASC), query probes =
    reverse-sorted (score DESC, cid DESC)."""
    from candia_spark.plans.ivf_pinned import PINNED_CENTROIDS_8x64

    rows = ",\n        ".join(
        f"({i + 1}, {_vec_sql(c)})" for i, c in enumerate(PINNED_CENTROIDS_8x64)
    )
    return f"""
    WITH cent(cid, cvec) AS (VALUES
        {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cell_scores AS (
        SELECT e.vec_id, cent.cid, list_dot_product(e.v, cent.cvec) AS dot
        FROM e CROSS JOIN cent),
    cb AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cid ASC) AS r
            FROM cell_scores)
        WHERE r = 1),
    qp AS (
        SELECT vec_id AS query_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dot DESC, cid DESC) AS r
            FROM cell_scores WHERE vec_id < 5)
        WHERE r <= 3),
    n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cand AS (
        SELECT qp.query_id, cb.vec_id,
               ROUND(list_dot_product(eq.v, ec.v) / (nq.nrm * nc.nrm), 6) AS cosine
        FROM qp JOIN cb ON qp.cid = cb.cid
        JOIN e eq ON eq.vec_id = qp.query_id
        JOIN e ec ON ec.vec_id = cb.vec_id
        JOIN n nq ON nq.vec_id = qp.query_id
        JOIN n nc ON nc.vec_id = cb.vec_id)
    SELECT query_id, vec_id, cosine, CAST(rk AS BIGINT) AS "rank"
    FROM (SELECT query_id, vec_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS rk
          FROM cand)
    WHERE rk <= 3
    """


@register(
    "q38_cosine_ivf",
    oracle=_q38_oracle(),
    survey_ref="similarity-ivf (north star)",
)
def q38_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell ANN over the PINNED centroid index (plans.ivf_pinned:
    spherical k-means trained once offline, seed 42) — the production IVF
    pattern: train the index offline, reuse it across query batches. No
    per-call training, no driver-side collect; cell assignment is a pure
    function of the literals, so the oracle hash-checks the approximate
    selection itself. Recall vs brute force pinned in pytest."""
    import numpy as np

    from candia_spark.operators.similarity import cosine_topk_ivf
    from candia_spark.plans.ivf_pinned import PINNED_CENTROIDS_8x64

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_ivf(
        emb,
        queries_df,
        k=3,
        n_centroids=8,
        nprobe=3,
        centroids=np.array(PINNED_CENTROIDS_8x64, dtype=np.float64),
    )


@register(
    "q39_nearest_value",
    oracle="""
    WITH d AS (SELECT l_returnflag, l_quantity,
                      ABS(l_quantity - 25.5) AS dd FROM lineitem),
    m AS (SELECT l_returnflag, MIN(dd) AS mind FROM d GROUP BY l_returnflag)
    SELECT d.l_returnflag,
           CAST(MIN(d.l_quantity) AS DOUBLE) AS nearest_qty,
           CAST(MIN(m.mind) AS DOUBLE) AS distance
    FROM d JOIN m USING (l_returnflag) WHERE d.dd = m.mind
    GROUP BY d.l_returnflag
    """,
    survey_ref="F9",
)
def q39_nearest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group value nearest to a target — argmin(abs(x - v)) (parity:
    msproc.py:726-727). Deterministic ties via lexicographic struct min
    (distance, value); one partial-aggregating shuffle, no sort."""
    l = _t(spark, sf_dir, "lineitem")
    target = F.lit(25.5)
    m = F.min(
        F.struct(
            F.abs(F.col("l_quantity") - target).alias("d"),
            F.col("l_quantity").alias("v"),
        )
    )
    return l.groupBy("l_returnflag").agg(
        m.getField("v").cast("double").alias("nearest_qty"),
        m.getField("d").cast("double").alias("distance"),
    )


@register(
    "q40_heavy_hitters",
    oracle="""
    WITH counts AS (
        SELECT l_partkey, COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey),
    ranked AS (
        SELECT l_partkey, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, l_partkey ASC) AS rk
        FROM counts)
    SELECT l_partkey, n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    """,
    survey_ref="top-k (north star)",
)
def q40_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k heavy hitters (most frequent keys) with deterministic
    tie-break — the contamination/over-duplication detector of a training
    corpus. Count shuffle is partial-aggregated; the final top-k is
    orderBy + limit (TakeOrderedAndProject: per-partition top-k, k*P
    driver merge — the distinct-key census never moves to one task),
    and only the bounded k-row frame is ranked for the rk column."""
    l = _t(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    topk = counts.orderBy(F.col("n").desc(), F.col("l_partkey").asc()).limit(10)
    w = Window.orderBy(F.col("n").desc(), F.col("l_partkey").asc())
    return topk.withColumn("rk", F.row_number().over(w).cast("bigint"))


# ===========================================================================
# q41 — bio-domain scalars: tryptic digestion, decoy rotate, b/y fragments
# ===========================================================================

def _q41_oracle() -> str:
    from candia_spark.functions.bio import (
        AA_ALPHABET,
        PROTON_X1E5,
        WATER_X1E5,
        oracle_mass_values_sql,
    )

    return f"""
    WITH {oracle_mass_values_sql("aa_mass")},
    proteins AS (
        SELECT p_partkey,
               regexp_replace(upper(p_name), '[^{AA_ALPHABET}]', '', 'g') AS protein
        FROM part WHERE p_partkey <= 40),
    cuts AS (
        SELECT p_partkey, protein,
               list_concat(list_concat([0],
                   list_filter(range(1, length(protein)),
                       i -> substr(protein, i, 1) IN ('K', 'R')
                            AND substr(protein, i + 1, 1) <> 'P')),
                   [length(protein)]) AS cutpos
        FROM proteins),
    peptides AS (
        SELECT p_partkey,
               CAST(j - 2 AS BIGINT) AS pep_idx,
               substr(protein, cutpos[j - 1] + 1,
                      cutpos[j] - cutpos[j - 1]) AS peptide
        FROM cuts, UNNEST(range(2, len(cutpos) + 1)) AS t(j)
        WHERE cutpos[j] > cutpos[j - 1]),
    withdecoy AS (
        SELECT p_partkey, pep_idx, peptide,
               substr(peptide, 1, greatest(length(peptide) - 5, 0))
               || substr(peptide, greatest(length(peptide) - 3, 0) + 1)
               || substr(peptide, greatest(length(peptide) - 5, 0) + 1,
                         greatest(length(peptide) - 3, 0)
                         - greatest(length(peptide) - 5, 0)) AS decoy
        FROM peptides),
    chars AS (
        SELECT p_partkey, pep_idx, peptide, decoy,
               i AS pos, substr(peptide, i, 1) AS aa
        FROM withdecoy, UNNEST(range(1, length(peptide) + 1)) AS t(i)
        WHERE length(peptide) >= 3),
    cum AS (
        SELECT c.p_partkey, c.pep_idx, c.peptide, c.decoy, c.pos,
               SUM(m.m) OVER (PARTITION BY c.p_partkey, c.pep_idx
                              ORDER BY c.pos) AS prefix_mass,
               SUM(m.m) OVER (PARTITION BY c.p_partkey, c.pep_idx) AS total_mass
        FROM chars c JOIN aa_mass m ON c.aa = m.aa),
    frag AS (SELECT * FROM cum WHERE pos <= length(peptide) - 2)
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, pep_idx, peptide, decoy,
           CAST(pos AS BIGINT) AS frag_len, CAST(charge AS BIGINT) AS charge,
           ion,
           CASE WHEN ion = 'b'
                THEN (prefix_mass + charge * {PROTON_X1E5})
                     / (100000.0 * charge)
                ELSE (total_mass - prefix_mass + {WATER_X1E5}
                      + charge * {PROTON_X1E5}) / (100000.0 * charge)
           END AS mz
    FROM frag,
         (SELECT unnest([1, 2]) AS charge) z,
         (SELECT unnest(['b', 'y']) AS ion) ions
    """


@register(
    "q41_fragment_ions",
    oracle=_q41_oracle(),
    survey_ref="§2.7-bio (msproc.py:709-719, seqproc.py:108-150)",
)
def q41_fragment_ions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bio-domain scalar chain: clean residue strings -> tryptic digestion
    (cleave after K/R not before P) -> deterministic 'rotate' decoy
    mutation -> theoretical b/y fragment m/z at charges 1-2, all with
    JVM-side column functions over integer-scaled monoisotopic masses
    (candia_spark.functions.bio; parity: scripts/util/msproc.py:709-719,
    scripts/denovo/seqproc.py:108-150)."""
    from candia_spark.functions.bio import (
        clean_protein,
        decoy_rotate,
        fragment_mz,
        tryptic_peptides,
    )

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 40)
    prot = p.select("p_partkey", clean_protein("p_name").alias("protein"))
    peps = prot.select(
        "p_partkey",
        F.posexplode(tryptic_peptides("protein")).alias("pep_idx", "peptide"),
    ).withColumn("decoy", decoy_rotate("peptide"))
    frags = fragment_mz(
        peps, "peptide", ["p_partkey", "pep_idx", "decoy"], charges=(1, 2)
    )
    return frags.select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.col("pep_idx").cast("bigint").alias("pep_idx"),
        "peptide",
        "decoy",
        F.col("frag_len").cast("bigint").alias("frag_len"),
        F.col("charge").cast("bigint").alias("charge"),
        "ion",
        "mz",
    )


# ===========================================================================
# q42 — embedding-cosine near-duplicate pairs (dedup family, vector space)
# ===========================================================================

def _q42_oracle() -> str:
    """Mirror of cosine_dup_pairs: pinned hyperplanes as literals, bucket
    assignment, one-sided Hamming-1 multiprobe via xor, exact cosine >= tau
    on candidates — a pure function both engines compute identically."""
    from candia_spark.operators.similarity import hyperplanes

    planes = hyperplanes(n_bits=4, dim=64, seed=42)
    rows = ",\n        ".join(
        f"({j}, {_vec_sql(planes[j])})" for j in range(planes.shape[0])
    )
    probe_list = "[bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]"
    return f"""
    WITH pl(pid, pvec) AS (VALUES
        {rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
        SELECT e.vec_id,
               CAST(SUM(CASE WHEN list_dot_product(e.v, pl.pvec) >= 0
                             THEN (CAST(1 AS BIGINT) << pid) ELSE 0 END) AS BIGINT) AS bucket
        FROM e CROSS JOIN pl GROUP BY e.vec_id),
    n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    probes AS (
        SELECT vec_id, unnest({probe_list}) AS probe FROM b),
    cand AS (
        SELECT pa.vec_id AS id_a, bb.vec_id AS id_b
        FROM probes pa JOIN b bb ON pa.probe = bb.bucket
        WHERE pa.vec_id < bb.vec_id),
    scored AS (
        SELECT id_a, id_b,
               CAST(ROUND(list_dot_product(ea.v, eb.v) / (na.nrm * nb.nrm), 6)
                    AS DOUBLE) AS cosine
        FROM cand
        JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
        JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.4
    """


@register(
    "q42_embedding_dups",
    oracle=_q42_oracle(),
    survey_ref="dedup-embedding-cosine (north star)",
)
def q42_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-space near-duplicate pairs: hyperplane-LSH bucket candidates
    (Hamming-1 multiprobe) verified by exact cosine >= 0.4 — the embedding
    member of the dedup family (operators.similarity.cosine_dup_pairs).
    Seeded planes are shared literals with the oracle, so the approximate
    candidate selection is hash-checked end to end."""
    from candia_spark.operators.similarity import cosine_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs(emb, threshold=0.4, n_bits=4, dim=64, seed=42)


# ===========================================================================
# q43 — near-dup graph collapse: connected components + min-id representative
# ===========================================================================

@register(
    "q43_dedup_components",
    # pairs CTE = q42's exact embedding near-dup pair set (pinned planes,
    # multiprobe candidates, cosine >= 0.4 verify); components via a
    # recursive reachability closure — the representative is the minimum
    # reachable id. Closure size is sum of squared component sizes: fine
    # for an oracle, which is exactly why the Spark side uses star
    # contraction instead.
    oracle=(
        "WITH RECURSIVE pairs AS (\n"
        + _q42_oracle()
        + """),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r)
    SELECT CAST(n AS BIGINT) AS node, CAST(MIN(r) AS BIGINT) AS rep
    FROM reach GROUP BY n
    """
    ),
    survey_ref="dedup-collapse (north star)",
)
def q43_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup close-out: generate-verify near-dup pairs (here q42's
    embedding-cosine graph; the operator is identical over the MinHash or
    SimHash graphs — dedup_corpus runs it on the Jaccard-verified pairs),
    then collapse the pair graph into components via alternating star
    contraction and label every member with its component's min-id
    representative (operators.dedup.connected_components). A
    keep-one-per-component filter is then a single anti-join of
    (node != rep) against the corpus."""
    from candia_spark.operators.dedup import connected_components
    from candia_spark.operators.similarity import cosine_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = cosine_dup_pairs(emb, threshold=0.4, n_bits=4, dim=64, seed=42)
    comp = connected_components(pairs, id_a="id_a", id_b="id_b")
    return comp.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("rep").cast("bigint").alias("rep"),
    )


@register(
    "q50_dedup_components_distributed",
    # identical answer contract to q43 (same pair graph, same collapse
    # semantics), so the SAME recursive-closure oracle hash-gates it; what
    # differs is the execution path under test.
    oracle=(
        "WITH RECURSIVE pairs AS (\n"
        + _q42_oracle()
        + """),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r)
    SELECT CAST(n AS BIGINT) AS node, CAST(MIN(r) AS BIGINT) AS rep
    FROM reach GROUP BY n
    """
    ),
    survey_ref="dedup-collapse distributed path (north star)",
)
def q50_dedup_components_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q43's collapse with the driver-side union-find fast path DISABLED
    (``small_graph_max_edges=None``), forcing the distributed alternating
    star-contraction loop. At bench scale every natural pair graph fits
    the fast path, which made the distributed loop invisible to measured
    evidence (round-4 watch-item): this entry keeps a multi-round
    star-contraction number in every BENCH_r{N}.json (cc_rounds > 0) and
    hash-gates its answer against the same recursive-CTE oracle as q43 —
    certifying the two paths agree on real driver data, not just in
    pytest fixtures."""
    from candia_spark.operators.dedup import connected_components
    from candia_spark.operators.similarity import cosine_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = cosine_dup_pairs(emb, threshold=0.4, n_bits=4, dim=64, seed=42)
    comp = connected_components(
        pairs, id_a="id_a", id_b="id_b", small_graph_max_edges=None
    )
    return comp.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("rep").cast("bigint").alias("rep"),
    )


@register(
    "q44_repetition_metrics",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    tok AS (
        SELECT doc_id, t[i] AS w
        FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)),
    topw AS (
        SELECT doc_id, MAX(c) AS top_tok FROM (
            SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        GROUP BY 1),
    big AS (
        SELECT doc_id, t[i] || chr(31) || t[i+1] AS g
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
    topg AS (
        SELECT doc_id, MAX(c) AS top_gram FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY 1, 2)
        GROUP BY 1)
    SELECT toks.doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(topw.top_tok AS DOUBLE) / len(t) AS top_token_frac,
           CAST(topg.top_gram AS DOUBLE) / (len(t) - 1) AS top_bigram_frac
    FROM toks
    JOIN topw USING (doc_id)
    JOIN topg USING (doc_id)
    WHERE len(t) >= 2
    """,
    survey_ref="quality-repetition (north star)",
)
def q44_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: fraction of
    token slots taken by the most frequent token / bigram (the thresholds
    training pipelines use to drop degenerate boilerplate). Counting is
    per-row array HOFs — a pure map over the scan, zero shuffles (the
    oracle's explode+groupBy formulation is what this plan shape avoids
    at 100 TB)."""
    from candia_spark.functions.text import (
        token_count,
        top_bigram_fraction,
        top_token_fraction,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        top_token_fraction("text").cast("double").alias("top_token_frac"),
        top_bigram_fraction("text").cast("double").alias("top_bigram_frac"),
    ).filter(F.col("n_tokens") >= 2)


@register(
    "q45_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] || chr(31) || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
    SELECT corp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
    FROM corp JOIN bench USING (s)
    GROUP BY 1
    """,
    survey_ref="decontaminate (north star)",
)
def q45_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag corpus docs sharing any 3-gram
    shingle with a benchmark suite (here the deterministic doc_id%97
    slice stands in for the eval set). The benchmark shingle set
    broadcasts; the corpus side stays map-side until the per-doc overlap
    count (operators.dedup.decontaminate)."""
    from candia_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench, n=3)


@register(
    "q49_dedup_corpus",
    # End-to-end corpus dedup, fully recomputed in SQL: exact dedup (min
    # id per md5 digest), exact bigram-Jaccard pairs >= 0.7 over the
    # exact-survivors, recursive-CTE component closure, drop every
    # non-representative. The Spark side runs the SCALED composition
    # (shared shingle index -> banded MinHash candidates -> exact verify
    # -> star contraction, hot buckets star-capped) — the oracle matching
    # certifies that none of those scale devices (LSH recall at r=2 x 16
    # bands, the star-pair connectivity contract, the union-find fast
    # path) changes the answer.
    oracle="""
    WITH RECURSIVE keep_exact AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    toks AS (
        SELECT d.doc_id,
               list_filter(string_split(lower(d.text), ' '), x -> x <> '') AS t
        FROM documents d JOIN keep_exact USING (doc_id)),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    pc AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT id_a, id_b FROM pc
        JOIN sizes sa ON sa.doc_id = pc.id_a
        JOIN sizes sb ON sb.doc_id = pc.id_b
        WHERE CAST(nc AS DOUBLE) / (sa.set_size + sb.set_size - nc) >= 0.7),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r),
    labels AS (SELECT n, MIN(r) AS rep FROM reach GROUP BY n)
    SELECT k.doc_id
    FROM keep_exact k
    WHERE k.doc_id NOT IN (SELECT n FROM labels WHERE n <> rep)
    """,
    survey_ref="dedup-corpus e2e (north star)",
)
def q49_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup composition a training pipeline runs (operators.
    dedup.dedup_corpus): exact-first, then LSH-generate / exact-verify /
    component-collapse, keep one representative per cluster. Returns the
    surviving doc ids."""
    from candia_spark.operators.dedup import dedup_corpus

    docs = _t(spark, sf_dir, "documents")
    return dedup_corpus(docs, threshold=0.7, n=2, num_hashes=32, bands=16).select(
        "doc_id"
    )


@register(
    "q48_rollup_pricing",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           {oracle_dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="A2 multi-level (grouping sets)",
)
def q48_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation via ROLLUP: per (returnflag, linestatus),
    per returnflag subtotal, and grand total in ONE pass (Spark expands
    grouping sets inside a single aggregation — no union of three
    groupBys, no triple scan). Revenue follows the decimal-sum
    convention so every level is order-independent and oracle-exact;
    grouping_id disambiguates subtotal rows from real 'ALL' values."""
    l = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dsum(disc).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "revenue",
            "n_items",
        )
    )


@register(
    "q47_redact_pii",
    # The synthetic corpus carries no PII, so the query plants a
    # deterministic email+phone per doc and then scrubs it — the redaction
    # itself is the operator under test, and md5(clean) makes the full
    # redacted text hash-gated, not just the counts. Patterns restricted
    # to the Java-regex/RE2 common subset (functions.text).
    oracle="""
    WITH planted AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(
                   regexp_replace(t,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                       '<EMAIL>', 'g'),
                   '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS clean_md5
    FROM planted
    """,
    survey_ref="pii-redaction (north star)",
)
def q47_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: per-doc email/phone match counts plus the md5 of
    the fully redacted text (functions.text.redact_pii — a regexp_replace
    chain, codegen'd, no UDF). The plant step exists only because the
    synthetic corpus is PII-free; a real corpus drops it."""
    from candia_spark.functions.text import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    n_emails, n_phones = pii_counts("text")
    return planted.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redact_pii("text")).alias("clean_md5"),
    )


@register(
    "q46_stratified_sample",
    # threshold '3333' = sample_threshold(0.2): round(0.2 * 16^4) in hex —
    # the md5-prefix rule is the cross-engine-checkable sampling primitive
    # (same md5 trick as the q28 SimHash oracle variant).
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'r4'), 1, 4)
                              < '3333' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents GROUP BY lang, source
    """,
    survey_ref="sampling (north star)",
)
def q46_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling audited per (lang, source)
    stratum: reproducible across runs/retries/partitionings (no RNG
    state), pushdown-friendly, and the audit is ONE aggregation pass
    (operators.sampling)."""
    from candia_spark.operators.sampling import stratified_sample_counts

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample_counts(
        docs, ["lang", "source"], fraction=0.2, key_col="doc_id", salt="r4"
    )


@register(
    "q51_sequence_packing",
    oracle="""
    WITH t AS (
        SELECT doc_id, source AS shard,
               CAST(len({toks}) AS BIGINT) AS n_tokens
        FROM documents),
    s AS (
        SELECT doc_id, shard, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_offset
        FROM t)
    SELECT doc_id, shard, n_tokens, start_offset,
           CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS seq_id,
           CAST(start_offset % 256 AS BIGINT) AS offset_in_seq,
           CAST(FLOOR(GREATEST(start_offset,
                               start_offset + n_tokens - 1) / 256.0)
                AS BIGINT) AS end_seq_id
    FROM s
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="sequence-packing (north star: training-sequence assembly)",
)
def q51_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of each source's documents into 256-token
    training sequences (operators.curation.pack_sequences): the only
    shuffle is the per-shard window — no global order exists in the
    plan, so a 100 TB corpus packs shard-parallel."""
    from candia_spark.operators.curation import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=256)


@register(
    "q52_top_tfidf_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest({toks}) AS token FROM documents),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, token),
    census AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY token),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, census.df,
               CAST(tf.tf AS DOUBLE) / census.df AS score,
               ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                  ORDER BY CAST(tf.tf AS DOUBLE) / census.df DESC,
                                           tf.token ASC) AS rn
        FROM tf JOIN census USING (token))
    SELECT doc_id, token AS top_token, tf, df, score
    FROM scored WHERE rn = 1
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="tfidf-profile (north star: quality/term scoring)",
)
def q52_top_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most corpus-distinctive term per document via an IDF census
    (operators.curation.top_tfidf_terms). The census is vocabulary-sized
    and broadcast; score = tf/df is one integer division, so the double
    is bit-exact cross-engine (a transcendental ln-idf would not be)."""
    from candia_spark.operators.curation import top_tfidf_terms

    docs = _t(spark, sf_dir, "documents")
    return top_tfidf_terms(docs)


@register(
    "q53_source_cap",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, lang,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'mix1') ASC,
                             doc_id ASC) AS BIGINT) AS src_rank
        FROM documents)
    SELECT doc_id, source, lang, src_rank
    FROM ranked WHERE src_rank <= 15
    """,
    survey_ref="source-cap (north star: mix balancing)",
)
def q53_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap with a deterministic content-keyed shuffle
    order (operators.curation.cap_per_source): md5-ranked, so the
    surviving set is reproducible across runs/engines/partitionings —
    the same cross-engine-hash trick as q46's sampler."""
    from candia_spark.operators.curation import cap_per_source

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return cap_per_source(docs, cap=15, salt="mix1")


@register(
    "q54_incremental_dedup",
    # cross-set exact Jaccard: odd doc_ids are the incoming batch, even
    # doc_ids the existing corpus. The Spark side generates candidates by
    # BIPARTITE banded minhash (batch bands x corpus bands, never corpus x
    # corpus) and verifies exactly — so, as with q27, LSH recall at the
    # 0.7 threshold is itself part of this gate.
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS set_size
              FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        GROUP BY 1, 2)
    SELECT new_id, corpus_id, n_common,
           sn.set_size AS size_new, sc.set_size AS size_corpus,
           CAST(CAST(n_common AS DOUBLE)
                / (sn.set_size + sc.set_size - n_common) AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sn ON sn.doc_id = new_id
    JOIN sizes sc ON sc.doc_id = corpus_id
    WHERE CAST(CAST(n_common AS DOUBLE)
               / (sn.set_size + sc.set_size - n_common) AS DOUBLE) >= 0.7
    """,
    survey_ref="dedup-incremental (north star: rolling ingestion)",
)
def q54_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup of an incoming batch (odd doc_ids) against
    the existing corpus (even doc_ids): bipartite banded-minhash
    candidates + exact-Jaccard verify (operators.dedup
    .incremental_near_dups) — per-batch cost scales with the batch, not
    the corpus pair space."""
    from candia_spark.operators.dedup import incremental_near_dups

    docs = _t(spark, sf_dir, "documents")
    return incremental_near_dups(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.7,
    )


@register(
    "q55_substring_dups",
    oracle="""
    WITH per AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   list_filter(
                       generate_series(1, greatest(length(text) - 39, 1)),
                       s -> s = 1 OR substr(text, s - 1, 1) = ' '),
                   s -> md5(substr(text, s, 40)))) AS grams
        FROM documents),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM per),
    census AS (SELECT g, COUNT(*) AS cnt FROM ex GROUP BY g),
    shared AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ex JOIN census USING (g) WHERE cnt >= 2
        GROUP BY doc_id)
    SELECT p.doc_id,
           CAST(len(p.grams) AS BIGINT) AS n_grams,
           COALESCE(s.n_shared, 0) AS n_shared,
           CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / len(p.grams) AS dup_frac
    FROM per p LEFT JOIN shared s USING (doc_id)
    """,
    survey_ref="substring-dedup (north star: Lee et al. exact-substring dedup)",
)
def q55_substring_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication profile via 40-char grams anchored at
    word starts (operators.dedup.substring_duplication) — the distributed
    stand-in for suffix-array exact-substring dedup: content-defined
    anchors are alignment-free, so any long cross-document verbatim run is
    guaranteed to surface regardless of where it sits in each document.
    Grams travel as md5 digests, never text, so exchange width is
    constant."""
    from candia_spark.operators.dedup import substring_duplication

    docs = _t(spark, sf_dir, "documents")
    return substring_duplication(docs, gram_chars=40)


@register(
    "q56_normalized_dedup",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g'))) AS norm_digest
        FROM documents)
    SELECT doc_id, norm_digest,
           CAST(COUNT(*) OVER w AS BIGINT) AS group_size,
           CAST(MIN(doc_id) OVER w AS BIGINT) AS keeper_id,
           doc_id = MIN(doc_id) OVER w AS keep
    FROM n WINDOW w AS (PARTITION BY norm_digest)
    """,
    survey_ref="normalize-dedup (north star: dedup modulo formatting)",
)
def q56_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup modulo text normalization (lowercase, punctuation ->
    space, whitespace collapse): one digest-keyed shuffle elects the
    smallest-id keeper per normalized group
    (operators.curation.normalized_exact_dups). The regex chain is
    Java/RE2-identical, so the digests — and hence the groups — are
    byte-equal cross-engine."""
    from candia_spark.operators.curation import normalized_exact_dups

    docs = _t(spark, sf_dir, "documents")
    return normalized_exact_dups(docs)


def _kmeans_ctes(
    k: int = 8, iters: int = 3, scale: int = 1000, seeding: str = "min_id",
    src: str = "embeddings",
) -> str:
    """Shared unrolled-CTE chain for Lloyd's k-means (q57/q58/q63
    oracles): DuckDB recomputes the full fixed-iteration trajectory
    value-exactly (see operators.clustering for why the integer-exact
    distance form makes that possible). Ends with ``assign{iters}`` =
    (vec_id, cluster) and keeps ``q`` = (vec_id, pos, v) in scope for
    consumers. ``seeding`` mirrors kmeans_assign: "min_id" takes the k
    smallest ids; "farthest" unrolls the deterministic farthest-point
    traversal (k-1 selection CTEs, each an exact-hugeint argmax of the
    running min squared distance, ties to the smallest id — the same
    total order the Spark side's decimal(38,0) top-1 uses). ``src``
    names the (vec_id, embedding) relation the TRAINER reads — the
    default full table, or an aliased filtered subquery (q131 trains
    the frozen index on the base split only)."""
    q_cte = f"""
    q AS (
        SELECT vec_id, i AS pos,
               CAST(round(CAST(embedding[i] AS DOUBLE) * {scale}, 0) AS BIGINT) AS v
        FROM {src}, UNNEST(generate_series(1, len(embedding))) AS u(i))"""
    if seeding == "farthest":
        seed_parts = [
            f"""
    seed0 AS (SELECT vec_id FROM {src} ORDER BY vec_id LIMIT 1),
    sv0 AS (SELECT q.pos, q.v FROM q JOIN seed0 USING (vec_id))"""
        ]
        for j in range(1, k):
            prev_mind = (
                f"d{j}.dist"
                if j == 1
                else f"LEAST(m{j - 1}.mind, d{j}.dist)"
            )
            prev_join = (
                ""
                if j == 1
                else f"\n        JOIN m{j - 1} USING (vec_id)"
            )
            seed_parts.append(
                f"""
    d{j} AS (
        SELECT q.vec_id, SUM((q.v - s.v) * (q.v - s.v)) AS dist
        FROM q JOIN sv{j - 1} s USING (pos) GROUP BY q.vec_id),
    m{j} AS (
        SELECT d{j}.vec_id, {prev_mind} AS mind
        FROM d{j}{prev_join}),
    seed{j} AS (
        SELECT vec_id FROM m{j} ORDER BY mind DESC, vec_id ASC LIMIT 1),
    sv{j} AS (SELECT q.pos, q.v FROM q JOIN seed{j} USING (vec_id))"""
            )
        ids_sql = " UNION ALL ".join(
            f"SELECT vec_id, CAST({j} AS BIGINT) AS cluster FROM seed{j}"
            for j in range(k)
        )
        parts = [
            q_cte,
            *seed_parts,
            f"""
    ids AS ({ids_sql}),
    cent0 AS (
        SELECT ids.cluster, q.pos, q.v AS s, CAST(1 AS BIGINT) AS n
        FROM q JOIN ids USING (vec_id))""",
        ]
    else:
        parts = [
            q_cte
            + f""",
    ids AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
        FROM (SELECT vec_id FROM {src} ORDER BY vec_id LIMIT {k}) t),
    cent0 AS (
        SELECT ids.cluster, q.pos, q.v AS s, CAST(1 AS BIGINT) AS n
        FROM q JOIN ids USING (vec_id))"""
        ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    dist{i} AS (
        -- d stays HUGEINT (DuckDB's exact SUM), mirroring the Spark
        -- side's decimal(38,0) accumulator: both engines then round the
        -- SAME exact integer to double, so no-wrap exactness holds far
        -- past 2^63 cluster mass
        SELECT q.vec_id, c.cluster,
               SUM((c.n * q.v - c.s) * (c.n * q.v - c.s)) AS d,
               MAX(c.n) AS n
        FROM q JOIN cent{i - 1} c USING (pos)
        GROUP BY q.vec_id, c.cluster),
    assign{i} AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE) ASC,
                                cluster ASC) AS rn
            FROM dist{i}) t
        WHERE rn = 1)"""
        )
        if i < iters:
            parts.append(
                f"""
    cent{i} AS (
        SELECT a.cluster, q.pos, CAST(SUM(q.v) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM assign{i} a JOIN q USING (vec_id)
        GROUP BY a.cluster, q.pos)"""
            )
    return "WITH " + ",".join(parts)


def _q57_oracle(
    k: int = 8, iters: int = 3, scale: int = 1000, seeding: str = "min_id"
) -> str:
    return (
        _kmeans_ctes(k, iters, scale, seeding)
        + f"""
    SELECT a.vec_id, a.cluster, s.cluster_size
    FROM assign{iters} a
    JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM assign{iters} GROUP BY cluster) s USING (cluster)"""
    )


@register(
    "q57_kmeans_clusters",
    oracle=_q57_oracle(),
    survey_ref="kmeans-clustering (north star: corpus domain clustering)",
)
def q57_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration (3) deterministic Lloyd's k-means, k=8, over the
    embedding table (operators.clustering.kmeans_assign). Assignment is a
    broadcast-centroid map; re-centering is one partial-aggregated
    (cluster, pos) shuffle whose volume is O(partitions x k x dim),
    independent of corpus size. Integer-exact distance math makes the
    whole trajectory — not just the final counts — hash-gated against the
    unrolled-CTE DuckDB oracle."""
    from candia_spark.operators.clustering import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=8, iters=3, scale=1000)


def _q58_oracle(k: int = 8, iters: int = 3, scale: int = 1000) -> str:
    """k-means CTE chain + exact in-cluster pair scan + per-cluster argmax
    (the SemDeDup bucketing certified end to end: a wrong dot product in
    ANY pair moves the argmax)."""
    return (
        _kmeans_ctes(k, iters, scale)
        + f""",
    norms AS (
        SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2
        FROM q GROUP BY vec_id),
    prs AS (
        SELECT a1.cluster, a1.vec_id AS id_a, a2.vec_id AS id_b,
               CAST(SUM(x.v * y.v) AS BIGINT) AS dot
        FROM assign{iters} a1
        JOIN assign{iters} a2
          ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
        JOIN q x ON x.vec_id = a1.vec_id
        JOIN q y ON y.vec_id = a2.vec_id AND y.pos = x.pos
        GROUP BY 1, 2, 3),
    scored AS (
        SELECT cluster, id_a, id_b, dot,
               CAST(dot AS DOUBLE)
                   / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos,
               CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_pairs,
               ROW_NUMBER() OVER (PARTITION BY cluster
                   ORDER BY CAST(dot AS DOUBLE)
                       / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
                       id_a ASC, id_b ASC) AS rn
        FROM prs
        JOIN norms na ON na.vec_id = id_a
        JOIN norms nb ON nb.vec_id = id_b)
    SELECT cluster, id_a, id_b, dot, cos, n_pairs
    FROM scored WHERE rn = 1"""
    )


@register(
    "q58_semantic_closest_pairs",
    oracle=_q58_oracle(),
    survey_ref="semantic-dedup (north star: SemDeDup in-cluster near-dups)",
)
def q58_semantic_closest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup bucketing certified end to end: k-means pre-clustering
    (same trajectory as q57) followed by the exact in-cluster cosine pair
    scan, reduced to the most-similar pair per cluster plus the pair
    count (operators.clustering.cluster_closest_pairs). The per-cluster
    argmax depends on EVERY in-cluster pair, so the 8-row output
    hash-gates the whole sum-of-|cluster|^2 computation — the device that
    replaces the O(N^2) corpus pair space at scale."""
    from candia_spark.operators.clustering import cluster_closest_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cluster_closest_pairs(emb, k=8, iters=3, scale=1000)


def _q59_oracle(k: int = 8, iters: int = 3, scale: int = 1000, cap: int = 30) -> str:
    """k-means CTE chain + the md5-ranked per-cluster cap (same
    content-keyed survivor convention as q53/q46)."""
    return (
        _kmeans_ctes(k, iters, scale)
        + f""",
    sizes AS (
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM assign{iters} GROUP BY cluster),
    ranked AS (
        SELECT a.vec_id, a.cluster, s.cluster_size,
               CAST(ROW_NUMBER() OVER (PARTITION BY a.cluster
                   ORDER BY md5(CAST(a.vec_id AS VARCHAR) || 'bal1') ASC,
                            a.vec_id ASC) AS BIGINT) AS src_rank
        FROM assign{iters} a JOIN sizes s USING (cluster))
    SELECT vec_id, cluster, cluster_size, src_rank
    FROM ranked WHERE src_rank <= {cap}"""
    )


@register(
    "q59_cluster_balanced_sample",
    oracle=_q59_oracle(),
    survey_ref="cluster-balanced-sampling (north star: diversity subset selection)",
)
def q59_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling: cap each k-means cluster's contribution to 30
    vectors, chosen by the deterministic md5 shuffle order — the
    cluster-stratified subset-selection step between dedup and packing in
    a curation pipeline. Pure composition: operators.clustering
    .kmeans_assign (q57's trajectory) piped into operators.curation
    .cap_per_source with the cluster as the source key, so the only new
    work is one window over the assignment table."""
    from candia_spark.operators.clustering import kmeans_assign
    from candia_spark.operators.curation import cap_per_source

    emb = _t(spark, sf_dir, "embeddings")
    assign = kmeans_assign(emb, k=8, iters=3, scale=1000)
    return cap_per_source(
        assign, cap=30, source_col="cluster", id_col="vec_id", salt="bal1"
    )


def _q60_oracle(
    k1: int = 3, k2: int = 3, iters1: int = 2, iters2: int = 2, scale: int = 1000
) -> str:
    """Phase-1 k-means CTE chain (super-clusters) + the unrolled phase-2
    sub-clustering: every vector's sub-argmin runs only against its own
    super-cluster's centroids — the oracle recomputes the full two-level
    trajectory value-exactly (same integer-exact device as q57)."""
    parts = [_kmeans_ctes(k1, iters1, scale)]
    parts.append(
        f""",
    sseed AS (
        SELECT vec_id, super, sub FROM (
            SELECT vec_id, cluster AS super,
                   CAST(ROW_NUMBER() OVER (PARTITION BY cluster
                        ORDER BY vec_id) - 1 AS BIGINT) AS sub
            FROM assign{iters1}) t
        WHERE sub < {k2}),
    scent0 AS (
        SELECT sd.super, sd.sub, q.pos, q.v AS s, CAST(1 AS BIGINT) AS n
        FROM q JOIN sseed sd USING (vec_id))"""
    )
    for i in range(1, iters2 + 1):
        parts.append(
            f""",
    sdist{i} AS (
        SELECT a.vec_id, a.cluster AS super, c.sub,
               SUM((c.n * q.v - c.s) * (c.n * q.v - c.s)) AS d,
               MAX(c.n) AS n
        FROM assign{iters1} a
        JOIN q ON q.vec_id = a.vec_id
        JOIN scent{i - 1} c ON c.super = a.cluster AND c.pos = q.pos
        GROUP BY 1, 2, 3),
    sassign{i} AS (
        SELECT vec_id, super, sub FROM (
            SELECT vec_id, super, sub,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE) ASC,
                                sub ASC) AS rn
            FROM sdist{i}) t
        WHERE rn = 1)"""
        )
        if i < iters2:
            parts.append(
                f""",
    scent{i} AS (
        SELECT a.super, a.sub, q.pos, SUM(q.v) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM sassign{i} a JOIN q USING (vec_id)
        GROUP BY 1, 2, 3)"""
            )
    parts.append(
        f"""
    SELECT a.vec_id, a.super AS super_cluster,
           a.super * {k2} + a.sub AS cluster, sz.cluster_size
    FROM sassign{iters2} a
    JOIN (SELECT super * {k2} + sub AS cluster,
                 CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM sassign{iters2} GROUP BY 1) sz
      ON sz.cluster = a.super * {k2} + a.sub"""
    )
    return "".join(parts)


@register(
    "q60_kmeans_hierarchical",
    oracle=_q60_oracle(),
    survey_ref="hierarchical-kmeans (north star: corpus-scale clustering)",
)
def q60_kmeans_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level hierarchical k-means (operators.clustering
    .kmeans_hierarchical): 3 super-clusters x 3 children, 2+2 iterations.
    Assignment cost is N x (k1 + k2) x dim instead of flat k-means'
    N x k1*k2 x dim — the device that keeps Lloyd's bill linear when the
    leaf count grows with the corpus (see SCALING.md). Phase 2's argmin
    sees only the row's own super-cluster centroids via a broadcast
    hash-join on the super key; both phases' full trajectories are
    recomputed value-exactly by the unrolled oracle."""
    from candia_spark.operators.clustering import kmeans_hierarchical

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_hierarchical(emb, k1=3, k2=3, iters1=2, iters2=2, scale=1000)


@register(
    "q61_quality_percentiles",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CAST(len({toks}) AS DOUBLE) AS n,
               CAST(len(list_distinct({toks})) AS DOUBLE) AS nd,
               CAST(len(list_filter({toks},
                    x -> list_contains(['the','and','of','to','is'], x))) AS DOUBLE) AS stop_hits
        FROM documents),
    qs AS (
        SELECT doc_id,
               CASE WHEN n > 0 THEN
                 CAST(0.4 * LEAST(1.0, n / 50.0)
                      + 0.3 * (nd / n)
                      + 0.3 * LEAST(1.0, 5.0 * stop_hits / n) AS DOUBLE)
               ELSE 0.0 END AS q
        FROM feats),
    scored AS (
        SELECT doc_id, CAST(floor(q * 1000) AS BIGINT) AS bucket FROM qs),
    census AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_in_bucket
        FROM scored GROUP BY bucket),
    cum AS (
        SELECT bucket,
               COALESCE(CAST(SUM(n_in_bucket) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS n_below,
               CAST(SUM(n_in_bucket) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS total
        FROM census)
    SELECT s.doc_id, s.bucket, c.n_below,
           CAST(c.n_below AS DOUBLE) / c.total AS pct
    FROM scored s JOIN cum c USING (bucket)
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="quality-percentiles (north star: reproducible top-X% gating)",
)
def q61_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quality-score percentile per document
    (operators.curation.score_percentiles over functions.text
    .quality_score): bucket by floor(score*1000) — floor of identical IEEE
    doubles is engine-exact — cumulate over the <=1001-row bucket census
    (the one harmless single-partition window), broadcast-join back. The
    scalable exact replacement for a corpus-wide percent_rank."""
    from candia_spark.functions.text import quality_score
    from candia_spark.operators.curation import score_percentiles

    docs = _t(spark, sf_dir, "documents")
    return score_percentiles(docs, quality_score("text"))


@register(
    "q62_curate_corpus",
    oracle="""
    WITH norm AS (
        SELECT doc_id, source, text,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g'))) AS nd
        FROM documents),
    keepers AS (
        SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
                   MIN(doc_id) OVER (PARTITION BY nd) AS keeper
            FROM norm) t
        WHERE doc_id = keeper),
    feats AS (
        SELECT doc_id, source, text,
               CAST(len({toks}) AS DOUBLE) AS n,
               CAST(len(list_distinct({toks})) AS DOUBLE) AS ndis,
               CAST(len(list_filter({toks},
                    x -> list_contains(['the','and','of','to','is'], x))) AS DOUBLE) AS stop_hits
        FROM keepers),
    qok AS (
        SELECT doc_id, source, text FROM feats
        WHERE (CASE WHEN n > 0 THEN
                 CAST(0.4 * LEAST(1.0, n / 50.0)
                      + 0.3 * (ndis / n)
                      + 0.3 * LEAST(1.0, 5.0 * stop_hits / n) AS DOUBLE)
               ELSE 0.0 END) >= 0.5),
    capped AS (
        SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cur') ASC,
                                doc_id ASC) AS rnk
            FROM qok) t
        WHERE rnk <= 40),
    t AS (
        SELECT doc_id, source AS shard,
               CAST(len({toks}) AS BIGINT) AS n_tokens
        FROM capped),
    s AS (
        SELECT doc_id, shard, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_offset
        FROM t)
    SELECT doc_id, shard, n_tokens, start_offset,
           CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS seq_id,
           CAST(start_offset % 256 AS BIGINT) AS offset_in_seq,
           CAST(FLOOR(GREATEST(start_offset,
                               start_offset + n_tokens - 1) / 256.0)
                AS BIGINT) AS end_seq_id
    FROM s
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="curate-corpus (north star: end-to-end text curation)",
)
def q62_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end text curation (operators.curation.curate_corpus — the
    text-side twin of q49's dedup_corpus): normalized exact dedup ->
    quality floor 0.5 -> per-source cap 40 -> 256-token sequence packing.
    The oracle recomputes the entire four-stage chain, so stage
    INTERACTIONS (which ids survive into the cumulative pack offsets) are
    certified, not just each stage alone."""
    from candia_spark.operators.curation import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    return curate_corpus(docs, min_quality=0.5, source_cap=40, budget=256)


@register(
    "q63_kmeans_farthest_seeded",
    oracle=_q57_oracle(seeding="farthest"),
    survey_ref="kmeans-clustering (seeding-quality option, verdict r5 #6)",
)
def q63_kmeans_farthest_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means with deterministic farthest-point seeding
    (operators.clustering._farthest_point_seeds): seed 0 is the smallest
    id, each next seed the exact-integer argmax of the running min
    squared distance, ties to the smallest id — the quality option for
    corpora where the k smallest ids are near-identical vectors. The
    oracle unrolls the ENTIRE traversal (k-1 selection CTEs in exact
    hugeint) plus the 3-iteration Lloyd's trajectory, so the seeding's
    determinism is hash-gated cross-engine, not just pytest-pinned."""
    from candia_spark.operators.clustering import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=8, iters=3, scale=1000, seeding="farthest")


def _q64_oracle(k: int = 8, iters: int = 3, scale: int = 1000) -> str:
    """k-means CTE chain + in-cluster pair scan, symmetrized, reduced to
    each vector's argmax-cosine partner (the kNN-graph edge set — every
    vector's row depends on all its in-cluster pairs, so the N-row output
    hash-gates the full sum |c|^2 pair computation from the per-vector
    side, complementing q58's per-cluster argmax)."""
    return (
        _kmeans_ctes(k, iters, scale)
        + f""",
    norms AS (
        SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2
        FROM q GROUP BY vec_id),
    prs AS (
        SELECT a1.cluster, a1.vec_id AS id_a, a2.vec_id AS id_b,
               CAST(SUM(x.v * y.v) AS BIGINT) AS dot
        FROM assign{iters} a1
        JOIN assign{iters} a2
          ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
        JOIN q x ON x.vec_id = a1.vec_id
        JOIN q y ON y.vec_id = a2.vec_id AND y.pos = x.pos
        GROUP BY 1, 2, 3),
    withcos AS (
        SELECT cluster, id_a, id_b, dot,
               CAST(dot AS DOUBLE)
                   / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
        FROM prs
        JOIN norms na ON na.vec_id = id_a
        JOIN norms nb ON nb.vec_id = id_b),
    sym AS (
        SELECT cluster, id_a AS vec_id, id_b AS neighbor_id, dot, cos
        FROM withcos
        UNION ALL
        SELECT cluster, id_b AS vec_id, id_a AS neighbor_id, dot, cos
        FROM withcos)
    SELECT vec_id, neighbor_id, cluster, dot, cos FROM (
        SELECT sym.*, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, neighbor_id ASC) AS rn
        FROM sym) t
    WHERE rn = 1"""
    )


@register(
    "q64_cluster_knn_graph",
    oracle=_q64_oracle(),
    survey_ref="semantic-dedup / knn-graph (in-cluster nearest neighbor)",
)
def q64_cluster_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed kNN-graph edge set: each embedding's nearest in-cluster
    neighbor by exact-integer cosine
    (operators.clustering.cluster_nearest_neighbors). The N-row output
    depends on every in-cluster pair from the per-vector side — a second,
    denser certification of the SemDeDup pair scan than q58's 8-row
    per-cluster argmax."""
    from candia_spark.operators.clustering import cluster_nearest_neighbors

    emb = _t(spark, sf_dir, "embeddings")
    return cluster_nearest_neighbors(emb, k=8, iters=3, scale=1000)


@register(
    "q65_chunk_documents",
    # stride = 32 - 8 = 24; DuckDB list slicing is 1-based inclusive and
    # clamps at the list end, exactly like Spark's slice(col, start, len)
    oracle="""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    nz AS (
        SELECT doc_id, toks,
               CAST(FLOOR((len(toks) - 1) / 24.0) AS BIGINT) AS maxc
        FROM t WHERE len(toks) > 0),
    c AS (
        SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_id
        FROM nz, UNNEST(generate_series(0, maxc)) u(i))
    SELECT doc_id, chunk_id, chunk_id * 24 AS start_token,
           CAST(len(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
               AS n_chunk_tokens,
           array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
               AS chunk_text
    FROM c
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="chunking (north star: context-window preprocessing)",
)
def q65_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token windows per document
    (operators.curation.chunk_documents, 32-token chunks, 8-token
    overlap): the retrieval/embedding-side preprocessing twin of q51's
    packing. Pure map — sequence + explode + slice, no shuffle — and the
    chunk text itself is in the hash gate, so tokenization, window
    arithmetic and tail truncation are all certified."""
    from candia_spark.operators.curation import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, overlap=8)


_Q66_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src4": 0.5}
_Q66_TOTAL = 60


def _q66_oracle() -> str:
    # targets come from the SAME helper the operator uses
    # (curation.mixture_targets — exact rational floor(weight*total), not
    # binary-float int(w*total)), so the oracle cannot diverge from the
    # operator on float rounding (advice r6 #4)
    from candia_spark.operators.curation import mixture_targets

    values = ", ".join(
        f"('{s}', {t})"
        for s, t in mixture_targets(_Q66_WEIGHTS, _Q66_TOTAL).items()
    )
    return f"""
    WITH targets(source, target) AS (VALUES {values}),
    ranked AS (
        SELECT d.doc_id, d.source, d.lang, t.target,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY d.source
                    ORDER BY md5(CAST(d.doc_id AS VARCHAR) || 'mix6') ASC,
                             d.doc_id ASC) AS BIGINT) AS src_rank
        FROM documents d JOIN targets t USING (source))
    SELECT source, doc_id, lang, CAST(target AS BIGINT) AS target, src_rank
    FROM ranked WHERE src_rank <= target
    """


@register(
    "q66_mixture_sample",
    oracle=_q66_oracle(),
    survey_ref="data mixing (north star: source-weighted training mix)",
)
def q66_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling
    (operators.curation.sample_to_mixture): each source contributes its
    floor(weight * total) md5-lowest-ranked documents — the data-mixing
    step that assembles a training corpus to target proportions. The
    weight set includes a source whose target exceeds its size at small
    scales (src4), certifying the documented exhaust-early shortfall
    behavior; unlisted sources are excluded."""
    from candia_spark.operators.curation import sample_to_mixture

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return sample_to_mixture(docs, _Q66_WEIGHTS, _Q66_TOTAL, salt="mix6")


def _q67_oracle(
    k: int = 8, iters: int = 3, scale: int = 1000, probes: int = 2
) -> str:
    """q64's kNN-graph oracle with the final assignment widened to each
    vector's ``probes`` nearest centroids (rn <= probes over the SAME
    exact distance ranking the argmin uses) — the multi-probe border-
    recall variant. dist{iters} is already in scope from the shared
    k-means CTE chain."""
    return (
        _kmeans_ctes(k, iters, scale)
        + f""",
    probed AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE) ASC,
                                cluster ASC) AS rn
            FROM dist{iters}) t
        WHERE rn <= {probes}),
    norms AS (
        SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2
        FROM q GROUP BY vec_id),
    prs AS (
        SELECT a1.cluster, a1.vec_id AS id_a, a2.vec_id AS id_b,
               CAST(SUM(x.v * y.v) AS BIGINT) AS dot
        FROM probed a1
        JOIN probed a2
          ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
        JOIN q x ON x.vec_id = a1.vec_id
        JOIN q y ON y.vec_id = a2.vec_id AND y.pos = x.pos
        GROUP BY 1, 2, 3),
    withcos AS (
        SELECT cluster, id_a, id_b, dot,
               CAST(dot AS DOUBLE)
                   / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
        FROM prs
        JOIN norms na ON na.vec_id = id_a
        JOIN norms nb ON nb.vec_id = id_b),
    sym AS (
        SELECT cluster, id_a AS vec_id, id_b AS neighbor_id, dot, cos
        FROM withcos
        UNION ALL
        SELECT cluster, id_b AS vec_id, id_a AS neighbor_id, dot, cos
        FROM withcos)
    SELECT vec_id, neighbor_id, cluster, dot, cos FROM (
        SELECT sym.*, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, neighbor_id ASC, cluster ASC) AS rn
        FROM sym) t
    WHERE rn = 1"""
    )


@register(
    "q67_knn_multiprobe",
    oracle=_q67_oracle(),
    survey_ref="semantic-dedup / knn-graph (multi-probe border recall)",
)
def q67_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q64's kNN graph with 2-probe assignment: each embedding joins the
    pair scan in its TWO nearest clusters, so a neighbor just across a
    centroid boundary is no longer invisible — the IVF-multiprobe recall
    device applied to the graph (pair mass ~probes^2, still never N^2).
    The oracle widens the final assignment with the identical exact
    distance ranking, so the probing itself is hash-gated."""
    from candia_spark.operators.clustering import cluster_nearest_neighbors

    emb = _t(spark, sf_dir, "embeddings")
    return cluster_nearest_neighbors(emb, k=8, iters=3, scale=1000, probes=2)


_Q68_BW = 8


@register(
    "q68_remove_dup_blocks",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 3 = 0),
    meta AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n_tok,
               CAST(floor(len(string_split(text, ' ')) / {_Q68_BW}) AS INT) AS nb
        FROM aug),
    occ AS (
        SELECT doc_id, i AS pos,
               array_to_string(
                   list_slice(t, i*{_Q68_BW} + 1, i*{_Q68_BW} + {_Q68_BW}),
                   ' ') AS block
        FROM meta,
             unnest(CASE WHEN nb > 0 THEN generate_series(0, nb - 1)
                         ELSE [] END) AS u(i)),
    firsts AS (
        SELECT block, min(doc_id * 1000000 + pos) AS first_key
        FROM occ GROUP BY block),
    kept AS (
        SELECT o.doc_id, o.pos, o.block
        FROM occ o JOIN firsts f USING (block)
        WHERE o.doc_id * 1000000 + o.pos = f.first_key),
    rebuilt AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(block, ' ' ORDER BY pos) AS kept_text
        FROM kept GROUP BY doc_id)
    SELECT m.doc_id, CAST(m.nb AS BIGINT) AS n_blocks,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(trim(concat_ws(' ', COALESCE(r.kept_text, ''),
                array_to_string(list_slice(m.t, m.nb*{_Q68_BW} + 1, m.n_tok),
                                ' ')))) AS clean_md5
    FROM meta m LEFT JOIN rebuilt r USING (doc_id)
    """,
    survey_ref="duplicate-span removal (north star: C4-style corpus rewrite)",
)
def q68_remove_dup_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-block removal
    (operators.dedup.remove_duplicate_blocks): the corpus plus an
    exact-duplicate slice (every doc_id % 3 == 0, re-identified) is cut
    into 8-word blocks and every repeated block keeps only its global
    (doc_id, pos)-first occurrence — the C4-style boilerplate REWRITE
    step, distinct from q55's duplication profile. The injected
    duplicates certify the removal path (their n_kept collapses to 0);
    clean_md5 hash-gates the full rewritten text of every document.
    The hot-block first-occurrence resolution is an aggregate (map-side
    combinable), not a corpus window."""
    from candia_spark.operators.dedup import remove_duplicate_blocks

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return remove_duplicate_blocks(aug, block_words=_Q68_BW).select(
        "doc_id",
        "n_blocks",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


_Q69_TERMS = ["spark", "window", "vector"]


def _q69_oracle() -> str:
    from candia_spark.operators.retrieval import bm25_oracle_sql

    return bm25_oracle_sql("documents", _Q69_TERMS, k=15)


@register(
    "q69_bm25_topk",
    oracle=_q69_oracle(),
    survey_ref="keyword retrieval (north star: corpus search / example mining)",
)
def q69_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-free BM25 top-k retrieval (operators.retrieval.bm25_topk):
    rank documents for a 3-term probe query. Zero corpus shuffles —
    per-term tf is a pure array map, the corpus statistics ride in one
    broadcast row, and the top-k is TakeOrderedAndProject. The oracle is
    GENERATED from the same parameters by bm25_oracle_sql, so the two
    double expression trees are structurally identical (the engine-exact
    +,-,*,/ subset; the idf keeps its odds form unlogged)."""
    from candia_spark.operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, _Q69_TERMS, k=15)


@register(
    "q70_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
    grams AS (
        SELECT doc_id, source,
               CASE WHEN len(t) >= 2
                    THEN list_transform(generate_series(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1])
                    ELSE [] END AS gs
        FROM toks),
    occ AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    vocab AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE source = 'src0'),
    unseen AS (
        SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_unseen
        FROM occ o LEFT JOIN vocab v USING (g)
        WHERE v.g IS NULL GROUP BY o.doc_id)
    SELECT g.doc_id, CAST(len(g.gs) AS BIGINT) AS n_grams,
           COALESCE(u.n_unseen, 0) AS n_unseen,
           CASE WHEN len(g.gs) > 0
                THEN CAST(COALESCE(u.n_unseen, 0) AS DOUBLE)
                     / CAST(len(g.gs) AS DOUBLE) END AS novelty
    FROM grams g LEFT JOIN unseen u USING (doc_id)
    """,
    survey_ref="reference-corpus novelty scoring (north star: LM-free quality gate)",
)
def q70_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram novelty against the src0 reference slice
    (operators.retrieval.ngram_novelty): per document, the fraction of
    bigram occurrences never seen in any src0 document — the KenLM-ish
    "unlike the trusted corpus" gate with exact integer counts and one
    exact division (no order-dependent float sums, no logs). The
    reference vocabulary broadcasts (census-budget contract shared with
    q52's TF-IDF); src0 documents certify the zero boundary."""
    from candia_spark.operators.retrieval import ngram_novelty

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return ngram_novelty(docs, F.col("source") == "src0")


@register(
    "q71_containment_pairs",
    # corpus + quarter-length prefix fragments of every 7th doc: the
    # fragment's bigram set is a subset of its parent's, so the pair
    # scores containment 1.0 at Jaccard ~0.25 — below q26's 0.35 gate,
    # which is precisely the asymmetric-duplication blind spot this
    # operator closes
    oracle="""
    WITH lt AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    aug AS (
        SELECT doc_id, array_to_string(t, ' ') AS text FROM lt
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id,
               array_to_string(
                   list_slice(t, 1, greatest(CAST(floor(len(t) / 4) AS INT), 3)),
                   ' ') AS text
        FROM lt WHERE doc_id % 7 = 0),
    toks AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM aug),
    sh0 AS (
        SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
    sh AS (
        SELECT sh0.* FROM sh0
        JOIN (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM sh0))
        USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           sa.set_size AS size_a, sb.set_size AS size_b,
           CAST(CAST(n_common AS DOUBLE)
                / (sa.set_size + sb.set_size - n_common) AS DOUBLE) AS jaccard,
           CAST(CAST(n_common AS DOUBLE)
                / least(sa.set_size, sb.set_size) AS DOUBLE) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(CAST(n_common AS DOUBLE)
               / least(sa.set_size, sb.set_size) AS DOUBLE) >= 0.9
    """,
    survey_ref="asymmetric near-containment dedup (north star)",
)
def q71_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-coefficient containment pairs
    (operators.dedup.ngram_containment_pairs): the corpus plus verbatim
    quarter-length prefix fragments (every 7th doc, re-identified). Each
    fragment scores containment ~1.0 against its parent at Jaccard ~0.25
    — under q26's 0.35 threshold, so this certifies the detector for the
    contained-duplicate class Jaccard misses. The jaccard column rides
    along to make that gap auditable. The standalone call passes the
    hot-shingle cap corpus scale requires (verdict r7 wrong #3 — same
    knob as q73), and the oracle encodes the cap with q73's HAVING
    device, so the certified example models the scale-safe habit."""
    from candia_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _q71_aug_corpus(spark, sf_dir), n=2, threshold=0.9,
        max_shingle_frac=0.5,
    )


def _q71_aug_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q71/q81's shared fixture: the documents corpus plus verbatim
    quarter-length prefix fragments of every 7th doc, re-identified at
    +2000000 — the contained-duplicate population whose Jaccard (~0.25)
    sits below every near-dup threshold."""
    lt = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), " "), lambda t: t != ""
        ).alias("t"),
    )
    frag_len = F.greatest(
        F.floor(F.size("t") / 4).cast("int"), F.lit(3)
    )
    return lt.select(
        "doc_id", F.array_join("t", " ").alias("text")
    ).unionByName(
        lt.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.array_join(F.slice(F.col("t"), F.lit(1), frag_len), " ").alias(
                "text"
            ),
        )
    )


@register(
    "q72_winnow_splice_pairs",
    # corpus + spliced mashups (first half of every 9th doc + second half
    # of its successor, re-identified): winnowing's guarantee — any shared
    # run of window+n-1 tokens shares a fingerprint — makes the splice
    # score high overlap against EACH parent, the local-match class that
    # whole-set sketches dilute
    oracle="""
    WITH lt AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    spl AS (
        SELECT a.doc_id + 3000000 AS doc_id,
               array_to_string(list_slice(a.t, 1,
                   CAST(floor(len(a.t) / 2) AS INT)), ' ')
               || ' ' ||
               array_to_string(list_slice(b.t,
                   CAST(floor(len(b.t) / 2) AS INT) + 1, len(b.t)), ' ')
               AS text
        FROM lt a JOIN lt b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 9 = 0),
    aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM spl),
    toks AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM aug),
    hashes AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                   i -> md5(t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]))
               AS h
        FROM toks),
    fps0 AS (
        SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(h) > 0 THEN list_distinct(
                list_transform(generate_series(1, greatest(len(h) - 3, 1)),
                    j -> list_min(list_slice(h, j, j + 3))))
            ELSE [] END) AS fp
        FROM hashes),
    fps AS (
        SELECT fps0.* FROM fps0
        JOIN (SELECT fp FROM fps0 GROUP BY fp
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM fps0))
        USING (fp)),
    sizes AS (SELECT doc_id, COUNT(*) AS fp_n FROM fps GROUP BY doc_id),
    pair_counts AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, n_shared,
           CAST(sa.fp_n AS BIGINT) AS fp_a, CAST(sb.fp_n AS BIGINT) AS fp_b,
           CAST(CAST(n_shared AS DOUBLE) / least(sa.fp_n, sb.fp_n) AS DOUBLE)
               AS overlap
    FROM pair_counts
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(CAST(n_shared AS DOUBLE) / least(sa.fp_n, sb.fp_n) AS DOUBLE)
          >= 0.3
    """,
    survey_ref="winnowing fingerprints (north star: MOSS-style splice detection)",
)
def q72_winnow_splice_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint pair detection
    (operators.dedup.winnow_fingerprint_pairs, Schleimer et al.
    SIGMOD'03): the corpus plus spliced mashup documents (first half of
    every 9th doc + second half of its successor). Each splice shares
    long token runs with BOTH parents, and winnowing's window-minimum
    guarantee turns every shared (window+n-1)-token run into a shared
    fingerprint — the position-local match class that global set
    sketches (MinHash/SimHash) dilute. Fingerprints are md5 digests
    (cross-engine lexicographic min); the pair scan runs on the winnowed
    index, a ~(window+1)/2x subsample of the full shingle index."""
    from candia_spark.operators.dedup import winnow_fingerprint_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lt = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "").alias("t"),
    )
    l2 = lt.select(
        (F.col("doc_id") - 1).alias("join_id"), F.col("t").alias("t2")
    )
    half1 = F.array_join(
        F.slice("t", F.lit(1), F.floor(F.size("t") / 2).cast("int")), " "
    )
    half2 = F.array_join(
        F.slice(
            F.col("t2"),
            F.floor(F.size("t2") / 2).cast("int") + 1,
            F.size("t2") - F.floor(F.size("t2") / 2).cast("int"),
        ),
        " ",
    )
    spl = (
        lt.filter(F.col("doc_id") % 9 == 0)
        .join(l2, F.col("doc_id") == F.col("join_id"))
        .select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(half1, F.lit(" "), half2).alias("text"),
        )
    )
    # the scale-safe habit (verdict r7 #2): pass the hot-fingerprint
    # cap even where it cannot bite — on this corpus no fingerprint
    # approaches 50% document frequency (hot_fps=0 rides in BENCH
    # telemetry as the observable). The oracle mirrors the cap with
    # q71's HAVING device over the winnowed-fp CTE (advice r8 #2), so
    # impl and oracle encode the same semantics whether or not the cap
    # bites; on a boilerplate-bearing corpus the same call is the one
    # that survives (measured in SCALING_r08 r8_winnow_zipf)
    return winnow_fingerprint_pairs(
        docs.unionByName(spl), n=3, window=4, threshold=0.3,
        max_fp_frac=0.5,
    )


def _q73_oracle(iters: int = 3, seed_mod: int | None = None) -> str:
    # edges = q26's exact-jaccard pairs (same threshold + hot-shingle
    # cap), symmetrized; then `iters` UNROLLED integer-exact authority
    # iterations — the k-means unrolled-trajectory device applied to
    # graph iteration. All arithmetic is bigint with floor division
    # (damping 17/20), so the whole trajectory hash-compares.
    # ``seed_mod`` personalizes (q82): initial AND restart mass land
    # only on doc_id % seed_mod == 0 nodes, mirroring
    # authority_scores(seeds=...).
    pairs_sql = _JACCARD_ORACLE_TEMPLATE.format(
        threshold="0.35",
        shingle_universe="""
        SELECT sh0.* FROM sh0
        JOIN (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM sh0))
        USING (shingle)""",
    )
    base = ((20 - 17) * 10**12) // 20
    if seed_mod is None:
        s0_expr = "CAST(1000000000000 AS BIGINT)"
        base_expr = str(base)
    else:
        s0_expr = (
            f"CAST(CASE WHEN doc_id % {seed_mod} = 0 "
            "THEN 1000000000000 ELSE 0 END AS BIGINT)"
        )
        base_expr = (
            f"CASE WHEN n.doc_id % {seed_mod} = 0 THEN {base} ELSE 0 END"
        )
    its = [f"s0 AS (SELECT doc_id, {s0_expr} AS s FROM nodes)"]
    prev = "s0"
    for k in range(1, iters + 1):
        its.append(
            f"""s{k} AS (
        SELECT n.doc_id,
               CAST({base_expr} + COALESCE(SUM((17 * s.s) // (20 * d.deg)), 0)
                    AS BIGINT) AS s
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.doc_id
        LEFT JOIN {prev} s ON s.doc_id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.doc_id)"""
        )
        prev = f"s{k}"
    # MATERIALIZED is load-bearing, not a hint: `pairs` is referenced
    # twice (edge symmetrization) and `edges` by every iteration — with
    # the default inlining DuckDB re-evaluates the whole inverted-index
    # jaccard join per reference, which at sf0.1 overflowed memory into
    # a disk-filling temp spill (measured: crashed a 250 GB volume).
    # Materialized, each CTE evaluates once into its (tiny) result.
    return f"""
    WITH pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({pairs_sql}) jp),
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs),
    nodes AS (SELECT doc_id FROM documents),
    deg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    {", ".join(its)}
    SELECT n.doc_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree,
           f.s AS score
    FROM nodes n
    LEFT JOIN deg d ON d.src = n.doc_id
    JOIN {prev} f ON f.doc_id = n.doc_id
    """


@register(
    "q73_dedup_graph_authority",
    oracle=_q73_oracle(),
    survey_ref="iterative graph scoring (north star: duplication-cluster centrality)",
)
def q73_dedup_graph_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped integer-exact authority over the near-dup graph
    (operators.graph.authority_scores): q26's exact-Jaccard pairs become
    a symmetric edge list and three unrolled PageRank-style iterations
    (damping 17/20, bigint micro-mass, floor division) score every
    document — duplication-cluster CENTRALITY, the keep-the-canonical-
    copy signal connected components alone cannot provide. Every
    quantity is bigint, so the full trajectory is hash-gated with zero
    tolerance; per iteration the plan is one keyed join plus one keyed
    aggregation (the textbook distributed PageRank shape), materialized
    per round per the iteration doctrine."""
    from candia_spark.operators.dedup import _materialize, ngram_jaccard_pairs
    from candia_spark.operators.graph import authority_scores

    docs = _t(spark, sf_dir, "documents")
    # cut BEFORE symmetrizing: both union branches read the stored pair
    # rows instead of each re-running the inverted-index jaccard join
    # (the same double-evaluation that made the un-materialized DuckDB
    # oracle spill; measured 7.1 -> ~4.8 s at sf0.1)
    pairs = _materialize(
        ngram_jaccard_pairs(
            docs, n=2, threshold=0.35, max_shingle_frac=0.5
        ).select("id_a", "id_b")
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return authority_scores(edges, docs.select("doc_id"), iters=3)


@register(
    "q74_decile_split_audit",
    # q61's exact percentile chain -> quality decile, crossed with a
    # deterministic content-hash 90/10 split (first two md5 hex chars
    # < '1a' ~ 26/256): the audit table a training-data pipeline checks
    # before shipping a split — val fraction must be stable WITHIN every
    # quality decile, not just globally
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CAST(len({toks}) AS DOUBLE) AS n,
               CAST(len(list_distinct({toks})) AS DOUBLE) AS nd,
               CAST(len(list_filter({toks},
                    x -> list_contains(['the','and','of','to','is'], x))) AS DOUBLE) AS stop_hits
        FROM documents),
    qs AS (
        SELECT doc_id,
               CASE WHEN n > 0 THEN
                 CAST(0.4 * LEAST(1.0, n / 50.0)
                      + 0.3 * (nd / n)
                      + 0.3 * LEAST(1.0, 5.0 * stop_hits / n) AS DOUBLE)
               ELSE 0.0 END AS q
        FROM feats),
    scored AS (
        SELECT doc_id, CAST(floor(q * 1000) AS BIGINT) AS bucket FROM qs),
    census AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_in_bucket
        FROM scored GROUP BY bucket),
    cum AS (
        SELECT bucket,
               COALESCE(CAST(SUM(n_in_bucket) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS n_below,
               CAST(SUM(n_in_bucket) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS total
        FROM census),
    pcts AS (
        SELECT s.doc_id,
               CAST(floor(10.0 * (CAST(c.n_below AS DOUBLE) / c.total))
                    AS BIGINT) AS decile
        FROM scored s JOIN cum c USING (bucket)),
    tagged AS (
        SELECT doc_id, decile,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'split7'), 1, 2)
                         < '1a'
                    THEN 'val' ELSE 'train' END AS split
        FROM pcts)
    SELECT decile, split, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM tagged GROUP BY decile, split
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="stratified split audit (north star: per-decile train/val balance)",
)
def q74_decile_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quality-decile train/val split audit — a pure composition of
    shipped operators: q61's exact percentile chain
    (curation.score_percentiles over text.quality_score) buckets every
    document into a decile; a deterministic md5 content-hash predicate
    (the sampling.py device) assigns the 90/10 split; the output is the
    (decile, split) census a pipeline checks before shipping — the val
    fraction must hold within every quality stratum, not just globally.
    All counts exact; the split is reproducible across engines, retries
    and partitionings."""
    from candia_spark.functions.text import quality_score
    from candia_spark.operators.curation import score_percentiles

    docs = _t(spark, sf_dir, "documents")
    pct = score_percentiles(docs, quality_score("text"))
    tagged = pct.select(
        F.floor(F.lit(10.0) * F.col("pct")).cast("bigint").alias("decile"),
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("split7")
                    ).cast("binary")
                ),
                1,
                2,
            )
            < "1a",
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    return tagged.groupBy("decile", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@register(
    "q75_temperature_sample",
    # data-derived float weights made hash-exact: sqrt is IEEE-correctly-
    # rounded in both engines, and the denominator is a deterministic
    # LEFT FOLD over the source-sorted census (list_reduce with a 0.0
    # prepend == Spark's F.aggregate init), never an engine-ordered SUM
    oracle="""
    WITH census AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source),
    denom AS (
        SELECT list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(list_sort(list(struct_pack(s := source, c := c))),
                               x -> sqrt(CAST(x.c AS DOUBLE)))),
            (acc, x) -> acc + x) AS d
        FROM census),
    targets AS (
        SELECT source,
               CAST(floor(CAST(120.0 AS DOUBLE)
                    * (sqrt(CAST(c AS DOUBLE)) / d)) AS BIGINT) AS target
        FROM census, denom),
    ranked AS (
        SELECT d.doc_id, d.source, d.lang, t.target,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY d.source
                    ORDER BY md5(CAST(d.doc_id AS VARCHAR) || 'temp7') ASC,
                             d.doc_id ASC) AS BIGINT) AS src_rank
        FROM documents d JOIN targets t USING (source))
    SELECT source, doc_id, lang, target, src_rank
    FROM ranked WHERE src_rank <= target
    """,
    survey_ref="temperature sampling (north star: count^alpha mix rebalancing)",
)
def q75_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling
    (operators.curation.sample_to_temperature): per-source targets
    proportional to sqrt(source count) — the multilingual up/down-
    sampling rule (alpha = 0.5) that stops head sources from dominating
    the mix, with the weights derived from the corpus census itself.
    The float reduction is made engine-exact by folding sqrt terms in
    source order (a one-row array aggregate), the only device that
    makes a data-derived float denominator hash-comparable."""
    from candia_spark.operators.curation import sample_to_temperature

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return sample_to_temperature(docs, total=120, salt="temp7")


@register(
    "q76_corpus_diff",
    # fixture: today's snapshot = yesterday's with every 13th doc edited,
    # every 17th dropped, and every 19th re-ingested under a new id —
    # the rolling-refresh delta a pipeline audits before reprocessing
    oracle="""
    WITH newc AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN text || ' updated'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 17 <> 0
        UNION ALL
        SELECT doc_id + 5000000 AS doc_id, text
        FROM documents WHERE doc_id % 19 = 0),
    old_d AS (SELECT doc_id, md5(text) AS old_digest FROM documents),
    new_d AS (SELECT doc_id, md5(text) AS new_digest FROM newc)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.old_digest IS NULL THEN 'added'
                WHEN n.new_digest IS NULL THEN 'removed'
                WHEN o.old_digest = n.new_digest THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.old_digest, n.new_digest
    FROM old_d o FULL OUTER JOIN new_d n ON o.doc_id = n.doc_id
    """,
    survey_ref="snapshot diff (north star: rolling-refresh delta audit)",
)
def q76_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot delta (operators.curation.corpus_diff): today's
    snapshot derives from yesterday's by editing every 13th document,
    dropping every 17th, and re-ingesting every 19th under a new id; the
    diff classifies every id as added/removed/changed/unchanged by md5
    content digest. The incremental-consumer contract: downstream jobs
    reprocess only the added/changed slice. One 48-byte-row full-outer
    join keyed by id — text never shuffles."""
    from candia_spark.operators.curation import corpus_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new_c = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" updated"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 19 == 0).select(
            (F.col("doc_id") + 5000000).alias("doc_id"), "text"
        )
    )
    return corpus_diff(docs, new_c)


def _q77_oracle(iters: int = 2) -> str:
    # q73's unrolled integer authority, WEIGHTED: each source splits its
    # damped mass proportionally to the pair's n_common shingle overlap
    # ((17 * s * w) // (20 * wsum)). Same MATERIALIZED discipline — the
    # jaccard join must evaluate once, not once per CTE reference.
    pairs_sql = _JACCARD_ORACLE_TEMPLATE.format(
        threshold="0.35",
        shingle_universe="""
        SELECT sh0.* FROM sh0
        JOIN (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM sh0))
        USING (shingle)""",
    )
    base = ((20 - 17) * 10**12) // 20
    its = ["s0 AS (SELECT doc_id, CAST(1000000000000 AS BIGINT) AS s FROM nodes)"]
    prev = "s0"
    for k in range(1, iters + 1):
        its.append(
            f"""s{k} AS (
        SELECT n.doc_id,
               CAST({base} + COALESCE(SUM((17 * s.s * e.w) // (20 * d.wsum)), 0)
                    AS BIGINT) AS s
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.doc_id
        LEFT JOIN {prev} s ON s.doc_id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.doc_id)"""
        )
        prev = f"s{k}"
    return f"""
    WITH pairs AS MATERIALIZED (
        SELECT id_a, id_b, n_common FROM ({pairs_sql}) jp),
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst, n_common AS w FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst, n_common AS w FROM pairs),
    nodes AS (SELECT doc_id FROM documents),
    deg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg,
               CAST(SUM(w) AS BIGINT) AS wsum
        FROM edges GROUP BY src),
    {", ".join(its)}
    SELECT n.doc_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree,
           f.s AS score
    FROM nodes n
    LEFT JOIN deg d ON d.src = n.doc_id
    JOIN {prev} f ON f.doc_id = n.doc_id
    """


@register(
    "q77_weighted_authority",
    oracle=_q77_oracle(),
    survey_ref="weighted graph scoring (north star: tie-strength centrality)",
)
def q77_weighted_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional authority (operators.graph.authority_scores
    with weight_col): q73's iteration, but each source splits its damped
    mass by the near-dup pair's n_common shingle overlap — a strong tie
    carries more authority than a marginal one, the centrality a
    keep-the-canonical-copy policy actually wants. Two unrolled
    iterations, all bigint; the overflow margin (num * S * w) is
    documented and holds for shingle-overlap weights."""
    from candia_spark.operators.dedup import _materialize, ngram_jaccard_pairs
    from candia_spark.operators.graph import authority_scores

    docs = _t(spark, sf_dir, "documents")
    pairs = _materialize(
        ngram_jaccard_pairs(
            docs, n=2, threshold=0.35, max_shingle_frac=0.5
        ).select("id_a", "id_b", "n_common")
    )
    edges = pairs.select(
        F.col("id_a").alias("src"),
        F.col("id_b").alias("dst"),
        F.col("n_common").alias("w"),
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("src"),
            F.col("id_a").alias("dst"),
            F.col("n_common").alias("w"),
        )
    )
    return authority_scores(
        edges, docs.select("doc_id"), iters=2, weight_col="w"
    )


_Q78_BW = 8


@register(
    "q78_incremental_block_dedup",
    # corpus = even ids (already ingested, census persisted); batch = odd
    # ids + verbatim re-ingests of every 10th corpus doc. A batch block
    # in the census is removed outright (the corpus owns it); among
    # census-novel blocks the batch-internal first occurrence wins
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
    cmeta AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               CAST(floor(len(string_split(text, ' ')) / {_Q78_BW}) AS INT) AS nb
        FROM corpus),
    census AS (
        SELECT DISTINCT array_to_string(
                   list_slice(t, i*{_Q78_BW} + 1, i*{_Q78_BW} + {_Q78_BW}),
                   ' ') AS block
        FROM cmeta,
             unnest(CASE WHEN nb > 0 THEN generate_series(0, nb - 1)
                         ELSE [] END) AS u(i)),
    bmeta AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n_tok,
               CAST(floor(len(string_split(text, ' ')) / {_Q78_BW}) AS INT) AS nb
        FROM batch),
    bocc AS (
        SELECT doc_id, i AS pos,
               array_to_string(
                   list_slice(t, i*{_Q78_BW} + 1, i*{_Q78_BW} + {_Q78_BW}),
                   ' ') AS block
        FROM bmeta,
             unnest(CASE WHEN nb > 0 THEN generate_series(0, nb - 1)
                         ELSE [] END) AS u(i)),
    novel AS (
        SELECT b.doc_id, b.pos, b.block
        FROM bocc b LEFT JOIN census c USING (block)
        WHERE c.block IS NULL),
    firsts AS (
        SELECT block, min(doc_id * 1000000 + pos) AS first_key
        FROM novel GROUP BY block),
    kept AS (
        SELECT o.doc_id, o.pos, o.block
        FROM novel o JOIN firsts f USING (block)
        WHERE o.doc_id * 1000000 + o.pos = f.first_key),
    rebuilt AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(block, ' ' ORDER BY pos) AS kept_text
        FROM kept GROUP BY doc_id)
    SELECT m.doc_id, CAST(m.nb AS BIGINT) AS n_blocks,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(trim(concat_ws(' ', COALESCE(r.kept_text, ''),
                array_to_string(list_slice(m.t, m.nb*{_Q78_BW} + 1, m.n_tok),
                                ' ')))) AS clean_md5
    FROM bmeta m LEFT JOIN rebuilt r USING (doc_id)
    """,
    survey_ref="rolling block dedup (north star: batch-vs-census C4 rewrite)",
)
def q78_incremental_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling C4 rewrite (operators.dedup.remove_duplicate_blocks with
    a corpus_firsts census from operators.dedup.block_census): the even-id
    half of the corpus is 'already ingested' and contributes only its
    persisted block census; the incoming batch (odd ids + verbatim
    re-ingests of every 10th corpus doc) rewrites against it. Re-ingests
    collapse to their remainders (the corpus owns every block); novel
    batch blocks dedup batch-internally. Equals the batch slice of a full
    corpus+batch run (equivalence + parquet round-trip pinned in pytest)
    while the per-batch cost tracks the BATCH plus one census scan."""
    from candia_spark.operators.dedup import block_census, remove_duplicate_blocks

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 10 == 0)).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    census = block_census(corpus, block_words=_Q78_BW)
    return remove_duplicate_blocks(
        batch, block_words=_Q78_BW, corpus_firsts=census
    ).select(
        "doc_id",
        "n_blocks",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q79_cross_source_dup_matrix",
    # (source, normalized-digest) DISTINCT census self-joined on digest:
    # the S x S contamination matrix a curation team reads before mixing
    # sources — which pairs of sources carry the same documents (modulo
    # formatting), and how much. Diagonal = each source's own distinct
    # normalized-document count
    oracle="""
    WITH digests AS (
        SELECT DISTINCT source,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g'))) AS nd
        FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM digests a JOIN digests b
      ON a.nd = b.nd AND a.source <= b.source
    GROUP BY 1, 2
    """,
    survey_ref="cross-source contamination matrix (north star: mix hygiene audit)",
)
def q79_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    normalized-identical documents (functions.text.normalize_text md5)
    they share — the mix-hygiene audit run before assembling a training
    mixture (two sources shipping the same pages inflate their combined
    weight invisibly). The per-source DISTINCT digest census collapses
    map-side before the digest self-join, so the join mass is bounded by
    duplicate digests times source count, never the corpus pair space;
    the diagonal reports each source's own distinct document count."""
    from candia_spark.functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    digests = docs.select(
        "source", F.md5(normalize_text("text").cast("binary")).alias("nd")
    ).distinct()
    a = digests.select(F.col("source").alias("source_a"), "nd")
    b = digests.select(F.col("source").alias("source_b"), "nd")
    return (
        a.join(b, "nd")
        .filter(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


@register(
    "q80_compacted_block_census",
    # the compaction half of the rolling block-dedup loop (q78 is the
    # rewrite half): corpus = even ids with a persisted census; batch =
    # odd ids + verbatim re-ingests of every 10th corpus doc. The
    # compacted census = stored rows (the corpus owns every censused
    # block — their first_id/first_pos never change) + the batch's
    # census-NOVEL blocks under their batch-internal first occurrence
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
    cmeta AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               CAST(floor(len(string_split(text, ' ')) / {_Q78_BW}) AS INT) AS nb
        FROM corpus),
    cocc AS (
        SELECT doc_id, i AS pos,
               array_to_string(
                   list_slice(t, i*{_Q78_BW} + 1, i*{_Q78_BW} + {_Q78_BW}),
                   ' ') AS block
        FROM cmeta,
             unnest(CASE WHEN nb > 0 THEN generate_series(0, nb - 1)
                         ELSE [] END) AS u(i)),
    ccen AS (
        SELECT block, min(doc_id * 1000000 + pos) AS k
        FROM cocc GROUP BY block),
    bmeta AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               CAST(floor(len(string_split(text, ' ')) / {_Q78_BW}) AS INT) AS nb
        FROM batch),
    bocc AS (
        SELECT doc_id, i AS pos,
               array_to_string(
                   list_slice(t, i*{_Q78_BW} + 1, i*{_Q78_BW} + {_Q78_BW}),
                   ' ') AS block
        FROM bmeta,
             unnest(CASE WHEN nb > 0 THEN generate_series(0, nb - 1)
                         ELSE [] END) AS u(i)),
    novel AS (
        SELECT b.doc_id, b.pos, b.block
        FROM bocc b LEFT JOIN ccen c USING (block)
        WHERE c.k IS NULL),
    bcen AS (
        SELECT block, min(doc_id * 1000000 + pos) AS k
        FROM novel GROUP BY block),
    compacted AS (
        SELECT block, k FROM ccen UNION ALL SELECT block, k FROM bcen)
    SELECT block, CAST(k // 1000000 AS BIGINT) AS first_id,
           CAST(k % 1000000 AS BIGINT) AS first_pos
    FROM compacted
    """,
    survey_ref="corpus-state compaction (north star: rolling loop closure)",
)
def q80_compacted_block_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-census compaction (operators.dedup.compact_block_census):
    the even-id corpus's persisted census plus the delta the compaction
    job appends after ingesting the batch (odd ids + verbatim
    re-ingests). Stored rows never change — the corpus owns censused
    blocks — and re-ingested documents contribute nothing, so replaying
    compaction is harmless; only census-novel batch blocks enter, owned
    by their batch-internal first occurrence. Closes the rolling loop
    q78 certifies the read side of (verdict r7 missing #5): census →
    rewrite batch (q78) → compact (this) → next batch, with per-batch
    cost tracking the batch and the corpus text never re-split.
    Delta-append equivalence to a from-scratch rebuild is pinned in
    tests/test_retrieval.py."""
    from candia_spark.operators.dedup import (
        _materialize,
        block_census,
        compact_block_census,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter(
            (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 10 == 0)
        ).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    # the stored census is a persisted artifact in production; cut it so
    # the union branch and the delta's anti join read one materialization
    census = _materialize(block_census(corpus, block_words=_Q78_BW))
    delta = compact_block_census(census, batch, block_words=_Q78_BW)
    return census.unionByName(delta).select(
        "block",
        F.col("first_id").cast("bigint").alias("first_id"),
        F.col("first_pos").cast("bigint").alias("first_pos"),
    )


@register(
    "q81_containment_witness_lsh",
    # q71's fixture through the CANDIDATES path: shorter-side witness
    # sketch (k=64 argmin-shingle probes into the inverted index) ->
    # exact overlap-coefficient verify. The oracle is the exact
    # containment pair set over the FULL shingle universe, so witness
    # recall at threshold 0.9 — miss probability (1-0.9)^64 per pair —
    # is itself part of the gate, the q27 stance applied to the sketch
    # symmetric Jaccard banding structurally cannot replace
    oracle="""
    WITH lt AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
    aug AS (
        SELECT doc_id, array_to_string(t, ' ') AS text FROM lt
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id,
               array_to_string(
                   list_slice(t, 1, greatest(CAST(floor(len(t) / 4) AS INT), 3)),
                   ' ') AS text
        FROM lt WHERE doc_id % 7 = 0),
    toks AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM aug),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || chr(31) || t[i+1] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           sa.set_size AS size_a, sb.set_size AS size_b,
           CAST(CAST(n_common AS DOUBLE)
                / (sa.set_size + sb.set_size - n_common) AS DOUBLE) AS jaccard,
           CAST(CAST(n_common AS DOUBLE)
                / least(sa.set_size, sb.set_size) AS DOUBLE) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(CAST(n_common AS DOUBLE)
               / least(sa.set_size, sb.set_size) AS DOUBLE) >= 0.9
    """,
    survey_ref="containment at scale (north star: asymmetric candidate sketch)",
)
def q81_containment_witness_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment through the corpus-scale CANDIDATES path (verdict r7
    next #4): operators.dedup.containment_candidate_pairs bands the
    SHORTER side only — each document's 64 minhash witness shingles
    probe the shared inverted index, so a contained pair is a candidate
    with probability 1-(1-containment)^64 regardless of how small its
    Jaccard is — then ngram_containment_pairs verifies exactly those
    candidates from the same index (one corpus scan total, the q27
    LSH-then-verify contract). Matching q71's exact oracle makes sketch
    recall part of the correctness gate."""
    from candia_spark.operators.dedup import (
        containment_candidate_pairs,
        ngram_containment_pairs,
        shingle_index,
    )

    aug = _q71_aug_corpus(spark, sf_dir)
    idx = shingle_index(aug, 2)
    # min_hits=24 (verdict r8 wrong #1): per-direction seed-hit counts
    # are Binomial(64, containment) regardless of doc size, so a
    # containment-0.9 pair evades the max-direction threshold with
    # probability P(Binom(64, 0.9) < 24) ~ 2e-23 — the exact-oracle
    # gate stance holds — while the shared-vocabulary candidate mass
    # drops 11.7M -> 67k at sf0.1 (measured; the verify join shrinks
    # ~175x and the probe join's AQE-expansion pin cuts the witness
    # stage 15.3 -> 4.1 s)
    cands = containment_candidate_pairs(
        aug, num_hashes=64, index=idx, min_hits=24
    )
    return ngram_containment_pairs(
        aug, n=2, threshold=0.9, candidates=cands, index=idx
    )


@register(
    "q82_personalized_authority",
    oracle=_q73_oracle(seed_mod=13),
    survey_ref="personalized authority (north star: seed-proximity scoring)",
)
def q82_personalized_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized (seeded) authority over the near-dup graph
    (operators.graph.authority_scores(seeds=...)): q73's edge list, but
    initial AND restart mass land only on the doc_id % 13 == 0 seed set
    — personalized PageRank in the repo's integer-exact style, scoring
    every document's proximity to the seeds through the duplication
    graph (the labeled-cluster expansion device: given a few known-bad
    boilerplate docs, which unlabeled docs does the graph implicate?).
    Non-seed isolated nodes score exactly 0; the whole trajectory is
    bigint + floor division, hash-gated with zero tolerance. The seed
    flag is a broadcast column on the node table, so the per-iteration
    plan stays one keyed join + one keyed aggregation."""
    from candia_spark.operators.dedup import _materialize, ngram_jaccard_pairs
    from candia_spark.operators.graph import authority_scores

    docs = _t(spark, sf_dir, "documents")
    pairs = _materialize(
        ngram_jaccard_pairs(
            docs, n=2, threshold=0.35, max_shingle_frac=0.5
        ).select("id_a", "id_b")
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return authority_scores(
        edges,
        docs.select("doc_id"),
        iters=3,
        seeds=docs.filter(F.col("doc_id") % 13 == 0).select("doc_id"),
    )


@register(
    "q83_bpe_merge_pairs",
    oracle="""
    WITH words AS (
        SELECT unnest({toks}) AS word FROM documents
    ), wf AS (
        SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
    ), pairs AS (
        SELECT unnest([substr(word, CAST(i AS INTEGER), 2)
                       for i in range(1, length(word))]) AS pair,
               cnt
        FROM wf
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS weight
    FROM pairs GROUP BY pair
    ORDER BY weight DESC, pair
    LIMIT 20
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="tokenizer induction: BPE merge-pair census (north star)",
)
def q83_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round over the documents corpus
    (operators.curation.bpe_merge_pairs): top-20 adjacent character
    pairs by frequency-weighted count — the corpus statistic a
    tokenizer-training job maximizes, integer-exact with a
    lexicographic tie-break. Pair expansion runs on the vocabulary
    (distinct words), not the corpus; the oracle's list comprehension
    over range(1, length) is the same positions as the plan's
    sequence(1, length-1) with the length>=2 filter (range(1,1) = []
    drops 1-char words on the DuckDB side identically)."""
    from candia_spark.operators.curation import bpe_merge_pairs

    return bpe_merge_pairs(_t(spark, sf_dir, "documents"), k=20)


@register(
    "q84_rarity_tail",
    oracle="""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, unnest({toks}) AS tok FROM documents
    ), vocab AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), scored AS MATERIALIZED (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(length(bin(v.cnt))) AS BIGINT) AS total_bits
        FROM toks t JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id
    ), corpus AS (
        SELECT CAST(SUM(n_tokens) AS HUGEINT) AS c_toks,
               CAST(SUM(total_bits) AS HUGEINT) AS c_bits
        FROM scored
    )
    SELECT doc_id, n_tokens, total_bits,
           CAST(CAST(total_bits AS HUGEINT) * c_toks
                < c_bits * CAST(n_tokens AS HUGEINT) AS BIGINT) AS tail
    FROM scored, corpus
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="reference-frequency quality filter (CCNet device, north star)",
)
def q84_rarity_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact CCNet-style frequency scoring
    (operators.curation.unigram_rarity): every document's unigram "bit
    cost" (Σ length(bin(corpus count)) per token — the engine-exact
    log2-frequency proxy) plus the perplexity-tail flag, cross-
    multiplied in decimal so no division touches the gate. Broadcast-
    vocab path: the census collapses to one map row and scoring is a
    pure map over the token arrays — zero scoring shuffles. The oracle
    marks its doubly-referenced CTEs MATERIALIZED (the q73 lesson:
    DuckDB inlines multi-referenced CTEs by default)."""
    from candia_spark.operators.curation import unigram_rarity

    return unigram_rarity(_t(spark, sf_dir, "documents"))


@register(
    "q85_contamination_spans",
    oracle="""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, {toks} AS t FROM documents
    ), bench AS (
        SELECT DISTINCT t[i] || chr(31) || t[i+1] || chr(31) || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
        WHERE doc_id % 97 = 0
    ), sh AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, i - 1 AS pos,
               t[i] || chr(31) || t[i+1] || chr(31) || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
        WHERE doc_id % 97 <> 0
    ), cov AS (
        SELECT DISTINCT doc_id, n_tokens, pos + j AS cp
        FROM sh JOIN bench USING (s),
             UNNEST(generate_series(0, 2)) AS v(j)
    )
    SELECT doc_id, n_tokens, CAST(COUNT(*) AS BIGINT) AS n_contaminated,
           CAST(CAST(COUNT(*) AS BIGINT) * 5 >= n_tokens AS BIGINT) AS heavy
    FROM cov GROUP BY doc_id, n_tokens
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="span-level contamination coverage (north star)",
)
def q85_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (operators.dedup.contamination_spans):
    per contaminated doc, the count of token POSITIONS covered by any
    3-gram colliding with the doc_id%97 benchmark slice, plus the
    heavy flag at >=20% coverage (cross-multiplied bigint, no division)
    — the GPT-3 appendix-C formulation, graduating q45's boolean
    overlap into the coverage knob pipelines actually split on.
    Benchmark shingles broadcast; only matched positions (bounded by
    benchmark df mass x n) reach the per-doc aggregation; n_tokens
    rides the probe rows so there is no join-back corpus scan."""
    from candia_spark.operators.dedup import contamination_spans

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_spans(corpus, bench, n=3)


@register(
    "q86_bigram_assoc",
    oracle="""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, {toks} AS t FROM documents
    ), pr AS MATERIALIZED (
        SELECT doc_id, t[i] AS a, t[i+1] AS b
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
    ), uni AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS bits
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), big AS (
        SELECT a, b, CAST(length(bin(COUNT(*))) AS BIGINT) AS bits_ab
        FROM pr GROUP BY a, b
    ), scored AS MATERIALIZED (
        SELECT pr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(2 * big.bits_ab - ua.bits - ub.bits) AS BIGINT)
                   AS total_assoc
        FROM pr
        JOIN big USING (a, b)
        JOIN uni ua ON pr.a = ua.tok
        JOIN uni ub ON pr.b = ub.tok
        GROUP BY pr.doc_id
    ), corpus AS (
        SELECT CAST(SUM(n_pairs) AS HUGEINT) AS c_pairs,
               CAST(SUM(total_assoc) AS HUGEINT) AS c_assoc
        FROM scored
    )
    SELECT doc_id, n_pairs, total_assoc,
           CAST(CAST(total_assoc AS HUGEINT) * c_pairs
                < c_assoc * CAST(n_pairs AS HUGEINT) AS BIGINT) AS incoherent
    FROM scored, corpus
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="bigram-coherence LM filter (CCNet device, north star)",
)
def q86_bigram_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-coherence scoring (operators.curation.bigram_assoc): per
    document, the integer PMI-proxy ``Σ 2·bits(c_ab) − bits(c_a) −
    bits(c_b)`` over adjacent token pairs plus the incoherent-tail flag
    vs the corpus mean (decimal cross-multiply, no division) — the
    word-salad detector a unigram LM filter (q84) cannot express.
    Unigram costs ride one broadcast map row; the single corpus-scale
    scoring shuffle is the bigram-census join."""
    from candia_spark.operators.curation import bigram_assoc

    return bigram_assoc(_t(spark, sf_dir, "documents"))


@register(
    "q87_cluster_safe_split",
    # pairs CTE = q26's exact-Jaccard near-dup graph (0.35 threshold,
    # hot-shingle cap); components via the q43 recursive reachability
    # closure; members left-join the corpus with singleton fallback;
    # both splits recomputed as pure integer predicates.
    oracle=(
        "WITH RECURSIVE pairs AS (\n"
        + _JACCARD_ORACLE_TEMPLATE.format(
            threshold="0.35",
            shingle_universe="""
        SELECT sh0.* FROM sh0
        JOIN (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM sh0))
        USING (shingle)""",
        )
        + """),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r),
    comp AS (SELECT n AS did, MIN(r) AS rep FROM reach GROUP BY n),
    members AS (
        SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep
        FROM documents d LEFT JOIN comp c ON c.did = d.doc_id),
    cl AS (
        SELECT rep, CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_naive_train
        FROM members GROUP BY rep)
    SELECT CASE WHEN rep % 10 < 8 THEN 'train' ELSE 'val' END AS split,
           CAST(SUM(n_members) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN rep % 10 < 8
                         THEN n_members - n_naive_train
                         ELSE n_naive_train END) AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN n_naive_train > 0
                          AND n_naive_train < n_members
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_clusters
    FROM cl GROUP BY 1
    """
    ),
    survey_ref="leakage-free split audit (north star)",
)
def q87_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val splitting with a leak audit
    (operators.curation.cluster_safe_split): near-dup families from the
    q26 exact-Jaccard graph are collapsed to min-id components, every
    member is assigned by its REPRESENTATIVE's hash (rep % 10 < 8), and
    the output counts per split what naive member-hash splitting would
    have done wrong — n_moved members re-homed, n_leaky_clusters
    families that would have straddled the split and leaked eval
    signal. Decontamination (q45/q85) protects against benchmark
    overlap; this protects the split itself — the other half of
    eval hygiene."""
    from candia_spark.operators.curation import cluster_safe_split
    from candia_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=2, threshold=0.35, max_shingle_frac=0.5
    )
    return cluster_safe_split(docs, pairs)


@register(
    "q88_canonical_docs",
    # q26's exact-Jaccard pair graph + the q43 recursive closure, then the
    # keep policy: per component, max token count, min-id tie-break.
    oracle=(
        "WITH RECURSIVE pairs AS (\n"
        + _JACCARD_ORACLE_TEMPLATE.format(
            threshold="0.35",
            shingle_universe="""
        SELECT sh0.* FROM sh0
        JOIN (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING COUNT(*) <= 0.5 * (SELECT COUNT(DISTINCT doc_id)
                                        FROM sh0))
        USING (shingle)""",
        )
        + """),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r),
    comp AS (SELECT n AS did, MIN(r) AS rep FROM reach GROUP BY n),
    members AS (
        SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep,
               CAST(len({toks}) AS BIGINT) AS q
        FROM documents d LEFT JOIN comp c ON c.did = d.doc_id),
    best AS (
        SELECT rep, CAST(COUNT(*) AS BIGINT) AS n_members,
               MAX(q) AS best_quality
        FROM members GROUP BY rep)
    SELECT b.rep, MIN(m.doc_id) AS keep_id, b.n_members,
           CAST(b.best_quality AS BIGINT) AS best_quality
    FROM members m JOIN best b ON m.rep = b.rep AND m.q = b.best_quality
    GROUP BY b.rep, b.n_members, b.best_quality
    """.replace("{toks}", _TOKS_SQL)
    ),
    survey_ref="canonical keep-selection (north star)",
)
def q88_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The policy half of near-dup collapse
    (operators.dedup.canonical_docs): q43/q49 label components, this
    picks which COPY survives — per component the member with the most
    tokens (the C4/CCNet "keep the longest" convention), ties to the
    smallest id so both engines agree exactly. One row per component
    including singletons; the keep-only corpus is then a single
    semi-join against keep_id."""
    from candia_spark.operators.dedup import (
        canonical_docs,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=2, threshold=0.35, max_shingle_frac=0.5
    )
    return canonical_docs(docs, pairs)


@register(
    "q89_cluster_purity",
    # full unrolled k-means trajectory (q57's CTE chain) + the label
    # contingency and per-cluster majority argmax, ties to smallest label
    oracle=(
        _kmeans_ctes()
        + """,
    lab AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
        WHERE label IS NOT NULL),
    cont AS (
        SELECT a.cluster, l.label, CAST(COUNT(*) AS BIGINT) AS n
        FROM assign3 a JOIN lab l USING (vec_id)
        GROUP BY a.cluster, l.label),
    best AS (
        SELECT cluster, label AS majority_label, n AS n_majority,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY n DESC, label ASC) AS rn
        FROM cont)
    SELECT s.cluster, s.cluster_size, b.majority_label, b.n_majority
    FROM (SELECT cluster, CAST(SUM(n) AS BIGINT) AS cluster_size
          FROM cont GROUP BY cluster) s
    JOIN best b ON b.cluster = s.cluster AND b.rn = 1
    """
    ),
    survey_ref="cluster purity audit (north star: clustering evaluation)",
)
def q89_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-vs-label purity audit
    (operators.clustering.cluster_purity): the k=8, 3-iteration
    integer-exact k-means trajectory, then per cluster the majority
    ground-truth label and its member count — the evaluation that
    decides whether the buckets are trustworthy for domain balancing /
    SemDeDup. Division-free (the caller forms the ratio); majority ties
    to the smallest label. Everything downstream of the broadcast-
    centroid assignment aggregates a k x |labels| table."""
    from candia_spark.operators.clustering import cluster_purity

    # majority_label keeps the label column's own type since the r10
    # string-label fix — cast to bigint here so the gated schema matches
    # the oracle's CAST(label AS BIGINT)
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "label", F.col("label").cast("bigint")
    )
    return cluster_purity(emb)


def _q90_oracle() -> str:
    from candia_spark.operators.retrieval import bm25_oracle_sql

    bm = bm25_oracle_sql("documents", _Q69_TERMS, k=15)
    return (
        "WITH bm AS (\n"
        + bm
        + """),
    bmr AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                    AS BIGINT) AS rank
        FROM bm),
    qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
           WHERE vec_id = 0),
    qn AS (
        SELECT query_id,
               SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qnorm
        FROM qv, UNNEST(embedding) AS u(x) GROUP BY query_id),
    cn AS (
        SELECT vec_id,
               SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS cnorm
        FROM embeddings, UNNEST(embedding) AS u(x) GROUP BY vec_id),
    dots AS (
        SELECT qv.query_id, c.vec_id,
               SUM(CAST(qv.embedding[i] AS DOUBLE)
                   * CAST(c.embedding[i] AS DOUBLE)) AS dot
        FROM qv JOIN embeddings c ON TRUE,
        UNNEST(generate_series(1, len(qv.embedding))) AS u(i)
        GROUP BY 1, 2),
    scored AS (
        SELECT d.vec_id AS doc_id,
               CAST(ROUND(d.dot / (qn.qnorm * cn.cnorm), 6) AS DOUBLE)
                   AS cosine
        FROM dots d JOIN qn ON qn.query_id = d.query_id
        JOIN cn ON cn.vec_id = d.vec_id),
    cosr AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC)
                    AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= 15),
    pts AS (
        SELECT doc_id, 16 - rank AS p FROM bmr
        UNION ALL
        SELECT doc_id, 16 - rank FROM cosr),
    f AS (
        SELECT doc_id, CAST(SUM(p) AS BIGINT) AS fused_points,
               CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM pts GROUP BY doc_id)
    SELECT doc_id, fused_points, n_lists,
           CAST(ROW_NUMBER() OVER (ORDER BY fused_points DESC, doc_id ASC)
                AS BIGINT) AS fused_rank
    FROM f
    QUALIFY fused_rank <= 10
    """
    )


@register(
    "q90_hybrid_fusion",
    oracle=_q90_oracle(),
    survey_ref="hybrid retrieval fusion (north star: RAG example mining)",
)
def q90_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators.retrieval.borda_fuse): the q69 BM25
    top-15 (sparse) and the exact cosine top-15 for probe vector 0
    (dense) fused by integer Borda counting — depth+1-rank points per
    list, absent ids score 0, fused order (points DESC, id ASC), top 10.
    Division-free by design: RRF's 1/(60+r) would put order-sensitive
    float sums in the gate; Borda keeps the whole fusion in bigint.
    Fusion input is two 15-row lists — nothing corpus-sized moves after
    the per-modality top-k stages (bm25: zero corpus shuffles; cosine:
    broadcast probe)."""
    from candia_spark.operators.retrieval import bm25_topk, borda_fuse
    from candia_spark.operators.similarity import cosine_topk_bruteforce
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bm = bm25_topk(docs, _Q69_TERMS, k=15)
    wr = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm_ranked = bm.select(
        "doc_id", F.row_number().over(wr).cast("bigint").alias("rank")
    )
    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cos_ranked = cosine_topk_bruteforce(emb, probe, k=15).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return borda_fuse([bm_ranked, cos_ranked], depth=15, out_k=10)


def _bpe_cte_chain(rounds: int, carry_word: bool = False) -> str:
    """Unrolled-CTE BPE trajectory (the q57/q73 trajectory device): one
    (pairs-census, argmax, merge-rewrite) CTE triple per round, all AS
    MATERIALIZED — v{i} and b{i} are each referenced twice and DuckDB
    inlines multi-referenced CTEs by default, which would re-run every
    earlier round per reference (the q73 temp-spill lesson).

    ``carry_word=False`` (q92, training): the vocab census drops 1-char
    words (they never carry a pair) and the v tables carry only
    (sym_str, cnt). ``carry_word=True`` (q93, encoding): the word rides
    every v table so v{rounds} IS the word -> segmentation map, and the
    1-char filter is dropped (those words segment to themselves; they
    contribute zero pairs, so the merge trajectory is IDENTICAL either
    way)."""
    chars = (
        "[substr(word, CAST(i AS INTEGER), 1) "
        "for i in range(1, length(word) + 1)]"
    )
    w = "word, " if carry_word else ""
    having = "" if carry_word else "HAVING length(word) >= 2"
    parts = [
        f"""WITH wf AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_TOKS_SQL}) AS word FROM documents)
    GROUP BY word {having}),
v0 AS MATERIALIZED (
    SELECT {w}' ' || array_to_string({chars}, '  ') || ' ' AS sym_str, cnt
    FROM wf)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
p{i} AS MATERIALIZED (
    SELECT pr['l'] AS l, pr['r'] AS r, CAST(SUM(cnt) AS BIGINT) AS weight
    FROM (
        SELECT unnest([{{'l': s[CAST(j AS INTEGER)],
                         'r': s[CAST(j AS INTEGER) + 1]}}
                       for j in range(1, len(s))]) AS pr,
               cnt
        FROM (SELECT string_split(trim(sym_str), '  ') AS s, cnt
              FROM v{i - 1}))
    GROUP BY 1, 2),
b{i} AS MATERIALIZED (
    SELECT l, r, weight FROM p{i} ORDER BY weight DESC, l, r LIMIT 1),
v{i} AS MATERIALIZED (
    SELECT {w}replace(sym_str, ' ' || b.l || '  ' || b.r || ' ',
                   ' ' || b.l || b.r || ' ') AS sym_str, cnt
    FROM v{i - 1}, b{i} b)"""
        )
    return "\n".join(parts)


def _q92_oracle(rounds: int = 6) -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_round, l AS lhs, r AS rhs, "
        f"l || r AS merged, weight FROM b{i}"
        for i in range(1, rounds + 1)
    )
    return _bpe_cte_chain(rounds) + "\n" + sel


def _q93_oracle(rounds: int = 6) -> str:
    """The encode oracle: the same unrolled trajectory, word carried
    through every rewrite, so v{rounds} is the segmentation map; token
    counts are one join of exploded document tokens against it."""
    return (
        _bpe_cte_chain(rounds, carry_word=True)
        + f""",
seg AS MATERIALIZED (
    SELECT word,
           CAST(len(string_split(trim(sym_str), '  ')) AS BIGINT) AS n_sym
    FROM v{rounds}),
dt AS (SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_sym) AS BIGINT) AS n_tokens
    FROM dt JOIN seg USING (word) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)"""
    )


@register(
    "q93_bpe_encode",
    oracle=_q93_oracle(6),
    survey_ref="tokenizer induction: BPE encoder / induced-tokenizer "
    "token counting (north star)",
)
def q93_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoder (operators.curation.bpe_encode): train 6 merges on
    the documents corpus (q92's trajectory), then tokenize every
    document under the induced tokenizer and report per-doc word and
    token counts — the budget statistic a data pipeline audits mixtures
    with. Segmentation is a pure map over the distinct-word table (one
    chained replace per merge); the only corpus-scale work is the
    token-vocabulary join and the per-doc aggregation."""
    from candia_spark.operators.curation import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode(docs, bpe_train(docs, rounds=6))


def _q95_oracle(
    k: int = 8, shortlist: int = 40, num: int = 1, den: int = 2
) -> str:
    """Unrolled greedy-MMR oracle (the q57/q92 trajectory device):
    relevance and pairwise-sim tables first (the q30 ROUND(...,6)
    cosine), then one (score, argmax, selected-set) CTE triple per
    round. Everything multi-referenced is AS MATERIALIZED."""
    head = f"""WITH qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
qn AS (
    SELECT SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qnorm
    FROM qv, UNNEST(embedding) AS u(x)),
cn AS MATERIALIZED (
    SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS cnorm
    FROM embeddings, UNNEST(embedding) AS u(x) GROUP BY vec_id),
dots AS (
    SELECT c.vec_id,
           SUM(CAST(q.embedding[i] AS DOUBLE)
               * CAST(c.embedding[i] AS DOUBLE)) AS dot
    FROM qv q JOIN embeddings c ON TRUE,
         UNNEST(generate_series(1, len(q.embedding))) AS u(i)
    GROUP BY 1),
sl AS MATERIALIZED (
    SELECT d.vec_id,
           CAST(ROUND(d.dot / (qn.qnorm * cn.cnorm), 6) AS DOUBLE) AS cosine
    FROM dots d JOIN cn ON cn.vec_id = d.vec_id CROSS JOIN qn
    ORDER BY cosine DESC, d.vec_id ASC LIMIT {shortlist}),
pe AS MATERIALIZED (
    SELECT e.vec_id, e.embedding, cn.cnorm
    FROM embeddings e JOIN sl USING (vec_id) JOIN cn USING (vec_id)),
sims AS MATERIALIZED (
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           CAST(ROUND(SUM(CAST(a.embedding[i] AS DOUBLE)
                          * CAST(b.embedding[i] AS DOUBLE))
                      / (ANY_VALUE(a.cnorm) * ANY_VALUE(b.cnorm)), 6)
                AS DOUBLE) AS sim
    FROM pe a JOIN pe b ON a.vec_id < b.vec_id,
         UNNEST(generate_series(1, len(a.embedding))) AS u(i)
    GROUP BY 1, 2),
s1 AS MATERIALIZED (
    SELECT vec_id FROM sl ORDER BY cosine DESC, vec_id ASC LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM s1)"""
    parts = [head]
    for i in range(2, k + 1):
        parts.append(f""",
r{i} AS (
    SELECT r.vec_id,
           {num} * r.cosine - {den - num} * (
               SELECT MAX(s.sim) FROM sims s
               WHERE (s.ia = r.vec_id
                      AND s.ib IN (SELECT vec_id FROM sel{i - 1}))
                  OR (s.ib = r.vec_id
                      AND s.ia IN (SELECT vec_id FROM sel{i - 1}))
           ) AS score
    FROM sl r
    WHERE r.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})),
s{i} AS MATERIALIZED (
    SELECT vec_id FROM r{i} ORDER BY score DESC, vec_id ASC LIMIT 1),
sel{i} AS MATERIALIZED (
    SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i})"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST(0 AS BIGINT) AS query_id, vec_id, "
        f"CAST({i} AS BIGINT) AS mmr_rank FROM s{i}"
        for i in range(1, k + 1)
    )
    return "\n".join(parts) + "\n" + sel


@register(
    "q95_mmr_rerank",
    oracle=_q95_oracle(8, 40, 1, 2),
    survey_ref="MMR diversity reranking (Carbonell & Goldstein 1998, "
    "north star: retrieval)",
)
def q95_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance rerank
    (operators.similarity.mmr_select): the exact cosine top-40
    shortlist for query vec 0, greedily reranked to 8 picks maximizing
    relevance minus max-similarity-to-selected at λ=1/2 — the diversity
    pass that stops a near-dup-ridden corpus answering every retrieval
    with k copies of one document. The whole greedy trajectory
    (ROUND(...,6) floats included) is gated by an unrolled-CTE oracle:
    a wrong pick in round i corrupts every later round. Runs the
    GROUPED engine (r11): the greedy executes inside
    groupBy(query_id).applyInPandas — nothing query-batch-sized is ever
    collected — and the driver≡grouped trajectory equivalence is
    additionally pytest-pinned."""
    from candia_spark.operators.similarity import mmr_select

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_select(
        emb, queries_df, k=8, shortlist=40, lam=(1, 2), engine="grouped"
    )


_DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3", "src4")


@register(
    "q94_dsir_select",
    oracle="""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, unnest({toks}) AS tok FROM documents
    ), src AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS src_bits
        FROM toks GROUP BY tok
    ), tgt AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS tgt_bits
        FROM (SELECT unnest({toks}) AS tok FROM documents
              WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4'))
        GROUP BY tok
    ), costs AS (
        SELECT s.tok, COALESCE(t.tgt_bits, 0) - s.src_bits AS tok_score
        FROM src s LEFT JOIN tgt t USING (tok)
    ), scored AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(tok_score) AS BIGINT) AS score_bits
        FROM toks JOIN costs USING (tok) GROUP BY doc_id
    ), corpus AS (
        SELECT CAST(SUM(n_tokens) AS HUGEINT) AS c_toks,
               CAST(SUM(score_bits) AS HUGEINT) AS c_bits
        FROM scored
    )
    SELECT doc_id, n_tokens, score_bits,
           CAST(CAST(score_bits AS HUGEINT) * c_toks
                > c_bits * CAST(n_tokens AS HUGEINT) AS BIGINT) AS selected
    FROM scored, corpus
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="DSIR-style importance selection (Xie et al. 2023, "
    "north star: data selection)",
)
def q94_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (operators.curation.dsir_select):
    score every document by how much more its vocabulary matches the
    src0-src4 target slice than the corpus at large — per token,
    bits(target count) - bits(corpus count), the integer log2 proxy —
    and flag the above-corpus-mean docs an importance-resampling pass
    keeps. Division-free (decimal cross-multiplied flag, the q84
    device with the inequality flipped: rarity drops the tail, DSIR
    keeps the head)."""
    from candia_spark.operators.curation import dsir_select

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
    return dsir_select(docs, target)


@register(
    "q96_dsir_hashed_bigrams",
    # q94's census->costs->score->flag chain, but the feature space is
    # hashed adjacent BIGRAMS: md5 first-15-hex-chars -> 60-bit int ->
    # % 65536 (the q28/q87 cross-engine hash device) — so the
    # importance model sees word order through a fixed-size table
    oracle="""
    WITH tk AS MATERIALIZED (
        SELECT doc_id, source, {toks} AS t FROM documents
    ), feats AS MATERIALIZED (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 15)
                    AS BIGINT) % 65536 AS tok
        FROM tk,
             unnest(CASE WHEN len(t) >= 2 THEN generate_series(1, len(t) - 1)
                         ELSE [] END) AS u(i)
    ), src AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS src_bits
        FROM feats GROUP BY tok
    ), tgt AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS tgt_bits
        FROM feats WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
        GROUP BY tok
    ), costs AS (
        SELECT s.tok, COALESCE(g.tgt_bits, 0) - s.src_bits AS tok_score
        FROM src s LEFT JOIN tgt g USING (tok)
    ), scored AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(tok_score) AS BIGINT) AS score_bits
        FROM feats JOIN costs USING (tok) GROUP BY doc_id
    ), corpus AS (
        SELECT CAST(SUM(n_tokens) AS HUGEINT) AS c_toks,
               CAST(SUM(score_bits) AS HUGEINT) AS c_bits
        FROM scored
    )
    SELECT doc_id, n_tokens, score_bits,
           CAST(CAST(score_bits AS HUGEINT) * c_toks
                > c_bits * CAST(n_tokens AS HUGEINT) AS BIGINT) AS selected
    FROM scored, corpus
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="DSIR hashed-bigram importance selection (Xie et al. "
    "2023's actual feature space; north star: data selection)",
)
def q96_dsir_hashed_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection over HASHED BIGRAM features
    (operators.curation.dsir_select with ngram=2, buckets=2^16): the
    published method's real feature space — adjacent word pairs hashed
    into a fixed-size table — so the importance model sees word order
    (reordered word salad stops scoring like target prose) and the
    model size is capped at ``buckets`` regardless of vocabulary
    growth. Same integer bits-proxy scoring and division-free
    above-corpus-mean flag as q94; the hash is the md5->60-bit->%
    device both engines compute bit-identically. n_tokens counts
    bigram features; docs with fewer than 2 tokens drop (no
    features)."""
    from candia_spark.operators.curation import dsir_select

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
    return dsir_select(docs, target, ngram=2, buckets=65536)


@register(
    "q97_quality_classifier",
    # NB-trained integer log-odds weights over hashed unigram features
    # (4096 buckets -> forced collisions, summed identically by both
    # engines), then the broadcast linear scorer + frozen 1/2 threshold
    oracle="""
    WITH feats AS MATERIALIZED (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 4096 AS tok
        FROM (SELECT doc_id, source, unnest({toks}) AS tok FROM documents)
    ), p AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS pos_bits
        FROM feats WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
        GROUP BY tok
    ), n AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS neg_bits
        FROM feats
        WHERE source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4')
        GROUP BY tok
    ), w AS (
        SELECT tok,
               COALESCE(pos_bits, 0) - COALESCE(neg_bits, 0) AS weight
        FROM p FULL JOIN n USING (tok)
    ), agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(COALESCE(weight, 0)) AS BIGINT) AS score_w
        FROM feats LEFT JOIN w USING (tok) GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
           COALESCE(a.score_w, 0) AS score_w,
           CAST(CAST(COALESCE(a.score_w, 0) AS HUGEINT) * 2
                > CAST(1 AS HUGEINT) * CAST(COALESCE(a.n_tokens, 0)
                                            AS HUGEINT) AS BIGINT) AS keep
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="quality-classifier scoring: broadcast linear model, "
    "hashed features, frozen keep threshold (north star; verdict r10 "
    "next #5)",
)
def q97_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier gate
    (operators.curation.quality_classifier_weights + _score): train a
    fastText-style broadcast linear model — integer log-odds weights
    bits(count_pos)−bits(count_neg) over 4096 hashed unigram features,
    positives = the src0-src4 slice, negatives = the rest — then score
    EVERY document (Σ weight per feature occurrence, bigint) and keep
    those whose per-feature mean clears the frozen 1/2 threshold by
    exact decimal cross-multiply. The scorer's verdict is a pure
    function of row + broadcast model + threshold, so its streaming
    twin (quality_stream) is batch-identical by construction."""
    from candia_spark.operators.curation import (
        quality_classifier_score,
        quality_classifier_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    pos = docs.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
    neg = docs.filter(~F.col("source").isin(*_DSIR_TARGET_SOURCES))
    w = quality_classifier_weights(pos, neg, buckets=4096)
    return quality_classifier_score(
        docs, w, threshold=(1, 2), buckets=4096
    )


@register(
    "q99_quality_budget_fill",
    # q97's hashed-feature NB scorer feeding the per-source greedy
    # prefix fill: rank by (score_w desc, doc_id), running token sum
    # with an explicit ROWS frame (RANGE would pool peers), keep while
    # cum <= 1000
    oracle="""
    WITH feats AS MATERIALIZED (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 4096 AS tok
        FROM (SELECT doc_id, source, unnest({toks}) AS tok FROM documents)
    ), p AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS pos_bits
        FROM feats WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
        GROUP BY tok
    ), n AS (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS neg_bits
        FROM feats
        WHERE source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4')
        GROUP BY tok
    ), w AS (
        SELECT tok,
               COALESCE(pos_bits, 0) - COALESCE(neg_bits, 0) AS weight
        FROM p FULL JOIN n USING (tok)
    ), agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(COALESCE(weight, 0)) AS BIGINT) AS score_w
        FROM feats LEFT JOIN w USING (tok) GROUP BY doc_id
    ), scored AS (
        SELECT d.doc_id, d.source AS shard,
               COALESCE(a.n_tokens, 0) AS n_tokens,
               COALESCE(a.score_w, 0) AS score
        FROM documents d LEFT JOIN agg a USING (doc_id)
    )
    SELECT doc_id, shard, n_tokens, score,
           CAST(ROW_NUMBER() OVER wsh AS BIGINT) AS fill_rank,
           CAST(SUM(n_tokens) OVER (wsh ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS cum_tokens,
           CAST(SUM(n_tokens) OVER (wsh ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) <= 1000
                AS BIGINT) AS kept
    FROM scored
    WINDOW wsh AS (PARTITION BY shard ORDER BY score DESC, doc_id ASC)
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="token-budget quality fill (greedy prefix mix assembly; "
    "north star: budgeted data mixes)",
)
def q99_quality_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mix assembly (operators.curation.quality_budget_fill
    fed by quality_classifier_score): score every document with q97's
    hashed-feature NB linear model, then per source keep the
    best-scored prefix whose running token count stays within a
    1000-token budget — "take the best until the budget is spent", the
    greedy a quality-filtered budgeted mix actually runs. One
    shard-keyed window, prefix semantics (the overflowing doc and
    everything after it are dropped), every output column bigint, the
    whole ranking + running sum engine-exact via the total
    (score desc, id) tie-break."""
    from candia_spark.operators.curation import (
        quality_budget_fill,
        quality_classifier_score,
        quality_classifier_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    pos = docs.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
    neg = docs.filter(~F.col("source").isin(*_DSIR_TARGET_SOURCES))
    w = quality_classifier_weights(pos, neg, buckets=4096)
    scored = quality_classifier_score(
        docs, w, threshold=(1, 2), buckets=4096
    ).join(docs.select("doc_id", "source"), "doc_id")
    return quality_budget_fill(scored, budget_tokens=1000)


@register(
    "q98_boilerplate_lines",
    # the documents table has no newlines, so the query PLANTS the line
    # structure (the q91 augmentation device): a per-source header and
    # a global footer on every doc (within-source df = 100% -> both
    # stripped), a 'promo banner' on doc_id % 3 == 0 docs (~1/3 < the
    # 1/2 threshold -> kept), and the original text as the body line
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id, source,
               'site header ' || source || chr(10) || text ||
               CASE WHEN doc_id % 3 = 0
                    THEN chr(10) || 'promo banner' ELSE '' END ||
               chr(10) || 'copyright footer' AS text
        FROM documents
    ), ln AS MATERIALIZED (
        SELECT doc_id, source, i AS pos, l[i] AS line
        FROM (SELECT doc_id, source,
                     string_split(text, chr(10)) AS l FROM aug),
             unnest(generate_series(1, len(l))) AS u(i)
    ), gdocs AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM aug GROUP BY source
    ), census AS (
        SELECT source, line,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS line_docs
        FROM ln GROUP BY source, line
    ), kept AS (
        SELECT l.doc_id, l.pos, l.line
        FROM ln l JOIN census c USING (source, line)
                  JOIN gdocs g USING (source)
        WHERE NOT (c.line_docs * 2 >= 1 * g.n_docs AND c.line_docs >= 2)
    ), rebuilt AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS clean
        FROM kept GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(len(string_split(a.text, chr(10))) AS BIGINT) AS n_lines,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(COALESCE(r.clean, '')) AS clean_md5
    FROM aug a LEFT JOIN rebuilt r USING (doc_id)
    """,
    survey_ref="boilerplate line removal (CCNet/RefinedWeb site-"
    "furniture stripping; north star: extraction cleanup)",
)
def q98_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-scoped boilerplate line removal
    (operators.curation.strip_boilerplate_lines): lines appearing in
    >= 1/2 of a source's documents (and in >= 2 of them) are site
    furniture and are stripped from every document of that source,
    surviving lines keep their order. The query plants a per-source
    header + global footer (stripped) and a 1-in-3 promo line (below
    threshold, kept) around each document's real text; md5(clean_text)
    hash-gates every rebuilt document, so a single mis-kept or
    mis-ordered line anywhere fails the gate."""
    from candia_spark.operators.curation import strip_boilerplate_lines

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.lit("site header "), F.col("source"), F.lit("\n"),
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\npromo banner")
            ).otherwise(F.lit("")),
            F.lit("\ncopyright footer"),
        ),
    )
    return strip_boilerplate_lines(
        aug, max_frac=(1, 2), min_docs=2
    ).select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q92_bpe_train",
    oracle=_q92_oracle(6),
    survey_ref="tokenizer induction: multi-round BPE trainer "
    "(north star; Sennrich et al. 2016 loop)",
)
def q92_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-round BPE trainer (operators.curation.bpe_train): six
    rounds of census -> argmax -> merge-everywhere over the documents
    vocabulary — Sennrich et al. 2016's actual training loop, certified
    as a full merge TRAJECTORY against the unrolled-CTE oracle (any
    wrong merge in round i corrupts every later round's census, so the
    gate is self-strengthening, the q57/q73 device). The corpus is
    touched once (the word census); each round then costs one
    vocabulary-sized aggregation + TakeOrdered(1) + pure-map rewrite."""
    from candia_spark.operators.curation import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), rounds=6)


@register(
    "q91_self_repetition_rewrite",
    # every doc_id % 5 == 0 doc is doubled (text || ' ' || text) so the
    # removal path visibly fires wherever the token count block-aligns;
    # clean_md5 hash-gates every rewritten document either way
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text
                    ELSE text END AS text
        FROM documents),
    meta AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n_tok,
               CAST(floor(len(string_split(text, ' ')) / 4) AS INT) AS nb
        FROM aug),
    occ AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(t, i*4 + 1, i*4 + 4), ' ') AS block
        FROM meta,
             unnest(CASE WHEN nb > 0 THEN generate_series(0, nb - 1)
                         ELSE [] END) AS u(i)),
    firsts AS (
        SELECT doc_id, block, MIN(pos) AS fpos
        FROM occ GROUP BY doc_id, block),
    rebuilt AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(block, ' ' ORDER BY fpos) AS kept_text
        FROM firsts GROUP BY doc_id)
    SELECT m.doc_id, CAST(m.nb AS BIGINT) AS n_blocks,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(trim(concat_ws(' ', COALESCE(r.kept_text, ''),
                array_to_string(list_slice(m.t, m.nb*4 + 1, m.n_tok),
                                ' ')))) AS clean_md5
    FROM meta m LEFT JOIN rebuilt r USING (doc_id)
    """,
    survey_ref="self-repetition rewrite (north star: intra-doc dedup)",
)
def q91_self_repetition_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-block removal
    (operators.dedup.remove_self_repeated_blocks): each document keeps
    the FIRST occurrence of every 4-word block of itself — the rewrite
    fix for the self-repetition q44's Gopher metrics only measure
    (looped templates, pagination, generation degeneration). Every
    doc_id % 5 == 0 document is doubled to certify the removal path.
    The whole operator is a pure map (one F.aggregate fold per row,
    zero exchanges) — the q68 corpus-level rewrite needs its three
    keyed shuffles; a document deduped against itself needs none."""
    from candia_spark.operators.dedup import remove_self_repeated_blocks

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat_ws(" ", F.col("text"), F.col("text")),
        ).otherwise(F.col("text")),
    )
    return remove_self_repeated_blocks(aug, block_words=4).select(
        "doc_id",
        "n_blocks",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q100_exact_substring_rewrite",
    # the planted 11-token phrase (the q91/q98 augmentation device)
    # certifies mid-document span removal on every %4==1 doc except the
    # smallest (the owner keeps it); the corpus's natural exact-dup
    # docs certify the full-wipe path; md5(clean_text) gates every
    # rebuilt document byte-for-byte
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 1
                    THEN text || ' shared boilerplate sentence planted'
                         || ' verbatim across documents for exact'
                         || ' substring dedup'
                    ELSE text END AS text
        FROM documents),
    base AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n FROM aug),
    occ AS MATERIALIZED (
        SELECT doc_id, i AS pos,
               md5(array_to_string(list_slice(t, i + 1, i + 8), ' ')) AS g
        FROM base, unnest(CASE WHEN n >= 8 THEN generate_series(0, n - 8)
                               ELSE [] END) AS u(i)),
    own AS (SELECT g, MIN(doc_id) AS owner FROM occ GROUP BY g),
    dup AS (SELECT o.doc_id, o.pos FROM occ o JOIN own USING (g)
            WHERE own.owner < o.doc_id),
    cov AS (SELECT DISTINCT doc_id, pos + j AS tpos
            FROM dup, unnest(generate_series(0, 7)) AS v(j)),
    tok AS (SELECT doc_id, i - 1 AS tpos, t[i] AS tok
            FROM base, unnest(generate_series(1, n)) AS w(i)),
    kept AS (SELECT k.doc_id, k.tpos, k.tok FROM tok k
             ANTI JOIN cov ON k.doc_id = cov.doc_id AND k.tpos = cov.tpos),
    rebuilt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                       string_agg(tok, ' ' ORDER BY tpos) AS clean
                FROM kept GROUP BY doc_id)
    SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(COALESCE(r.clean, '')) AS clean_md5
    FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """,
    survey_ref="exact-substring cross-doc dedup rewrite (Lee et al. "
    "2022 ExactSubstr; north star: span-level corpus dedup)",
)
def q100_exact_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring cross-document dedup REWRITE
    (operators.dedup.exact_substring_dedup, verdict r11 next #1): every
    token covered by an 8-token gram that verbatim-appears in an
    EARLIER document is deleted; the earliest document keeps each
    span. The query plants an 11-token boilerplate phrase on every
    doc_id % 4 == 1 document — the smallest such doc owns it, every
    other carrier loses exactly those 11 tokens regardless of where
    they sit — and the corpus's natural exact-duplicate documents
    certify the full-wipe path. md5(clean_text) hash-gates each
    rebuilt document, so one mis-kept or mis-dropped token anywhere
    fails the gate."""
    from candia_spark.operators.dedup import exact_substring_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.col("text"),
                F.lit(
                    " shared boilerplate sentence planted verbatim"
                    " across documents for exact substring dedup"
                ),
            ),
        ).otherwise(F.col("text")),
    )
    return exact_substring_dedup(aug, k=8).select(
        "doc_id",
        "n_tokens",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q101_image_phash_dups",
    # the image corpus = every doc's text bytes as the stand-in payload
    # (the q35/q36 device) plus a last-char-flipped twin for every
    # doc_id % 10 == 0 doc — one byte changed at unchanged length, so
    # only the final grid cell moves and the twin sits within ~1 bit of
    # its source (the planted NEAR-dup certifying the verify stage);
    # natural exact-dup docs certify hamming 0. The oracle recomputes
    # the ENTIRE pipeline: byte chunking (q36's array_split rule at 72
    # cells), integer cross-multiplied dHash bits, 32-bit packing,
    # 16-bit banding, the banded candidate set itself (recall is part
    # of the gate, the q27 stance), and the bit_count(xor) verify
    oracle="""
    WITH img AS MATERIALIZED (
        SELECT doc_id, encode(text) AS payload FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               encode(substr(text, 1, length(text) - 1) || '.')
        FROM documents WHERE doc_id % 10 = 0),
    b AS MATERIALIZED (
        SELECT doc_id, octet_length(payload) AS n, hex(payload) AS h
        FROM img),
    bytes AS (
        SELECT doc_id, p,
               CAST('0x' || substr(h, 2 * p + 1, 2) AS INT) AS v,
               CASE WHEN p < (n % 72) * ((n // 72) + 1)
                    THEN p // ((n // 72) + 1)
                    ELSE (n % 72) + (p - (n % 72) * ((n // 72) + 1))
                         // (n // 72)
               END AS cell
        FROM b, UNNEST(range(0, n)) AS t(p)
        WHERE n > 0),
    stats AS (
        SELECT doc_id, cell, SUM(v) AS s, COUNT(*) AS c
        FROM bytes GROUP BY doc_id, cell),
    cells AS MATERIALIZED (
        SELECT b.doc_id, g.cell, COALESCE(st.s, 0) AS s,
               COALESCE(st.c, 0) AS c
        FROM b CROSS JOIN (SELECT UNNEST(range(0, 72)) AS cell) g
        LEFT JOIN stats st ON st.doc_id = b.doc_id AND st.cell = g.cell),
    bits AS (
        SELECT l.doc_id,
               CAST((l.cell // 9) * 8 + (l.cell % 9) AS BIGINT) AS j,
               CASE WHEN l.s * r.c > r.s * l.c THEN 1 ELSE 0 END AS bit
        FROM cells l JOIN cells r
          ON r.doc_id = l.doc_id AND r.cell = l.cell + 1
        WHERE l.cell % 9 < 8),
    sig AS MATERIALIZED (
        SELECT doc_id,
               CAST(SUM(CASE WHEN j < 32
                             THEN bit * (CAST(1 AS BIGINT) << j)
                             ELSE 0 END) AS BIGINT) AS h_hi,
               CAST(SUM(CASE WHEN j >= 32
                             THEN bit * (CAST(1 AS BIGINT) << (j - 32))
                             ELSE 0 END) AS BIGINT) AS h_lo
        FROM bits GROUP BY doc_id),
    bands AS (
        SELECT doc_id, bidx,
               CASE bidx WHEN 0 THEN h_hi & 65535
                         WHEN 1 THEN h_hi >> 16
                         WHEN 2 THEN h_lo & 65535
                         ELSE h_lo >> 16 END AS bval
        FROM sig, UNNEST([0, 1, 2, 3]) AS u(bidx)),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
        FROM bands a JOIN bands bb
          ON a.bidx = bb.bidx AND a.bval = bb.bval
        WHERE a.doc_id < bb.doc_id)
    SELECT id_a, id_b, hamming FROM (
        SELECT c.id_a, c.id_b,
               CAST(bit_count(xor(sa.h_hi, sb.h_hi))
                    + bit_count(xor(sa.h_lo, sb.h_lo)) AS BIGINT)
                   AS hamming
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b)
    WHERE hamming <= 6
    """,
    survey_ref="perceptual-hash image near-dedup (dHash + Hamming "
    "banding; north star: LAION-style multimodal dedup)",
)
def q101_image_phash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-duplicate pairs (verdict r11 next #2:
    operators.multimodal.dhash64 + phash_near_dups): 64-bit integer
    dHash over the binary payloads (decode step = the documented
    deterministic byte-grid stand-in, the q36 stance — the Spark-side
    plumbing, banding, and verify are the real, gated part), candidates
    from exact 16-bit band matches (pigeonhole-complete to Hamming 3),
    verified with exact bit_count(xor) distance <= 6. Every doc's text
    bytes are the stand-in image; a last-char-flipped twin is planted
    on every tenth doc to certify the near-miss path (hamming ~1), and
    natural duplicate docs certify hamming 0."""
    from candia_spark.operators.multimodal import phash_near_dups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    twins = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.encode(
            F.concat(
                F.col("text").substr(F.lit(1), F.length("text") - 1),
                F.lit("."),
            ),
            "UTF-8",
        ).alias("payload"),
    )
    return phash_near_dups(base.unionByName(twins), max_hamming=6)


@register(
    "q102_multiclass_langid",
    # the synthetic corpus's text carries no real language signal (one
    # shared vocabulary under every lang label), so the class signal is
    # PLANTED (the q91/q98/q100 augmentation device): three 'langsig'
    # marker tokens per document. The oracle recomputes the ENTIRE
    # trained pipeline — hashed features, per-class census, NB rate
    # normalization, one-vs-rest integer weights, contrast pruning,
    # broadcast scoring, exact argmax tie-break — value-identically
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id, lang,
               text || ' langsig' || lang || ' langsig' || lang
                    || ' langsig' || lang AS text
        FROM documents),
    feats AS MATERIALIZED (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 4096 AS tok
        FROM (SELECT doc_id, lang, unnest({toks}) AS tok FROM aug)),
    cen AS MATERIALIZED (
        SELECT lang AS label, tok, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(length(bin(COUNT(*))) AS BIGINT) AS b
        FROM feats GROUP BY lang, tok),
    ltot AS (
        SELECT label,
               CAST(length(bin(CAST(SUM(cnt) AS BIGINT))) AS BIGINT) AS lt
        FROM cen GROUP BY label),
    sdf AS (
        SELECT CAST(SUM(lt) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM ltot),
    tokb AS (
        SELECT tok, CAST(SUM(b) AS BIGINT) AS tb FROM cen GROUP BY tok),
    dense AS (
        SELECT l.label, t.tok,
               COALESCE(c.b, 0) - l.lt AS nb,
               sdf.k * (COALESCE(c.b, 0) - l.lt) - (t2.tb - sdf.s)
                   AS weight
        FROM (SELECT DISTINCT tok FROM cen) t
        CROSS JOIN ltot l CROSS JOIN sdf
        JOIN tokb t2 ON t2.tok = t.tok
        LEFT JOIN cen c ON c.tok = t.tok AND c.label = l.label),
    pruned AS (
        SELECT label, tok, weight FROM (
            SELECT label, tok, weight,
                   MAX(nb) OVER (PARTITION BY tok)
                       - MIN(nb) OVER (PARTITION BY tok) AS rng
            FROM dense)
        WHERE rng >= 3),
    sc AS (
        SELECT f.doc_id, p.label, CAST(SUM(p.weight) AS BIGINT) AS score
        FROM feats f JOIN pruned p ON p.tok = f.tok
        GROUP BY f.doc_id, p.label),
    best AS (
        SELECT doc_id, label FROM (
            SELECT doc_id, label,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, label ASC)
                       AS rk
            FROM sc) WHERE rk = 1),
    pred AS (
        SELECT a.doc_id, a.lang, COALESCE(b.label, 'und') AS predicted_lang
        FROM aug a LEFT JOIN best b USING (doc_id))
    SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY lang, predicted_lang
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="multi-class hashed-feature classifier / trained langid "
    "(fastText-style argmax; north star; verdict r11 next #3)",
)
def q102_multiclass_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multi-class language ID
    (operators.curation.multiclass_classifier_weights + _predict,
    verdict r11 next #3 — the fastText-style replacement for q32's
    marker-list heuristic, which stays as the frozen fixture): NB-rate-
    normalized one-vs-rest integer log-odds weights over 4096 hashed
    unigram features, contrast-pruned at 3 bits, broadcast linear
    scoring, exact (score desc, label asc) argmax. The synthetic corpus
    shares one vocabulary across lang labels, so three per-lang marker
    tokens are planted per document (the augmentation device) — the
    trained model must recover a PERFECT diagonal confusion matrix
    from them, certifying weights, pruning, scoring, and tie-break end
    to end (any single wrong weight or argmax flips a confusion
    cell)."""
    from candia_spark.operators.curation import (
        multiclass_classifier_predict,
        multiclass_classifier_weights,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" langsig"), F.col("lang"),
            F.lit(" langsig"), F.col("lang"),
            F.lit(" langsig"), F.col("lang"),
        ),
    )
    w = multiclass_classifier_weights(
        aug, label_col="lang", buckets=4096, min_contrast=3
    )
    pred = multiclass_classifier_predict(aug, w, buckets=4096)
    return (
        pred.join(aug.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", F.col("predicted_label").alias("predicted_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@register(
    "q103_rolling_substring_dedup",
    # rolling-ingestion certification (the q78 stance, on the gram
    # census): the corpus = the lower half of doc ids, the batch = the
    # upper half; the batch rewrites against the PERSISTED census only
    # — corpus-owned grams cover every batch occurrence, batch-novel
    # grams use the batch-internal first-owner rule. Equals the batch
    # slice of a full run here (corpus ids order first), which is
    # exactly what the oracle computes
    oracle="""
    WITH split AS (
        SELECT CAST(MAX(doc_id) // 2 AS BIGINT) AS cut FROM documents),
    base AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n FROM documents),
    occ AS MATERIALIZED (
        SELECT doc_id, i AS pos,
               md5(array_to_string(list_slice(t, i + 1, i + 8), ' ')) AS g
        FROM base, unnest(CASE WHEN n >= 8 THEN generate_series(0, n - 8)
                               ELSE [] END) AS u(i)),
    corpus_census AS (
        SELECT g FROM occ, split WHERE doc_id <= cut GROUP BY g),
    batch_occ AS MATERIALIZED (
        SELECT doc_id, pos, g FROM occ, split WHERE doc_id > cut),
    batch_own AS (
        SELECT g, MIN(doc_id) AS owner FROM batch_occ GROUP BY g),
    dup AS (
        SELECT o.doc_id, o.pos
        FROM batch_occ o
        JOIN batch_own b USING (g)
        LEFT JOIN corpus_census c USING (g)
        WHERE c.g IS NOT NULL OR b.owner < o.doc_id),
    cov AS (SELECT DISTINCT doc_id, pos + j AS tpos
            FROM dup, unnest(generate_series(0, 7)) AS v(j)),
    tok AS (
        SELECT doc_id, i - 1 AS tpos, t[i] AS tok
        FROM base, split, unnest(generate_series(1, n)) AS w(i)
        WHERE doc_id > cut),
    kept AS (SELECT k.doc_id, k.tpos, k.tok FROM tok k
             ANTI JOIN cov ON k.doc_id = cov.doc_id AND k.tpos = cov.tpos),
    rebuilt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                       string_agg(tok, ' ' ORDER BY tpos) AS clean
                FROM kept GROUP BY doc_id)
    SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(COALESCE(r.clean, '')) AS clean_md5
    FROM base b CROSS JOIN split
    LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
    WHERE b.doc_id > cut
    """,
    survey_ref="rolling exact-substring dedup vs persisted gram census "
    "(north star: rolling-ingestion span dedup)",
)
def q103_rolling_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact-substring dedup
    (operators.dedup.gram_owner_census + exact_substring_dedup
    corpus_owners mode): the lower-id half of the documents table is
    the shipped corpus whose gram census is persisted; the upper-id
    half is the arriving batch, rewritten against the STORED census
    without re-tokenizing the corpus. Corpus ids order before batch
    ids here, so the rolling rewrite equals the batch slice of a full
    from-scratch run — which is what the oracle recomputes, making the
    rolling path's ownership semantics oracle-gated, not just
    pytest-pinned. md5(clean_text) gates every rebuilt batch
    document."""
    from candia_spark.operators.dedup import (
        exact_substring_dedup,
        gram_owner_census,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # integer division on both sides: CAST(double) rounds in DuckDB but
    # truncates in Spark, so the cut must never pass through a double
    cut = docs.agg(F.expr("CAST(max(doc_id) DIV 2 AS BIGINT)").alias("c"))
    corpus = docs.join(F.broadcast(cut)).filter(
        F.col("doc_id") <= F.col("c")
    ).select("doc_id", "text")
    batch = docs.join(F.broadcast(cut)).filter(
        F.col("doc_id") > F.col("c")
    ).select("doc_id", "text")
    census = gram_owner_census(corpus, k=8)
    return exact_substring_dedup(batch, k=8, corpus_owners=census).select(
        "doc_id",
        "n_tokens",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q104_url_dedup",
    # documents carry no URL column, so URLs are PLANTED (the
    # augmentation device) with every canonicalization rule exercised:
    # scheme/host casing (%3), tracking params in both separator
    # positions (%2 / %6), fragments (%5), trailing slash (%7), and
    # collision groups of two via the shared (id%4, id//8) path — the
    # oracle replicates the whole backreference-free regexp chain
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END)
               || '://'
               || (CASE WHEN doc_id % 3 = 1 THEN 'WWW.h' ELSE 'www.h' END)
               || CAST(doc_id % 4 AS VARCHAR) || '.Example.com/Doc/'
               || CAST(doc_id // 8 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 0
                        THEN '?utm_source=feed'
                             || (CASE WHEN doc_id % 6 = 0
                                      THEN '&gclid=g1&x=keep' ELSE '' END)
                        ELSE '' END)
               || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)
               || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
                   AS url
        FROM documents),
    canon AS MATERIALIZED (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         lower(regexp_extract(url,
                             '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                         || '://'
                         || lower(regexp_extract(url,
                             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
                         || regexp_extract(url,
                             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
                         '#.*', '', 'g'),
                       '&(utm_[^=&#]*|gclid|fbclid)=[^&#]*', '', 'g'),
                     '\\?(utm_[^=&#]*|gclid|fbclid)=[^&#]*&', '?', 'g'),
                   '\\?(utm_[^=&#]*|gclid|fbclid)=[^&#]*$', '', 'g'),
                 '/$', '', 'g') AS canonical_url
        FROM aug),
    dom AS (
        SELECT doc_id, canonical_url,
               regexp_extract(
                   regexp_extract(canonical_url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1),
                   '([^.]+\\.[^.]+)$', 1) AS domain
        FROM canon)
    SELECT doc_id, canonical_url, domain,
           CAST(COUNT(*) OVER w AS BIGINT) AS group_size,
           CAST(MIN(doc_id) OVER w AS BIGINT) AS keeper_id,
           doc_id = MIN(doc_id) OVER w AS keep
    FROM dom WINDOW w AS (PARTITION BY canonical_url)
    """,
    survey_ref="URL canonicalization + dedup-by-URL (RefinedWeb/FineWeb "
    "first dedup stage; north star: web-pipeline curation)",
)
def q104_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (functions.text.canonical_url +
    operators.curation.url_dedup) — the first, cheapest dedup stage of
    a web pipeline: canonicalize (lowercase scheme/host, drop
    fragments, strip utm_*/gclid/fbclid with healed separators, strip
    trailing slash — a backreference-FREE regexp chain, since Java and
    RE2 spell group replacements differently) and elect the smallest-id
    keeper per canonical URL. URLs are planted deterministically with
    every rule exercised and two-doc collision groups; the oracle
    recomputes the entire chain, so one regex divergence anywhere
    flips a keep bit and fails the gate."""
    from candia_spark.operators.curation import url_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(i % 3 == 1, F.lit("WWW.h")).otherwise(F.lit("www.h")),
        (i % 4).cast("string"),
        F.lit(".Example.com/Doc/"),
        F.expr("CAST(doc_id DIV 8 AS STRING)"),
        F.when(
            i % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed"),
                F.when(i % 6 == 0, F.lit("&gclid=g1&x=keep")).otherwise(
                    F.lit("")
                ),
            ),
        ).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    return url_dedup(d.withColumn("url", url))


@register(
    "q105_gopher_rules",
    # the synthetic docs are single-line and symbol-free, so the line
    # and symbol rules are exercised by planting (the q98 device):
    # bullet headers on %6==0, a trailing ellipsis line on %8==0, and
    # a '##' prefix on %9==0; word/mwl/alpha/stopword rules fire on
    # the natural text
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id,
               (CASE WHEN doc_id % 6 = 0
                     THEN '- bullet one' || chr(10) || '- bullet two'
                          || chr(10) ELSE '' END)
               || (CASE WHEN doc_id % 9 = 0 THEN '## ' ELSE '' END)
               || text
               || (CASE WHEN doc_id % 8 = 0
                        THEN chr(10) || 'this trails off...'
                        ELSE '' END) AS text
        FROM documents),
    m AS (
        SELECT doc_id,
               {toks} AS toks,
               string_split(text, chr(10)) AS lines,
               CAST(length(text)
                    - length(replace(text, '#', '')) AS BIGINT)
               + CAST((length(text)
                    - length(replace(text, '...', ''))) // 3 AS BIGINT)
                   AS n_symbols
        FROM aug),
    c AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS sum_chars,
               n_symbols,
               CAST(len(list_filter(lines,
                    l -> substr(l, 1, 1) = '-' OR substr(l, 1, 1) = '*'
                         OR substr(l, 1, 1) = '•')) AS BIGINT) AS bullets,
               CAST(len(list_filter(lines,
                    l -> length(l) >= 3
                         AND substr(l, length(l) - 2, 3) = '...'))
                    AS BIGINT) AS ell_lines,
               CAST(len(list_filter(toks,
                    x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
                   AS alpha_words,
               CAST(len(list_intersect(list_distinct(toks),
                    ['the', 'be', 'to', 'of', 'and',
                     'that', 'have', 'with'])) AS BIGINT)
                   AS stop_hits
        FROM m),
    f AS (
        SELECT doc_id, n_words, n_lines,
               CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT)
                   AS r_words,
               CAST(COALESCE(sum_chars, 0) >= 3 * n_words
                    AND COALESCE(sum_chars, 0) <= 10 * n_words AS BIGINT)
                   AS r_mwl,
               CAST(n_symbols * 10 <= 1 * n_words AS BIGINT) AS r_symbol,
               CAST(bullets * 10 <= 9 * n_lines AS BIGINT) AS r_bullet,
               CAST(ell_lines * 10 <= 3 * n_lines AS BIGINT) AS r_ellipsis,
               CAST(alpha_words * 5 >= 4 * n_words AS BIGINT) AS r_alpha,
               CAST(stop_hits >= 2 AS BIGINT) AS r_stop
        FROM c)
    SELECT doc_id, n_words, n_lines, r_words, r_mwl, r_symbol, r_bullet,
           r_ellipsis, r_alpha, r_stop,
           CAST(r_words = 1 AND r_mwl = 1 AND r_symbol = 1 AND r_bullet = 1
                AND r_ellipsis = 1 AND r_alpha = 1 AND r_stop = 1
                AS BIGINT) AS keep
    FROM f
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="Gopher quality-rule bundle (Rae et al. 2021 document-"
    "shape filters; north star: rule-based quality gating)",
)
def q105_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-shape rule bundle
    (operators.curation.gopher_rules): word-count and mean-word-length
    bounds, symbol-to-word ratio, bullet-line and ellipsis-line
    fractions, alphabetic-word fraction, distinct-stopword floor —
    at the paper's Table A1 defaults (50..100k words, mwl 3..10, the
    8-stopword set), every rule integer-exact and division-free, the
    whole verdict vector a pure map over the scan (zero exchanges;
    r13: defaults aligned to the paper per ADVICE). Bullet headers,
    a trailing-ellipsis line, and '##' symbols are planted on doc_id
    subsets so every rule fires both ways; the oracle recomputes all
    seven flags plus the conjunction per document."""
    from candia_spark.operators.curation import gopher_rules

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.when(
                i % 6 == 0, F.lit("- bullet one\n- bullet two\n")
            ).otherwise(F.lit("")),
            F.when(i % 9 == 0, F.lit("## ")).otherwise(F.lit("")),
            F.col("text"),
            F.when(i % 8 == 0, F.lit("\nthis trails off...")).otherwise(
                F.lit("")
            ),
        ),
    )
    return gopher_rules(aug)


@register(
    "q106_fuzzy_decontaminate",
    # benchmark = the %97 slice (the q45 convention); contamination is
    # PLANTED: each bench doc gets a corpus twin (id + 500000) with its
    # FIRST token swapped — near-identical bigram sets (J ~ 0.9) but
    # not exact, the paraphrase class exact-overlap decontamination
    # misses. The oracle computes cross-set exact Jaccard + the per-doc
    # argmax audit, so LSH recall at the verify threshold is part of
    # the gate (the q27/q54 stance)
    oracle="""
    WITH bench_docs AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    corpus_docs AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 500000,
               regexp_replace(text, '^[^ ]+', 'zzplanted')
        FROM bench_docs),
    toks AS (
        SELECT doc_id, 0 AS is_bench,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM corpus_docs
        UNION ALL
        SELECT doc_id, 1,
               list_filter(string_split(lower(text), ' '), x -> x <> '')
        FROM bench_docs),
    sh AS (
        SELECT DISTINCT doc_id, is_bench,
               t[i] || chr(31) || t[i+1] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 0)))
             AS u(i)),
    sizes AS (SELECT doc_id, is_bench, CAST(COUNT(*) AS BIGINT) AS sz
              FROM sh GROUP BY doc_id, is_bench),
    inter AS (
        SELECT a.doc_id AS cid, b.doc_id AS bid,
               CAST(COUNT(*) AS BIGINT) AS nc
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.is_bench = 0 AND b.is_bench = 1
        GROUP BY 1, 2),
    scored AS (
        SELECT cid, bid, nc,
               CAST(CAST(nc AS DOUBLE) / (sa.sz + sb.sz - nc) AS DOUBLE)
                   AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = cid AND sa.is_bench = 0
        JOIN sizes sb ON sb.doc_id = bid AND sb.is_bench = 1),
    hits AS (SELECT * FROM scored WHERE j >= 0.7)
    SELECT cid AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
           CAST(MAX(j) AS DOUBLE) AS max_jaccard,
           CAST(MIN(CASE WHEN j = mx THEN bid END) AS BIGINT)
               AS worst_bench_id
    FROM (SELECT hits.*, MAX(j) OVER (PARTITION BY cid) AS mx FROM hits)
    GROUP BY cid
    """,
    survey_ref="fuzzy (near-dup) eval decontamination — the third leg "
    "next to exact-overlap q45 and span-coverage q85 (north star)",
)
def q106_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy eval-set decontamination
    (operators.dedup.decontaminate_fuzzy): bipartite banded-minhash
    candidates corpus-vs-benchmark, exact bigram-Jaccard verify >= 0.7,
    aggregated to the drop-list shape (n matches, max jaccard, argmax
    bench item with min-id tie-break). Each %97 bench doc gets a
    planted corpus twin with its first token swapped — near-identical
    shingle sets without exactness, the paraphrase class the exact
    passes (q45/q85) structurally miss."""
    from candia_spark.operators.dedup import decontaminate_fuzzy

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.regexp_replace("text", "^[^ ]+", "zzplanted").alias("text"),
        )
    )
    return decontaminate_fuzzy(corpus, bench, threshold=0.7)


@register(
    "q107_domain_cap",
    # per-registered-domain contribution caps (the FineWeb anti-
    # monoculture stage) as a pure composition: planted four-domain
    # URLs (mixed host casing) -> url_registered_domain -> the q53
    # md5-ranked deterministic cap, keyed on the extracted domain
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id,
               'https://'
               || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site'
                        ELSE 'www.site' END)
               || CAST(doc_id % 4 AS VARCHAR) || '.Com/p/'
               || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
    dom AS (
        SELECT doc_id,
               regexp_extract(
                   lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)),
                   '([^.]+\\.[^.]+)$', 1) AS domain
        FROM aug),
    ranked AS (
        SELECT doc_id, domain,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC) AS BIGINT) AS src_rank
        FROM dom)
    SELECT doc_id, domain, src_rank FROM ranked WHERE src_rank <= 50
    """,
    survey_ref="per-domain contribution cap (FineWeb anti-monoculture "
    "stage; composition of URL domain extraction + deterministic cap)",
)
def q107_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (functions.text.url_registered_domain composed
    with operators.curation.cap_per_source keyed on the extracted
    domain): bound any one web domain's contribution to 50 documents,
    chosen by the deterministic md5(id) rank — the FineWeb-style
    anti-monoculture stage between URL dedup and content dedup. URLs
    planted over four domains with mixed host casing; the oracle
    recomputes extraction + ranking + cap exactly."""
    from candia_spark.functions.text import url_registered_domain
    from candia_spark.operators.curation import cap_per_source

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(i % 3 == 0, F.lit("WWW.Site")).otherwise(F.lit("www.site")),
        (i % 4).cast("string"),
        F.lit(".Com/p/"),
        i.cast("string"),
    )
    withdom = d.withColumn("url", url).withColumn(
        "domain", url_registered_domain("url")
    )
    return cap_per_source(withdom, cap=50, source_col="domain").select(
        "doc_id", "domain", "src_rank"
    )


@register(
    "q108_paragraph_dedup",
    # documents are single-line, so paragraph structure is PLANTED
    # (the q98/q105 augmentation device): a shared cookie banner on
    # %6==0 (cross-doc dup: every copy but the first in corpus order
    # is removed), a shared newsletter paragraph on %4==0, and the
    # doc's OWN text repeated on %9==0 (the intra-doc second
    # occurrence, also removed). concat_ws skips NULLs identically in
    # both engines, so conditional paragraphs need no empty-string
    # splices. The oracle recomputes first-occurrence ownership
    # (min doc, then min pos within that doc) and the ordered rebuild;
    # md5(clean_text) gates every rewritten document.
    oracle="""
    WITH aug AS MATERIALIZED (
        SELECT doc_id,
               concat_ws(chr(10) || chr(10),
                   CASE WHEN doc_id % 6 = 0
                        THEN 'cookie notice please accept' END,
                   text,
                   CASE WHEN doc_id % 4 = 0
                        THEN 'subscribe to our newsletter today' END,
                   CASE WHEN doc_id % 9 = 0 THEN text END) AS text
        FROM documents),
    pl AS MATERIALIZED (
        SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
        FROM aug),
    paras AS MATERIALIZED (
        SELECT doc_id, i - 1 AS pos, ps[i] AS para
        FROM pl, UNNEST(generate_series(1, len(ps))) AS u(i)),
    own1 AS (
        SELECT para, MIN(doc_id) AS od
        FROM paras WHERE para <> '' GROUP BY para),
    own AS MATERIALIZED (
        SELECT p.para, o.od, MIN(p.pos) AS op
        FROM paras p JOIN own1 o ON p.para = o.para AND p.doc_id = o.od
        GROUP BY p.para, o.od),
    kept AS (
        SELECT p.doc_id, p.pos, p.para
        FROM paras p LEFT JOIN own o ON p.para = o.para
        WHERE o.para IS NULL OR (p.doc_id = o.od AND p.pos = o.op)),
    reb AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean
        FROM kept GROUP BY doc_id)
    SELECT l.doc_id, CAST(len(l.ps) AS BIGINT) AS n_paras,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(COALESCE(r.clean, '')) AS clean_md5
    FROM pl l LEFT JOIN reb r USING (doc_id)
    """,
    survey_ref="paragraph-level exact dedup (Dolma's paragraph stage / "
    "C4's sentence ancestor; north star: corpus-wide first-occurrence "
    "rewrite at paragraph granularity)",
)
def q108_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (operators.dedup.paragraph_dedup):
    every paragraph keeps only its first occurrence in (doc, position)
    corpus order — the Dolma pipeline's paragraph stage, sitting
    between doc-level dedup (q25/q56) and q100's k-token-span rewrite.
    Paragraph structure is planted (shared banners cross-doc, the
    doc's own text repeated intra-doc); md5(clean_text) hash-gates
    every rebuilt document, so one mis-owned or mis-ordered paragraph
    anywhere fails the gate. Scale shape: the q98 three-linear-keyed-
    shuffles shape — map-side-combined census, one census join, one
    per-doc ordered rebuild."""
    from candia_spark.operators.dedup import paragraph_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    aug = docs.withColumn(
        "text",
        F.concat_ws(
            "\n\n",
            F.when(i % 6 == 0, F.lit("cookie notice please accept")),
            F.col("text"),
            F.when(i % 4 == 0, F.lit("subscribe to our newsletter today")),
            F.when(i % 9 == 0, F.col("text")),
        ),
    )
    return paragraph_dedup(aug).select(
        "doc_id",
        "n_paras",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q109_perplexity_buckets",
    # reference = the %97 document slice (the q45/q106 convention —
    # CCNet's Wikipedia stand-in); corpus = everything else. lang is a
    # planted mod-3 partition label (a real pipeline feeds q102's
    # langid verdicts; the bucketing is per-partition either way).
    # Token costs are the q84 integer bits(count) device against the
    # REFERENCE census, OOV costs 0; the only float is the final mean
    # bits/token, an IEEE division of identical bigints, and the
    # tertile cut is a ROW_NUMBER + integer-DIV device — no percentile
    # function, no rounding, anywhere.
    oracle="""
    WITH ref AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    vocab AS MATERIALIZED (
        SELECT tok, CAST(length(bin(COUNT(*))) AS BIGINT) AS bits
        FROM (SELECT unnest({toks}) AS tok FROM ref) GROUP BY tok),
    corp AS MATERIALIZED (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS lang,
               {toks} AS t
        FROM documents WHERE doc_id % 97 <> 0),
    toks AS (SELECT doc_id, lang, unnest(t) AS tok FROM corp),
    scored AS MATERIALIZED (
        SELECT t.doc_id, t.lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(COALESCE(v.bits, 0)) AS BIGINT) AS total_bits
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id, t.lang),
    ranked AS (
        SELECT doc_id, lang, n_tokens, total_bits,
               (ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY CAST(total_bits AS DOUBLE) / n_tokens DESC,
                             doc_id ASC) - 1) * 3 AS r3,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scored WHERE n_tokens > 0)
    SELECT doc_id, lang, n_tokens, total_bits,
           CASE r3 // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="CCNet perplexity head/middle/tail split (Wenzek et al. "
    "2020 reference-LM bucketing; north star: model-based quality "
    "partitioning)",
)
def q109_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality bucketing
    (operators.curation.perplexity_buckets, engine='rank' — the exact
    certified cut; engine='approx' is the linear deploy path): score
    every corpus document under the REFERENCE slice's integer-bits
    unigram model (the q84 device pointed at an external reference,
    OOV = 0 bits) and cut each language into exact tertiles by mean
    bits-per-token via ROW_NUMBER + integer DIV. The oracle recomputes
    census, scoring, and the per-language rank cut; one swapped rank
    anywhere flips a bucket label and fails the gate."""
    from candia_spark.operators.curation import perplexity_buckets

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    ref = docs.filter(i % 97 == 0)
    corpus = docs.filter(i % 97 != 0).withColumn(
        "lang",
        F.when(i % 3 == 0, F.lit("en"))
        .when(i % 3 == 1, F.lit("de"))
        .otherwise(F.lit("fr")),
    )
    return perplexity_buckets(corpus, ref, lang_col="lang")


@register(
    "q110_int8_topk",
    # int8 scalar quantization (the production ANN memory lever): both
    # sides unit-normalized in double, floor-quantized to [-127, 127]
    # bigints, scored by the INTEGER dot product — float -> double
    # widening, IEEE division, and floor are engine-exact, so unlike
    # the float-cosine q30 family no ROUND device is needed; scores,
    # ranks, and ties (score desc, id asc) are exact by construction.
    oracle="""
    WITH nrm AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv
        FROM embeddings),
    qz AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) / nv * 127) AS BIGINT))
                   AS qv
        FROM nrm),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               CAST(SUM(q.qv[i] * c.qv[i]) AS BIGINT) AS score
        FROM qz q, qz c, UNNEST(generate_series(1, len(q.qv))) AS u(i)
        WHERE q.vec_id % 61 = 0
        GROUP BY q.vec_id, c.vec_id)
    SELECT query_id, vec_id, score, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, vec_id ASC) AS rnk FROM dots)
    WHERE rnk <= 5
    """,
    survey_ref="int8-quantized ANN top-k (scalar quantization — the "
    "compressed scoring kernel of a production vector path; north "
    "star: similarity search at memory scale)",
)
def q110_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-k (operators.similarity
    .cosine_topk_int8 over quantize_int8): unit-normalize, floor-
    quantize to [-127, 127], rank by the bigint dot product — 4x less
    vector memory and shuffle bandwidth than float32 brute force, and
    the first similarity query whose scores are INTEGERS, so the gate
    needs no rounding device at all. Queries = every 61st vector,
    k=5; the oracle replicates quantization and integer scoring
    element-for-element."""
    from candia_spark.operators.similarity import cosine_topk_int8

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_int8(emb, qs, k=5)


# ===========================================================================
# r13 additions: web extraction, contrastive mining, training writes,
# mixture planning, entropy signals, product quantization — q111..q116
# ===========================================================================


def _sql_lit(s: str) -> str:
    """A DuckDB string literal for ``s`` (newline via chr(10) — standard
    SQL strings have no backslash escapes, so patterns pass through
    verbatim)."""
    if s == "\n":
        return "chr(10)"
    return "'" + s.replace("'", "''") + "'"


def _html_clean_sql(expr: str) -> str:
    """The DuckDB rendering of curation.html_clean_text over ``expr`` —
    generated from the SAME pattern tables the Spark column uses, so the
    two engines cannot drift (every pattern is in the Java-regex/RE2
    common subset; DuckDB needs the explicit 'g' option where Spark's
    regexp_replace is global by default)."""
    from candia_spark.operators.curation import (
        HTML_COLLAPSE_STEPS,
        HTML_ENTITIES,
        HTML_STRIP_STEPS,
    )

    c = expr
    for pat, rep in HTML_STRIP_STEPS:
        c = f"regexp_replace({c}, {_sql_lit(pat)}, {_sql_lit(rep)}, 'g')"
    for ent, ch in HTML_ENTITIES:
        c = f"replace({c}, {_sql_lit(ent)}, {_sql_lit(ch)})"
    for pat, rep in HTML_COLLAPSE_STEPS:
        c = f"regexp_replace({c}, {_sql_lit(pat)}, {_sql_lit(rep)}, 'g')"
    return f"trim({c}, ' ' || chr(10) || chr(9))"


# The planted HTML envelope (q98/q105/q108 augmentation device): the
# documents table is plain text, so the markup is built in-plan — a head
# with title/style/script (payload must vanish wholesale, including a
# decoy '</div>' inside a script string), a comment holding decoy tags,
# entities of every supported kind, and a mod-5 list block so line
# structure varies per doc.
_HTML_ENVELOPE_SQL = (
    "'<!DOCTYPE html><html><head><title> Doc ' || doc_id || "
    "' </title><style type=\"text/css\">p { color: red; }</style>"
    "<SCRIPT>var x = 1 < 2 && \"</div>\";</SCRIPT></head>"
    "<body><!-- draft: <p>' || source || '</p> --><h1>' || source || "
    "'</h1>\n<p>' || text || "
    "' &amp;co &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p>' || "
    "CASE WHEN doc_id % 5 = 0 "
    "THEN '<ul><li>item one</li><li>item two</li></ul>' ELSE '' END || "
    "'<div>tail ' || doc_id || '</div></body></html>'"
)


@register(
    "q111_html_extract",
    # The oracle's strip chain is RENDERED from the operator's own
    # pattern tables (_html_clean_sql), so the gate certifies that the
    # Java-regex and RE2 executions of the same patterns agree byte for
    # byte; md5(clean_text) gates every extracted document, and n_lines
    # gates the block-tag -> newline structure.
    oracle=f"""
    WITH h AS MATERIALIZED (
        SELECT doc_id, {_HTML_ENVELOPE_SQL} AS html FROM documents),
    x AS (
        SELECT doc_id,
               trim(coalesce(regexp_extract(html,
                    '(?is)<title[^>]*>(.*?)</title>', 1), '')) AS title,
               {_html_clean_sql('html')} AS clean
        FROM h)
    SELECT doc_id, title,
           CASE WHEN clean = '' THEN 0
                ELSE CAST(len(string_split(clean, chr(10))) AS BIGINT)
           END AS n_lines,
           CAST(length(clean) AS BIGINT) AS n_chars,
           md5(clean) AS clean_md5
    FROM x
    """,
    survey_ref="HTML->text extraction (web pipeline step zero; north "
    "star: trafilatura/resiliparse extraction as a deterministic, "
    "oracle-checkable column chain)",
)
def q111_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> visible-text extraction (operators.curation
    .extract_html_text): strip comments, script/style/title payloads,
    and tags (block closers become newlines), decode core entities,
    collapse whitespace. The markup is planted in-plan (title + script
    with a decoy close tag + comment with decoy tags + every supported
    entity + a mod-5 list block); md5(clean_text) hash-gates every
    document, so one mis-stripped byte anywhere fails the gate. Pure
    per-row regexp chain: no shuffle, no UDF — the plan IS the 100 TB
    plan."""
    from candia_spark.operators.curation import extract_html_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    i = F.col("doc_id")
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title> Doc "),
        i.cast("string"),
        F.lit(' </title><style type="text/css">p { color: red; }</style>'),
        F.lit('<SCRIPT>var x = 1 < 2 && "</div>";</SCRIPT></head>'),
        F.lit("<body><!-- draft: <p>"),
        F.col("source"),
        F.lit("</p> --><h1>"),
        F.col("source"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit(" &amp;co &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p>"),
        F.when(
            i % 5 == 0, F.lit("<ul><li>item one</li><li>item two</li></ul>")
        ).otherwise(F.lit("")),
        F.lit("<div>tail "),
        i.cast("string"),
        F.lit("</div></body></html>"),
    )
    out = extract_html_text(docs.select("doc_id", html.alias("html")))
    return out.select(
        "doc_id",
        "title",
        "n_lines",
        "n_chars",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


# int8 quantization CTEs shared by the q112/q116 oracles (q110's device).
_INT8_NRM_SQL = """
    nrm AS MATERIALIZED (
        SELECT vec_id, label, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv
        FROM embeddings),
    qz AS MATERIALIZED (
        SELECT vec_id, label,
               list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) / nv * 127) AS BIGINT))
                   AS qv
        FROM nrm)
"""


@register(
    "q112_hard_negatives",
    # Same integer-exact int8 device as q110 — scores are bigints, so
    # rank and tie-break (score desc, id asc) are exact with no rounding
    # device; the label inequality is the positive-pair exclusion.
    oracle=f"""
    WITH {_INT8_NRM_SQL},
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neg_id, c.label,
               CAST(SUM(q.qv[i] * c.qv[i]) AS BIGINT) AS score
        FROM qz q, qz c, UNNEST(generate_series(1, len(q.qv))) AS u(i)
        -- IS DISTINCT FROM mirrors the operator's null-safe inequality:
        -- a NULL-label corpus row IS a negative for every labeled query
        -- (a bare <> would drop it), two NULLs are the same class.
        WHERE q.vec_id % 53 = 0 AND c.label IS DISTINCT FROM q.label
        GROUP BY q.vec_id, c.vec_id, c.label)
    SELECT query_id, neg_id, label, score, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, neg_id ASC) AS rnk FROM dots)
    WHERE rnk <= 5
    """,
    survey_ref="hard-negative mining (contrastive training data — the "
    "dense-retriever/CLIP negative-selection stage; north star: "
    "boundary-adjacent negatives at corpus scale)",
)
def q112_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators.similarity.mine_hard_negatives):
    for every query vector (every 53rd), the 5 most-similar corpus
    vectors of a DIFFERENT label — the contrastive-training negatives
    that sit closest to the decision boundary. Scored under the q110
    int8 device, so scores are integers and the gate is exact with no
    rounding anywhere. Queries broadcast; the corpus never shuffles."""
    from candia_spark.operators.similarity import mine_hard_negatives

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    qs = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return mine_hard_negatives(emb, qs, k=5)


@register(
    "q116_pq_topk",
    # Product quantization with a DETERMINISTIC codebook (the int8
    # subvectors of the 16 smallest-id corpus vectors — k-means training
    # is certified separately by the q57/q60/q63 family), so encode +
    # LUT + ADC are oracle-recomputable end to end; every distance is a
    # bigint (integer L2 over int8 lanes), so assignment argmins, ADC
    # sums, ranks, and ties are exact with no rounding device.
    oracle=f"""
    WITH {_INT8_NRM_SQL},
    cb0 AS (
        SELECT qv, ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS code
        FROM qz ORDER BY vec_id ASC LIMIT 16),
    cb AS MATERIALIZED (
        SELECT CAST(s AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
               list_slice(qv, s * 8 + 1, (s + 1) * 8) AS cw
        FROM cb0, UNNEST(generate_series(0, 7)) AS g(s)),
    subs AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub,
               list_slice(qv, s * 8 + 1, (s + 1) * 8) AS sv
        FROM qz, UNNEST(generate_series(0, 7)) AS g(s)),
    dists AS (
        SELECT v.vec_id, v.sub, c.code,
               CAST(SUM((v.sv[i] - c.cw[i]) * (v.sv[i] - c.cw[i]))
                    AS BIGINT) AS d
        FROM subs v JOIN cb c ON v.sub = c.sub,
             UNNEST(generate_series(1, 8)) AS u(i)
        GROUP BY v.vec_id, v.sub, c.code),
    enc AS MATERIALIZED (
        SELECT vec_id, sub, MIN({{'d': d, 'code': code}}).code AS code
        FROM dists GROUP BY vec_id, sub),
    lut AS MATERIALIZED (
        SELECT vec_id AS query_id, sub, code, d
        FROM dists WHERE vec_id % 59 = 0),
    scored AS (
        SELECT l.query_id, e.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
        FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        GROUP BY l.query_id, e.vec_id)
    SELECT query_id, vec_id, dist, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist ASC, vec_id ASC) AS rnk FROM scored)
    WHERE rnk <= 5
    """,
    survey_ref="product-quantization ADC top-k (Jegou et al. 2011 "
    "IVFADC scoring kernel; north star: billion-vector ANN at m bytes "
    "per vector)",
)
def q116_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ top-k with asymmetric distance computation
    (operators.similarity.pq_topk_adc): the corpus is PQ-encoded to
    m=8 codes over 16 deterministic codewords per subspace; each query
    (every 59th vector) precomputes an integer L2 lookup table; a
    candidate's distance is the sum of 8 lookups — the float payload is
    touched once at encode time, search reads only the codes. The
    oracle replicates codebook, assignment argmin (struct-min, ties ->
    smallest code), LUT, ADC sum, and rank; one wrong code anywhere
    reorders a rank and fails the gate."""
    from candia_spark.operators.similarity import pq_topk_adc

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 59 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_adc(emb, qs, k=5, m=8, codewords=16)


@register(
    "q113_deterministic_shuffle",
    # shard = md5(salt:id) % 8 via the cross-engine 60-bit device;
    # pos = rank of the full digest within the shard (ties -> id). The
    # permutation is a pure function of (id, salt) — the reproducibility
    # contract a training write needs and rand() cannot give.
    oracle="""
    WITH k AS MATERIALIZED (
        SELECT doc_id,
               md5('ep0:' || CAST(doc_id AS VARCHAR)) AS key
        FROM documents),
    s AS (
        SELECT doc_id, key,
               CAST('0x' || substr(key, 1, 15) AS BIGINT) % 8 AS shard
        FROM k)
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                ORDER BY key ASC, doc_id ASC) - 1 AS BIGINT) AS pos
    FROM s
    """,
    survey_ref="deterministic training shuffle + shard assignment "
    "(reproducible global permutation for training writes; north star: "
    "epoch-salted corpus shuffling without a global sort)",
)
def q113_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle (operators.sampling
    .deterministic_shuffle): every document gets a (shard, pos) slot
    that is a pure function of (doc_id, salt='ep0') — re-running after
    a retry or repartition reproduces the identical training order,
    and a new salt draws an independent permutation (the epoch knob).
    One keyed shuffle, shard-local sorts, no global total order in the
    plan. The oracle recomputes the full permutation; one transposed
    row anywhere fails the gate."""
    from candia_spark.operators.sampling import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, n_shards=8, salt="ep0")


@register(
    "q114_mixture_plan",
    # integer-only arithmetic: floor-div targets, ceil-div epochs via
    # the add-den-minus-one device; the inner join against the VALUES
    # weight table IS the mixture's source selection.
    oracle="""
    WITH w(source, weight) AS (
        VALUES ('src0', CAST(3 AS BIGINT)), ('src1', CAST(2 AS BIGINT)),
               ('src12', CAST(4 AS BIGINT)), ('src5', CAST(5 AS BIGINT)),
               ('src7', CAST(1 AS BIGINT))),
    avail AS MATERIALIZED (
        SELECT source,
               CAST(SUM(len({toks})) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source)
    SELECT a.source, w.weight, a.available_tokens,
           CAST((w.weight * 100000) // 15 AS BIGINT) AS target_tokens,
           CASE WHEN a.available_tokens <= 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(((w.weight * 100000) // 15
                     + a.available_tokens - 1) // a.available_tokens
                     AS BIGINT)
           END AS epochs
    FROM avail a JOIN w USING (source)
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="mixture/epoch token-budget planning (DoReMi/Pile-style "
    "mixture table as an executable plan; north star: data-budget "
    "planning for a 100 TB mix)",
)
def q114_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning (operators.curation.mixture_epoch_plan): given
    integer mixture weights over 5 of the 20 sources and a 100k-token
    budget, compute per source the available token mass, the floor-div
    target allocation, and the ceil-div epoch count — the passes-over-
    Wikipedia number every mixture paper reports. All-integer
    arithmetic; one map-side-combined census + one broadcast join."""
    from candia_spark.operators.curation import mixture_epoch_plan

    docs = _t(spark, sf_dir, "documents").select("source", "text")
    weights = {"src0": 3, "src1": 2, "src5": 5, "src7": 1, "src12": 4}
    return mixture_epoch_plan(docs, weights, budget_tokens=100000)


@register(
    "q115_char_entropy",
    # the integer-bits entropy surrogate: sum_c cnt_c*(bitlen(N)-
    # bitlen(cnt_c)) — log2 is BANNED from gates (JVM vs libm last-ulp
    # divergence on ~28% of integer inputs, measured r13), bitlen is
    # exact on both engines. The census itself is the no-explode
    # length-replace device, mirrored per distinct char.
    oracle="""
    WITH cs AS MATERIALIZED (
        SELECT doc_id, text, length(text) AS n,
               list_filter(list_distinct(string_split(text, '')),
                           c -> c <> '') AS dis
        FROM documents),
    cnts AS (
        SELECT doc_id, n,
               len(dis) AS n_distinct,
               list_transform(dis,
                   c -> CAST(n - length(replace(text, c, ''))
                        AS BIGINT)) AS cnt
        FROM cs)
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(COALESCE(list_max(cnt), 0) AS BIGINT) AS top_char_count,
           CAST(COALESCE(list_sum(list_transform(cnt,
                c -> c * (length(bin(CAST(n AS BIGINT)))
                          - length(bin(c))))), 0) AS BIGINT)
               AS entropy_bits
    FROM cnts
    """,
    survey_ref="character-entropy quality signals (integer-exact "
    "entropy surrogate; north star: low-entropy/garbage filtering in "
    "web curation)",
)
def q115_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level entropy quality signals (functions.text
    .char_census_counts / char_entropy_bits): per-document distinct
    chars, top-char count, and the integer-bits entropy surrogate that
    low-entropy filters cut on. Pure per-row HOFs — O(D*N) work per
    row, ZERO exchange, no char-explode (the plan that would shuffle
    one row per character of a 100 TB corpus). Exact integers end to
    end: the float log2 was measured to diverge cross-engine in the
    last ulp, so the gate uses bitlen."""
    from candia_spark.functions.text import (
        char_census_counts,
        char_entropy_bits,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.length("text").cast("bigint")
    # census materialized ONCE as a column — three projections off it,
    # not three recomputations of the O(D*N) HOF
    c = docs.select(
        "doc_id", n.alias("n_chars"), char_census_counts("text").alias("__cnt")
    )
    return c.select(
        "doc_id",
        "n_chars",
        F.size("__cnt").cast("bigint").alias("n_distinct"),
        F.coalesce(F.array_max("__cnt"), F.lit(0))
        .cast("bigint")
        .alias("top_char_count"),
        F.coalesce(char_entropy_bits(F.col("__cnt"), F.col("n_chars")), F.lit(0))
        .cast("bigint")
        .alias("entropy_bits"),
    )


@register(
    "q117_jl_projection",
    # The +-1 matrix is md5-parity-derived from 'jl:i:j' strings, so the
    # oracle RECOMPUTES the matrix the Spark plan inlined as literals
    # (hashlib md5 == SQL md5 on the same bytes) — the whole projection
    # is integer (int8 lanes x Rademacher signs), no rounding device.
    oracle=f"""
    WITH {_INT8_NRM_SQL},
    signs AS MATERIALIZED (
        SELECT i, j,
               CASE WHEN CAST('0x' || substr(
                        md5('jl:' || i || ':' || j), 1, 1) AS INT) % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM generate_series(0, 63) t(i), generate_series(0, 15) u(j))
    SELECT q.vec_id, CAST(g.j AS BIGINT) AS dim,
           CAST(SUM(q.qv[g.i + 1] * g.s) AS BIGINT) AS value
    FROM qz q, signs g
    GROUP BY q.vec_id, g.j
    """,
    survey_ref="Johnson-Lindenstrauss signed-sum projection (Achlioptas "
    "2003 Rademacher JL; north star: dimension reduction feeding "
    "LSH/k-means/PQ at 4x fewer lanes)",
)
def q117_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact JL projection (operators.similarity
    .jl_project_int8): 64 int8 lanes -> 16 bigint lanes through a
    deterministic +-1 matrix (md5-parity of 'jl:i:j'). The matrix is a
    plan literal, so the operator is a pure zero-exchange map; the
    oracle recomputes the same matrix from the same strings via SQL
    md5. Output exploded to (vec_id, dim, value) — one wrong sign
    anywhere flips a value and fails the gate."""
    from candia_spark.operators.similarity import jl_project_int8

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # output='long' emits (id, dim, value) via stack — each lane
    # evaluates ONCE per input row; a posexplode over the array form
    # collapses the projection into the Generate and re-evaluates all
    # 16 lanes per output row (measured 18 s vs 4 s at sf0.1, r13)
    return jl_project_int8(
        emb, in_dim=64, out_dim=16, salt="jl", output="long"
    )


@register(
    "q118_whole_doc_packing",
    # The per-shard greedy is replayed by a RECURSIVE CTE (the unrolled-
    # trajectory stance the BPE trainer set): state (open seq, fill)
    # advances row by row in (shard, doc_id) order; every branch of the
    # greedy (fits / overflows / oversize-alone) is a CASE arm. budget
    # 60 makes all three branches fire on the real token distribution.
    oracle="""
    WITH RECURSIVE d AS (
        SELECT source AS shard, doc_id,
               CAST(len({toks}) AS BIGINT) AS n_tok,
               ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY doc_id) AS rn
        FROM documents),
    walk AS (
        SELECT shard, doc_id, n_tok, rn,
               0 AS seq_id, 0 AS off,
               CASE WHEN n_tok > 60 THEN 60 ELSE n_tok END AS kept,
               CASE WHEN n_tok > 60 THEN 1 ELSE 0 END AS nxt_seq,
               CASE WHEN n_tok > 60 THEN 0 ELSE n_tok END AS nxt_fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT n.shard, n.doc_id, n.n_tok, n.rn,
               CASE WHEN n.n_tok > 60 THEN w.nxt_seq
                         + CASE WHEN w.nxt_fill > 0 THEN 1 ELSE 0 END
                    WHEN w.nxt_fill + n.n_tok <= 60 THEN w.nxt_seq
                    ELSE w.nxt_seq + 1 END,
               CASE WHEN n.n_tok > 60 THEN 0
                    WHEN w.nxt_fill + n.n_tok <= 60 THEN w.nxt_fill
                    ELSE 0 END,
               CASE WHEN n.n_tok > 60 THEN 60 ELSE n.n_tok END,
               CASE WHEN n.n_tok > 60 THEN w.nxt_seq
                         + CASE WHEN w.nxt_fill > 0 THEN 1 ELSE 0 END + 1
                    WHEN w.nxt_fill + n.n_tok <= 60 THEN w.nxt_seq
                    ELSE w.nxt_seq + 1 END,
               CASE WHEN n.n_tok > 60 THEN 0
                    WHEN w.nxt_fill + n.n_tok <= 60
                         THEN w.nxt_fill + n.n_tok
                    ELSE n.n_tok END
        FROM walk w JOIN d n ON n.shard = w.shard AND n.rn = w.rn + 1)
    SELECT shard, doc_id, n_tok AS n_tokens,
           CAST(seq_id AS BIGINT) AS seq_id,
           CAST(off AS BIGINT) AS offset_in_seq,
           CAST(kept AS BIGINT) AS kept_tokens
    FROM walk
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="whole-document greedy packing (SFT-style no-straddle "
    "sequence assembly; north star: instruction-tuning batch packing "
    "that never splits a document)",
)
def q118_whole_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document packing (operators.curation.pack_sequences_whole):
    per source shard, documents fill 60-token training sequences in id
    order; an overflowing doc closes the sequence, an oversize doc sits
    alone truncated — q51's concat-and-chunk sibling for the pipelines
    that must not straddle. The greedy runs as an Arrow grouped-map
    over 16-byte (id, n_tokens) rows (text never enters the UDF); the
    oracle replays the full per-shard state walk as a recursive CTE, so
    one misplaced document anywhere derails every later seat in its
    shard and fails the gate."""
    from candia_spark.operators.curation import pack_sequences_whole

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    return pack_sequences_whole(docs, budget=60)


def _q119_oracle() -> str:
    """IVFADC as pure SQL: the q38 coarse-cell device (argmax-dot cells
    over the pinned literal centroids, first-max corpus tie-break,
    reverse-sorted query probes) composed with the q116 PQ device
    (first-k codebook, struct-min assignment, integer L2 LUT, ADC sum).
    Scoring is restricted to probed cells by the probes⋈cells join."""
    from candia_spark.plans.ivf_pinned import PINNED_CENTROIDS_8x64

    rows = ",\n        ".join(
        f"({i + 1}, {_vec_sql(c)})" for i, c in enumerate(PINNED_CENTROIDS_8x64)
    )
    return f"""
    WITH cent(cid, cvec) AS (VALUES
        {rows}),
    {_INT8_NRM_SQL},
    e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cell_scores AS MATERIALIZED (
        SELECT e.vec_id, cent.cid, list_dot_product(e.v, cent.cvec) AS dot
        FROM e CROSS JOIN cent),
    cells AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY dot DESC, cid ASC) AS r
            FROM cell_scores)
        WHERE r = 1),
    probes AS (
        SELECT vec_id AS query_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY dot DESC, cid DESC) AS r
            FROM cell_scores WHERE vec_id % 47 = 0)
        WHERE r <= 3),
    cb0 AS (
        SELECT qv, ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS code
        FROM qz ORDER BY vec_id ASC LIMIT 16),
    cb AS MATERIALIZED (
        SELECT CAST(s AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
               list_slice(qv, s * 8 + 1, (s + 1) * 8) AS cw
        FROM cb0, UNNEST(generate_series(0, 7)) AS g(s)),
    subs AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub,
               list_slice(qv, s * 8 + 1, (s + 1) * 8) AS sv
        FROM qz, UNNEST(generate_series(0, 7)) AS g(s)),
    dists AS (
        SELECT v.vec_id, v.sub, c.code,
               CAST(SUM((v.sv[i] - c.cw[i]) * (v.sv[i] - c.cw[i]))
                    AS BIGINT) AS d
        FROM subs v JOIN cb c ON v.sub = c.sub,
             UNNEST(generate_series(1, 8)) AS u(i)
        GROUP BY v.vec_id, v.sub, c.code),
    enc AS MATERIALIZED (
        SELECT vec_id, sub, MIN({{'d': d, 'code': code}}).code AS code
        FROM dists GROUP BY vec_id, sub),
    encc AS (
        SELECT enc.vec_id, enc.sub, enc.code, cells.cid
        FROM enc JOIN cells USING (vec_id)),
    lut AS MATERIALIZED (
        SELECT vec_id AS query_id, sub, code, d
        FROM dists WHERE vec_id % 47 = 0),
    cand AS (
        SELECT p.query_id, ec.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
        FROM probes p
        JOIN encc ec ON ec.cid = p.cid
        JOIN lut l ON l.query_id = p.query_id
                  AND l.sub = ec.sub AND l.code = ec.code
        GROUP BY p.query_id, ec.vec_id)
    SELECT query_id, vec_id, dist, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist ASC, vec_id ASC) AS rnk FROM cand)
    WHERE rnk <= 5
    """


@register(
    "q119_pq_ivf_topk",
    oracle=_q119_oracle(),
    survey_ref="IVF+PQ composed index (the full IVFADC layout — coarse "
    "cells prune, m-byte codes score; north star: billion-vector ANN)",
)
def q119_pq_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVFADC index (operators.similarity.pq_topk_ivf): the
    q38 pinned coarse cells prune candidates (~nprobe/n_cells of the
    corpus per query), the q116 PQ codes score them with integer ADC
    sums — search touches neither the float payload nor unprobed
    cells. Queries = every 47th vector, nprobe=3, k=5. The oracle
    composes the two certified devices and re-walks cell assignment,
    probing, encoding, LUT, ADC, and rank end to end."""
    import numpy as np

    from candia_spark.operators.similarity import pq_topk_ivf
    from candia_spark.plans.ivf_pinned import PINNED_CENTROIDS_8x64

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 47 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_ivf(
        emb,
        qs,
        centroids=np.array(PINNED_CENTROIDS_8x64, dtype=np.float64),
        k=5,
        m=8,
        codewords=16,
        nprobe=3,
    )


@register(
    "q120_web_curate_chain",
    # Stage COMPOSITION gate: the q111 extraction chain feeds the q108
    # dedup machinery at line granularity (sep = \n, C4's line-dedup
    # shape) inside ONE plan, and the oracle replays both stages back
    # to back — extraction rendered from the operator's own pattern
    # tables, then first-occurrence line ownership + ordered rebuild.
    # The markup plants cross-doc duplicate lines (every doc of a
    # source shares its h1; %5 docs share the list items), so the
    # dedup has real mass only the composed chain can compute.
    oracle=f"""
    WITH h AS MATERIALIZED (
        SELECT doc_id, {_HTML_ENVELOPE_SQL} AS html FROM documents),
    x AS MATERIALIZED (
        SELECT doc_id, {_html_clean_sql('html')} AS text FROM h),
    pl AS MATERIALIZED (
        SELECT doc_id, string_split(text, chr(10)) AS ps FROM x),
    paras AS MATERIALIZED (
        SELECT doc_id, i - 1 AS pos, ps[i] AS para
        FROM pl, UNNEST(generate_series(1, len(ps))) AS u(i)),
    own1 AS (
        SELECT para, MIN(doc_id) AS od
        FROM paras WHERE para <> '' GROUP BY para),
    own AS MATERIALIZED (
        SELECT p.para, o.od, MIN(p.pos) AS op
        FROM paras p JOIN own1 o ON p.para = o.para AND p.doc_id = o.od
        GROUP BY p.para, o.od),
    kept AS (
        SELECT p.doc_id, p.pos, p.para
        FROM paras p LEFT JOIN own o ON p.para = o.para
        WHERE o.para IS NULL OR (p.doc_id = o.od AND p.pos = o.op)),
    reb AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(para, chr(10) ORDER BY pos) AS clean
        FROM kept GROUP BY doc_id)
    SELECT l.doc_id, CAST(len(l.ps) AS BIGINT) AS n_paras,
           COALESCE(r.n_kept, 0) AS n_kept,
           md5(COALESCE(r.clean, '')) AS clean_md5
    FROM pl l LEFT JOIN reb r USING (doc_id)
    """,
    survey_ref="composed web-curation chain (HTML extraction -> line "
    "dedup in one certified plan; north star: the C4/Dolma stage "
    "pipeline as a single gated dataflow)",
)
def q120_web_curate_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed web-curation chain: plant the q111 markup envelope,
    extract visible text (operators.curation.extract_html_text), then
    line-level corpus dedup (operators.dedup.paragraph_dedup with
    sep='\\n' — C4's line-dedup shape) — two certified operators
    composed in ONE plan and gated END TO END by md5(clean_text).
    Every doc of a source shares its h1 line and %5 docs share list
    items, so only the corpus-first occurrence of each survives. A
    regression in either stage, or in how they compose (schema, null
    handling, separator discipline), fails the gate."""
    from candia_spark.operators.curation import extract_html_text
    from candia_spark.operators.dedup import paragraph_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    i = F.col("doc_id")
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title> Doc "),
        i.cast("string"),
        F.lit(' </title><style type="text/css">p { color: red; }</style>'),
        F.lit('<SCRIPT>var x = 1 < 2 && "</div>";</SCRIPT></head>'),
        F.lit("<body><!-- draft: <p>"),
        F.col("source"),
        F.lit("</p> --><h1>"),
        F.col("source"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit(" &amp;co &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p>"),
        F.when(
            i % 5 == 0, F.lit("<ul><li>item one</li><li>item two</li></ul>")
        ).otherwise(F.lit("")),
        F.lit("<div>tail "),
        i.cast("string"),
        F.lit("</div></body></html>"),
    )
    extracted = extract_html_text(
        docs.select("doc_id", html.alias("html"))
    ).select("doc_id", F.col("clean_text").alias("text"))
    out = paragraph_dedup(extracted, sep="\n")
    return out.select(
        "doc_id",
        "n_paras",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "q121_blocklist_filter",
    # the padded-space phrase device: normalize once (lowercase,
    # non-alnum -> space, collapse, pad), then a word-bounded phrase
    # hit is position(' p ') > 0 — no \b metachar (only ASCII-safe in
    # the Java/RE2 common subset), no alternation regex. Blocklist:
    # one single word ('slow' — must NOT fire inside 'slowly'), one
    # PUNCTUATED phrase ('Merge-Batch!' — the r13 ADVICE gap: phrases
    # must normalize by the SAME rule as the text, and this one has
    # real corpus hits so the gate fails if they don't), one absent
    # word. The oracle tests the hand-normalized forms.
    oracle="""
    WITH n AS MATERIALIZED (
        SELECT doc_id,
               ' ' || trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) || ' '
                   AS t
        FROM documents),
    h AS (
        SELECT doc_id,
               CASE WHEN position(' merge batch ' IN t) > 0
                    THEN 1 ELSE 0 END AS h0,
               CASE WHEN position(' nosuchword ' IN t) > 0
                    THEN 1 ELSE 0 END AS h1,
               CASE WHEN position(' slow ' IN t) > 0
                    THEN 1 ELSE 0 END AS h2
        FROM n)
    SELECT doc_id,
           CAST(h0 + h1 + h2 AS BIGINT) AS n_hits,
           CASE WHEN h0 = 1 THEN 'merge batch'
                WHEN h1 = 1 THEN 'nosuchword'
                WHEN h2 = 1 THEN 'slow' ELSE '' END AS first_hit,
           (h0 + h1 + h2) > 0 AS blocked
    FROM h
    """,
    survey_ref="blocklist phrase gate (C4's bad-words page filter; "
    "north star: word-bounded multi-phrase screening without regex "
    "alternation)",
)
def q121_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate (operators.curation.blocklist_filter):
    flag documents containing any blocklist phrase as a word-bounded,
    case/punctuation-insensitive match via the padded-space device —
    'slow' does not fire inside 'slowly', and the punctuated phrase
    'Merge-Batch!' matches through the SAME normalization the text
    gets (-> 'merge batch', with real corpus hits). One normalize
    projection shared by every phrase test; pure map, zero exchanges.
    The oracle mirrors normalize + position tests phrase for phrase
    on the hand-normalized forms."""
    from candia_spark.operators.curation import blocklist_filter

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # trim in the oracle == collapse-then-pad here: both yield single
    # interior spaces with exactly one sentinel space at each end
    return blocklist_filter(
        docs, ["Merge-Batch!", "slow", "nosuchword"]
    )


def _pq_train_cte_parts(
    m: int = 8, codewords: int = 16, iters: int = 2, dsub: int = 8,
    px: str = "", src: str = "qz",
) -> list:
    """CTE fragments replaying the per-subspace PQ k-means train +
    corpus encode (the q57 unrolled-trajectory device with ``sub`` as
    an extra grouping key everywhere; round-half-up integer codebook
    via the same pure floor device as the Spark trainer). Shared by
    the q122, q124, and q127 oracles; ``px`` prefixes every CTE name so
    the chain composes next to the coarse-kmeans CTEs, which own the
    unprefixed cent{{i}}/dist{{i}}/assign{{i}} names. ``src`` names the
    (vec_id, qv array<bigint>) CTE the trainer reads — ``qz`` (from
    _INT8_NRM_SQL) for raw int8 lanes, or a residual-lane CTE (q127).
    Ends with ``{{px}}enc`` = (vec_id, sub, code) and keeps
    ``{{px}}dists``/``{{px}}cb`` in scope for LUT construction."""
    parts = [
        f"""
    {px}lanes AS MATERIALIZED (
        SELECT vec_id,
               CAST(floor((i - 1) / {dsub}) AS BIGINT) AS sub,
               CAST((i - 1) % {dsub} AS BIGINT) AS pos,
               qv[i] AS v
        FROM {src}, UNNEST(generate_series(1, len(qv))) AS u(i)),
    {px}ids AS (
        -- codeword seeds come from the TRAINING frame's own id set
        -- ({src}) — identical to the full table for the all-corpus
        -- oracles, and the base split for q131's frozen training
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
        FROM (SELECT vec_id FROM {src} ORDER BY vec_id
              LIMIT {codewords}) t),
    {px}cent0 AS (
        SELECT l.sub, i.code, l.pos, l.v AS s, CAST(1 AS BIGINT) AS n
        FROM {px}lanes l JOIN {px}ids i USING (vec_id))""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    {px}dist{i} AS (
        -- d stays HUGEINT (exact SUM) mirroring the Spark decimal(38,0)
        -- accumulator; both engines round the SAME exact integer ratio
        SELECT l.vec_id, l.sub, c.code,
               SUM((c.n * l.v - c.s) * (c.n * l.v - c.s)) AS d,
               MAX(c.n) AS n
        FROM {px}lanes l
        JOIN {px}cent{i - 1} c ON c.sub = l.sub AND c.pos = l.pos
        GROUP BY 1, 2, 3),
    {px}assign{i} AS (
        SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE)
                                    ASC,
                                code ASC) AS rn
            FROM {px}dist{i}) t
        WHERE rn = 1),
    {px}cent{i} AS MATERIALIZED (
        SELECT a.sub, a.code, l.pos, CAST(SUM(l.v) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM {px}assign{i} a
        JOIN {px}lanes l ON l.vec_id = a.vec_id AND l.sub = a.sub
        GROUP BY 1, 2, 3)""",
        )
    parts.append(
        f"""
    {px}cb AS MATERIALIZED (
        -- round-half-up mean: the identical pure floor((2s+n)/(2n))
        -- device the trainer applies, so codeword lanes are integers
        SELECT sub, code,
               list(CAST(floor(CAST(2 * s + n AS DOUBLE)
                                   / CAST(2 * n AS DOUBLE)) AS BIGINT)
                    ORDER BY pos) AS cw
        FROM {px}cent{iters} GROUP BY sub, code),
    {px}subsq AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub,
               list_slice(qv, s * {dsub} + 1, (s + 1) * {dsub}) AS sv
        FROM {src}, UNNEST(generate_series(0, {m - 1})) AS g(s)),
    {px}dists AS (
        SELECT v.vec_id, v.sub, c.code,
               CAST(SUM((v.sv[i] - c.cw[i]) * (v.sv[i] - c.cw[i]))
                    AS BIGINT) AS d
        FROM {px}subsq v JOIN {px}cb c ON v.sub = c.sub,
             UNNEST(generate_series(1, {dsub})) AS u(i)
        GROUP BY 1, 2, 3),
    {px}enc AS MATERIALIZED (
        SELECT vec_id, sub, MIN({{'d': d, 'code': code}}).code AS code
        FROM {px}dists GROUP BY vec_id, sub)""",
    )
    return parts


def _q122_oracle(
    m: int = 8, codewords: int = 16, iters: int = 2, stride: int = 61,
    k: int = 5, dsub: int = 8,
) -> str:
    """DuckDB replay of the flat train -> encode -> ADC-search chain:
    the shared per-subspace trajectory parts plus an unrestricted LUT
    join (no coarse pruning — that is q124's composition)."""
    parts = [_INT8_NRM_SQL]
    parts.extend(_pq_train_cte_parts(m, codewords, iters, dsub))
    parts.append(
        f"""
    lut AS MATERIALIZED (
        SELECT vec_id AS query_id, sub, code, d
        FROM dists WHERE vec_id % {stride} = 0),
    scored AS (
        SELECT l.query_id, e.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
        FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        GROUP BY 1, 2)
    SELECT query_id, vec_id, dist, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist ASC, vec_id ASC) AS rnk FROM scored)
    WHERE rnk <= {k}""",
    )
    return "WITH " + ",".join(parts)


@register(
    "q122_pq_kmeans_chain",
    oracle=_q122_oracle(),
    survey_ref="k-means-trained PQ codebook chain (Jégou et al. 2011 "
    "IVFADC's real trainer replacing the q116 first-k stub; north "
    "star: train once on a sample, encode/search the full corpus)",
)
def q122_pq_kmeans_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION PQ chain certified end to end: per-subspace
    Lloyd's k-means trains the codebook (operators.similarity
    .pq_codebook_kmeans — the q57 integer-exact trajectory doctrine per
    subspace, min-id seeding, decimal-exact distances, round-half-up
    integer codewords), which feeds pq_encode + pq_topk_adc unchanged.
    Replaces q116's first-k-by-id codebook stub as the trained path —
    q116 stays as the plumbing-isolation gate. Every distance in train,
    encode, and search is integer-derived, so the full trajectory — not
    just the final ranks — hash-gates against the unrolled-CTE oracle.
    Train: m broadcast-centroid map passes + m*K-row recenters in one
    plan; encode: one keyed shuffle of N*m integer rows; search: codes
    join a broadcast LUT. Nothing corpus-sized shuffles after encode."""
    from candia_spark.operators.similarity import (
        pq_codebook_kmeans,
        pq_topk_adc,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_codebook_kmeans(emb, m=8, codewords=16, iters=2)
    qs = emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_adc(emb, qs, k=5, codebook=cb)


# The pinned PSL snippet the q123 chain loads: one rule of every class
# the real public_suffix_list.dat contains (plain, wildcard, exception,
# section marker, deep private suffix). The ORACLE's suffix VALUES list
# is the HAND-derived expansion of these rules over the planted hosts —
# independent of load_psl, so the loader's wildcard/exception semantics
# are part of the gate.
_Q123_PSL_LINES = [
    "// ===BEGIN ICANN DOMAINS===",
    "com",
    "uk",
    "co.uk",
    "*.ck",
    "!www.ck",
    "// ===BEGIN PRIVATE DOMAINS===",
    "s3.dualstack.eu-west-1.amazonaws.com",
]


@register(
    "q123_psl_registered_domain",
    # hand-expanded suffix table: plain rules verbatim; wildcard *.ck
    # grounds to 'that.ck' (the only observed label under ck besides
    # the EXCEPTION-removed 'www'); the wildcard base 'ck' is emitted
    # so u*.www.ck longest-match 'ck' and register 'www.ck' — the PSL
    # algorithm's answer for exception rules. Longest match in SQL via
    # an endswith join + max-label-count argmax; registered domain =
    # one label more than the match; whole-host matches and bare
    # suffixes yield NULL.
    oracle="""
    WITH urls AS MATERIALIZED (
        SELECT doc_id,
               CASE CAST(doc_id % 6 AS INTEGER)
                 WHEN 0 THEN 'https://x' || CAST(doc_id % 7 AS VARCHAR)
                             || '.Shop.co.uk/p'
                 WHEN 1 THEN 'https://deep.y.b.co.uk/q'
                 WHEN 2 THEN 'https://t' || CAST(doc_id % 4 AS VARCHAR)
                             || '.that.ck/r'
                 WHEN 3 THEN 'https://u' || CAST(doc_id % 3 AS VARCHAR)
                             || '.www.ck/s'
                 WHEN 4 THEN 'https://bkt' || CAST(doc_id % 3 AS VARCHAR)
                             || '.s3.dualstack.eu-west-1.amazonaws.com/k'
                 ELSE 'https://co.uk/'
               END AS url
        FROM documents),
    hosts AS (
        SELECT doc_id,
               lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host
        FROM urls),
    psl(suffix) AS (VALUES ('com'), ('uk'), ('co.uk'), ('ck'),
                           ('that.ck'),
                           ('s3.dualstack.eu-west-1.amazonaws.com')),
    cands AS (
        SELECT h.doc_id, h.host, p.suffix,
               len(string_split(p.suffix, '.')) AS k,
               len(string_split(h.host, '.')) AS n
        FROM hosts h JOIN psl p
          ON h.host = p.suffix OR h.host LIKE '%.' || p.suffix),
    best AS (
        SELECT doc_id, host, suffix, k, n,
               ROW_NUMBER() OVER (PARTITION BY doc_id, host
                   ORDER BY k DESC, suffix ASC) AS rn
        FROM cands)
    SELECT h.doc_id, h.host,
           CASE WHEN b.suffix IS NULL OR b.n <= b.k THEN NULL
                ELSE array_to_string(
                    list_slice(string_split(h.host, '.'),
                               b.n - b.k, b.n), '.')
           END AS registered_domain
    FROM hosts h
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.doc_id = h.doc_id AND b.host = h.host
    """,
    survey_ref="PSL loader + eTLD+1 chain (publicsuffix.org semantics "
    "end to end; north star: per-domain caps that never key on a "
    "public suffix)",
)
def q123_psl_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSL chain certified end to end: load_psl parses a pinned
    snippet with every rule class of the real public_suffix_list.dat
    (plain / wildcard / exception / section markers / deep private
    suffix), grounds the wildcard on the corpus's own host census, and
    the expanded table drives registered_domain_psl over planted URLs
    exercising every semantic branch: mixed-case hosts, a deeper host
    under co.uk, wildcard-grounded that.ck, the !www.ck exception
    (longest match falls to the base 'ck', registering www.ck), a
    5-label private-section suffix, and a bare-suffix host (NULL). The
    oracle's suffix table is hand-expanded, so the loader's
    wildcard/exception resolution is inside the gate."""
    from candia_spark.functions.text import url_host
    from candia_spark.operators.curation import (
        load_psl,
        registered_domain_psl,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = (
        F.when(i % 6 == 0, F.concat(
            F.lit("https://x"), (i % 7).cast("string"),
            F.lit(".Shop.co.uk/p")))
        .when(i % 6 == 1, F.lit("https://deep.y.b.co.uk/q"))
        .when(i % 6 == 2, F.concat(
            F.lit("https://t"), (i % 4).cast("string"),
            F.lit(".that.ck/r")))
        .when(i % 6 == 3, F.concat(
            F.lit("https://u"), (i % 3).cast("string"),
            F.lit(".www.ck/s")))
        .when(i % 6 == 4, F.concat(
            F.lit("https://bkt"), (i % 3).cast("string"),
            F.lit(".s3.dualstack.eu-west-1.amazonaws.com/k")))
        .otherwise(F.lit("https://co.uk/"))
    )
    docs = d.withColumn("url", url)
    psl = load_psl(
        spark, lines=_Q123_PSL_LINES,
        hosts=docs.select(url_host("url").alias("host")),
    )
    return registered_domain_psl(docs, psl)


def _q124_oracle(
    coarse_k: int = 8, coarse_iters: int = 2, coarse_scale: int = 1000,
    m: int = 8, codewords: int = 16, pq_iters: int = 2, nprobe: int = 3,
    stride: int = 67, k: int = 5, dsub: int = 8,
) -> str:
    """The fully-trained IVFADC replay: the q57 coarse-kmeans CTE chain
    (cells = assign{iters}, probe centroids = cent{iters-1} — the SAME
    table the final assignment pass ranked against), the q122
    per-subspace PQ train/encode chain under the 'p' prefix, a
    decimal-exact top-nprobe probe per query, and ADC restricted to
    probed cells."""
    coarse = _kmeans_ctes(coarse_k, coarse_iters, coarse_scale, "min_id")
    parts = [coarse[len("WITH "):], _INT8_NRM_SQL]
    parts.extend(_pq_train_cte_parts(m, codewords, pq_iters, dsub, px="p"))
    parts.append(
        f"""
    qprobe AS (
        -- probe against cent{coarse_iters - 1}: the centroids the final
        -- assignment pass used — cells and probes share one total order
        SELECT q.vec_id AS query_id, c.cluster,
               SUM((c.n * q.v - c.s) * (c.n * q.v - c.s)) AS d,
               MAX(c.n) AS n
        FROM q JOIN cent{coarse_iters - 1} c USING (pos)
        WHERE q.vec_id % {stride} = 0
        GROUP BY 1, 2),
    probes AS (
        SELECT query_id, cluster FROM (
            SELECT query_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE)
                                    ASC,
                                cluster ASC) AS rn
            FROM qprobe) t
        WHERE rn <= {nprobe}),
    encc AS (
        SELECT e.vec_id, e.sub, e.code, a.cluster
        FROM penc e JOIN assign{coarse_iters} a USING (vec_id)),
    lut AS MATERIALIZED (
        SELECT vec_id AS query_id, sub, code, d
        FROM pdists WHERE vec_id % {stride} = 0),
    scored AS (
        SELECT l.query_id, e.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
        FROM encc e
        JOIN lut l ON l.sub = e.sub AND l.code = e.code
        JOIN probes p ON p.query_id = l.query_id AND p.cluster = e.cluster
        GROUP BY 1, 2)
    SELECT query_id, vec_id, dist, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist ASC, vec_id ASC) AS rnk FROM scored)
    WHERE rnk <= {k}""",
    )
    return "WITH " + ",".join(parts)


@register(
    "q124_trained_ivfadc",
    oracle=_q124_oracle(),
    survey_ref="fully-trained IVFADC (Jégou et al. 2011 with BOTH "
    "quantizers trained on the corpus — zero pinned constants; north "
    "star: the production billion-vector index build)",
)
def q124_trained_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVFADC build certified end to end with ZERO
    pinned constants (operators.similarity.pq_topk_ivf_trained): the
    coarse quantizer is corpus-trained Lloyd's k-means — cells assigned
    and queries probed against the SAME trained centroid table under
    the q57 decimal-exact total order — and the fine quantizer is the
    q122 per-subspace k-means codebook; ADC scores only the probed
    ~nprobe/k corpus fraction in bigints. q119 (pinned centroids,
    first-k codebook) stays as the plumbing-isolation twin. The oracle
    replays BOTH training trajectories (coarse q57 chain + prefixed PQ
    chain), the probe ranking, and the restricted ADC — one swapped
    probe or one mis-assigned cell fails the gate."""
    from candia_spark.operators.similarity import pq_topk_ivf_trained

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 67 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_ivf_trained(
        emb, qs, k=5, m=8, codewords=16, nprobe=3,
        coarse_k=8, coarse_iters=2, pq_iters=2,
    )


@register(
    "q125_ann_recall_audit",
    # both lists integer-exact (bigint dots for the truth, bigint ADC
    # sums for the approx), so membership, overlap counts, and the
    # divide-by-constant recall are engine-exact — an EVALUATION gate:
    # the oracle recomputes both indexes AND the audit, so a recall
    # regression in either index fails correctness, not just a number.
    oracle=f"""
    WITH {_INT8_NRM_SQL},
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               CAST(SUM(q.qv[i] * c.qv[i]) AS BIGINT) AS score
        FROM qz q, qz c, UNNEST(generate_series(1, len(q.qv))) AS u(i)
        WHERE q.vec_id % 71 = 0
        GROUP BY 1, 2),
    truth AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, vec_id ASC) AS rn
            FROM dots) t
        WHERE rn <= 10),
    cb0 AS (
        SELECT qv, ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS code
        FROM qz ORDER BY vec_id ASC LIMIT 16),
    cb AS MATERIALIZED (
        SELECT CAST(s AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
               list_slice(qv, s * 8 + 1, (s + 1) * 8) AS cw
        FROM cb0, UNNEST(generate_series(0, 7)) AS g(s)),
    subs AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub,
               list_slice(qv, s * 8 + 1, (s + 1) * 8) AS sv
        FROM qz, UNNEST(generate_series(0, 7)) AS g(s)),
    dists AS (
        SELECT v.vec_id, v.sub, c.code,
               CAST(SUM((v.sv[i] - c.cw[i]) * (v.sv[i] - c.cw[i]))
                    AS BIGINT) AS d
        FROM subs v JOIN cb c ON v.sub = c.sub,
             UNNEST(generate_series(1, 8)) AS u(i)
        GROUP BY 1, 2, 3),
    enc AS MATERIALIZED (
        SELECT vec_id, sub, MIN({{'d': d, 'code': code}}).code AS code
        FROM dists GROUP BY vec_id, sub),
    lut AS MATERIALIZED (
        SELECT vec_id AS query_id, sub, code, d
        FROM dists WHERE vec_id % 71 = 0),
    scored AS (
        SELECT l.query_id, e.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
        FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        GROUP BY 1, 2),
    approx AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY dist ASC, vec_id ASC) AS rnk
            FROM scored) t
        WHERE rnk <= 10)
    SELECT t.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / 10 AS recall
    FROM truth t
    LEFT JOIN approx a
      ON a.query_id = t.query_id AND a.vec_id = t.vec_id
    GROUP BY 1
    """,
    survey_ref="ANN recall@k audit (measured-recall contract, Jégou et "
    "al. 2011 §V; north star: never deploy an index whose recall you "
    "have not measured)",
)
def q125_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of flat PQ-ADC (q116's device) against the int8
    brute-force truth (q110's device), per query
    (operators.retrieval.ann_recall_audit): the evaluation harness an
    ANN deployment runs before trusting its index, certified as a
    QUERY — the oracle recomputes both indexes and the audit join, so
    a silent recall regression in the PQ chain fails the gate. Both
    lists are integer-exact, and recall divides by the constant k, so
    the output is engine-exact with no rounding device. Queries =
    every 71st vector."""
    from candia_spark.operators.retrieval import ann_recall_audit
    from candia_spark.operators.similarity import (
        cosine_topk_int8,
        pq_topk_adc,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 71 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = cosine_topk_int8(emb, qs, k=10)
    approx = pq_topk_adc(emb, qs, k=10)
    return ann_recall_audit(truth, approx, k=10)


@register(
    "q126_curriculum_order",
    # q61's exact bucket-census percentile chain picks the stage
    # (floor(pct * 4) — floor of identical IEEE doubles), q113's md5
    # permutation orders within (stage, shard); the whole curriculum is
    # a pure function of (score census, id, salt) and the oracle
    # recomputes every slot — one transposed row fails.
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CAST(len({toks}) AS DOUBLE) AS n,
               CAST(len(list_distinct({toks})) AS DOUBLE) AS nd,
               CAST(len(list_filter({toks},
                    x -> list_contains(['the','and','of','to','is'], x))) AS DOUBLE) AS stop_hits
        FROM documents),
    qs AS (
        SELECT doc_id,
               CASE WHEN n > 0 THEN
                 CAST(0.4 * LEAST(1.0, n / 50.0)
                      + 0.3 * (nd / n)
                      + 0.3 * LEAST(1.0, 5.0 * stop_hits / n) AS DOUBLE)
               ELSE 0.0 END AS q
        FROM feats),
    scored AS (
        SELECT doc_id, CAST(floor(q * 1000) AS BIGINT) AS bucket FROM qs),
    census AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_in_bucket
        FROM scored GROUP BY bucket),
    cum AS (
        SELECT bucket,
               COALESCE(CAST(SUM(n_in_bucket) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS n_below,
               CAST(SUM(n_in_bucket) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS total
        FROM census),
    staged AS (
        SELECT s.doc_id,
               CAST(floor(CAST(c.n_below AS DOUBLE) / c.total * 4)
                    AS BIGINT) AS stage,
               md5('cur0:' || CAST(s.doc_id AS VARCHAR)) AS key
        FROM scored s JOIN cum c USING (bucket)),
    sharded AS (
        SELECT doc_id, stage,
               CAST('0x' || substr(key, 1, 15) AS BIGINT) % 4 AS shard,
               key
        FROM staged)
    SELECT doc_id, stage, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY stage, shard
                ORDER BY key ASC, doc_id ASC) - 1 AS BIGINT) AS pos
    FROM sharded
    """.replace("{toks}", _TOKS_SQL),
    survey_ref="curriculum data ordering (Bengio et al. 2009 for corpus "
    "assembly; north star: reproducible easy-to-hard training order "
    "without a global sort)",
)
def q126_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering (operators.curation.curriculum_order):
    every document is staged by its exact quality-score percentile
    (easy material in stage 0) and deterministically ordered within
    (stage, shard) by the md5 permutation — q61's census-percentile
    device composed with q113's shuffle device into the training-order
    artifact a curriculum-learning run consumes. No global sort, no
    corpus-wide percent_rank; salt='cur0' is the epoch knob."""
    from candia_spark.functions.text import quality_score
    from candia_spark.operators.curation import curriculum_order

    docs = _t(spark, sf_dir, "documents")
    return curriculum_order(
        docs, quality_score("text"), n_stages=4, n_shards=4, salt="cur0"
    )


def _residual_cte_parts(coarse_iters: int) -> str:
    """The residual-derivation CTE block shared by the q127 and q131
    oracles: int8 lanes of EVERY vector (zlanes, from the _INT8_NRM_SQL
    qz), integer cell centroids over the TRAINING corpus's final
    assignment (ccent — the round-half-up floor device), and the
    training corpus's residual arrays (rz). With a base-restricted
    coarse chain (q131) the assign join restricts ccent/rz to the base
    split automatically; zlanes stays corpus-wide so batch residuals
    can derive from the same lane table."""
    return f"""
    zlanes AS MATERIALIZED (
        SELECT vec_id, i AS pos, qv[i] AS v
        FROM qz, UNNEST(generate_series(1, len(qv))) AS u(i)),
    ccent AS MATERIALIZED (
        -- integer cell centroids in the int8 lane space: round-half-up
        -- mean via the identical pure floor((2s+n)/(2n)) device
        SELECT a.cluster, l.pos,
               CAST(floor(CAST(2 * SUM(l.v) + COUNT(*) AS DOUBLE)
                          / CAST(2 * COUNT(*) AS DOUBLE)) AS BIGINT) AS c
        FROM zlanes l JOIN assign{coarse_iters} a USING (vec_id)
        GROUP BY 1, 2),
    rz AS MATERIALIZED (
        -- residual lanes r(x) = x - q1(x), re-assembled to arrays so
        -- the shared PQ train/encode chain reads them like qz
        SELECT l.vec_id, list(l.v - c.c ORDER BY l.pos) AS qv
        FROM zlanes l
        JOIN assign{coarse_iters} a USING (vec_id)
        JOIN ccent c ON c.cluster = a.cluster AND c.pos = l.pos
        GROUP BY l.vec_id)"""


def _q127_oracle(
    coarse_k: int = 8, coarse_iters: int = 2, coarse_scale: int = 1000,
    m: int = 8, codewords: int = 16, pq_iters: int = 2, nprobe: int = 3,
    stride: int = 67, k: int = 5, dsub: int = 8,
    tail: str | None = None,
) -> str:
    """The RESIDUAL-encoded IVFADC replay (Jégou et al. 2011 §III): the
    q57 coarse chain, integer cell centroids in the int8 lane space
    (the same round-half-up floor device as the Spark side), residual
    lanes r(x) = x - q1(x) re-assembled to arrays, the shared PQ
    train/encode chain pointed at the residual CTE (src='rz'), a
    per-probed-cell query-residual LUT, and ADC restricted to probed
    cells. One wrong residual lane, one swapped probe, or one
    mis-seeded codeword moves a distance and fails the gate."""
    coarse = _kmeans_ctes(coarse_k, coarse_iters, coarse_scale, "min_id")
    parts = [coarse[len("WITH "):], _INT8_NRM_SQL]
    parts.append(_residual_cte_parts(coarse_iters))
    parts.extend(
        _pq_train_cte_parts(m, codewords, pq_iters, dsub, px="r", src="rz")
    )
    parts.append(
        f"""
    qprobe AS (
        -- probe against cent{coarse_iters - 1}: the centroids the
        -- final assignment pass used (one total order for cells and
        -- probes)
        SELECT q.vec_id AS query_id, c.cluster,
               SUM((c.n * q.v - c.s) * (c.n * q.v - c.s)) AS d,
               MAX(c.n) AS n
        FROM q JOIN cent{coarse_iters - 1} c USING (pos)
        WHERE q.vec_id % {stride} = 0
        GROUP BY 1, 2),
    probes AS (
        SELECT query_id, cluster FROM (
            SELECT query_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE)
                                    ASC,
                                cluster ASC) AS rn
            FROM qprobe) t
        WHERE rn <= {nprobe}),
    qres AS (
        -- the query's residual is PER PROBED CELL (the paper's
        -- Algorithm 2: the LUT keys on the cell's reproduction value)
        SELECT p.query_id, p.cluster,
               CAST(floor((l.pos - 1) / {dsub}) AS BIGINT) AS sub,
               list(l.v - c.c ORDER BY l.pos) AS sv
        FROM probes p
        JOIN zlanes l ON l.vec_id = p.query_id
        JOIN ccent c ON c.cluster = p.cluster AND c.pos = l.pos
        GROUP BY 1, 2, 3),
    lut AS MATERIALIZED (
        SELECT r.query_id, r.cluster, r.sub, c.code,
               CAST(SUM((r.sv[i] - c.cw[i]) * (r.sv[i] - c.cw[i]))
                    AS BIGINT) AS d
        FROM qres r JOIN rcb c ON c.sub = r.sub,
             UNNEST(generate_series(1, {dsub})) AS u(i)
        GROUP BY 1, 2, 3, 4),
    encc AS (
        SELECT e.vec_id, e.sub, e.code, a.cluster
        FROM renc e JOIN assign{coarse_iters} a USING (vec_id)),
    scored AS (
        SELECT l.query_id, e.vec_id, CAST(SUM(l.d) AS BIGINT) AS dist
        FROM encc e
        JOIN lut l ON l.cluster = e.cluster AND l.sub = e.sub
                   AND l.code = e.code
        GROUP BY 1, 2)""",
    )
    final = f"""
    SELECT query_id, vec_id, dist, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist ASC, vec_id ASC) AS rnk FROM scored)
    WHERE rnk <= {k}"""
    if tail is None:
        return "WITH " + ",".join(parts) + final
    # the rank-filtered result becomes the `shortlist` CTE and the
    # caller's tail consumes it (q130: exact re-rank over the
    # shortlist; `zlanes` stays in scope for bigint dot products)
    parts.append(f"""
    shortlist AS ({final})""")
    return "WITH " + ",".join(parts) + tail


@register(
    "q127_residual_ivfadc",
    oracle=_q127_oracle(),
    survey_ref="residual-encoded IVFADC (Jégou et al. 2011 §III — the "
    "PQ codebook trains on and encodes r(x) = x - q1(x), closing "
    "q124's one algorithmic gap; north star: recall held at high "
    "compression on a billion-vector index)",
)
def q127_residual_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVFADC certified end to end
    (operators.similarity.pq_topk_ivfadc_residual): the coarse
    quantizer is the q57-trained k-means (one table for cells AND
    probes), the reproduction values are integer cell centroids in the
    int8 lane space, and the q122 per-subspace trainer + encoder run on
    the RESIDUAL lanes — Jégou et al. 2011 §III in full, with every
    stage integer-exact so the oracle replays the entire chain
    (coarse trajectory, residual derivation, PQ trajectory, per-cell
    query LUTs, restricted ADC). q124 (raw-vector encoding) stays as
    the ablation twin; the measured recall@k delta between the two is
    SCALING_r15's ann leg."""
    from candia_spark.operators.similarity import pq_topk_ivfadc_residual

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 67 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_ivfadc_residual(
        emb, qs, k=5, m=8, codewords=16, nprobe=3,
        coarse_k=8, coarse_iters=2, pq_iters=2,
    )


def _q128_oracle() -> str:
    """The capstone pretrain-assembly replay: WET gate (malformed route
    dropped), HTML extraction (_html_clean_sql — rendered from the
    operator's own pattern tables), Gopher + blocklist + quality +
    langid gates, URL canonicalization dedup, line-level paragraph
    dedup, 3-gram decontamination, per-domain cap, mixture plan join,
    per-shard whole-doc packing (recursive CTE), and the deterministic
    shuffle — every stage the composed q128 chain runs, recomputed
    independently so a contract break BETWEEN stages (which ids flow
    where, with which text) fails the gate, not just a stage in
    isolation. The WET projection itself is certified transitively: the
    oracle derives the payload from the planted construction, so any
    byte the Spark-side record split/terminator-trim mangles changes
    clean_md5 and every downstream token count."""
    url_sql = (
        "(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END)"
        " || '://'"
        " || (CASE WHEN doc_id % 3 = 1 THEN 'WWW.h' ELSE 'www.h' END)"
        " || CAST(doc_id % 4 AS VARCHAR) || '.Site'"
        " || CAST(doc_id % 3 AS VARCHAR) || '.Com/Doc/'"
        " || CAST(doc_id // 24 AS VARCHAR)"
        " || (CASE WHEN doc_id % 2 = 0"
        "          THEN '?utm_source=feed'"
        "               || (CASE WHEN doc_id % 6 = 0"
        "                        THEN '&gclid=g1&x=keep' ELSE '' END)"
        "          ELSE '' END)"
        " || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
        " || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)"
    )
    env_sql = (
        "'<!DOCTYPE html><html><head><title> Doc ' || doc_id || "
        "' </title><style type=\"text/css\">p { color: red; }</style>"
        "<SCRIPT>var x = 1 < 2 && \"</div>\";</SCRIPT></head>"
        "<body><!-- draft: <p>' || source || '</p> --><h1>' || source || "
        "'</h1>\n<p>' || text || "
        "' &amp;co &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p>' || "
        "CASE WHEN doc_id % 5 = 0 "
        "THEN '<ul><li>item one</li><li>item two</li></ul>' ELSE '' END || "
        "CASE WHEN doc_id % 11 = 0 "
        "THEN '<p>limited Merge-Batch! offer</p>' ELSE '' END || "
        "'<div>tail ' || doc_id || '</div></body></html>'"
    )
    canon_sql = """
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         lower(regexp_extract(url,
                             '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                         || '://'
                         || lower(regexp_extract(url,
                             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
                         || regexp_extract(url,
                             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1),
                         '#.*', '', 'g'),
                       '&(utm_[^=&#]*|gclid|fbclid)=[^&#]*', '', 'g'),
                     '\\?(utm_[^=&#]*|gclid|fbclid)=[^&#]*&', '?', 'g'),
                   '\\?(utm_[^=&#]*|gclid|fbclid)=[^&#]*$', '', 'g'),
                 '/$', '', 'g')"""
    norm_sql = (
        "' ' || trim(regexp_replace(regexp_replace(lower(clean),"
        " '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) || ' '"
    )
    sql = """
    WITH RECURSIVE base AS MATERIALIZED (
        -- the WET gate: the %13 rows lose their WARC-Type header on
        -- the Spark side and route to _malformed; they never enter
        SELECT doc_id, source, {URL} AS url, {ENV} AS html
        FROM documents WHERE doc_id % 13 <> 0),
    x AS MATERIALIZED (
        SELECT doc_id, source, url, {CLEAN} AS clean FROM base),
    gt AS MATERIALIZED (
        SELECT doc_id, {ctoks} AS toks,
               string_split(clean, chr(10)) AS lines,
               CAST(length(clean)
                    - length(replace(clean, '#', '')) AS BIGINT)
               + CAST((length(clean)
                    - length(replace(clean, '...', ''))) // 3 AS BIGINT)
                   AS n_symbols
        FROM x),
    gc AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS sum_chars,
               n_symbols,
               CAST(len(list_filter(lines,
                    l -> substr(l, 1, 1) = '-' OR substr(l, 1, 1) = '*'
                         OR substr(l, 1, 1) = '•')) AS BIGINT) AS bullets,
               CAST(len(list_filter(lines,
                    l -> length(l) >= 3
                         AND substr(l, length(l) - 2, 3) = '...'))
                    AS BIGINT) AS ell_lines,
               CAST(len(list_filter(toks,
                    x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
                   AS alpha_words,
               CAST(len(list_intersect(list_distinct(toks),
                    ['the', 'be', 'to', 'of', 'and',
                     'that', 'have', 'with'])) AS BIGINT) AS stop_hits,
               CAST(len(list_intersect(list_distinct(toks),
                    ['the','and','of','to','is'])) AS BIGINT) AS s_en,
               CAST(len(list_intersect(list_distinct(toks),
                    ['der','die','und','nicht','das'])) AS BIGINT) AS s_de,
               CAST(len(list_intersect(list_distinct(toks),
                    ['el','la','de','que','los'])) AS BIGINT) AS s_es,
               CAST(len(list_intersect(list_distinct(toks),
                    ['le','la','les','et','des'])) AS BIGINT) AS s_fr,
               CAST(len(list_intersect(list_distinct(toks),
                    ['de5','shi4','le5','zai4','he2'])) AS BIGINT) AS s_zh,
               CAST(len(toks) AS DOUBLE) AS nw,
               CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
               CAST(len(list_filter(toks,
                    x -> list_contains(['the','and','of','to','is'], x)))
                    AS DOUBLE) AS qstop
        FROM gt),
    verdicts AS MATERIALIZED (
        SELECT doc_id,
               (n_words >= 20 AND n_words <= 100000
                AND COALESCE(sum_chars, 0) >= 3 * n_words
                AND COALESCE(sum_chars, 0) <= 10 * n_words
                AND n_symbols * 10 <= 1 * n_words
                AND bullets * 10 <= 9 * n_lines
                AND ell_lines * 10 <= 3 * n_lines
                AND alpha_words * 5 >= 4 * n_words
                AND stop_hits >= 1) AS gopher_keep,
               (CASE WHEN nw > 0 THEN
                  CAST(0.4 * LEAST(1.0, nw / 50.0)
                       + 0.3 * (nd / nw)
                       + 0.3 * LEAST(1.0, 5.0 * qstop / nw) AS DOUBLE)
                ELSE 0.0 END) >= 0.5 AS quality_keep,
               (GREATEST(s_de, s_en, s_es, s_fr, s_zh) > 0
                AND s_de < GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                AND s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh))
                   AS lang_en
        FROM gc),
    gate AS MATERIALIZED (
        SELECT x.doc_id, x.source, x.url, x.clean
        FROM x JOIN verdicts v USING (doc_id)
        WHERE v.gopher_keep AND v.quality_keep AND v.lang_en
          AND position(' merge batch ' IN ({NORM})) = 0),
    canon AS MATERIALIZED (
        SELECT doc_id, source, clean, {CANON} AS canonical_url
        FROM gate),
    alive3 AS MATERIALIZED (
        SELECT doc_id, source, clean,
               regexp_extract(
                   regexp_extract(canonical_url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1),
                   '([^.]+\\.[^.]+)$', 1) AS domain
        FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY canonical_url)
                   AS keeper
              FROM canon) t
        WHERE doc_id = keeper),
    pl AS MATERIALIZED (
        SELECT doc_id, string_split(clean, chr(10)) AS ps FROM alive3),
    paras AS MATERIALIZED (
        SELECT doc_id, i - 1 AS pos, ps[i] AS para
        FROM pl, UNNEST(generate_series(1, len(ps))) AS u(i)),
    own1 AS (
        SELECT para, MIN(doc_id) AS od
        FROM paras WHERE para <> '' GROUP BY para),
    own AS MATERIALIZED (
        SELECT p.para, o.od, MIN(p.pos) AS op
        FROM paras p JOIN own1 o ON p.para = o.para AND p.doc_id = o.od
        GROUP BY p.para, o.od),
    keptp AS (
        SELECT p.doc_id, p.pos, p.para
        FROM paras p LEFT JOIN own o ON p.para = o.para
        WHERE o.para IS NULL OR (p.doc_id = o.od AND p.pos = o.op)),
    reb AS MATERIALIZED (
        SELECT doc_id,
               string_agg(para, chr(10) ORDER BY pos) AS clean2
        FROM keptp GROUP BY doc_id),
    ftxt AS MATERIALIZED (
        SELECT a.doc_id, a.source, a.domain,
               COALESCE(r.clean2, '') AS clean2
        FROM alive3 a LEFT JOIN reb r USING (doc_id)),
    ft AS MATERIALIZED (
        SELECT doc_id, {ftoks} AS t FROM ftxt),
    csh AS (
        -- 5-gram shingles: the synthetic corpus draws from a ~30-word
        -- vocabulary, so 3-grams collide across unrelated docs and
        -- would flag ~everything; 5-grams identify real overlap
        SELECT DISTINCT doc_id,
               t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]
                    || chr(31) || t[i+3] || chr(31) || t[i+4] AS s
        FROM ft, UNNEST(generate_series(1, greatest(len(t) - 4, 0)))
             AS u(i)),
    bt AS (
        SELECT doc_id, {toks} AS t FROM documents WHERE doc_id % 17 = 0),
    bsh AS (
        SELECT DISTINCT t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]
                    || chr(31) || t[i+3] || chr(31) || t[i+4] AS s
        FROM bt, UNNEST(generate_series(1, greatest(len(t) - 4, 0)))
             AS u(i)),
    flagged AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh USING (s)),
    alive4 AS MATERIALIZED (
        SELECT f.* FROM ftxt f LEFT JOIN flagged g USING (doc_id)
        WHERE g.doc_id IS NULL),
    capped AS MATERIALIZED (
        SELECT doc_id, source, domain, clean2 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
                ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cap128') ASC,
                         doc_id ASC) AS rnk
            FROM alive4) t
        WHERE rnk <= 25),
    w(source, weight) AS (
        VALUES ('src0', CAST(1 AS BIGINT)), ('src1', CAST(2 AS BIGINT)),
               ('src2', CAST(3 AS BIGINT)), ('src3', CAST(1 AS BIGINT)),
               ('src4', CAST(2 AS BIGINT)), ('src5', CAST(3 AS BIGINT)),
               ('src6', CAST(1 AS BIGINT)), ('src7', CAST(2 AS BIGINT)),
               ('src8', CAST(3 AS BIGINT)), ('src9', CAST(1 AS BIGINT)),
               ('src10', CAST(2 AS BIGINT)), ('src11', CAST(3 AS BIGINT))),
    avail AS MATERIALIZED (
        SELECT source, CAST(SUM(len({ftoks2})) AS BIGINT)
                   AS available_tokens
        FROM capped GROUP BY source),
    plan AS MATERIALIZED (
        SELECT a.source, w.weight, a.available_tokens,
               CAST((w.weight * 50000) // 24 AS BIGINT) AS target_tokens,
               CASE WHEN a.available_tokens <= 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(((w.weight * 50000) // 24
                         + a.available_tokens - 1) // a.available_tokens
                         AS BIGINT)
               END AS epochs
        FROM avail a JOIN w USING (source)),
    alive5 AS MATERIALIZED (
        SELECT c.doc_id, c.source, c.domain, c.clean2, p.epochs
        FROM capped c JOIN plan p USING (source)),
    d AS MATERIALIZED (
        SELECT source AS shard, doc_id, domain, epochs,
               md5(clean2) AS clean_md5,
               CAST(len({ftoks2}) AS BIGINT) AS n_tok,
               ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY doc_id) AS rn
        FROM alive5),
    walk AS (
        SELECT shard, doc_id, n_tok, rn,
               0 AS seq_id, 0 AS off,
               CASE WHEN n_tok > 60 THEN 60 ELSE n_tok END AS kept,
               CASE WHEN n_tok > 60 THEN 1 ELSE 0 END AS nxt_seq,
               CASE WHEN n_tok > 60 THEN 0 ELSE n_tok END AS nxt_fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT n.shard, n.doc_id, n.n_tok, n.rn,
               CASE WHEN n.n_tok > 60 THEN w.nxt_seq
                         + CASE WHEN w.nxt_fill > 0 THEN 1 ELSE 0 END
                    WHEN w.nxt_fill + n.n_tok <= 60 THEN w.nxt_seq
                    ELSE w.nxt_seq + 1 END,
               CASE WHEN n.n_tok > 60 THEN 0
                    WHEN w.nxt_fill + n.n_tok <= 60 THEN w.nxt_fill
                    ELSE 0 END,
               CASE WHEN n.n_tok > 60 THEN 60 ELSE n.n_tok END,
               CASE WHEN n.n_tok > 60 THEN w.nxt_seq
                         + CASE WHEN w.nxt_fill > 0 THEN 1 ELSE 0 END + 1
                    WHEN w.nxt_fill + n.n_tok <= 60 THEN w.nxt_seq
                    ELSE w.nxt_seq + 1 END,
               CASE WHEN n.n_tok > 60 THEN 0
                    WHEN w.nxt_fill + n.n_tok <= 60
                         THEN w.nxt_fill + n.n_tok
                    ELSE n.n_tok END
        FROM walk w JOIN d n ON n.shard = w.shard AND n.rn = w.rn + 1),
    shuf AS (
        SELECT doc_id,
               md5('ep128:' || CAST(doc_id AS VARCHAR)) AS key
        FROM d),
    shufp AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(key, 1, 15) AS BIGINT) % 4
                    AS BIGINT) AS shuffle_shard,
               key
        FROM shuf)
    SELECT w.doc_id, w.shard AS source, d.domain, d.epochs,
           w.n_tok AS n_tokens,
           CAST(w.seq_id AS BIGINT) AS seq_id,
           CAST(w.off AS BIGINT) AS offset_in_seq,
           CAST(w.kept AS BIGINT) AS kept_tokens,
           s.shuffle_shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY s.shuffle_shard
                ORDER BY s.key ASC, s.doc_id ASC) - 1 AS BIGINT)
               AS shuffle_pos,
           d.clean_md5
    FROM walk w
    JOIN d ON d.shard = w.shard AND d.doc_id = w.doc_id
    JOIN shufp s ON s.doc_id = w.doc_id
    """
    return (
        sql.replace("{URL}", url_sql)
        .replace("{ENV}", env_sql)
        .replace("{CLEAN}", _html_clean_sql("html"))
        .replace("{CANON}", canon_sql)
        .replace("{NORM}", norm_sql)
        .replace(
            "{ctoks}",
            "list_filter(string_split(lower(clean), ' '), x -> x <> '')",
        )
        .replace(
            "{ftoks2}",
            "list_filter(string_split(lower(clean2), ' '), x -> x <> '')",
        )
        .replace(
            "{ftoks}",
            "list_filter(string_split(lower(clean2), ' '), x -> x <> '')",
        )
        .replace("{toks}", _TOKS_SQL)
    )


@register(
    "q128_pretrain_assembly",
    oracle=_q128_oracle(),
    survey_ref="capstone pretrain-assembly chain (WET gate -> extract "
    "-> gopher/blocklist/quality/langid -> url dedup -> paragraph "
    "dedup -> decontaminate -> domain cap -> mixture -> pack + "
    "shuffle, as ONE dataflow; north star: the 109 components are a "
    "pipeline, not a parts bin)",
)
def q128_pretrain_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED pretraining-assembly pipeline, certified end to end
    as one plan: planted WET record blocks (HTML payloads, %13 rows
    headerless) flow through the shared ``_wet_project`` expressions
    (malformed routed out — the first oracle gate on the WET reader),
    HTML extraction, the Gopher (min_words 20, stopword floor 1 — the synthetic
    vocabulary carries a single stopword) / blocklist / quality(0.5) /
    langid('en') gate bank,
    URL-canonicalization dedup (the q104 rule set with collision
    pairs), line-level paragraph dedup, 5-gram decontamination against
    the %17 benchmark slice, a per-domain cap, the mixture plan's
    source selection, whole-document packing per source shard, and the
    deterministic training shuffle. Single-operator oracles (q104,
    q105, q108, q45, q107, q114, q118, q113) certify each stage alone;
    THIS gate certifies their contracts compose — which ids reach which
    stage carrying which text. Every stage keeps its 100 TB shape
    (pure maps, keyed shuffles, broadcast plans); nothing here is
    test-only scaffolding."""
    from candia_spark.functions.text import (
        lang_id_from_distinct,
        quality_score,
        tokens,
    )
    from candia_spark.operators.curation import (
        blocklist_filter,
        cap_per_source,
        extract_html_text,
        gopher_rules,
        mixture_epoch_plan,
        pack_sequences_whole,
        url_dedup,
    )
    from candia_spark.operators.dedup import (
        _materialize,
        decontaminate,
        paragraph_dedup,
    )
    from candia_spark.operators.sampling import deterministic_shuffle
    from candia_spark.sources.adapters import _wet_project

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(i % 3 == 1, F.lit("WWW.h")).otherwise(F.lit("www.h")),
        (i % 4).cast("string"),
        F.lit(".Site"),
        (i % 3).cast("string"),
        F.lit(".Com/Doc/"),
        F.expr("CAST(doc_id DIV 24 AS STRING)"),
        F.when(
            i % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed"),
                F.when(i % 6 == 0, F.lit("&gclid=g1&x=keep")).otherwise(
                    F.lit("")
                ),
            ),
        ).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title> Doc "),
        i.cast("string"),
        F.lit(' </title><style type="text/css">p { color: red; }</style>'),
        F.lit('<SCRIPT>var x = 1 < 2 && "</div>";</SCRIPT></head>'),
        F.lit("<body><!-- draft: <p>"),
        F.col("source"),
        F.lit("</p> --><h1>"),
        F.col("source"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit(" &amp;co &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end</p>"),
        F.when(
            i % 5 == 0, F.lit("<ul><li>item one</li><li>item two</li></ul>")
        ).otherwise(F.lit("")),
        F.when(
            i % 11 == 0, F.lit("<p>limited Merge-Batch! offer</p>")
        ).otherwise(F.lit("")),
        F.lit("<div>tail "),
        i.cast("string"),
        F.lit("</div></body></html>"),
    )
    # (0) post-split WET blocks: the %13 rows lose WARC-Type and route
    # to _malformed (the F4 stance) — the gate drops them, auditable
    hdrs_ok = F.concat(
        F.lit("\r\nWARC-Type: conversion\r\nWARC-Record-ID: <urn:uuid:"),
        i.cast("string"),
        F.lit(">\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: 2020-01-01T00:00:00Z\r\nContent-Length: "),
        F.octet_length(html).cast("string"),
    )
    hdrs_bad = F.concat(
        F.lit("\r\nWARC-Record-ID: <urn:uuid:"), i.cast("string"), F.lit(">")
    )
    block = F.concat(
        F.when(i % 13 == 0, hdrs_bad).otherwise(hdrs_ok),
        F.lit("\r\n\r\n"),
        html,
        F.lit("\r\n\r\n"),
    )
    wet = _wet_project(docs.select(block.alias("value")), keep_raw=False)
    base = (
        wet.filter(~F.col("_malformed"))
        .select(
            F.regexp_extract("record_id", "([0-9]+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("text").alias("html"),
        )
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    # (1) HTML -> visible text
    ext = extract_html_text(base.select("doc_id", "html")).select(
        "doc_id", "clean_text"
    )
    # Stage barriers: each stage's output is checkpointed before the
    # next consumes it. The chain self-joins its own lineage at every
    # gate (gopher/blocklist/quality branches all read the extraction),
    # and without the cuts Catalyst re-derives the whole upstream chain
    # once per branch per stage — measured 134 s vs 16 s at sf0.001.
    # This is also the production shape: a real assembly run persists
    # each stage's corpus.
    withtext = _materialize(
        base.select("doc_id", "url", "source").join(ext, "doc_id")
    )
    # (2) the gate bank: Gopher shape rules (min_words relaxed to 20 —
    # the envelope adds ~8 words to 10..99-word docs, so the rule still
    # fires both ways), blocklist, heuristic quality, marker langid
    gop = gopher_rules(
        withtext.select("doc_id", F.col("clean_text").alias("text")),
        min_words=20,
        min_stop_hits=1,  # the synthetic vocab carries ONE stopword
    ).select("doc_id", F.col("keep").alias("__gk"))
    blk = blocklist_filter(
        withtext.select("doc_id", F.col("clean_text").alias("text")),
        ["Merge-Batch!"],
    ).select("doc_id", "blocked")
    ql = withtext.select(
        "doc_id",
        quality_score("clean_text").alias("__q"),
        lang_id_from_distinct(
            F.array_distinct(tokens("clean_text"))
        ).alias("__lang"),
    )
    gated = (
        withtext.join(gop, "doc_id")
        .join(blk, "doc_id")
        .join(ql, "doc_id")
        .filter(
            (F.col("__gk") == 1)
            & ~F.col("blocked")
            & (F.col("__q") >= 0.5)
            & (F.col("__lang") == "en")
        )
        .select("doc_id", "url", "source", "clean_text")
    )
    gated = _materialize(gated)
    # (3) URL-canonicalization dedup (collision pairs k / k+12 share a
    # canonical URL; smallest id wins)
    ud = url_dedup(gated.select("doc_id", "url")).select(
        "doc_id", "domain", "keep"
    )
    alive3 = _materialize(
        gated.join(ud, "doc_id")
        .filter(F.col("keep"))
        .select("doc_id", "source", "domain", "clean_text")
    )
    # (4) corpus-wide line dedup (the shared h1/list lines collapse to
    # their corpus-first occurrence)
    pd = paragraph_dedup(
        alive3.select("doc_id", F.col("clean_text").alias("text")),
        sep="\n",
    ).select("doc_id", F.col("clean_text").alias("clean2"))
    withclean2 = _materialize(
        alive3.select("doc_id", "source", "domain").join(pd, "doc_id")
    )
    # (5) 3-gram decontamination against the %17 benchmark slice (docs
    # in the slice self-flag through their own payload — guaranteed
    # non-trivial drops)
    bench = docs.filter(i % 17 == 0).select("doc_id", "text")
    flagged = decontaminate(
        withclean2.select("doc_id", F.col("clean2").alias("text")),
        bench,
        n=5,  # 3-grams over the ~30-word synthetic vocabulary collide
        # across unrelated docs (measured: 95% flagged); 5-grams flag
        # real overlap only (the %17 slice self-flags + true matches)
    ).select("doc_id")
    alive4 = _materialize(withclean2.join(flagged, "doc_id", "left_anti"))
    # (6) per-domain contribution cap (3 planted domains)
    capped = cap_per_source(
        alive4, cap=25, source_col="domain", salt="cap128"
    ).select("doc_id", "source", "domain", "clean2")
    # (7) mixture plan: weighted sources only (the inner join IS the
    # selection), carrying the per-source epoch count
    weights = {f"src{j}": (j % 3) + 1 for j in range(12)}
    plan = mixture_epoch_plan(
        capped.select("source", F.col("clean2").alias("text")),
        weights,
        budget_tokens=50000,
    ).select("source", "epochs")
    alive5 = _materialize(capped.join(F.broadcast(plan), "source"))
    # (8) whole-document packing per source shard + (9) the
    # deterministic training shuffle
    packed = pack_sequences_whole(
        alive5.select("source", "doc_id", F.col("clean2").alias("text")),
        budget=60,
    )
    shuf = deterministic_shuffle(
        alive5.select("doc_id"), n_shards=4, salt="ep128"
    ).select(
        "doc_id",
        F.col("shard").alias("shuffle_shard"),
        F.col("pos").alias("shuffle_pos"),
    )
    return (
        packed.join(shuf, "doc_id")
        .join(
            alive5.select(
                "doc_id", "domain", "epochs",
                F.md5(F.col("clean2").cast("binary")).alias("clean_md5"),
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            F.col("shard").alias("source"),
            "domain",
            "epochs",
            "n_tokens",
            "seq_id",
            "offset_in_seq",
            "kept_tokens",
            "shuffle_shard",
            "shuffle_pos",
            "clean_md5",
        )
    )


_Q130_RERANK_TAIL = """
    SELECT query_id, vec_id, score, rank FROM (
        SELECT query_id, vec_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank
        FROM (
            SELECT s.query_id, s.vec_id,
                   CAST(SUM(a.v * b.v) AS BIGINT) AS score
            FROM shortlist s
            JOIN zlanes a ON a.vec_id = s.query_id
            JOIN zlanes b ON b.vec_id = s.vec_id AND b.pos = a.pos
            GROUP BY s.query_id, s.vec_id) t) tt
    WHERE rank <= 5
"""


@register(
    "q130_ivfadc_rerank",
    # the full q127 replay ranked to the R=20 shortlist, then the
    # exact bigint dot re-rank over the int8 lanes (zlanes, already in
    # scope from the residual derivation) — the paper's IVFADC+R: one
    # swapped shortlist member or one wrong re-rank dot fails the gate
    oracle=_q127_oracle(k=20, tail=_Q130_RERANK_TAIL),
    survey_ref="IVFADC + exact re-ranking (Jégou et al. 2011 §V-D: ADC "
    "shortlist of R from codes alone, exact re-rank of only those R; "
    "north star: buying back quantizer recall at Q*R full-vector "
    "reads, never a corpus scan)",
)
def q130_ivfadc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The re-ranked residual index certified end to end
    (operators.similarity.pq_topk_rerank): the q127 chain produces a
    20-candidate shortlist per query from compressed codes, and ONLY
    those rows are re-scored with the exact int8 dot product — the
    production recall-recovery stage (Jégou §V-D). Output ranks under
    the cosine_topk_int8 total order (score desc, id asc), so q125's
    audit compares it to the truth directly; the oracle replays the
    whole shortlist construction AND the re-rank dots."""
    from candia_spark.operators.similarity import pq_topk_rerank

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 67 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_rerank(
        emb, qs, k=5, shortlist=20, m=8, codewords=16, nprobe=3,
        coarse_k=8, coarse_iters=2, pq_iters=2,
    )


@register(
    "q129_blocklist_join_engine",
    # the join engine's oracle mirrors its SHAPE, not its plan: the
    # phrase table is GENERATED (1200 three-word fillers + the three
    # real probes), the normalized text explodes into 1/2/3-word
    # n-grams, hits aggregate per doc (count DISTINCT phrase + min
    # phrase), and the id spine left-joins back — phrase data never
    # becomes SQL literals, exactly the property the engine exists for
    # (the inline engine's 1200-contains() fold is a measured
    # StackOverflow).
    oracle="""
    WITH p(phrase) AS (
        SELECT 'marker phrase ' || lpad(CAST(i AS VARCHAR), 4, '0')
        FROM generate_series(0, 1199) AS g(i)
        UNION ALL SELECT 'merge batch'
        UNION ALL SELECT 'slow'
        UNION ALL SELECT 'nosuchword'),
    lens(n) AS (VALUES (1), (2), (3)),
    norm AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split(
                   trim(regexp_replace(regexp_replace(
                       lower(coalesce(text, '')),
                       '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')),
                   ' '), x -> x <> '') AS toks
        FROM documents),
    grams AS (
        SELECT doc_id,
               array_to_string(list_slice(toks, i, i + n - 1), ' ') AS g
        FROM norm, lens,
             UNNEST(generate_series(1, greatest(len(toks) - n + 1, 0)))
                 AS u(i)),
    hits AS (
        SELECT doc_id,
               CAST(COUNT(DISTINCT phrase) AS BIGINT) AS n_hits,
               MIN(phrase) AS first_hit
        FROM grams JOIN p ON g = phrase
        GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.first_hit, '') AS first_hit,
           COALESCE(h.n_hits, 0) > 0 AS blocked
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
    survey_ref="blocklist broadcast-join engine (the C4-scale phrase "
    "gate with phrases as DATA, not expression literals; north star: "
    "10k+-phrase lists without a Janino/plan-size hazard)",
)
def q129_blocklist_join_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocklist JOIN engine certified driver-grade
    (operators.curation.blocklist_filter(engine='join')): a
    1203-phrase list — 1200 generated three-word fillers plus the
    q121 probes ('Merge-Batch!' punctuated, 'slow' word-bounded,
    'nosuchword' absent) — flows as a broadcast phrase TABLE against
    the corpus's exploded word n-grams. The inline engine cannot run
    this list (its per-phrase contains() fold stack-overflows near 1k
    phrases — measured); q121 keeps the inline engine certified on the
    bounded list. Plan size is constant in the list length; exploded
    mass is corpus tokens x the 3 distinct phrase lengths; one keyed
    shuffle on doc_id."""
    from candia_spark.operators.curation import blocklist_filter

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = [f"marker phrase {i:04d}" for i in range(1200)] + [
        "Merge-Batch!", "slow", "nosuchword"
    ]
    return blocklist_filter(docs, phrases, engine="join")


def _q131_oracle(
    coarse_k: int = 8, coarse_iters: int = 2, coarse_scale: int = 1000,
    m: int = 8, codewords: int = 16, pq_iters: int = 2,
    mod: int = 5, rem: int = 4, dsub: int = 8,
) -> str:
    """The ROLLING-INGESTION replay: the entire frozen index — coarse
    trajectory, integer cell centroids, residual PQ trajectory — is
    recomputed over the BASE split only (``vec_id % mod <> rem``; the
    _kmeans_ctes/_pq_train_cte_parts src parameters restrict every
    training CTE), then the BATCH split is assigned, residualized, and
    encoded against those frozen pieces exactly as
    ``ivfadc_encode_batch`` does: a probe-rank-1 assignment against the
    final-pass centroids, residual lanes against the base-derived
    integer cell centroids, codes from the base-trained codebook. One
    batch vector routed to the wrong cell, one residual lane off by
    one, or one code drawn from a batch-contaminated codebook moves a
    row and fails the gate."""
    base_src = (
        f"(SELECT * FROM embeddings WHERE vec_id % {mod} <> {rem}) base_emb"
    )
    coarse = _kmeans_ctes(
        coarse_k, coarse_iters, coarse_scale, "min_id", src=base_src
    )
    parts = [coarse[len("WITH "):], _INT8_NRM_SQL]
    parts.append(_residual_cte_parts(coarse_iters))
    parts.extend(
        _pq_train_cte_parts(m, codewords, pq_iters, dsub, px="r", src="rz")
    )
    parts.append(
        f"""
    qb AS (
        -- batch lanes at the COARSE scale (the probe/assignment
        -- quantization device, distinct from the int8 zlanes)
        SELECT vec_id, i AS pos,
               CAST(round(CAST(embedding[i] AS DOUBLE) * {coarse_scale}, 0)
                    AS BIGINT) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
        WHERE vec_id % {mod} = {rem}),
    bdist AS (
        -- frozen assignment: rank against cent{coarse_iters - 1}, the
        -- centroids the base build's final pass used — nprobe=1 IS the
        -- assignment (one total order for cells, probes, and batches)
        SELECT qb.vec_id, c.cluster,
               SUM((c.n * qb.v - c.s) * (c.n * qb.v - c.s)) AS d,
               MAX(c.n) AS n
        FROM qb JOIN cent{coarse_iters - 1} c USING (pos)
        GROUP BY 1, 2),
    bassign AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY CAST(d AS DOUBLE) / CAST(n * n AS DOUBLE)
                                    ASC,
                                cluster ASC) AS rn
            FROM bdist) t
        WHERE rn = 1),
    brz AS (
        -- batch residual arrays against the FROZEN base cell centroids
        SELECT l.vec_id, list(l.v - c.c ORDER BY l.pos) AS qv
        FROM zlanes l
        JOIN bassign a USING (vec_id)
        JOIN ccent c ON c.cluster = a.cluster AND c.pos = l.pos
        GROUP BY l.vec_id),
    bsubsq AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub,
               list_slice(qv, s * {dsub} + 1, (s + 1) * {dsub}) AS sv
        FROM brz, UNNEST(generate_series(0, {m - 1})) AS g(s)),
    bdists AS (
        SELECT v.vec_id, v.sub, c.code,
               CAST(SUM((v.sv[i] - c.cw[i]) * (v.sv[i] - c.cw[i]))
                    AS BIGINT) AS d
        FROM bsubsq v JOIN rcb c ON v.sub = c.sub,
             UNNEST(generate_series(1, {dsub})) AS u(i)
        GROUP BY 1, 2, 3),
    benc AS (
        SELECT vec_id, sub, MIN({{'d': d, 'code': code}}).code AS code
        FROM bdists GROUP BY vec_id, sub)"""
    )
    final = """
    SELECT b.vec_id, b.sub, b.code, a.cluster AS bucket
    FROM benc b JOIN bassign a USING (vec_id)"""
    return "WITH " + ",".join(parts) + final


@register(
    "q131_rolling_ann_ingest",
    oracle=_q131_oracle(),
    survey_ref="rolling ANN ingestion (encode an arriving batch under "
    "the FROZEN IVFADC pieces — Jégou et al. 2011 §V's train-once/"
    "encode-forever deployment shape; north star: a corpus that rolls "
    "daily without retraining, with append == rebuild equivalence and "
    "a per-batch recall-drift audit as the retrain signal)",
)
def q131_rolling_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ANN ingestion certified end to end
    (operators.similarity.ivfadc_build_index + ivfadc_encode_batch):
    the index trains on the BASE split only (vec_id % 5 != 4), then the
    held-out batch encodes under the FROZEN
    centroids/cell_centroids/codebook — the fifth persisted-state
    rolling family (VERDICT r15 next #1). The output is every encoded
    batch row (id, sub, code, bucket), so the oracle gates the complete
    encode-append contract: frozen assignment, frozen residuals, frozen
    codes — not just the slice a top-k search happens to touch. The
    storage half (partitioned append, replay idempotence, ownership
    rule) and the search-over-rolled == search-over-rebuilt equivalence
    are pytest-pinned (test_r16_ops); the per-batch recall-drift audit
    is SCALING_r16's drift leg."""
    from candia_spark.operators.similarity import (
        ivfadc_build_index,
        ivfadc_encode_batch,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    idx = ivfadc_build_index(
        base, m=8, codewords=16, coarse_k=8, coarse_iters=2, pq_iters=2
    )
    return ivfadc_encode_batch(
        batch, idx["centroids"], idx["cell_centroids"], idx["codebook"]
    )


# --- Driver certification window (verdict r5 #2) -------------------------
# The per-round driver correctness artifact certifies the FIRST 50
# registry entries, and queries()/oracle_sql() preserve this dict's
# insertion order, so this tail list IS the rotation schedule (verdict
# r7 next #6: every query's driver-grade certification stays <= 2 rounds
# old). Round-11 rotation: the r10 window (the 41 oldest-certification
# rows brought back in r10 + the r10-changed eight + q92-q95) carries
# over, minus two seats for the new q96 (DSIR hashed bigrams) and q97
# (quality classifier) — parked rows and their covers are annotated
# inline at the tail's end. Rows whose operator code changed THIS
# round all sit in-window for fresh driver-grade certification: q89
# (cluster_purity null-label filter), q91 (null-text auto routing),
# q92 (bpe_train local engine — the auto path now runs the in-process
# merge loop), q94 (dsir feature-space signature), q95 (mmr grouped
# engine, now the certified leg), q96/q97 (new queries always certify
# driver-grade in their first round). Every tail entry stays
# re-certified locally each round by plans/compare.py compare_all at
# three scales (CORRECTNESS_local_r{N}.json). Registry contents
# unchanged — order only.
_DRIVER_WINDOW_TAIL = [
    "q01_pricing_summary",
    "q06_two_level_count_filter",
    "q23_parafac_decompose",
    "q24_time_mode_peaks",
    "q25_dedup_exact",
    "q28_simhash_dups",
    "q30_cosine_topk",
    "q31_cosine_lsh",
    "q32_lang_id",
    "q33_quality_score",
    "q34_token_counts",
    "q35_multimodal_metadata",
    "q36_multimodal_features",
    "q37_sessionize",
    "q38_cosine_ivf",
    "q42_embedding_dups",
    "q43_dedup_components",
    "q49_dedup_corpus",
    "q50_dedup_components_distributed",
    "q51_sequence_packing",
    "q52_top_tfidf_terms",
    "q53_source_cap",
    "q55_substring_dups",
    "q56_normalized_dedup",
    "q58_semantic_closest_pairs",
    "q59_cluster_balanced_sample",
    "q60_kmeans_hierarchical",
    "q61_quality_percentiles",
    "q62_curate_corpus",
    "q63_kmeans_farthest_seeded",
    "q64_cluster_knn_graph",
    "q65_chunk_documents",
    "q66_mixture_sample",
    "q67_knn_multiprobe",
    "q78_incremental_block_dedup",
    "q80_compacted_block_census",
    "q81_containment_witness_lsh",
    "q83_bpe_merge_pairs",
    "q84_rarity_tail",
    "q85_contamination_spans",
    "q88_canonical_docs",
    "q90_hybrid_fusion",
    # q93's seat (BPE encoder): q57's min-id k-means trajectory stays
    # driver-covered through q89, which recomputes the full assign3
    # chain inside the window. Back in at r11:
    "q57_kmeans_clusters",
    # q94's seat (DSIR selection): q74's mod-split decile arithmetic is
    # exactly q87's cluster-split assignment device, driver-covered
    # through q87 inside the window. Back in at r11:
    "q74_decile_split_audit",
    # q95's seat (MMR rerank): q20's greedy ppm partitioner stays
    # certified each round by its reference-golden pytest plus the
    # 200-example property fuzz against the rule-by-rule python
    # reference (the strongest non-driver evidence in the suite).
    # Back in at r11:
    "q20_greedy_ppm_partition",
    # --- r11 rotation: q96 (DSIR hashed bigrams) and q97 (quality
    # classifier) take the two new seats; every row whose operator code
    # changed this round stays in-window (q89 null-label filter, q91
    # null-text routing, q92 local BPE engine, q94 feature-space
    # signature, q95 grouped engine, plus the new pair). Parked:
    # q97's seat: q29's canonical normalize+md5-digest machinery stays
    # driver-covered through q47 (regex-normalized rewrite gated by
    # clean_md5, in-window) and the md5-digest device additionally
    # rides q26/q27's oracle and q97's hashed features.
    "q29_fingerprint",
    # q96's seat: q75's cross-engine sampling primitive (the md5-prefix
    # rule) stays driver-covered through q46_stratified_sample
    # (in-window, same primitive); the sqrt-temperature weight
    # arithmetic is pinned by its by-hand pytest
    # (test_text_multimodal/test_retrieval sampling suites).
    "q75_temperature_sample",
    # q98's seat (boilerplate line removal): q39's nearest-value argmin
    # is the struct-min argmin device that stays in-window through
    # q05's groupwise argmax and q89's majority tie-break; q39 has
    # been driver-certified every round since r4 and keeps its
    # three-scale local certification.
    "q39_nearest_value",
    # (q40 returned to the window at r14: its top-k plan changed from a
    # census-global row_number to limit-then-rank and needs fresh
    # driver-grade certification; q99's seat is covered as before by
    # q15 in-window.)
    # --- r12 rotation: q100 (exact-substring rewrite) takes a new
    # seat. q100's seat: q44's pure-map per-row HOF repetition census
    # stays in-window through q91's F.aggregate fold rewrite (the same
    # zero-exchange device, plan-pinned), and the duplication DOMAIN
    # q44 only measures is now gated end-to-end by q100's md5-gated
    # rewrite; q44 has been driver-certified every round since r4 and
    # keeps its three-scale local certification.
    "q44_repetition_metrics",
    # q101's seat (image pHash near-dedup): q68's corpus-level block
    # rewrite stays in-window-covered through q100 — the exact-substring
    # rewrite runs the SAME census -> first-occurrence ownership ->
    # ordered-rebuild chain at strictly finer (every-offset) granularity
    # — plus q91's in-window intra-doc block fold; q68 driver-certified
    # every round since r7 with its own golden/pytest coverage.
    "q68_remove_dup_blocks",
    # q102's seat (multi-class classifier): q54's incremental
    # near-dedup state machinery stays covered by the delta-append ≡
    # from-scratch-rebuild equivalence pytests (the r9-accepted
    # rationale when q54 was first parked) and by the in-window
    # q26/q27 band+verify chain that produces the same signatures;
    # the rolling census half additionally rides q78/q80's tail rows,
    # re-certified locally at three scales every round.
    "q54_incremental_dedup",
    # q103's seat (rolling exact-substring dedup): q13's unimodal-
    # fraction agg rides pipeline.py's stage chain, which is pinned by
    # the reference-golden e2e parity suite (test_pipeline /
    # test_golden_parity — the q20-accepted strongest-non-driver
    # evidence class); the conditional-fraction aggregation device
    # itself stays in-window through q14 (CV per group) and q48's
    # rollup sums. Driver-certified every round since r4.
    "q13_conditional_fraction",
    # q104's seat (URL dedup): q17's union-align machinery now rides
    # IN-WINDOW queries structurally — q101 and q103 both build their
    # inputs with column-aligned unionByName over planted twins/halves,
    # so a union regression fails their md5 gates; q17 itself has been
    # driver-certified every round since r4.
    "q17_union_align",
    # q105's seat (Gopher rule bundle): q16's exact-median device is
    # the census-cumulative exact-percentile machinery that stays
    # in-window through q61's score-percentile chain (the same
    # inverted-CDF percentile definition over an exact census);
    # driver-certified every round since r4.
    "q16_median",
    # q106's seat (fuzzy decontamination): q21's scan-cycle binning is
    # pinned by test_sequential_ops' by-hand fixtures, and its
    # sequence-bucketization device stays in-window through q04's time
    # buckets; driver-certified every round since r4.
    "q21_scan_cycles",
    # q107's seat (domain cap): q22's as-of join machinery
    # (operators/asof.py) is pinned by test_sequential_ops' by-hand
    # fixtures plus the test_properties hypothesis fuzz, and the
    # tolerance/band join family it certifies (J5) stays in-window
    # through q09's band join; driver-certified every round since r4.
    "q22_asof_join",
    # --- r13 rotation: q108 (paragraph dedup), q109 (perplexity
    # buckets), q110 (int8 top-k) take the three new seats; q104-q106
    # stay in-window because their operators changed this round (the
    # four ADVICE fixes). Parked:
    # q108's seat: q05's group-wise argmax (ties kept) is the
    # struct-min/argmax device that stays in-window through q15's
    # count-distinct argmax and q89's majority tie-break — and q108
    # itself gates a min(struct) ownership argmin corpus-wide;
    # driver-certified every round since r2.
    "q05_groupwise_argmax",
    # q109's seat: q10's anti-join device now rides IN-WINDOW gated
    # rewrites structurally — q100's covered-position removal is an
    # explode+ANTI JOIN whose md5 gate fails on any anti-join
    # regression — and q18's interval anti-join stays in-window;
    # driver-certified every round since r2.
    "q10_anti_join",
    # q110's seat: q19's scalar-function surface (math/string/regex/
    # JSON) stays covered in-window by the gated regexp chains of
    # q104 (url canonicalization) and q47 (PII rewrite) and by its
    # own by-hand pytest family; driver-certified every round
    # since r2.
    "q19_scalar_functions",
    # --- r13 rotation (continued): q111 (HTML extraction), q112 (hard
    # negatives), q113 (deterministic shuffle), q114 (mixture plan),
    # q115 (char entropy), q116 (PQ ADC top-k) take six new seats —
    # new queries always certify driver-grade in their first round.
    # Parked:
    # q111's seat: q46's md5-prefix deterministic-sample primitive is
    # now gated STRONGER in-window by q113, which certifies the full
    # md5 permutation (every digest's rank, not just a 4-hex-char
    # threshold test); the stratified census half keeps its by-hand
    # pytest (test_text_multimodal sampling suite). Driver-certified
    # every round since r5.
    "q46_stratified_sample",
    # q112's seat: q93's BPE encoder consumes exactly the merge table
    # q92 certifies IN-WINDOW (the train->encode pair shares the merge
    # loop; q92's local-engine trajectory-equivalence pytest pins both
    # directions), and the encoder's longest-match application keeps
    # its by-hand + round-trip pytest family. Driver-certified r11-r12.
    "q93_bpe_encode",
    # q113's seat: q94's DSIR unigram importance scoring is the same
    # hashed-feature census/scoring chain q96 certifies in-window at
    # ngram=2 (strictly more machinery: the bigram zip + the same
    # bucket device), plus the batch==stream equivalence pytest.
    # Driver-certified r11-r12.
    "q94_dsir_select",
    # q114's seat: q76's corpus set-difference device (anti join over
    # content digests) stays in-window through q45's decontamination
    # anti-join and q100's explode+ANTI JOIN under an md5 rewrite gate;
    # its census half rides q79's pytest. Driver-certified since r7.
    "q76_corpus_diff",
    # q115's seat: q86's open-vocab bigram association census keeps the
    # token-pair zip device in-window through q96's hashed bigrams, and
    # its integer-bits association arithmetic (the q84 device) is
    # in-window through q109's bits-scored perplexity buckets; by-hand
    # pytest retained. Driver-certified r11-r12.
    "q86_bigram_assoc",
    # q116's seat: q79's cross-source duplicate matrix is a digest
    # group-census + source pair count whose census device stays
    # in-window through q104's canonical-key dup groups and whose
    # digest-dedup family is additionally q25/q49-covered in the local
    # three-scale artifact; by-hand pytest retained. Driver-certified
    # since r7.
    "q79_cross_source_dup_matrix",
    # q117's seat: q70's reference-census novelty scoring is the
    # vocab-census-vs-external-reference structure that q109 certifies
    # in-window (integer-bits scoring against a reference slice, the
    # strictly larger chain: census + join + rank cut); the single
    # exact division stays pinned by q70's by-hand pytest.
    # Driver-certified since r7.
    "q70_ngram_novelty",
    # q118's seat: q91's intra-doc keep-first-block rewrite domain is
    # gated in-window by q108, which plants the doc's OWN text repeated
    # intra-doc and removes the second occurrence under an md5 full-
    # text gate (plus the cross-doc half q91 doesn't do); the
    # zero-exchange F.aggregate fold device itself now also rides
    # q115's in-window entropy fold. Pytest family retained.
    # Driver-certified r11-r12.
    "q91_self_repetition_rewrite",
    # q119's seat: q89's contingency argmax (majority label, min-label
    # tie-break) is the struct-max device that stays in-window through
    # q05's groupwise argmax and q102's multiclass (score desc, label
    # asc) argmax; the kmeans assign3 chain it recomputes is pinned by
    # the integer-exact trajectory pytests and stays three-scale-
    # certified in the local artifact. Driver-certified r11-r12 (its
    # r11 operator change has two rounds of driver-grade evidence).
    # (q38 — already tail-parked since its r-earlier rotation — gains
    # NEW in-window coverage this round regardless: q119 re-walks its
    # cells/probes device inside the strictly larger IVFADC chain.)
    "q89_cluster_purity",
    # q120's seat: q97's quality-classifier scorer runs END-TO-END
    # inside the in-window q99 (quality_budget_fill composes the q97
    # scorer — its oracle recomputes the same weights/threshold chain),
    # and the hashed-feature device additionally rides q102's
    # multiclass generalization in-window; NB-weight training keeps its
    # by-hand pytest. Driver-certified r11-r12.
    "q97_quality_classifier",
    # q121's seat: q47's md5-gated regexp-rewrite device is DOUBLY
    # in-window — q111's extraction chain (a strictly larger gated
    # regexp pipeline) and q104's url canonicalization both fail their
    # gates on any regexp_replace regression — and q121 itself gates
    # the same normalize-chain class; the PII pattern semantics keep
    # their by-hand pytest family. Driver-certified every round
    # since r5.
    "q47_redact_pii",
    # --- r14 rotation: q122 (k-means-trained PQ chain) takes one new
    # seat and q40 RETURNS to the window (its top-k plan changed to
    # limit-then-rank this round — changed-operator rows certify
    # driver-grade). Rows whose operators also changed this round were
    # already in-window and stay: q15 (same limit-then-rank change),
    # q112 (raw-label comparison), q121 (phrase normalization + the
    # punctuated-phrase gate), q101 (banding refactor, default path
    # plan-identical). Parked:
    # q14's seat: A7's CV = std/mean decimal arithmetic is pinned by
    # functions/numeric's by-hand pytest family, and the decimal-exact
    # aggregate device stays in-window through q48's ROLLUP pricing
    # sums and q12's star-join revenue; driver-certified every round
    # since r4 and three-scale-certified in the local artifact.
    "q14_cv_per_group",
    # q11's seat: J4's left-semi join is the complement of the anti-
    # join device that stays DOUBLY in-window (q18's interval anti-join
    # and q100's explode+anti-join under an md5 full-text gate) on the
    # same join machinery; q11 keeps its by-hand relational pytest and
    # three-scale local certification. Driver-certified every round
    # since r4.
    "q11_semi_join",
    # q123's seat (PSL chain): F6/A12's histogram-cutoff binning is
    # pinned by test_relational_ops' by-hand fixtures, and the
    # bucketization device stays in-window through q04's time buckets;
    # q08 has been driver-certified every round since r4 and stays
    # three-scale-certified in the local artifact.
    "q08_histogram_cutoff",
    # q124's seat (trained IVFADC): q116's first-k codebook + encode +
    # LUT + ADC chain is recomputed END TO END inside the in-window
    # q125 oracle (its approx side is exactly the q116 chain at k=10),
    # and the ADC scoring device additionally rides q119/q122/q124
    # in-window; by-hand pytest family retained. Driver-certified
    # r13-r14.
    "q116_pq_topk",
    # q125's seat (recall audit): q110's int8 quantize + integer-dot
    # device is recomputed inside the in-window q112 (label-excluded
    # top-k) and q125's truth side, and the shared qz oracle CTE
    # underpins the whole in-window PQ family (q122/q124/q125);
    # by-hand pytest retained. Driver-certified r13-r14.
    "q110_int8_topk",
    # q126's seat (curriculum order): J1's broadcast-interval join
    # device stays in-window through q09's tolerance/band join and
    # q18's interval anti-join (the same interval machinery both
    # directions), and q02 keeps its by-hand relational pytest
    # fixtures; driver-certified every round since r2 and three-scale-
    # certified in the local artifact.
    "q02_interval_join",
    # --- r15 rotation: q127 (residual IVFADC) and q128 (capstone
    # pretrain-assembly chain) take the two new seats — new queries
    # always certify driver-grade in their first round. Rows whose
    # operators changed this round stay in-window: q121 (blocklist
    # engine param — inline path plan-identical), q119/q122/q124/q125
    # (the PQ subspace-explode refactor + single-coarse-training fix +
    # recall-audit dedup). Parked:
    # q127's seat: q45's shingle-decontamination device (n-gram
    # explode -> DISTINCT -> benchmark semi-join -> overlap census) is
    # recomputed END TO END inside the in-window q128 oracle (its
    # decontaminate stage, at n=5 — strictly the same CTE shape), and
    # the anti-join consumption side stays in-window through q128's
    # alive4 stage and q18's interval anti-join; q45 has been
    # driver-certified every round since r5 and keeps its three-scale
    # local certification.
    "q45_decontaminate",
    # q128's seat: q113's md5 permutation (shard = 60-bit digest
    # prefix mod N, pos = digest rank within shard) is recomputed
    # FULLY inside the in-window q128 oracle (shuffle_shard /
    # shuffle_pos on the surviving corpus, salt 'ep128') and inside
    # the in-window q126 curriculum ordering (the same device keyed by
    # stage); q113 driver-certified r13-r14 and three-scale-certified
    # locally.
    "q113_deterministic_shuffle",
    # q129's seat (blocklist join engine): q114's mixture arithmetic
    # (available-token census, floor-div targets over the weight-dict
    # total, ceil-div epochs) is recomputed inside the in-window q128
    # oracle's avail/plan CTEs on the surviving corpus — the same
    # integer devices on a strictly harder input (a gated, deduped,
    # capped population instead of the raw table); q114
    # driver-certified r13-r14 and three-scale-certified locally.
    "q114_mixture_plan",
    # q130's seat (IVFADC + exact re-rank): q118's per-shard greedy
    # packing walk (fits / overflows / oversize-alone, every branch)
    # is recomputed as the SAME recursive CTE inside the in-window
    # q128 oracle — identical budget 60, on the gated/deduped corpus
    # (a strictly harder input: stage interactions feed the walk);
    # q118 driver-certified r13-r14 and three-scale-certified locally.
    "q118_whole_doc_packing",
    # --- r16 rotation: q131 (rolling ANN ingestion) takes the one new
    # seat — new queries always certify driver-grade in their first
    # round. Rows whose operators changed this round all sit in-window
    # already and stay: q125 (recall-audit depth guard), q127/q130
    # (residual family delegation to ivfadc_build_index + rerank
    # pushdown), q119/q122/q124 (geometry asserts + broadcast_lut on
    # the PQ search paths), q121/q129 (blocklist phrases_df plumbing),
    # q101 (dhash64 decoder param; default leg plan-identical). Parked:
    # q131's seat: q40's limit-then-rank heavy-hitters device returned
    # to the window at r14 for exactly this plan shape and has two
    # rounds of driver-grade certification (r14-r15); the SAME
    # limit-then-rank change is still certified in-window through q15
    # (count-distinct argmax, the r14 twin), and q40 keeps its
    # three-scale local certification every round.
    "q40_heavy_hitters",
]
for _name in _DRIVER_WINDOW_TAIL:
    QUERY_REGISTRY[_name] = QUERY_REGISTRY.pop(_name)
