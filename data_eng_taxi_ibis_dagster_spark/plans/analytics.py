"""Product-analytics query pack: retention cohorts, RFM segmentation,
and distribution histograms — the standard read-side workloads a
warehouse serves on top of the event/order tables.

All strictly oracle-checked: cohort arithmetic is integer week
bucketing, RFM uses ntile over totally ordered windows (unique
tiebreaks), and the histogram is fixed-width integer binning with
order-independent extrema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

_WEEK_US = 7 * 24 * 3600 * 1_000_000


@query(
    "events_retention_cohorts",
    oracle=f"""
        WITH firsts AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) // {_WEEK_US} AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // {_WEEK_US} AS active_week
            FROM events
        )
        SELECT f.cohort_week,
               a.active_week - f.cohort_week AS weeks_since,
               CAST(COUNT(*) AS BIGINT) AS n_active_users
        FROM firsts f JOIN activity a USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("E5", "E14", "EXT"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen week
    (cohort), counted in each subsequent week they were active.
    Shape: two user-keyed aggregates (both partial-combined map-side)
    and one co-partitioned join on user_id — the join carries one row
    per (user, active week), already deduplicated, so at 100 TB the
    joined relation is bounded by user-weeks, not raw events. The
    final (cohort, offset) aggregate has a tiny keyspace."""
    e = load_table(spark, sf_dir, "events")
    week = (F.col("ts_us") / F.lit(_WEEK_US)).cast("long")
    firsts = (
        e.select("user_id", week.alias("w"))
        .groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    )
    activity = e.select("user_id", week.alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week"))
                .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "rfm_segmentation",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey AS custkey,
                   MAX(o_orderdate) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS monetary
            FROM orders GROUP BY o_custkey
        )
        SELECT custkey,
               CAST(ntile(4) OVER (ORDER BY last_order, custkey) AS BIGINT)
                   AS r_quartile,
               CAST(ntile(4) OVER (ORDER BY frequency, custkey) AS BIGINT)
                   AS f_quartile,
               CAST(ntile(4) OVER (ORDER BY monetary, custkey) AS BIGINT)
                   AS m_quartile
        FROM per_cust
    """,
    tags=("E5", "EXT"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartiles: per customer, recency (last order date),
    frequency (order count), monetary (exact decimal total), each
    ntile(4)-ranked with custkey tiebreaks so the quartile assignment
    is total-order deterministic. The per-customer aggregate shuffles
    once on custkey; the three quartile assignments use
    ``operators.order.distributed_ntile`` — range-bucketed rank +
    arithmetic ntile — instead of global ntile windows, so NOTHING
    sorts the customer relation on a single partition (the only
    single-partition window is the 256-row bucket-offset running sum).
    Bucket ids come from a monotone *non-decreasing* double cast of
    each measure, which is all bucketing needs — exact within-bucket
    order still uses the raw (measure, custkey) key, and monetary
    stays DECIMAL end-to-end."""
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_ntile,
    )

    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
                .alias("monetary"),
        )
    )
    tiled = per_cust
    for score, out in [
        (F.unix_micros(F.col("last_order").cast("timestamp")), "r_quartile"),
        (F.col("frequency"), "f_quartile"),
        (F.col("monetary"), "m_quartile"),
    ]:
        tiled = distributed_ntile(
            tiled, score, F.col("custkey"), k=4, name=out)
    return tiled.select(
        "custkey",
        F.col("r_quartile").cast("long").alias("r_quartile"),
        F.col("f_quartile").cast("long").alias("f_quartile"),
        F.col("m_quartile").cast("long").alias("m_quartile"),
    )


@query(
    "sketch_rollup_uniques",
    oracle=None,  # HLL estimates — approximate by design, rows-only
    tags=("E8", "E14", "EXT"),
    bench=True,
)
def sketch_rollup_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch-column rollup — THE pattern for incremental
    distinct counts at 100 TB: per-day HLL sketches (Spark's native
    datasketches ``hll_sketch_agg``) are data, not just aggregates —
    persist them with each daily partition and any later rollup
    (week/month/all-time) is a cheap ``hll_union_agg`` over sketch
    bytes instead of a re-scan of raw events. Register-wise max-merge
    is commutative, so estimates are partition-order deterministic.
    Emits per-week estimated uniques from merged daily sketches; the
    pytest twin (test_operators) asserts <2% error vs exact."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    daily = e.groupBy(day).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
    )
    week = (F.unix_micros(F.col("day")) / F.lit(_WEEK_US)).cast("long")
    return (
        daily.groupBy(week.alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
                .alias("est_weekly_users"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("week")
    )


_BIN_W = 10_000


@query(
    "histogram_price",
    oracle=f"""
        SELECT CAST(floor(o_totalprice / {_BIN_W}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(o_totalprice) AS bin_min,
               MAX(o_totalprice) AS bin_max
        FROM orders
        GROUP BY 1
    """,
    tags=("E7", "EXT"),
)
def histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (profiling / data-viz
    feed): integer bin ids via floor division, per-bin counts and
    exact extrema (min/max are order-independent, so raw doubles are
    bit-stable cross-engine). One map-side-combined aggregate over a
    bounded bin keyspace — the full-table distribution costs one
    shuffle of (bins × partitions) rows regardless of data size."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / _BIN_W).cast("long")
             .alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
    )
