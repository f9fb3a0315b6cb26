"""Tenth batch: co-occurrence analysis, gaps-and-islands, ratio-to-report,
and the iterative-algorithm representative (Lloyd k-means).

* ``basket_brand_pairs`` — market-basket co-occurrence: brand pairs
  purchased in the same order. The self-join-on-container shape behind
  association mining and co-citation graphs.
* ``events_activity_streaks`` — gaps-and-islands: maximal runs of
  consecutive active days per user (the sequence-continuity primitive
  behind streaks, SLA windows, and sessionized retention).
* ``share_of_priority_by_status`` — ratio-to-report window: each
  priority's share of its status group, on integer counts so the
  single final division is bit-deterministic.
* ``kmeans_lloyd`` — fixed-iteration Lloyd clustering over the
  embeddings table (driver-looped deterministic DataFrame rounds;
  rows-only check — float distances are not SQL-oracle material, but
  runs are bit-reproducible, asserted in tests/test_kmeans.py).

The reference has no joins, windows, or iteration at all (SURVEY.md
§2a "explicitly absent"); these are EXT rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.similarity import kmeans_lloyd
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "basket_brand_pairs",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON l_partkey = p_partkey
        )
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
        HAVING COUNT(*) >= 100
    """,
    tags=("E1", "EXT"),
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence. Dims first: the part join is a
    joined by AQE size choice (part is an SF-scaling dimension — small
    enough to broadcast until it isn't), then DISTINCT collapses to one
    row per (order, brand) BEFORE the self-join — the self-join input
    is bounded by orders×brands-per-order, not raw lineitems. The
    `<` predicate halves the pair space and canonicalizes pair order.
    At 100 TB the self-join co-partitions both sides on l_orderkey
    (same key both sides → one shuffle, reused), and per-order fan-out
    is quadratic only in the per-basket distinct-brand count — small
    by nature; a pathological mega-basket is the thing to clamp
    upstream (cap distinct items per container)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.p_brand") < F.col("b.p_brand")))
        .groupBy(F.col("a.p_brand").alias("brand_a"),
                 F.col("b.p_brand").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 100)
    )


@query(
    "events_activity_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), isl AS (
            SELECT user_id, d,
                   (d - DATE '1970-01-01')
                   - row_number() OVER (PARTITION BY user_id ORDER BY d)
                       AS grp
            FROM days
        )
        SELECT user_id,
               strftime(MIN(d), '%Y-%m-%d') AS streak_start,
               strftime(MAX(d), '%Y-%m-%d') AS streak_end,
               COUNT(*) AS n_days
        FROM isl
        GROUP BY user_id, grp
        HAVING COUNT(*) >= 3
    """,
    tags=("E5", "E14", "EXT"),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal consecutive-day activity runs per
    user via the classic date-minus-row_number island key (consecutive
    days share a constant difference). DISTINCT collapses the stream
    to user-days first, so the window and the island agg both run on
    |user|×|days| rows, and all three hops (distinct, window, agg)
    hash the same user_id key — Catalyst reuses one exchange. Integer
    date arithmetic end-to-end; nothing float, fully oracle-exact."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id", "d",
        (F.datediff("d", F.lit("1970-01-01"))
         - F.row_number().over(w)).alias("grp"),
    )
    return (
        isl.groupBy("user_id", "grp")
        .agg(F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
             F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
             F.count(F.lit(1)).alias("n_days"))
        .filter(F.col("n_days") >= 3)
        .drop("grp")
    )


@query(
    "share_of_priority_by_status",
    oracle="""
        WITH counts AS (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
            FROM orders
            GROUP BY 1, 2
        )
        SELECT o_orderstatus, o_orderpriority, n_orders,
               CAST(n_orders AS DOUBLE)
               / SUM(n_orders) OVER (PARTITION BY o_orderstatus)
                   AS share_of_status
        FROM counts
    """,
    tags=("E5",),
)
def share_of_priority_by_status(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Ratio-to-report: each priority's share within its status.
    Aggregate-then-window — the window input is the |status|×|priority|
    grid, not the raw table, and both steps share the status hash
    partitioning. The share divides two exact integers (one double
    division at the end), so it is bit-identical cross-engine —
    the pattern for any percent-of-total on counts or money."""
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("o_orderstatus")
    return counts.select(
        "o_orderstatus", "o_orderpriority", "n_orders",
        (F.col("n_orders").cast("double") / F.sum("n_orders").over(w))
        .alias("share_of_status"),
    )


@query(
    "kmeans_lloyd",
    oracle=None,  # float distances — deterministic but not SQL-oracle-able
    tags=("E11", "EXT"),
)
def kmeans_lloyd_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three Lloyd iterations, k=4, over the embeddings table; emits
    final cluster sizes + representative id. See
    operators.similarity.kmeans_lloyd for the iteration shape (E-step
    broadcast-literal argmin, M-step k·d-cell decimal-exact shuffle)."""
    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(e, k=4, iters=3)
