"""Incremental-maintenance and sequence queries, round 4 (cont. 4):
mergeable aggregate-state maintenance (the materialized-view /
incremental-rollup pattern), a Markov transition matrix over per-user
event sequences, and a trailing-24-hour RANGE-frame window — three
shapes a production warehouse leans on daily, each strictly
oracle-checked.

Scale shapes:

* **State merge** — the partial-aggregate state (count + long-quantized
  sum per key) is associative/commutative, so yesterday's state and
  today's delta combine WITHOUT rescanning history: cost is
  O(|delta| + |keys|), the difference between a 100 TB backfill and a
  1 GB increment. The query proves merged(base, delta) ≡ full
  recompute — the invariant every incremental pipeline rests on.
* **Markov transitions** — ``lead()`` inside a per-user window (one
  hash shuffle on user_id, within-partition sort bounded by a user's
  own history), then the transition matrix is |event_types|² rows —
  effectively scalar state thereafter.
* **Trailing 24 h** — a genuine RANGE frame over microsecond offsets:
  each task sorts only its user's timeline; the decimal in-frame
  accumulator keeps the sliding sum order-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

_DAY_US = 24 * 3600 * 1000 * 1000


@query(
    "incremental_agg_merge",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total_value
        FROM events
        GROUP BY event_type
    """,
    tags=("EXT", "incremental"),
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the corpus is split into a
    'base' (history) and a 'delta' (arriving batch) by a deterministic
    id rule, each side reduces to mergeable per-key state (count +
    long-quantized sum — both plain SUMs under merge), and the states
    combine by re-aggregation. The oracle recomputes from scratch over
    the full table; equality proves the merge path is lossless — the
    contract that lets a 100 TB rollup absorb a daily delta without a
    history rescan. (The long-quantized sum is exactly why: FLOAT sums
    are order-dependent and would NOT merge losslessly.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("_q"))

    def partial_state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("_n"), F.sum("_q").alias("_s"))

    base = partial_state(ev.filter(F.col("event_id") % 10 != 0))
    delta = partial_state(ev.filter(F.col("event_id") % 10 == 0))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("_n").alias("n_events"),
             (F.sum("_s").cast("double") / F.lit(100.0))
             .alias("total_value"))
    )


@query(
    "markov_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ), t AS (
            SELECT from_type, to_type, COUNT(*) AS n_trans
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n_trans,
               n_trans / SUM(n_trans) OVER (PARTITION BY from_type)
                   AS p_trans
        FROM t
    """,
    tags=("EXT", "sequence"),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    consecutive event pair in a user's timeline, count and normalize
    (from_type → to_type) transitions. The heavy relation shuffles
    once on user_id for the ``lead`` window; the matrix itself is
    |types|² rows, so the normalizing window is scalar-scale. The
    probability is one exact integer division — engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    t = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    wn = Window.partitionBy("from_type")
    return t.select(
        "from_type", "to_type", "n_trans",
        (F.col("n_trans") / F.sum("n_trans").over(wn)).alias("p_trans"),
    )


@query(
    "events_trailing_24h_spend",
    oracle=f"""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               COUNT(*) OVER w AS n_24h,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
                   / CAST(100 AS DOUBLE) AS spend_24h
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN {_DAY_US} PRECEDING AND CURRENT ROW
        )
    """,
    tags=("E5", "timeseries"),
)
def events_trailing_24h_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour per-user activity: a true RANGE frame over
    microsecond offsets (value-based, not row-based — the frame adapts
    to each event's timestamp). One shuffle on user_id; each task
    sorts only its users' timelines; the decimal accumulator keeps the
    sliding sum order-exact so the oracle matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-_DAY_US, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts_us",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).over(w)
         .cast("double") / F.lit(100.0)).alias("spend_24h"),
    )


@query(
    "table_diff_orders",
    oracle="""
        WITH v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_custkey % 97 = 0 THEN o_totalprice + 1.0
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 101 != 0
            UNION ALL
            SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice
            FROM orders WHERE o_orderkey % 103 = 0
        )
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN a.o_orderkey IS NULL THEN 'added'
                    WHEN b.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change_type,
               a.o_totalprice AS old_price,
               b.o_totalprice AS new_price
        FROM orders a FULL OUTER JOIN v2 b USING (o_orderkey)
        WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
           OR a.o_totalprice != b.o_totalprice
    """,
    tags=("EXT", "versioning"),
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two table versions (the data-versioning /
    audit primitive): v2 is derived deterministically from v1 by
    keyed delete/update/insert rules (identical derivation in the
    oracle), then ONE full-outer equi-join on the key classifies every
    row as added / removed / changed — unchanged rows drop out before
    the result materializes. At 100 TB both sides shuffle once on the
    key (or zero times if both snapshots are bucketed on it); the
    comparison itself is row-local."""
    v1 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    v2 = (
        v1.filter(F.col("o_orderkey") % 101 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_custkey") % 97 == 0,
                   F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice")).alias("o_totalprice"))
        .unionByName(
            v1.filter(F.col("o_orderkey") % 103 == 0)
            .select((F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                    "o_totalprice"))
    )
    a = v1.select("o_orderkey", F.col("o_totalprice").alias("old_price"))
    b = v2.select("o_orderkey", F.col("o_totalprice").alias("new_price"))
    j = a.join(b, "o_orderkey", "full_outer")
    return (
        j.filter(F.col("old_price").isNull() | F.col("new_price").isNull()
                 | (F.col("old_price") != F.col("new_price")))
        .select(
            "o_orderkey",
            F.when(F.col("old_price").isNull(), F.lit("added"))
            .when(F.col("new_price").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed")).alias("change_type"),
            "old_price", "new_price")
    )


@query(
    "histogram_equidepth_price",
    oracle="""
        WITH t AS (
            SELECT l_extendedprice,
                   ntile(10) OVER (
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS tile
            FROM lineitem
        )
        SELECT tile, COUNT(*) AS n_rows,
               MIN(l_extendedprice) AS lo,
               MAX(l_extendedprice) AS hi
        FROM t GROUP BY tile
    """,
    tags=("E8", "EXT"),
)
def histogram_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram — the complement of
    ``histogram_price``'s equi-width buckets and the shape ANALYZE
    statistics collectors compute. Tiles come from
    :func:`operators.order.distributed_ntile` (range-bucketed rank +
    arithmetic ntile — no single-partition sort), then one bounded
    aggregate yields exact per-tile counts and boundary values."""
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_ntile,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber")
    tiled = distributed_ntile(
        li, F.col("l_extendedprice"), F.col("l_orderkey"),
        F.col("l_linenumber"), k=10, name="tile")
    return tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


@query(
    "rolling_7d_active_users",
    oracle="""
        SELECT wd AS window_day, COUNT(DISTINCT user_id) AS n_active
        FROM (
            SELECT user_id,
                   unnest(generate_series(
                       epoch_us(ts) // 86400000000,
                       epoch_us(ts) // 86400000000 + 6)) AS wd
            FROM events
        )
        GROUP BY 1
    """,
    tags=("E14", "EXT", "timeseries"),
    bench=True,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the classic
    metric a sliding COUNT(DISTINCT) window cannot partial-aggregate.
    The standard distributed rewrite: each event fans out to the 7
    day-windows it participates in (explode factor = window/slide,
    bounded), then ONE distinct aggregate per window key. Trailing
    windows past the data horizon carry partial tails by construction
    (mirrored exactly in the oracle). At scale the fan-out happens
    AFTER a per-(user, day) dedup, so the exploded relation is bounded
    by active-user-days × 7, not raw events."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("ts_us DIV 86400000000")
    return (
        ev.select("user_id", day.alias("_d"))
        .distinct()  # dedup to active user-days BEFORE the 7× fan-out
        .select("user_id",
                F.explode(F.sequence(F.col("_d"), F.col("_d") + 6))
                .alias("window_day"))
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
