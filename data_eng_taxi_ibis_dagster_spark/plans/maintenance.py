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
               CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE)
                   AS spend_24h
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
        F.sum(F.col("value").cast("decimal(38,2)")).over(w)
        .cast("double").alias("spend_24h"),
    )
