"""E14 — event-time windowed aggregations, batch-rendered.

Each query calls the SAME transformation builder the streaming entry
points use (streaming/events.py), on the static events table. The
DuckDB oracle proves the windowing semantics here; the streaming tests
prove the streaming runtime reproduces the batch result. Window starts
travel as epoch microseconds — engine-neutral, precision-exact (DuckDB
truncates the fixture's nanosecond timestamps to micros exactly like
our ``ts DIV 1000`` read-side normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import sql_lsum
from data_eng_taxi_ibis_dagster_spark.operators.relational import asof_join
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table
from data_eng_taxi_ibis_dagster_spark.streaming.events import (
    dedup_events,
    hourly_by_type,
    sessionize,
    sliding_value,
)


@query(
    "events_hourly_by_type",
    oracle=f"""
        SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws_us,
               event_type,
               COUNT(*) AS n_events,
               {sql_lsum('value')} AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("E14",),
    bench=True,
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × type (streaming/events.hourly_by_type
    on the static table)."""
    return hourly_by_type(load_table(spark, sf_dir, "events"))


@query(
    "events_sliding_value",
    oracle=f"""
        SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, ts) - k.k * INTERVAL 30 MINUTE) AS ws_us,
               COUNT(*) AS n_events,
               {sql_lsum('value')} AS total_value
        FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
        GROUP BY 1
    """,
    tags=("E14",),
)
def events_sliding_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows — each event contributes to exactly two
    windows; the oracle renders the slide as an explicit 2-way offset
    cross join."""
    return sliding_value(load_table(spark, sf_dir, "events"))


@query(
    "events_sessionize",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 600000000
                        OR LAG(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), tagged AS (
            SELECT user_id, ts_us,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                                     ROWS UNBOUNDED PRECEDING) AS sess_no
            FROM seq
        )
        SELECT user_id,
               MIN(ts_us) AS session_start_us,
               COUNT(*) AS n_events
        FROM tagged
        GROUP BY user_id, sess_no
    """,
    tags=("E14",),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 10-minute-gap session windows. The oracle is classic SQL
    sessionization (lag → new-session flag → running sum → group):
    provably the same semantics as session_window's gap merging, with
    the ≥-gap boundary matching session_window's exclusive end."""
    return sessionize(load_table(spark, sf_dir, "events"), "10 minutes")


@query(
    "events_dedup_ids",
    oracle="""
        SELECT DISTINCT event_id, event_type, value
        FROM (
            SELECT event_id, event_type, value FROM events
            UNION ALL
            SELECT event_id, event_type, value FROM events
        )
    """,
    tags=("E14", "E9"),
)
def events_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-id dedup over a doubled stream (the fixture has unique ids,
    so duplication is synthesized to make the collapse observable). The
    streaming twin is dropDuplicatesWithinWatermark — see
    streaming/events.dedup_events and its test."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return dedup_events(e.unionByName(e))


@query(
    "events_asof_purchase_click",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               epoch_us(p.ts) AS ts_us,
               epoch_us(c.ts) AS click_ts_us,
               c.value AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    tags=("E2", "E14"),
    bench=True,
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    strictly-earlier click. Implemented with the union+window pattern
    (operators.relational.asof_join — ONE shuffle on user_id, no range
    explosion); the oracle uses DuckDB's native ASOF JOIN, so two
    independent as-of implementations must agree."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases, clicks,
        on="user_id", left_time="ts_us", right_time="click_ts_us",
        right_cols=["click_ts_us", "click_value"], strict=True,
    )


@query(
    "events_click_purchase_interval",
    oracle="""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.user_id,
               epoch_us(p.ts) AS purchase_ts_us,
               epoch_us(c.ts) AS click_ts_us,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
    tags=("E2", "E14"),
)
def events_click_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join, batch-rendered: all clicks within 30 minutes
    before each purchase by the same user (multi-touch attribution; the
    as-of query above keeps only the latest touch). Same builder runs as
    a stream-stream join in streaming/events.py, where the watermark +
    interval bound the join state."""
    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        click_purchase_pairs,
    )

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    return click_purchase_pairs(clicks, purchases)


@query(
    "events_value_quantiles_hourly",
    oracle="""
        WITH ranked AS (
            SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY FLOOR(value)) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
            WHERE value IS NOT NULL  -- sketch drops NULLs
        )
        SELECT event_type, CAST(p.pct AS BIGINT) AS pct,
               CAST(MIN(CASE WHEN rn * 100 >= p.pct * cnt
                             THEN v END) AS BIGINT) AS est_lo,
               CAST(MAX(cnt) AS BIGINT) AS n_rows
        FROM ranked CROSS JOIN (VALUES (50), (95)) AS p(pct)
        GROUP BY event_type, p.pct
        ORDER BY event_type, pct
    """,
    tags=("E8", "E14", "EXT"),
)
def events_value_quantiles_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value percentiles read off MERGED per-hour quantile
    sketches (streaming/events.hourly_value_sketch — the SAME builder
    the maintained-table pipeline ``hourly_value_sketch_incremental``
    runs): hourly (window, type, bin) grid rows merge by count
    addition across every event-time slice, then p50/p95 come off the
    merged grid. The strict oracle derives true width-1-grid
    PERCENTILE_DISC by rank selection over the RAW rows — hash-match
    proves the event-time two-level path (slice → additive merge →
    quantile read) exact, the streaming-shaped companion of
    ``quantile_sketch_rollup``'s month slices. At 100 TB the hourly
    grids are the maintained rollup table; this read never touches raw
    events."""
    from data_eng_taxi_ibis_dagster_spark.operators import qsketch as Q
    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        hourly_value_sketch,
    )

    hourly = hourly_value_sketch(load_table(spark, sf_dir, "events"),
                                 width=1)
    merged = Q.merge_sketches(hourly, group_cols=["event_type"])
    return (
        Q.sketch_quantiles(merged, [50, 95], width=1,
                           group_cols=["event_type"])
        .orderBy("event_type", "pct")
    )
