"""Event-time processing over the events table (EXT E14).

The transformation builders here are *shared* between the batch plans
(plans/streaming_batch.py — oracle-checked against DuckDB) and the
Structured Streaming entry points (readStream → same builder →
writeStream). That makes the correctness argument compositional:
DuckDB proves the windowing semantics on the batch rendering, and the
streaming tests prove batch-equivalence of the runtime.

Scale notes: tumbling/sliding aggregations and watermarked dedup keep
bounded per-key state in the state store; session windows are merged by
Spark's session-window exec. Watermarks bound state growth — at 100 TB
of events/day the watermark delay IS the state budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import lsum
from data_eng_taxi_ibis_dagster_spark.sources.tables import _normalize_events


def _as_stream_dir(sf_dir: str, table: str = "events") -> str:
    """Spark's file stream source requires a *directory*; the fixture is
    a single file. Stage a directory of symlinks (no data copied) —
    at scale the source would already be a directory of parquet parts."""
    import hashlib
    import os

    out = os.path.join(
        "/tmp", "spark_graft_streams",
        hashlib.md5(f"{sf_dir}:{table}".encode()).hexdigest()[:12],
    )
    os.makedirs(out, exist_ok=True)
    link = os.path.join(out, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/{table}.parquet", link)
    return out


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1,
                       stream_dir: str | None = None) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from
    the static read, nanos normalized identically). ``stream_dir``
    overrides the staged fixture directory — a live landing directory
    where new parquet parts keep arriving between runs."""
    from data_eng_taxi_ibis_dagster_spark.session import ensure_conf

    ensure_conf(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir or _as_stream_dir(sf_dir))
    )
    return _normalize_events(stream)


def read_documents_stream(spark: SparkSession, sf_dir: str,
                          max_files_per_trigger: int = 1,
                          stream_dir: str | None = None) -> DataFrame:
    """File-source stream over the documents parquet (schema pinned
    from the static read) — the ingest shape for streaming text
    operators (the stateful heavy-hitter sketch). ``stream_dir``
    overrides the staged fixture directory, same contract as
    :func:`read_events_stream`."""
    from data_eng_taxi_ibis_dagster_spark.session import ensure_conf

    ensure_conf(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir or _as_stream_dir(sf_dir, "documents"))
    )


# -- shared transformations (batch plans import these) ----------------------

def hourly_by_type(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows × event_type: counts + exact
    value sum. Window starts exposed as epoch micros (engine-neutral)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             lsum("value").alias("total_value"))
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hourly_value_sketch(events: DataFrame, *, width: int = 1) -> DataFrame:
    """Tumbling 1-hour windows × event_type × value-grid bin: the
    mergeable quantile-histogram sketch (``operators/qsketch``) as a
    STREAMING-maintainable relation. Each (window, type) group's value
    distribution is ≤ range/width grid rows whose counts are additive
    — exactly the state a streaming aggregation keeps per key, so the
    sketch column needs no custom stateful operator: it IS a grouped
    count with the bin in the key. Shared by the batch rendering and
    ``hourly_value_sketch_incremental`` (the maintained-table path).
    NULL values are dropped BEFORE binning — the
    ``operators/qsketch.histogram_sketch`` contract (and the
    registered oracle's ``WHERE value IS NOT NULL``); without the
    filter a NULL row would land in a NULL ``_qs_bin`` that inflates
    ``n_rows`` and, under NULLS-FIRST ordering, shifts every
    cumulative rank (round-9 review finding — latent until a fixture
    regeneration introduces a NULL value)."""
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
            F.floor(F.col("value") / F.lit(width)).cast("long")
            .alias("_qs_bin", metadata={"qs_width": width}),
        )
        .agg(F.count(F.lit(1)).alias("_qs_n"))
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "_qs_bin",
            "_qs_n",
        )
    )


def hourly_value_sketch_incremental(spark: SparkSession, sf_dir: str,
                                    path: str, *, checkpoint: str,
                                    width: int = 1,
                                    watermark: str = "2 hours",
                                    stream_dir: str | None = None):
    """Continuous SKETCH-column rollup (round-9 verdict #5's streaming
    half): maintain per-(hour, type) quantile-histogram grid rows in a
    partitioned parquet table, incrementally. ``update`` mode emits
    only the (window, type, bin) keys each micro-batch changed — with
    their new RUNNING counts from the streaming state store — and
    foreachBatch upserts them by full grid key, so late rows within
    the watermark correct exactly their bins and history partitions
    go cold once the watermark passes. Percentiles-without-rescan
    then read off the maintained table via ``merge_sketches`` +
    ``sketch_quantiles`` at ANY slice granularity — the batch-serving
    half never touches raw events. (Strict external twin of the merge
    machinery: ``quantile_sketch_incremental``.)"""
    from data_eng_taxi_ibis_dagster_spark.sources.sinks import (
        merge_upsert_partitioned,
    )

    stream = read_events_stream(spark, sf_dir, stream_dir=stream_dir)
    sk = hourly_value_sketch(stream.withWatermark("ts", watermark),
                             width=width)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        updates = batch_df.withColumn(
            "ws_date",
            F.to_date(F.timestamp_micros(F.col("ws_us"))),
        )
        if updates.isEmpty():
            return
        merge_upsert_partitioned(
            batch_df.sparkSession, path, updates,
            key=("ws_us", "event_type", "_qs_bin"),
            partition_by=("ws_date",),
        )

    q = (
        sk.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def sliding_value(events: DataFrame) -> DataFrame:
    """Sliding windows (1 hour long, 30-minute slide): each event lands
    in exactly two windows."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             lsum("value").alias("total_value"))
        .select(F.unix_micros("w.start").alias("ws_us"), "n_events", "total_value")
    )


def sessionize(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows (gap-merged). Emits user_id,
    session_start_us, n_events — a session closes when the next event
    is ≥ gap after the previous one (session_window end is exclusive)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
        )
    )


def dedup_events(events: DataFrame, *, within_watermark: bool = False,
                 delay: str = "1 hour") -> DataFrame:
    """Exact-id dedup. Streaming flavor uses dropDuplicatesWithinWatermark
    so state for old ids is reclaimed — unbounded-state dedup is the
    classic streaming OOM at scale."""
    if within_watermark:
        return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def click_purchase_pairs(clicks: DataFrame, purchases: DataFrame, *,
                         lookback: str = "30 minutes") -> DataFrame:
    """Interval join: every (purchase, click) pair for the same user
    where the click lands in ``[purchase.ts - lookback, purchase.ts]``
    — the multi-touch flavor of attribution (the as-of join in
    operators.relational picks only the latest touch).

    Batch: one sort-merge shuffle on user_id; the time bounds ride along
    as the join's secondary condition, so there is no time-bucket
    explosion. Streaming: the same builder is a stream-stream inner
    join — Spark derives each side's state retention from the watermark
    plus these time bounds, so click state older than
    watermark + lookback is evicted instead of accumulating forever
    (unbounded join state is the stream-stream OOM at scale).
    """
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        p.join(
            c,
            (F.col("click_user") == F.col("user_id"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        )
        .select(
            "purchase_id", "click_id", "user_id",
            F.unix_micros("purchase_ts").alias("purchase_ts_us"),
            F.unix_micros("click_ts").alias("click_ts_us"),
            "purchase_value",
        )
    )


# -- streaming entry points --------------------------------------------------

def click_purchase_pairs_stream(spark: SparkSession, sf_dir: str, *,
                                watermark: str = "2 hours",
                                lookback: str = "30 minutes") -> DataFrame:
    """Stream-stream rendering of :func:`click_purchase_pairs`: two
    independent file-source streams (each side progresses its own
    watermark), inner interval join, append output."""
    clicks = (read_events_stream(spark, sf_dir)
              .filter(F.col("event_type") == "click")
              .withWatermark("ts", watermark))
    purchases = (read_events_stream(spark, sf_dir)
                 .filter(F.col("event_type") == "purchase")
                 .withWatermark("ts", watermark))
    return click_purchase_pairs(clicks, purchases, lookback=lookback)



def hourly_by_type_stream(spark: SparkSession, sf_dir: str,
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked streaming rendering of :func:`hourly_by_type`."""
    stream = read_events_stream(spark, sf_dir)
    return hourly_by_type(stream.withWatermark("ts", watermark))


def stream_to_parquet(result: DataFrame, path: str, *,
                      checkpoint: str, output_mode: str = "complete"):
    """foreachBatch parquet sink: each micro-batch lands as an
    idempotent overwrite (batch id in the path would make it append-only;
    overwrite keeps "latest state" semantics for complete-mode aggs).
    foreachBatch is the escape hatch that lets a streaming query reuse
    every batch writer — parquet here, but JDBC/Delta/merge logic slot
    in identically."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(path)

    q = (
        result.writeStream.foreachBatch(_write)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def hourly_rollup_incremental(spark: SparkSession, sf_dir: str, path: str, *,
                              checkpoint: str, watermark: str = "2 hours",
                              stream_dir: str | None = None):
    """Continuous aggregate (hypertable-rollup style): the hourly
    window × type aggregation maintained incrementally in a partitioned
    parquet table.

    ``update`` output mode emits only the window rows each micro-batch
    changed; foreachBatch upserts them by (window, type) key into the
    rollup table, partitioned by window date — so each batch rewrites
    only the day-partitions it touched, never the table's history. This
    is the batch-serving half of a lambda-free pipeline: readers see a
    plain parquet table; the stream keeps it current; watermark-expired
    windows stop changing and their partitions go cold.
    """
    from data_eng_taxi_ibis_dagster_spark.sources.sinks import (
        merge_upsert_partitioned,
    )

    stream = read_events_stream(spark, sf_dir, stream_dir=stream_dir)
    agg = hourly_by_type(stream.withWatermark("ts", watermark))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        updates = batch_df.withColumn(
            "ws_date",
            F.to_date(F.timestamp_micros(F.col("ws_us"))),
        )
        if updates.isEmpty():
            return
        merge_upsert_partitioned(
            batch_df.sparkSession, path, updates,
            key=("ws_us", "event_type"), partition_by=("ws_date",),
        )

    q = (
        agg.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_memory(result: DataFrame, name: str, *, output_mode: str = "complete"):
    """Execute a streaming DataFrame to completion against the in-memory
    sink (availableNow → processes the full backlog, then stops).
    Returns the finished query; results via spark.table(name)."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
