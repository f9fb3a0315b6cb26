"""E14: the streaming runtime must reproduce the batch rendering of the
same transformation (the engine's batch-equivalence correctness
argument; the batch side is oracle-checked in test_parity)."""

import pandas as pd
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table
from data_eng_taxi_ibis_dagster_spark.streaming.events import (
    dedup_events,
    hourly_by_type,
    read_events_stream,
    run_to_memory,
    sessionize,
)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def test_hourly_stream_equals_batch(spark, sf_dir):
    batch = hourly_by_type(load_table(spark, sf_dir, "events")).toPandas()
    stream = hourly_by_type(
        read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours"))
    run_to_memory(stream, "hourly_stream", output_mode="complete")
    streamed = spark.table("hourly_stream").toPandas()
    pd.testing.assert_frame_equal(_sorted(batch), _sorted(streamed))


def test_session_stream_equals_batch(spark, sf_dir):
    batch = sessionize(load_table(spark, sf_dir, "events")).toPandas()
    stream = sessionize(
        read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours"))
    run_to_memory(stream, "session_stream", output_mode="complete")
    streamed = spark.table("session_stream").toPandas()
    pd.testing.assert_frame_equal(_sorted(batch), _sorted(streamed))


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    batch = hourly_by_type(load_table(spark, sf_dir, "events")).toPandas()
    stream = hourly_by_type(
        read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours"))
    from data_eng_taxi_ibis_dagster_spark.streaming.events import stream_to_parquet
    out = str(tmp_path / "hourly_parquet")
    stream_to_parquet(stream, out, checkpoint=str(tmp_path / "ckpt"))
    written = spark.read.parquet(out).toPandas()
    pd.testing.assert_frame_equal(_sorted(batch), _sorted(written))


def test_dedup_within_watermark_stream(spark, sf_dir):
    n_unique = load_table(spark, sf_dir, "events").count()
    stream = dedup_events(
        read_events_stream(spark, sf_dir), within_watermark=True, delay="1 hour")
    run_to_memory(
        stream.select("event_id", "event_type"), "dedup_stream",
        output_mode="append")
    got = spark.table("dedup_stream")
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        click_purchase_pairs,
        click_purchase_pairs_stream,
    )

    events = load_table(spark, sf_dir, "events")
    batch = click_purchase_pairs(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    ).toPandas()
    stream = click_purchase_pairs_stream(spark, sf_dir)
    run_to_memory(stream, "interval_join_stream", output_mode="append")
    streamed = spark.table("interval_join_stream").toPandas()
    assert len(batch) > 0
    pd.testing.assert_frame_equal(_sorted(batch), _sorted(streamed))


def test_hourly_rollup_incremental_merge(spark, sf_dir, tmp_path):
    """The incrementally-merged rollup table equals the batch rendering,
    and a second (no-new-data) run leaves it unchanged (idempotent)."""
    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        hourly_rollup_incremental,
    )

    out = str(tmp_path / "rollup")
    hourly_rollup_incremental(
        spark, sf_dir, out, checkpoint=str(tmp_path / "ck1"))
    batch = hourly_by_type(load_table(spark, sf_dir, "events")).toPandas()
    rolled = spark.read.parquet(out).drop("ws_date").toPandas()
    pd.testing.assert_frame_equal(_sorted(batch), _sorted(rolled))
    # re-run from the same checkpoint: no new files to process, no change
    hourly_rollup_incremental(
        spark, sf_dir, out, checkpoint=str(tmp_path / "ck1"))
    again = spark.read.parquet(out).drop("ws_date").toPandas()
    pd.testing.assert_frame_equal(_sorted(rolled), _sorted(again))


def test_incremental_arrival_exactly_once(spark, sf_dir, tmp_path):
    """New files landing between runs from ONE checkpoint are processed
    exactly once: after each run the rollup equals the batch aggregate
    over everything that has arrived so far — nothing dropped, nothing
    double-counted."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        hourly_rollup_incremental,
    )

    events = load_table(spark, sf_dir, "events")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "rollup")
    ck = str(tmp_path / "ck")

    # Split by TIME, mirroring real arrival order: a watermark is
    # supposed to drop data arriving far behind the stream's clock, so
    # an id-based split (old rows in the second batch) would be
    # *correctly* discarded as late.
    cut = raw.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("c")).collect()[0]["c"]
    half1 = raw.filter(F.col("ts") <= cut)
    half2 = raw.filter(F.col("ts") > cut)

    from data_eng_taxi_ibis_dagster_spark.sources.tables import (
        _normalize_events,
    )

    half1.write.parquet(landing)  # first arrival
    hourly_rollup_incremental(
        spark, sf_dir, out, checkpoint=ck, stream_dir=landing)
    batch1 = hourly_by_type(
        _normalize_events(spark.read.parquet(landing))).toPandas()
    got1 = spark.read.parquet(out).drop("ws_date").toPandas()
    pd.testing.assert_frame_equal(_sorted(batch1), _sorted(got1))

    half2.write.mode("append").parquet(landing)  # second arrival
    hourly_rollup_incremental(
        spark, sf_dir, out, checkpoint=ck, stream_dir=landing)
    batch_all = hourly_by_type(events).toPandas()
    got2 = spark.read.parquet(out).drop("ws_date").toPandas()
    pd.testing.assert_frame_equal(_sorted(batch_all), _sorted(got2))


def test_python_datasource_stream_equals_batch(spark, tmp_path):
    """The custom connector's streaming reader must replay exactly the
    batch reader's rows (same generator arithmetic, offset-tracked
    micro-batches): stream-collected rows == batch rows, exactly once."""
    from data_eng_taxi_ibis_dagster_spark.sources import pysource

    pysource.register(spark)
    opts = {"rows": "5000", "batch_rows": "1300"}
    batch = (spark.read.format("synthetic_telemetry").options(**opts)
             .load().toPandas().sort_values("row_id").reset_index(drop=True))
    stream = (spark.readStream.format("synthetic_telemetry").options(**opts)
              .load())
    collected = []
    q = (stream.writeStream
         .foreachBatch(lambda df, _id: collected.append(df.toPandas()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    # a Simple stream reader has no end-of-stream notion, so drain by
    # row count (4 micro-batches of ≤1300) and stop explicitly
    import time

    deadline = time.time() + 120
    while time.time() < deadline and sum(map(len, collected)) < 5000:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    import pandas as pd
    got = (pd.concat(collected).sort_values("row_id")
           .reset_index(drop=True).drop_duplicates("row_id"))
    assert len(got) == 5000
    assert got.reset_index(drop=True).equals(batch)


def test_hourly_value_sketch_incremental(spark, sf_dir, tmp_path):
    """The streaming-maintained sketch table equals the batch sketch
    rendering bit-for-bit, quantiles read off the MAINTAINED table
    (merge + grid read, raw events never rescanned) equal quantiles
    computed from scratch, and new arrivals upsert exactly their bins."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.qsketch import (
        merge_sketches,
        sketch_quantiles,
    )
    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        hourly_value_sketch,
        hourly_value_sketch_incremental,
    )

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "sk_rollup")
    hourly_value_sketch_incremental(
        spark, sf_dir, out, checkpoint=str(tmp_path / "ck"), width=1)
    table = spark.read.parquet(out).drop("ws_date")
    batch = hourly_value_sketch(events, width=1).toPandas()
    got = table.toPandas()
    pd.testing.assert_frame_equal(_sorted(batch), _sorted(got))

    # percentiles WITHOUT RESCAN: merge the maintained grid rows up to
    # per-type all-time and compare against sketching raw events
    served = sketch_quantiles(
        merge_sketches(table, group_cols=["event_type"]),
        [50, 95], width=1, group_cols=["event_type"]).toPandas()
    from data_eng_taxi_ibis_dagster_spark.operators.qsketch import (
        histogram_sketch,
    )
    scratch = sketch_quantiles(
        histogram_sketch(events, F.col("value"), width=1,
                         group_cols=["event_type"]),
        [50, 95], width=1, group_cols=["event_type"]).toPandas()
    pd.testing.assert_frame_equal(_sorted(served), _sorted(scratch))
