"""MJPEG container: structural demux, frame sampling, quarantine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.jpeg import (
    encode_jpeg,
    jpeg_pixels,
)
from data_eng_taxi_ibis_dagster_spark.operators.multimodal import (
    decode_mjpeg,
    encode_mjpeg,
    sample_video_frames,
    split_mjpeg,
    synthetic_video,
)
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def _frames(n=5, side=16, seed=3):
    base = np.arange(side * side * 3, dtype=np.int64)
    px = ((base * seed + 7) % 256).astype(np.uint8).reshape(side, side, 3)
    return [np.roll(px, f, axis=0) for f in range(n)]


def test_split_roundtrips_exact_frame_bytes():
    frames = _frames(5)
    payload = encode_mjpeg(frames)
    parts = split_mjpeg(payload)
    assert parts == [encode_jpeg(f) for f in frames]
    assert b"".join(parts) == payload


def test_decode_mjpeg_counts_and_geometry():
    frames = _frames(4, side=16)
    d = decode_mjpeg(encode_mjpeg(frames))
    assert d["n_frames"] == 4
    assert d["width"] == d["height"] == 16
    assert d["duration_ms"] == 160


def test_split_rejects_garbage():
    with pytest.raises(ValueError):
        split_mjpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        split_mjpeg(encode_mjpeg(_frames(2))[:-4])  # truncated EOI


def test_sampled_frames_decode_to_original_reconstruction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 10)
    media = synthetic_video(docs, n_frames=6)
    out = sample_video_frames(media, stride=2, max_frames=3).toPandas()
    # every doc yields exactly frames 0, 2, 4
    for _, grp in out.groupby("media_id"):
        assert sorted(grp["frame_index"]) == [0, 2, 4]
    # a sampled frame's payload is the contained JPEG: re-decoding it
    # reproduces the same reconstruction stats the sampler reported
    row = out.iloc[0]
    px = jpeg_pixels(bytes(row["frame_payload"]))
    assert int(px.mean() * 1000) == row["feat_mean_x1000"]
    assert (px.shape[1], px.shape[0]) == (row["width"], row["height"])


def test_corrupt_container_quarantines_per_row(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 4)
    media = synthetic_video(docs, n_frames=3)
    corrupted = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 0,
               F.substring("payload", 1, 10).cast("binary"))
        .otherwise(F.col("payload")))
    out = sample_video_frames(corrupted).toPandas()
    bad = out[out["media_id"] == 0]
    assert list(bad["frame_index"]) == [-1]
    assert bad["width"].isna().all()
    good = out[out["media_id"] != 0]
    assert (good["frame_index"] >= 0).all()


def test_fill_bytes_before_markers_are_skipped():
    """ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may pad before
    a marker — real camera MJPEG streams emit them."""
    frames = _frames(2)
    f0, f1 = [encode_jpeg(f) for f in frames]
    # inject fill bytes after SOI and before EOI of the first frame
    padded = (f0[:2] + b"\xff" * 3 + f0[2:-2] + b"\xff" * 2 + f0[-2:]) + f1
    parts = split_mjpeg(padded)
    assert len(parts) == 2
    assert parts[1] == f1


def test_partial_decode_failure_quarantines_whole_container(spark):
    """A container whose frames split structurally but whose SECOND
    frame fails to decode must yield ONLY the quarantine row — never
    partial frame rows plus a quarantine marker for the same id."""
    good = encode_jpeg(_frames(1)[0])
    bad_frame = b"\xff\xd8\xff\xd9"  # structurally valid, undecodable
    payload = good + bad_frame
    assert len(split_mjpeg(payload)) == 2  # splits fine
    media = spark.createDataFrame(
        [(1, "video/x-motion-jpeg", bytearray(payload), None, None, None)],
        "media_id long, mime string, payload binary, meta_width int, "
        "meta_height int, meta_duration_ms long")
    out = sample_video_frames(media, stride=1, max_frames=4).toPandas()
    assert list(out["frame_index"]) == [-1]
    assert out["width"].isna().all()


def test_video_frame_sampling_streams_equal_batch(spark, sf_dir, tmp_path):
    """The keyframe sampler is a stateless mapInPandas, so it runs
    unchanged on a streaming binary ingest — the E13×E14 composition a
    video-training pipeline needs (frames extracted as containers
    arrive). Stream-collected frames must equal the batch rendering."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 12)
    media = synthetic_video(docs, n_frames=4)
    src = str(tmp_path / "media")
    media.write.parquet(src)

    stored = spark.read.parquet(src)
    batch = (sample_video_frames(stored, stride=2, max_frames=2)
             .drop("frame_payload").toPandas())

    stream = spark.readStream.schema(stored.schema).parquet(src)
    collected = []
    q = (sample_video_frames(stream, stride=2, max_frames=2)
         .drop("frame_payload")
         .writeStream
         .foreachBatch(lambda df, _id: collected.append(df.toPandas()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    got = pd.concat(collected)
    cols = sorted(batch.columns)
    pd.testing.assert_frame_equal(
        batch[cols].sort_values(cols).reset_index(drop=True),
        got[cols].sort_values(cols).reset_index(drop=True))
