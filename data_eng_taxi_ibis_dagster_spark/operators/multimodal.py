"""Multimodal column handling (EXT E13).

Images / audio / video ride through the engine as opaque ``binary``
payload columns plus a typed metadata struct — the lakehouse-standard
shape (same as ``spark.read.format("binaryFile")`` produces). The Spark
side of decode / feature-extract / resize / frame-sample is real:
Arrow-batched ``mapInPandas`` with explicit output schemas and
partition-size control. The codec itself is STUBBED (image/audio
libraries are not in this container): ``decode_stub`` derives a
deterministic fake decode from the payload bytes, and raises
``NotImplementedError`` when a real codec is requested, so swapping in
Pillow/librosa later changes one function, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("mime", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("meta_width", IntegerType(), True),
    StructField("meta_height", IntegerType(), True),
    StructField("meta_duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("mime", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("checksum", StringType(), True),
    StructField("feat_mean_byte", LongType(), True),
])


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: each document's text encoded as a
    UTF-8 binary payload with synthetic metadata. Exercises the real
    binary-column plumbing (schema, partitioning, Arrow transfer)
    without container-absent codecs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast(IntegerType()).alias("meta_width"),
        F.lit(None).cast(IntegerType()).alias("meta_height"),
        F.lit(None).cast(LongType()).alias("meta_duration_ms"),
    )


def decode_stub(payload: bytes, mime: str) -> dict:
    """Deterministic fake decode. A real deployment replaces this with
    Pillow / soundfile / pyav; everything around it (batching, schema,
    partitioning) is production-shaped already."""
    if mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"real codec for {mime} not available in this environment; "
            "install the codec lib and replace decode_stub"
        )
    return {
        "n_bytes": len(payload),
        "feat_mean_byte": int(sum(payload) // len(payload)) if payload else 0,
    }


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches through Python — payload
    bytes never collect to the driver, and batch size is bounded via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
    is payload-size-aware (at 100 TB set it from expected payload MB).
    """
    import hashlib

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_stub(bytes(p) if p is not None else b"", m)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": [d["n_bytes"] for d in decoded],
                "checksum": [
                    hashlib.md5(bytes(p) if p is not None else b"").hexdigest()
                    for p in pdf["payload"]
                ],
                "feat_mean_byte": [d["feat_mean_byte"] for d in decoded],
            })

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("mime", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("meta_width", IntegerType(), True),
    StructField("meta_height", IntegerType(), True),
    StructField("meta_duration_ms", LongType(), True),
])


def resize_media(media: DataFrame, *, target_width: int = 224,
                 target_height: int = 224) -> DataFrame:
    """Payload-transforming stage (resize under a real codec): maps each
    binary payload to a new, typically smaller payload and updates the
    size metadata, schema-preserving — so resize stages compose with any
    other media op. Under the stub the "resample" is a deterministic
    byte-stride decimation to ``target_width*target_height`` bytes; a
    Pillow/pyav implementation replaces only the inner function.

    Output payloads shrink, so this is the stage to run EARLY in a 100 TB
    media pipeline — every byte dropped here is a byte not shuffled,
    cached, or Arrow-transferred by later stages.
    """
    target = max(1, target_width * target_height)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if len(raw) <= target:
                    out.append(raw)
                else:
                    stride = len(raw) / target
                    out.append(bytes(raw[int(i * stride)] for i in range(target)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "payload": out,
                "meta_width": pd.array([target_width] * len(pdf), dtype="int32"),
                "meta_height": pd.array([target_height] * len(pdf), dtype="int32"),
                "meta_duration_ms": pdf["meta_duration_ms"],
            })

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """1→N frame sampling through mapInPandas: each payload yields up to
    ``max_frames`` fixed-stride "frames" (byte windows under the stub —
    a video codec would emit decoded keyframes with the identical batch
    shape). Demonstrates the row-expanding UDF pattern with an explicit
    schema: output cardinality is decided per-payload inside the batch,
    which no built-in generator can express over opaque binaries."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({
                "media_id": ids,
                "frame_index": pd.array(idxs, dtype="int32"),
                "frame_payload": frames,
            })

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)
