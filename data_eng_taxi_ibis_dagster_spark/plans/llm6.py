"""Sixth LLM-pipeline batch: embedding storage/compression ops.

At 100 TB scale the embedding store is often bigger than the text it
came from; these are the two ops that keep it tractable:

* ``embedding_quantize_int8`` — symmetric int8 quantization (the
  standard 4× storage/bandwidth cut for ANN serving): per-vector
  max-abs scale, components mapped to ``floor(x·127/scale)``. Pure
  per-row array math in codegen — embarrassingly parallel, no shuffle.
* ``embedding_centroids`` — exact per-label centroids (the k-means
  E-step / IVF coarse-codebook build): posexplode to (label, dim,
  value) and an order-independent exact mean per cell, so the floats
  bit-match the oracle despite distributed summation.

Both strictly oracle-checked; every float op (widen, multiply, divide,
floor) is order-fixed and IEEE-deterministic, and means go through the
exact-decimal path (functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import davg, sql_davg
from data_eng_taxi_ibis_dagster_spark.operators.similarity import as_double
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "embedding_quantize_int8",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        m AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS mx
            FROM v
        ),
        q AS (
            SELECT vec_id, mx,
                   list_transform(v, x -> CASE WHEN mx = 0 THEN 0
                                          ELSE CAST(floor(x * 127.0 / mx)
                                                    AS BIGINT) END) AS q
            FROM m
        )
        SELECT vec_id,
               mx + CAST(0 AS DOUBLE) AS scale_abs,
               array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)),
                               ',') AS q_str,
               CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
               CAST(list_aggregate(q, 'min') AS BIGINT) AS q_min,
               CAST(list_aggregate(q, 'max') AS BIGINT) AS q_max
        FROM q
    """,
    tags=("E11", "E13", "EXT"),
    bench=True,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding: per-vector
    max-abs scale, q_i = floor(x_i·127/scale) ∈ [-127, 127]. The whole
    op is row-local array math inside whole-stage codegen — at 100 TB
    it streams through the scan with zero shuffle, and the 4× byte cut
    compounds into every downstream shuffle/broadcast of the vectors.
    The quantized vector is emitted as a canonical comma-joined string
    plus integer checksums (sum/min/max) so the oracle comparison is
    total. Each derived array is a named column in its own projection —
    the mx→q chain would otherwise be re-inlined per reference."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double("embedding").alias("v"))
    m = v.select(
        "vec_id", "v",
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("mx"))
    # zero-scale guard (round-12 adversarial sweep): the all-zero
    # vector has mx = 0 — it quantizes to all zeros on both engines
    # instead of tripping ANSI DIVIDE_BY_ZERO / NaN casts.
    q = m.select(
        "vec_id", F.col("mx"),
        F.transform(
            "v", lambda x: F.when(F.col("mx") == 0.0, F.lit(0))
            .otherwise(F.floor(x * 127.0 / F.col("mx"))).cast("long")
        ).alias("q"),
    )
    return q.select(
        "vec_id",
        # + 0.0 normalizes a signed-zero scale: DuckDB's abs/list_max
        # preserve -0.0 where Spark yields 0.0, and the driver hashes
        # RENDERED strings ("-0.0" != "0.0"); IEEE -0.0 + 0.0 = +0.0
        # on both engines, all other values unchanged
        (F.col("mx") + F.lit(0.0)).alias("scale_abs"),
        F.array_join(F.transform("q", lambda x: x.cast("string")), ",")
            .alias("q_str"),
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x)
            .alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


@query(
    "embedding_centroids",
    oracle=f"""
        WITH comp AS (
            SELECT label,
                   UNNEST(generate_series(1, len(embedding))) AS dim,
                   UNNEST(list_transform(embedding,
                                         x -> CAST(x AS DOUBLE))) AS x
            FROM embeddings
        )
        SELECT label, dim,
               {sql_davg("x", 8)} AS centroid,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM comp
        GROUP BY label, dim
    """,
    tags=("E11", "EXT"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label centroids (k-means E-step / IVF codebook):
    posexplode each vector to (label, dim, component) and take an
    order-independent exact mean per (label, dim) cell via the
    decimal-quantized sum. One explode (row-local ×64) and ONE shuffle
    on the (label, dim) aggregate, partial-combined map-side — the
    canonical shape for computing k·d cells over any corpus size.
    Grouping on the tiny (label, dim) keyspace is skew-proof: every
    partial aggregate is bounded by k·d cells regardless of input."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label",
        F.posexplode(as_double("embedding")).alias("pos", "x"),
    )
    return (
        comp.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            davg("x", 8).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )
