#!/usr/bin/env python
"""Skew stress: measure the bounded-window machinery against naive
single-window plans on a deliberately pathological corpus — one
mega-domain / mega-language holding ~95% of all rows (the shape the
round-5 verdict flagged as the `domain_cap_sample` scale risk, and the
shape a real web corpus has: one host with billions of pages).

Three head-to-heads, each checksum-verified identical before timing is
trusted:

1. per-domain cap K=10 — naive ``row_number() OVER (PARTITION BY
   source)`` vs the registry's two-stage map-side-pre-thin
   (`plans/llm16.domain_cap_sample`'s exact shape);
2. per-group rank — naive per-lang window vs
   ``operators/order.grouped_rank`` (range-bucketed);
3. per-group running sum — naive per-lang cumsum window vs
   ``operators/order.grouped_prefix_sum``.

Writes ``.sfdata/skew/documents.parquet`` (gitignored) on first run.
Prints one JSON line per head-to-head: {name, naive_sec, bounded_sec,
checksum_match}. Timing = full plan into the noop sink, min of 2 runs.

Usage: python scripts/skew_stress.py [n_rows]   (default 4_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SKEW_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".sfdata", "skew")


def make_skew(spark, n: int) -> None:
    """95% of rows in one domain+lang; the rest over 1000 domains and
    4 langs. Text is a short deterministic token string (so md5/order
    keys exist); doc_id unique."""
    df = (
        spark.range(n).withColumnRenamed("id", "doc_id")
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 20 != 0, F.lit("mega.example"))
            .otherwise(F.concat(F.lit("site"),
                                (F.col("doc_id") % 1000).cast("string"),
                                F.lit(".example"))))
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 10 != 0, F.lit("en"))
            .otherwise(F.element_at(
                F.array(F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
                ((F.col("doc_id") / 10) % 4 + 1).cast("int"))))
        .withColumn(
            "text",
            F.concat(F.lit("tok"), (F.xxhash64("doc_id") % 99991).cast("string"),
                     F.lit(" w"), (F.col("doc_id") % 977).cast("string")))
        .withColumn("n_tokens", (F.xxhash64("doc_id", F.lit(1)) % 400 + 5)
                    .cast("long"))
    )
    df.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SKEW_DIR, "documents.parquet"))


def timed(df: DataFrame) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def checksum(df: DataFrame, *cols: str) -> int:
    # decimal(38,0) sum: 4M 64-bit terms overflow a long under ANSI
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))
        .alias("c")).collect()[0]["c"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        grouped_prefix_sum,
        grouped_rank,
    )
    from data_eng_taxi_ibis_dagster_spark.session import get_session

    spark = get_session(app_name="skew-stress")
    path = os.path.join(SKEW_DIR, "documents.parquet")
    if not os.path.exists(path):
        make_skew(spark, n)
    docs = spark.read.parquet(path)
    docs.count()  # warm scan

    results = []

    # 1. per-domain cap K=10
    hashed = docs.select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("_h"))
    w_naive = Window.partitionBy("source").orderBy("_h", "doc_id")
    naive_cap = (hashed.withColumn("r", F.row_number().over(w_naive))
                 .filter(F.col("r") <= 10).select("doc_id", "source", "r"))
    thin_local = Window.partitionBy("source", "_pid").orderBy("_h", "doc_id")
    staged = (hashed.withColumn("_pid", F.spark_partition_id())
              .withColumn("_lr", F.row_number().over(thin_local))
              .filter(F.col("_lr") <= 10))
    bounded_cap = (staged.withColumn("r", F.row_number().over(w_naive))
                   .filter(F.col("r") <= 10).select("doc_id", "source", "r"))
    match = checksum(naive_cap, "doc_id", "source", "r") == \
        checksum(bounded_cap, "doc_id", "source", "r")
    results.append({"name": "domain_cap_k10",
                    "naive_sec": timed(naive_cap),
                    "bounded_sec": timed(bounded_cap),
                    "checksum_match": match})

    # 2. per-lang rank
    w_rank = Window.partitionBy("lang").orderBy("doc_id")
    # cast: row_number() is int, grouped_rank's offset+row_number is
    # long, and xxhash64 hashes the two widths differently
    naive_rank = docs.select("doc_id", "lang",
                             F.row_number().over(w_rank).cast("long")
                             .alias("pos"))
    bounded_rank = grouped_rank(
        docs.select("doc_id", "lang"), ["lang"], F.col("doc_id"),
        name="pos").select("doc_id", "lang", "pos")
    match = checksum(naive_rank, "doc_id", "lang", "pos") == \
        checksum(bounded_rank, "doc_id", "lang", "pos")
    results.append({"name": "grouped_rank_mega_lang",
                    "naive_sec": timed(naive_rank),
                    "bounded_sec": timed(bounded_rank),
                    "checksum_match": match})

    # 3. per-lang running token sum
    w_sum = (Window.partitionBy("lang").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive_sum = docs.select("doc_id", "lang",
                            F.sum("n_tokens").over(w_sum).alias("cum"))
    bounded_sum = grouped_prefix_sum(
        docs.select("doc_id", "lang", "n_tokens"), ["lang"],
        F.col("doc_id"), F.col("n_tokens"),
        name="cum").select("doc_id", "lang", "cum")
    match = checksum(naive_sum, "doc_id", "lang", "cum") == \
        checksum(bounded_sum, "doc_id", "lang", "cum")
    results.append({"name": "grouped_prefix_sum_mega_lang",
                    "naive_sec": timed(naive_sum),
                    "bounded_sec": timed(bounded_sum),
                    "checksum_match": match})

    for r in results:
        print(json.dumps(r))




def point_mass(n: int | None = None) -> None:
    """Head-to-head 4 (round-6 verdict item): the VALUE-bucketed global
    prefix machinery under a point-mass score — 95% of rows share ONE
    score value, so the affine bucket map sends them all to one bucket
    and the within-bucket window runs on one task (same shape as the
    naive global window). Measures naive global cumsum / running-max
    windows vs distributed_prefix_sum/_max on (a) the point-mass score
    and (b) a spread score (doc_id) for the asymptote contrast, plus
    the tie-split decomposition where implemented.

    Usage: python scripts/skew_stress.py point_mass [n_rows]
    """
    import sys as _sys
    n = n or (int(_sys.argv[2]) if len(_sys.argv) > 2 else 4_000_000)
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_prefix_max,
        distributed_prefix_sum,
    )
    from data_eng_taxi_ibis_dagster_spark.session import get_session

    spark = get_session(app_name="skew-stress-pm")
    path = os.path.join(SKEW_DIR, "documents.parquet")
    if not os.path.exists(path):
        make_skew(spark, n)
    docs = (
        spark.read.parquet(path)
        .withColumn("score_pm",
                    F.when(F.col("doc_id") % 20 != 0, F.lit(1000.0))
                    .otherwise(F.col("doc_id").cast("double")))
        .select("doc_id", "score_pm", "n_tokens")
    )
    docs.count()

    results = []
    for label, score in [("point_mass", "score_pm"),
                         ("spread", "doc_id")]:
        w = (Window.orderBy(F.col(score).cast("double"), "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        naive_sum = docs.select(
            "doc_id", F.sum("n_tokens").over(w).alias("cum"))
        dist_sum = distributed_prefix_sum(
            docs, F.col(score), F.col("n_tokens"), F.col("doc_id"),
            name="cum").select("doc_id", "cum")
        match = checksum(naive_sum, "doc_id", "cum") == \
            checksum(dist_sum, "doc_id", "cum")
        results.append({"name": f"prefix_sum_{label}",
                        "naive_sec": timed(naive_sum),
                        "bounded_sec": timed(dist_sum),
                        "checksum_match": match})
        print(json.dumps(results[-1]), flush=True)
        tie_sum = distributed_prefix_sum(
            docs, F.col(score), F.col("n_tokens"), F.col("doc_id"),
            name="cum", tie_split=F.col("doc_id")).select("doc_id", "cum")
        match = checksum(naive_sum, "doc_id", "cum") == \
            checksum(tie_sum, "doc_id", "cum")
        results.append({"name": f"prefix_sum_{label}_tie_split",
                        "naive_sec": None,
                        "bounded_sec": timed(tie_sum),
                        "checksum_match": match})
        print(json.dumps(results[-1]), flush=True)
        wx = (Window.orderBy(F.col(score).cast("double"), "doc_id")
              .rowsBetween(Window.unboundedPreceding, -1))
        naive_max = docs.select(
            "doc_id", F.max("n_tokens").over(wx).alias("pm"))
        dist_max = distributed_prefix_max(
            docs, F.col(score), F.col("n_tokens"), F.col("doc_id"),
            name="pm").select("doc_id", "pm")
        match = checksum(naive_max.fillna(-1), "doc_id", "pm") == \
            checksum(dist_max.fillna(-1), "doc_id", "pm")
        results.append({"name": f"prefix_max_{label}",
                        "naive_sec": timed(naive_max),
                        "bounded_sec": timed(dist_max),
                        "checksum_match": match})
        print(json.dumps(results[-1]), flush=True)
        tie_max = distributed_prefix_max(
            docs, F.col(score), F.col("n_tokens"), F.col("doc_id"),
            name="pm", tie_split=F.col("doc_id")).select("doc_id", "pm")
        match = checksum(naive_max.fillna(-1), "doc_id", "pm") == \
            checksum(tie_max.fillna(-1), "doc_id", "pm")
        results.append({"name": f"prefix_max_{label}_tie_split",
                        "naive_sec": None,
                        "bounded_sec": timed(tie_max),
                        "checksum_match": match})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "point_mass":
        point_mass()
    else:
        main()
