"""Deterministic global ordering without a single-partition sort.

A global ``row_number() OVER (ORDER BY …)`` in Spark collapses to ONE
window partition — the whole dataset funnels through a single task,
which is exactly the anti-pattern a 100 TB engine cannot contain.
``repartitionByRange`` + ``zipWithIndex`` is the folk fix, but the range
partitioner picks boundaries by *sampling with a per-job seed*, so the
counts job and the indexing job can disagree unless the intermediate is
persisted — fragile and cache-hungry at scale.

:func:`global_sort_index` instead derives the range buckets
deterministically from the data itself: when the sort key is (or leads
with) a hex-encoded hash, its first ``prefix_chars`` characters are a
monotone function of the key, so bucket id = int(prefix, 16) yields
up to 16^prefix_chars ordered, statistically balanced buckets with NO
sampling pass. Global position is then

    pos = (rows in all lower buckets) + rank within bucket

computed with one hash shuffle on the bucket id (the per-bucket window)
plus one tiny aggregate (bucket → count, 16^prefix rows) whose running
sum is broadcast back. Every step is deterministic, so the result equals
the oracle's global ``row_number`` exactly, run after run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_sort_index(
    df: DataFrame,
    hash_col: Column,
    *tiebreaks: Column,
    prefix_chars: int = 2,
    name: str = "pos",
) -> DataFrame:
    """Add a 1-based global rank column ``name`` ordering by
    ``(hash_col, *tiebreaks)``, where ``hash_col`` is a lowercase/upper
    hex string (e.g. ``F.md5(...)``). ``tiebreaks`` must make the full
    ordering unique for the rank to be well-defined.

    ``prefix_chars=2`` → 256 buckets; raise it when executor-count or
    skew demands finer granularity (3 → 4096). The offsets window runs
    on a single partition but over only 16^prefix_chars rows —
    driver-trivial at any data scale.
    """
    staged = df.withColumn("_gsi_h", hash_col).withColumn(
        "_gsi_bucket",
        F.conv(F.substring(F.col("_gsi_h"), 1, prefix_chars), 16, 10)
        .cast("long"),
    )
    counts = staged.groupBy("_gsi_bucket").agg(F.count("*").alias("_gsi_cnt"))
    w_off = (
        Window.orderBy("_gsi_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_gsi_bucket",
        F.coalesce(F.sum("_gsi_cnt").over(w_off), F.lit(0).cast("long"))
        .alias("_gsi_offset"),
    )
    w_loc = Window.partitionBy("_gsi_bucket").orderBy(
        F.col("_gsi_h"), *tiebreaks
    )
    return (
        staged.join(F.broadcast(offsets), "_gsi_bucket")
        .withColumn(name, F.col("_gsi_offset") + F.row_number().over(w_loc))
        .drop("_gsi_bucket", "_gsi_h", "_gsi_offset")
    )
