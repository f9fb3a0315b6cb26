"""Engine-parity semantics coverage: NULL handling (grouping, ordering,
coalescing) and schema-on-read JSON parsing — the classic places where
engines silently disagree, pinned down with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "null_semantics",
    oracle="""
        SELECT COALESCE(flag, 'NULL_GROUP') AS flag_group,
               COUNT(*) AS n_rows,
               COUNT(flag) AS n_nonnull,
               COUNT(DISTINCT flag) AS n_distinct
        FROM (
            SELECT NULLIF(l_returnflag, 'N') AS flag FROM lineitem
        )
        GROUP BY flag
    """,
    tags=("A1", "E4"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL grouping parity: NULLIF manufactures NULLs, the group-by
    must put all NULLs in ONE group (both engines do — but it's the
    kind of semantic that deserves a pinned check), COUNT(col) skips
    them, COUNT(DISTINCT) ignores them."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag"))
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("flag").alias("n_nonnull"),
            F.count_distinct(F.col("flag")).alias("n_distinct"),
        )
        .select(
            F.coalesce("flag", F.lit("NULL_GROUP")).alias("flag_group"),
            "n_rows", "n_nonnull", "n_distinct",
        )
    )


@query(
    "json_schema_parse",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
               CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k
        FROM events
    """,
    tags=("E7",),
)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON: from_json with an explicit struct schema
    (the scalable path — parsed once into a typed column, prunable and
    filterable) vs the per-path get_json_object string API exercised in
    scalar_json."""
    ev = load_table(spark, sf_dir, "events")
    # BIGINT, not INT (round-12 adversarial sweep): a JSON integer at
    # 2^53+1 must round-trip exactly — the string-ground-truth parse
    # preserves int64 precision where a double-typed parse would round
    # to 2^53, and an int32 schema nulls/errors it on both engines.
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.when(parsed.getField("k").isNotNull(), 1).otherwise(0).alias("has_k"),
    )
