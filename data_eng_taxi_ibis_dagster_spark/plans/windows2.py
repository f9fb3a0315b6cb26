"""Window-function and array-aggregate completeness: distribution
functions (ntile / percent_rank / cume_dist), first/last value frames,
sorted array aggregation, deterministic systematic sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "window_distribution_funcs",
    oracle="""
        SELECT o_orderkey,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("E5",),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over one shared window spec.
    percent_rank/cume_dist emit exact rational doubles ((rank-1)/(n-1),
    rank/n) — integer-derived, so bit-comparable."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


@query(
    "collect_sorted_list",
    oracle="""
        SELECT c_mktsegment,
               array_to_string(list(c_custkey ORDER BY c_custkey), ',') AS keys_csv,
               len(list(c_custkey)) AS n
        FROM customer
        WHERE c_acctbal < -900
        GROUP BY c_mktsegment
    """,
    tags=("E7", "A1"),
)
def collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list) canonicalized by sorting —
    collection order is partition-dependent, so the sort is what makes
    the result well-defined. Rendered as CSV (engine-neutral hashing).
    Scale note: collect_list state is unbounded per group — always
    bound the group size upstream (the filter here)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") < -900)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_custkey")), ",")
            .alias("keys_csv"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "systematic_sample",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_orderkey % 100 = 7
    """,
    tags=("F1",),
)
def systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1%-ish systematic sample on the key (TABLESAMPLE's
    reproducible cousin — Bernoulli sampling is engine-RNG-specific and
    would never cross-validate; modulo sampling is stable across
    engines, runs, and scale)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 7)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )
