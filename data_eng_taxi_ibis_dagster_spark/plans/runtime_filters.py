"""Runtime-filter joins: the explicit bloom pre-filter.

At 100 TB the dominant join cost is shuffling the fact side; when the
build side is selective, a runtime filter applied at the SCAN cuts the
shuffled volume by the build side's selectivity before any exchange.
Spark injects these only under optimizer heuristics — this module
makes the technique a first-class, auditable operator
(operators/bloom.py) and proves exactness by letting the exact
semi-join remove the bloom's false positives: the registered result is
bit-identical to the plain join, which is precisely what makes it
strictly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import dsum
from data_eng_taxi_ibis_dagster_spark.operators import bloom as B
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

_BUILD_FILTER = "o_orderpriority = '1-URGENT' AND o_totalprice > 150000"


@query(
    "join_bloom_prefilter",
    bench=True,
    oracle=f"""
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(CAST(SUM(CAST(CAST(FLOOR((l.l_extendedprice
                             * (1 - l.l_discount)) * 10000 + 0.5)
                             AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
                    AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
        FROM lineitem l
        WHERE l.l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE {_BUILD_FILTER})
        GROUP BY l.l_returnflag
    """,
    tags=("E1", "EXT"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for line items of urgent high-value orders,
    executed as a bloom-runtime-filtered semi-join: the selective build
    side (≈14%% of orders) aggregates into a fixed 128 Kibit bitmap
    (≤ 2,048-row exchange, 16 KiB driver artifact), every lineitem row
    is probed ROW-LOCALLY against the broadcast-literal bitmap before
    the shuffle, and the exact semi-join then removes the bloom's false
    positives — so the result is bit-identical to the plain semi-join
    the oracle runs, while the fact side's shuffle volume shrinks to
    roughly the build-side selectivity. The hand-built analog of
    Spark's injected bloom runtime filter, made explicit and
    plan-auditable."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey")
    bitmap = B.build_bloom(keys, "o_orderkey")
    pre = li.filter(B.might_contain(bitmap, F.col("l_orderkey")))
    survivors = pre.join(
        (keys),
        pre["l_orderkey"] == keys["o_orderkey"],
        "left_semi",
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        survivors
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(rev, 4).alias("revenue"))
    )


@query(
    "join_salted_skew",
    oracle="""
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(CAST(SUM(CAST(CAST(FLOOR((l.l_extendedprice
                             * (1 - l.l_discount)) * 10000 + 0.5)
                             AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
                    AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
    tags=("E1", "EXT"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand through an explicitly SALTED fact-dim
    join (operators/skew.py:salted_join): the lineitem side carries a
    deterministic row-hash salt, the part side replicates salt× via
    explode, and the join key becomes (partkey, salt) — so if one part
    went hot (the canonical skew scenario this query pins the plan
    shape for), its rows split across `salt` reducers instead of one
    straggler task. Salting is partitioning-only, so the result — and
    the oracle — is the plain join, bit-for-bit (decimal-exact
    revenue). Completes the skew toolkit next to `agg_salted_hot_key`
    (aggregation salt) and AQE's runtime skew split."""
    from data_eng_taxi_ibis_dagster_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        salted_join(li, part, "l_partkey", "p_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(rev, 4).alias("revenue"))
    )


_TELEMETRY_ROWS = 20_000


@query(
    "pysource_telemetry_rollup",
    oracle=f"""
        WITH gen AS (
            SELECT i % 30 AS day,
                   CAST((i * 31 + 7) % 99991 AS DOUBLE) / 100.0 AS metric
            FROM (SELECT unnest(generate_series(0, {_TELEMETRY_ROWS - 1}))
                  AS i)
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(CAST(SUM(CAST(CAST(FLOOR(metric * 100 + 0.5) AS BIGINT)
                   AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
                   / CAST(100 AS DOUBLE) AS total_metric
        FROM gen GROUP BY day
    """,
    tags=("EXT",),
)
def pysource_telemetry_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a CUSTOM CONNECTOR: the Spark 4 Python
    DataSource API source in sources/pysource.py (partition-planned
    Python reader — one read task per InputPartition, the bespoke-
    endpoint connector shape). Because the source is deterministic
    integer arithmetic, the DuckDB oracle replays the generator from
    ``generate_series`` — so the strict differential check covers the
    ENTIRE custom read path: partition planning, the per-partition
    Python iterator, Arrow conversion, and the rollup on top. (The
    fixture dir is unused: this query's input IS the connector.)"""
    from data_eng_taxi_ibis_dagster_spark.functions.exact import dsum
    from data_eng_taxi_ibis_dagster_spark.sources import pysource

    pysource.register(spark)
    df = (spark.read.format("synthetic_telemetry")
          .option("rows", _TELEMETRY_ROWS).option("partitions", 8).load())
    return (
        df.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             dsum("metric", 2).alias("total_metric"))
    )
