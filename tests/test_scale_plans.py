"""Scale-feature plan evidence: dynamic partition pruning and runtime
bloom-filter join pruning.

Neither changes query *results* — both are Catalyst runtime-pruning
strategies that only matter (and only show up) with the right physical
layout, so they are asserted on the physical plan itself, the same way
PLANS.md documents pushdown/broadcast/WindowGroupLimit shapes. At 100 TB
these two are the difference between scanning a partition's worth of a
fact table and scanning all of it.
"""

import pytest
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A fact table partitioned on the join key + a filtered dim side
    must plan a dynamicpruning partition filter on the fact scan: the
    dim's broadcast result prunes fact *partitions* at runtime, before
    any fact bytes are read."""
    path = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)

    dim = (
        orders.select(F.col("o_orderpriority").alias("p")).distinct()
        .filter(F.col("p").startswith("1"))
    )
    joined = (
        fact.join(dim, fact.o_orderpriority == dim.p)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan, plan
    # The pruned scan must be the partitioned fact table's.
    assert "PartitionFilters" in plan

    # And it must still compute the right answer.
    n = joined.collect()[0]["n"]
    expected = orders.filter(F.col("o_orderpriority").startswith("1")).count()
    assert n == expected


def test_runtime_bloom_filter_join(spark, sf_dir):
    """With broadcast off (large-large join), a selective creation side
    must inject a bloom filter (bloom_filter_agg / might_contain) on the
    probe side: at scale this drops most probe rows before the shuffle
    instead of after it."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Fixture tables are far below the 10 GB production threshold;
        # drop it so the injection logic is exercised at test scale.
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")

        line = load_table(spark, sf_dir, "lineitem")
        sel = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 500000)
        joined = (
            line.join(sel, line.l_orderkey == sel.o_orderkey)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        assert "might_contain" in plan, plan

        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders")
                .filter(F.col("o_totalprice") > 500000),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.collect()[0]["n"] == expected
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
