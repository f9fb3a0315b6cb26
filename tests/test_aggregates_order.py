"""Extended aggregates (plans/aggregates.py) and the distributed
global-sort-index operator (operators/order.py)."""

import pyspark.sql.functions as F
import pytest

from data_eng_taxi_ibis_dagster_spark.operators.order import global_sort_index
from data_eng_taxi_ibis_dagster_spark.plans.registry import get


def test_exact_linear_stats_match_native(spark, sf_dir):
    """The oracle-able closed-form corr/covar/slope must agree with
    Spark's native streaming aggregates to float tolerance (the native
    ones are partition-order-dependent in the last ulps, which is
    exactly why the registered query uses the exact form)."""
    exact = {
        r["l_returnflag"]: r
        for r in get("agg_exact_linear_stats").builder(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qx"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .alias("qy"),
    )
    native = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("qx", "qy").alias("corr"),
            F.covar_samp("qx", "qy").alias("covar"),
            F.regr_slope("qy", "qx").alias("slope"),
        )
        .collect()
    }
    assert set(exact) == set(native) and len(exact) >= 2
    for flag, e in exact.items():
        n = native[flag]
        assert n["corr"] == pytest.approx(e["corr_qty_price"], rel=1e-9)
        assert n["covar"] == pytest.approx(e["covar_samp_cents"], rel=1e-9)
        assert n["slope"] == pytest.approx(e["slope_cents_per_qty"], rel=1e-9)


def test_global_sort_index_is_global_rank(spark):
    rows = [(i,) for i in range(997)]
    df = spark.createDataFrame(rows, ["k"]).repartition(7)
    h = F.md5(F.col("k").cast("string"))
    out = global_sort_index(df, h, F.col("k"), name="pos").collect()
    assert sorted(r["pos"] for r in out) == list(range(1, 998))
    # position order must equal (md5, k) sort order
    by_pos = [r["k"] for r in sorted(out, key=lambda r: r["pos"])]
    import hashlib

    expected = sorted(
        range(997), key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k)
    )
    assert by_pos == expected


def test_global_sort_index_no_single_partition_scan(spark):
    """The big-side window must partition by bucket — the physical plan
    may not funnel the full input through one window partition (the
    naive global row_number would)."""
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    h = F.md5(F.col("k").cast("string"))
    plan = global_sort_index(df, h, F.col("k"))._jdf.queryExecution().executedPlan().toString()
    # the per-row window runs partitioned by the bucket column, not empty
    assert "_gsi_bucket" in plan
