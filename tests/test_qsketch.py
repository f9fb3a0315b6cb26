"""Quantile-histogram sketch (operators/qsketch): exact mergeability,
the lower-bound error contract, and exact-regime equivalence with
PERCENTILE_DISC. The strict external twins are
``quantile_sketch_rollup`` / ``quantile_sketch_exact_audit``."""

import math

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.qsketch import (
    histogram_sketch,
    merge_sketches,
    sketch_quantiles,
)
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def _rows(sk):
    return {tuple(r) for r in sk.collect()}


def test_sketch_merge_equals_single_pass(spark, sf_dir):
    """merge(sketch(slice_i)) must equal sketch(union) bit-for-bit —
    counts are additive, so the two-level path is EXACT, the property
    that makes persisted per-slice sketches safe to re-aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
         .alias("cents"))
    direct = histogram_sketch(o, F.col("cents"), width=10000)
    sliced = histogram_sketch(
        o.withColumn("slice", F.col("o_orderkey") % 7),
        F.col("cents"), width=10000, group_cols=["slice"])
    merged = merge_sketches(sliced)
    assert _rows(merged) == _rows(direct) and _rows(direct)


def test_sketch_estimate_bounds_true_percentile(spark, sf_dir):
    """Coarse-grid estimates must bracket the true discrete percentile:
    est_lo ≤ percentile_disc < est_lo + width (the crossing bin
    contains the true value by construction)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
         .alias("cents"))
    width = 50000  # deliberately coarse: $500 bins
    sk = histogram_sketch(o, F.col("cents"), width=width)
    est = {r["pct"]: r["est_lo"]
           for r in sketch_quantiles(sk, [25, 50, 75, 95],
                                     width=width).collect()}
    vals = sorted(r["cents"] for r in o.collect())
    n = len(vals)
    for pct in (25, 50, 75, 95):
        true = vals[math.ceil(pct * n / 100) - 1]
        assert est[pct] <= true < est[pct] + width, (pct, est[pct], true)


def test_sketch_exact_regime_is_percentile_disc(spark, sf_dir):
    """width = the data's native grid ⇒ the estimate IS the discrete
    percentile (the in-repo twin of quantile_sketch_exact_audit)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"))
    sk = histogram_sketch(li, F.col("qty"), width=1)
    est = {r["pct"]: r["est_lo"]
           for r in sketch_quantiles(sk, [25, 50, 75, 95],
                                     width=1).collect()}
    vals = sorted(r["qty"] for r in li.collect())
    n = len(vals)
    for pct in (25, 50, 75, 95):
        assert est[pct] == vals[math.ceil(pct * n / 100) - 1]


def test_sketch_drops_nulls_and_counts_rest(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (2,), (None,), (2,)], "v long")
    sk = histogram_sketch(df, F.col("v"), width=1)
    assert _rows(sk) == {(1, 1), (2, 2)}
    out = sketch_quantiles(sk, [50], width=1).collect()
    assert out[0]["n_rows"] == 3 and out[0]["est_lo"] == 2


def test_sketch_quantiles_empty_input_is_empty(spark):
    """A global read over an empty sketch must emit NO rows (not a
    single all-NULL aggregate row), matching the grouped path."""
    df = spark.createDataFrame([], "v long")
    sk = histogram_sketch(df, F.col("v"), width=1)
    assert sketch_quantiles(sk, [50], width=1).count() == 0


def test_sketch_width_rides_the_relation(spark, tmp_path):
    """The grid width stamped by histogram_sketch must survive merges
    AND a parquet round-trip, resolve implicitly in sketch_quantiles,
    and contradict a wrong explicit width loudly (round-8 advisor: a
    silently mismatched width rescales every quantile)."""
    import pytest

    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    sk = merge_sketches(histogram_sketch(df, F.col("v"), width=10))
    path = str(tmp_path / "sk")
    sk.write.parquet(path)
    back = spark.read.parquet(path)
    # implicit resolution from the stamp, through merge + parquet
    est = {r["pct"]: r["est_lo"]
           for r in sketch_quantiles(back, [50]).collect()}
    assert est[50] == 40  # bin floor(49/10)*10: the p50 bin lower bound
    # matching explicit width is allowed
    assert sketch_quantiles(back, [50], width=10).count() == 1
    # contradicting width fails at plan build, not silently
    with pytest.raises(ValueError):
        sketch_quantiles(back, [50], width=100)
    # an unstamped relation with no width is refused
    bare = back.select(F.col("_qs_bin").alias("_qs_bin"), "_qs_n")
    stripped = spark.createDataFrame(bare.collect(),
                                     "_qs_bin long, _qs_n long")
    with pytest.raises(ValueError):
        sketch_quantiles(stripped, [50])
