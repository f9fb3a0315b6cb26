"""KMV distinct-sketch operator properties (operators/kmv): the
exact-merge contract, the estimator's accuracy OUTSIDE the exact
regime (where the strict oracles can't see), the parameter
cross-check, and the fixture-regime pin that keeps the registered
queries' strict oracles valid."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import kmv as K
from data_eng_taxi_ibis_dagster_spark.plans.llm21 import _KMV_K
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def test_kmv_exact_regime_fixture_bounds():
    """The kmv_* strict queries hold because every hash POOL the
    estimator expressions actually form stays inside the exact regime
    (< k, where the pool IS the full hash set). Pin exactly those
    pools, at ALL gate SFs including sf0.1 where the 10x sweep runs,
    so a fixture regeneration that leaves a regime fails here with a
    clear message instead of as a hash mismatch in the parity sweep:

    * per EPOCH week (``epoch_us // WEEK_US`` — the queries' slicing;
      NOT ISO date_trunc('week'), whose Monday-start boundaries could
      hide an over-k epoch week across two ISO weeks): the pool
      ``kmv_rollup_uniques``/``kmv_incremental_uniques`` merge;
    * per ADJACENT-DAY UNION: ``kmv_returning_users_daily``'s
      intersect estimator pools day d with day d−1 — each day can be
      under k while their union is not (round-9 review finding)."""
    week_us = 7 * 24 * 3600 * 1_000_000
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        con = duckdb.connect()
        rows = con.execute(
            f"""SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                           AS day,
                       epoch_us(date_trunc('day', ts)) // {week_us}
                           AS week,
                       user_id
                FROM read_parquet('{sf}/events.parquet')
                WHERE user_id IS NOT NULL"""
        ).fetchall()
        assert rows
        by_day, by_week = {}, {}
        for day, week, uid in rows:
            by_day.setdefault(day, set()).add(uid)
            by_week.setdefault(week, set()).add(uid)
        for week, users in by_week.items():
            assert len(users) < _KMV_K, (
                f"{sf} epoch week {week}: {len(users)} distinct users "
                f"leaves the KMV k={_KMV_K} exact regime — the weekly "
                f"rollup oracles will stop matching")
        days = sorted(by_day)
        for prev, cur in zip(days, days[1:]):
            pooled = len(by_day[prev] | by_day[cur])
            assert pooled < _KMV_K, (
                f"{sf} days {prev}+{cur}: pooled union {pooled} "
                f"leaves the exact regime — kmv_returning_users_daily"
                f"'s intersect estimator will take the approximate "
                f"branch while its oracle stays exact")


def test_kmv_merge_equals_direct(spark, sf_dir):
    """merge(sketch per day) ≡ sketch(union) — ARRAY equality, not
    just estimate equality: the bottom-k of a union is a subset of
    the union of per-part bottom-ks, so the rollup loses nothing.
    This is the determinism contract that makes persisted daily
    sketch columns safe to re-aggregate forever."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
    week = (F.unix_micros(F.col("day"))
            / F.lit(7 * 24 * 3600 * 1_000_000)).cast("long")
    daily = K.kmv_sketch(e, F.col("user_id"), k=64, group_cols=["day"])
    merged = {r["week"]: r["_kmv"] for r in K.merge_kmv(
        daily.select(week.alias("week"), "_kmv"), ["week"]).collect()}
    direct = {r["week"]: r["_kmv"] for r in K.kmv_sketch(
        e.select(week.alias("week"), "user_id"),
        F.col("user_id"), k=64, group_cols=["week"]).collect()}
    assert merged == direct and merged


def test_kmv_estimate_beyond_exact_regime(spark):
    """With distinct ≫ k the estimator read is (k−1)/frac(kth min);
    relative error concentrates at ~1/sqrt(k−2). md5 is fixed, so
    this is a deterministic draw — 20% tolerance at k=512 is ~3.6
    sigma."""
    n, k = 60_000, 512
    d = spark.range(n).select(F.col("id"))
    sk = K.kmv_sketch(d, F.col("id"), k=k)
    est = sk.select(K.kmv_estimate(F.col("_kmv"), k=k).alias("e")
                    ).collect()[0]["e"]
    assert abs(est / n - 1.0) < 0.20, est


def test_kmv_intersect_estimate_beyond_exact_regime(spark):
    """Pooled-bottom-k intersection estimator on overlapping ranges
    A=[0,40k), B=[20k,60k): true |A∩B| = 20k. Noise stacks the union
    estimator (~1/sqrt(k)) on the binomial overlap fraction
    (~sqrt(ρ(1−ρ)/k)/ρ ≈ 6% at ρ=1/3), so 25% tolerance is wide."""
    k = 512
    a = K.kmv_sketch(spark.range(0, 40_000), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("a"))
    b = K.kmv_sketch(spark.range(20_000, 60_000), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("b"))
    est = a.crossJoin(b).select(
        K.kmv_intersect_estimate(F.col("a"), F.col("b"), k=k).alias("e")
    ).collect()[0]["e"]
    assert abs(est / 20_000 - 1.0) < 0.25, est


def test_kmv_intersect_exact_regime_is_exact(spark):
    """In the exact regime the estimator expression degenerates to
    the exact intersection count — the property the strict queries'
    hash matches ride on."""
    k = 4096
    a = K.kmv_sketch(spark.range(0, 300), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("a"))
    b = K.kmv_sketch(spark.range(100, 500), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("b"))
    est = a.crossJoin(b).select(
        K.kmv_intersect_estimate(F.col("a"), F.col("b"), k=k).alias("e")
    ).collect()[0]["e"]
    assert est == 200.0


def test_kmv_difference_estimate_beyond_exact_regime(spark):
    """Pooled-bottom-k difference estimator on overlapping ranges
    A=[0,40k), B=[20k,60k): true |A\\B| = 20k. Same noise stack as the
    intersect twin (union estimator ~1/sqrt(k) on the binomial
    sample fraction), so the same wide 25% tolerance."""
    k = 512
    a = K.kmv_sketch(spark.range(0, 40_000), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("a"))
    b = K.kmv_sketch(spark.range(20_000, 60_000), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("b"))
    est = a.crossJoin(b).select(
        K.kmv_difference_estimate(F.col("a"), F.col("b"), k=k).alias("e")
    ).collect()[0]["e"]
    assert abs(est / 20_000 - 1.0) < 0.25, est


def test_kmv_difference_exact_regime_is_exact(spark):
    """In the exact regime the difference expression degenerates to
    the exact |A\\B| — the property kmv_churned_users_daily's strict
    hash match rides on. Both orientations (the estimator is
    asymmetric by definition)."""
    k = 4096
    a = K.kmv_sketch(spark.range(0, 300), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("a"))
    b = K.kmv_sketch(spark.range(100, 500), F.col("id"), k=k) \
        .select(F.col("_kmv").alias("b"))
    row = a.crossJoin(b).select(
        K.kmv_difference_estimate(F.col("a"), F.col("b"), k=k).alias("ab"),
        K.kmv_difference_estimate(F.col("b"), F.col("a"), k=k).alias("ba"),
    ).collect()[0]
    assert row["ab"] == 100.0   # [0,100)
    assert row["ba"] == 200.0   # [300,500)


def test_kmv_k_metadata_cross_check(spark):
    """merge_kmv resolves k from the sketch's own kmv_k stamp; a
    contradictory explicit k (or a sketch with no stamp and no k)
    raises instead of silently mis-scaling estimates — the qsketch
    width-stamp contract."""
    sk = K.kmv_sketch(spark.range(10), F.col("id"), k=16)
    with pytest.raises(ValueError, match="contradicts"):
        K.merge_kmv(sk, k=32)
    bare = sk.select(F.col("_kmv").alias("_kmv"))  # alias drops metadata
    if not (bare.schema["_kmv"].metadata or {}).get("kmv_k"):
        with pytest.raises(ValueError, match="no kmv_k"):
            K.merge_kmv(bare)
    assert K.merge_kmv(sk).collect()[0]["_kmv"] == \
        sk.collect()[0]["_kmv"]


def test_estimate_from_hashes_matches_column_twin(spark):
    """The Python-side estimator (the stateful streaming operator's
    read) must equal the Column form bit-for-bit, in AND beyond the
    exact regime — both read the same leading 52 bits, which round to
    doubles exactly."""
    for n, k in ((40, 64), (5000, 64)):
        sk = K.kmv_sketch(spark.range(n), F.col("id"), k=k)
        row = sk.select(
            "_kmv", K.kmv_estimate(F.col("_kmv"), k=k).alias("e")
        ).collect()[0]
        assert K.estimate_from_hashes(list(row["_kmv"]), k=k) == row["e"]
