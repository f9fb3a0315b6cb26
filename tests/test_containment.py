"""Semantic + plan-shape checks for shingle-containment dedup
(plans/llm18.py). Engine parity is covered by test_parity.py; these
assert the meaning — every planted prefix-truncated twin that survives
the df cap scores containment EXACTLY 1.0 with the twin's full capped
shingle set as the intersection — and the scale shape (equi-join
candidates only, never a cross product)."""

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.llm18 import dedup_containment


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_planted_twins_score_exactly_one(spark, sf_dir):
    res = dedup_containment(spark, sf_dir)
    twins = res.filter(F.col("doc_b") == F.col("doc_a") + 1000000).collect()
    assert twins, "no planted prefix-twin pairs survived"
    for r in twins:
        # A token prefix's shingles are a subset of its source's, and
        # the df cap filters the same shingles on both sides — so the
        # intersection IS the twin's capped set and containment is 1.0.
        assert r.inter_size == r.size_b, r
        assert r.size_b <= r.size_a, r
        assert r.containment == 1.0, r


def test_threshold_is_exact_integer_compare(spark, sf_dir):
    rows = dedup_containment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 10 * r.inter_size >= 9 * min(r.size_a, r.size_b), r
        assert r.inter_size <= min(r.size_a, r.size_b), r


def test_pair_join_is_equi_not_cross(spark, sf_dir):
    plan = _plan(dedup_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
