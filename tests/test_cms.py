"""Count-min sketch operator properties (operators/cms): counter
additivity (merge ≡ direct), the never-undercount / ε-overcount
contract on fixture tokens AND in a deliberately collision-heavy
regime, the no-collision exactness of a sparse grid, and the
parameter cross-check."""

import math

import pytest
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import cms as C
from data_eng_taxi_ibis_dagster_spark.operators import text as T


def _grid(sk) -> dict:
    return {(r["_cms_seed"], r["_cms_bin"]): r["_cms_n"]
            for r in sk.collect()}


def test_cms_merge_equals_direct(spark, sf_dir):
    """merge(per-source sketches) ≡ one-pass global sketch — full
    grid equality, the additivity the strict query's oracle pins
    externally (Spark merges per source, DuckDB builds globally)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.explode(T.tokens("text")).alias("tok"))
    merged = _grid(C.merge_cms(
        C.cms_sketch(d, F.col("tok"), group_cols=["source"])))
    direct = _grid(C.cms_sketch(d, F.col("tok")))
    assert merged == direct and merged


def test_cms_overcount_bound_fixture(spark, sf_dir):
    """est ≥ exact always (collisions only add); est − exact ≤
    (e/width)·N on the fixture's top tokens. At fixture scale the
    4×4096 grid dwarfs the vocabulary and the observed max overcount
    is 0 — the assert still uses the analytic bound so a fixture
    regeneration is judged against the sketch's real contract."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.explode(T.tokens("text")).alias("tok"))
    n_tokens = d.count()
    sk = C.merge_cms(C.cms_sketch(d, F.col("tok")))
    exact = (d.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
             .orderBy(F.col("exact_n").desc(), F.col("tok")).limit(50))
    rows = C.cms_lookup(sk, exact, "tok").collect()
    assert rows
    eps_n = math.e / (16 ** C.CMS_HEX_DIGITS) * n_tokens
    for r in rows:
        over = r["est_count"] - r["exact_n"]
        assert 0 <= over <= eps_n, (r["tok"], over, eps_n)


def test_cms_collision_heavy_regime(spark):
    """60k distinct keys into a 4×4096 grid: every bin is shared
    (~15 keys/bin), so estimates MUST overcount — but the min-read
    keeps each within the ε·N bound (bins are ~Poisson(14.6); the
    min of 4 exceeding e/w·N ≈ 40 has vanishing probability, and
    md5 makes the draw deterministic)."""
    n = 60_000
    d = spark.range(n).select(F.col("id").cast("string").alias("k"))
    sk = C.merge_cms(C.cms_sketch(d, F.col("k")))
    probes = spark.range(0, n, n // 200).select(
        F.col("id").cast("string").alias("k"))
    rows = C.cms_lookup(sk, probes, "k").collect()
    eps_n = math.e / (16 ** C.CMS_HEX_DIGITS) * n
    overs = [r["est_count"] - 1 for r in rows]
    assert all(0 <= o <= eps_n for o in overs), (max(overs), eps_n)
    assert any(o > 0 for o in overs)  # genuinely collision-heavy


def test_cms_sparse_grid_is_exact(spark):
    """50 keys in a 4×4096 grid: the chance any key collides on ALL
    depth rows is ~(50/4096)^4 ≈ 2e-8, and md5 fixes the draw — the
    sketch answers exactly."""
    d = spark.range(50).select(F.col("id").cast("string").alias("k"))
    sk = C.merge_cms(C.cms_sketch(d, F.col("k")))
    rows = C.cms_lookup(sk, d, "k").collect()
    assert len(rows) == 50 and all(r["est_count"] == 1 for r in rows)


def test_cms_param_metadata_cross_check(spark):
    """Reads resolve depth/width from the sketch's own metadata stamp
    and refuse contradictions — the qsketch/kmv parameter contract."""
    d = spark.range(10).select(F.col("id").cast("string").alias("k"))
    sk = C.cms_sketch(d, F.col("k"))
    with pytest.raises(ValueError, match="cms_depth"):
        C.cms_lookup(sk, d, "k", depth=8)
    with pytest.raises(ValueError, match="cms_hex"):
        C.cms_lookup(sk, d, "k", hex_digits=2)
    bare = sk.select(F.col("_cms_seed"),
                     F.col("_cms_bin").alias("_cms_bin"), "_cms_n")
    if not (bare.schema["_cms_bin"].metadata or {}).get("cms_depth"):
        with pytest.raises(ValueError, match="no depth"):
            C.cms_lookup(bare, d, "k")


def test_cms_lookup_rejects_grouped_sketch(spark):
    """A sketch still carrying group columns would silently UNDERCOUNT
    through the per-group left join (min over per-group counters) —
    cms_lookup must refuse it at plan build (round-9 review)."""
    d = spark.range(20).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("string").alias("k"))
    grouped = C.cms_sketch(d, F.col("k"), group_cols=["g"])
    with pytest.raises(ValueError, match="group columns"):
        C.cms_lookup(grouped, d.select("k"), "k")
    C.cms_lookup(C.merge_cms(grouped), d.select("k"), "k").collect()
