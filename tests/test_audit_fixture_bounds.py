"""Fixture-regime tripwires for the closed-form audit oracles.

Round-8 one-off: the full strict differential was run at sf0.1 — 10×
the driver's gate scale — and 217/219 queries hash-matched. The two
divergences were exactly the two audits whose oracles assume a
fixture-bounded regime, each failing for its predicted reason:

* ``approx_exact_regime_audit``: 1,500 distinct users per event_type
  at sf0.1 exceeds the lgK=12 DataSketches coupon-SET capacity
  (~2^lgK/4 ≈ 1024), so the HLL estimate stops being exact (1480 vs
  1500). At the sf0.01 gate it is 150/type — deep inside the regime.
* ``phash_twin_audit``: with ~4,200 images the synthetic generator's
  251 multiplier classes produce same-multiplier brightness-offset
  pairs, which a PERCEPTUAL hash correctly calls near-dups (28 extra
  hamming-0 pairs) — behavior working as designed, but outside the
  oracle's no-collision pair map. At gate scale no two distinct
  originals collide.

These tests pin both regime assumptions on every correctness-gate
corpus (mirroring ``test_lsh_fixture_bucket_bounds``), so a fixture
regeneration that silently leaves the regimes surfaces here instead of
as an inscrutable external hash mismatch. Gate corpora are derived
from the configured fixture root, never hardcoded.
"""

import os

from pyspark.sql import functions as F

from tests.conftest import TEST_SF_DIR

from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def _gate_dirs() -> list[str]:
    gates = [TEST_SF_DIR]
    driver_gate = os.path.join(os.path.dirname(TEST_SF_DIR.rstrip("/")),
                               "sf0.01")
    if os.path.isdir(driver_gate) and driver_gate != TEST_SF_DIR:
        gates.append(driver_gate)
    return gates


def test_hll_audit_user_cardinality_bounds(spark):
    """approx_exact_regime_audit is exact only while every per-type
    distinct-user count sits inside the lgK=12 coupon-SET capacity
    (~1024); pin gate corpora at ≤ half that, the same safety margin
    the LSH bucket-bounds guard uses."""
    for sf in _gate_dirs():
        mx = (load_table(spark, sf, "events")
              .groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("nd"))
              .agg(F.max("nd").alias("mx")).first()["mx"])
        assert mx <= 512, (
            f"{sf}: {mx} distinct users in one event_type — within 2x "
            f"of the lgK=12 HLL coupon capacity (~1024) where "
            f"approx_exact_regime_audit's strict oracle stops holding "
            f"(measured divergent at 1500/type on sf0.1)")


def test_phash_audit_no_original_collisions(spark):
    """phash_twin_audit's oracle is the closed-form twin map, valid
    only while no two DISTINCT original images share a perceptual
    hash; pin that on every gate corpus (at sf0.1 the generator's
    same-multiplier brightness-offset pairs already collide — real
    near-dups, but outside the closed form)."""
    from data_eng_taxi_ibis_dagster_spark.operators import multimodal as M

    for sf in _gate_dirs():
        docs = load_table(spark, sf, "documents")
        hashes = M.phash_media(M.synthetic_media(docs))
        n = hashes.count()
        nd = hashes.select("phash").distinct().count()
        assert n > 0 and n == nd, (
            f"{sf}: {n - nd} perceptual-hash collisions among distinct "
            f"originals — phash_twin_audit's strict pair-map oracle "
            f"assumes zero on gate corpora")
