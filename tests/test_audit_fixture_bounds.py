"""Scale-invariance tripwires for the closed-form audit oracles.

History: the round-8 strict differential at sf0.1 (10x the driver's
gate scale) surfaced exactly two divergences, both audits whose
oracles assumed a fixture-bounded regime (raw-user_id HLL exactness;
a collision-free pHash pair map). Round 10 removed both regime
assumptions instead of pinning them:

* ``approx_exact_regime_audit`` now pins HLL only on BOUNDED value
  domains that are the same set at every sf (hour-of-day; a
  127-bucket projection of user_id), and derives percentile accuracy
  from observed group sizes at plan build.
* ``phash_twin_audit`` now reads the twin-edge subset of the pair
  relation (doc_b = doc_a + 1M), which same-multiplier original
  collisions (real near-dups, present from sf0.1 up) can never enter.

What remains here are the few assumptions those closed forms still
make — each one scale-INVARIANT (a property of the value domain or
the id space, not of a corpus size), so the audits stay strict at
every sf dir. Gate corpora are derived from the configured fixture
root, never hardcoded.
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


def test_hll_bucket_domain_is_coupon_unique(spark):
    """approx_exact_regime_audit's scale-invariance argument: the 127
    possible values of pmod(user_id, 127) are the SAME set at every
    sf, so exactness over the full domain (no two values share a
    DataSketches coupon, estimator bias rounds away at lgK=14) is a
    data-independent fact checkable once — and any subset of a
    coupon-unique set is itself coupon-unique, covering groups/sfs
    that hit fewer buckets."""
    est = (spark.range(127)
           .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(id, 14))")
                .alias("e")).first()["e"])
    assert est == 127, (
        f"full 127-value bucket domain estimates {est} at lgK=14 — "
        f"coupon collision or estimator drift; "
        f"approx_exact_regime_audit's exactness argument is broken")
    est24 = (spark.range(24)
             .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(id, 12))")
                  .alias("e")).first()["e"])
    assert est24 == 24, (
        f"hour-of-day domain estimates {est24} at lgK=12")


def test_hll_audit_user_ids_nonnegative(spark):
    """Spark ``pmod`` is always non-negative while DuckDB ``%`` takes
    the dividend's sign — the bucket projections agree only for
    user_id >= 0. Pin that on every gate corpus."""
    for sf in _gate_dirs():
        mn = (load_table(spark, sf, "events")
              .agg(F.min("user_id").alias("mn")).first()["mn"])
        assert mn is not None and mn >= 0, (
            f"{sf}: min user_id {mn} — pmod/% diverge on negatives, "
            f"approx_exact_regime_audit's bucket oracle would break")


def test_phash_twin_id_space_separation(spark):
    """phash_twin_audit's twin-edge filter (doc_b = doc_a + 1M) is
    collision-closed only while original ids never reach the twin
    offset — otherwise an original could sit at another original's
    twin address. Pin doc_id < 1M on every gate corpus (the one
    assumption the round-10 closure rewrite still makes)."""
    for sf in _gate_dirs():
        mx = (load_table(spark, sf, "documents")
              .agg(F.max("doc_id").alias("mx")).first()["mx"])
        assert mx is not None and mx < 1_000_000, (
            f"{sf}: max doc_id {mx} reaches the 1M twin offset — "
            f"phash_twin_audit's id map is no longer unambiguous")


def test_phash_twin_edges_complete(spark):
    """Every decodable original must meet its resized/re-encoded twin
    at hamming 0 — the determinism claim the audit pins externally,
    asserted here against the image population so a silently-empty
    pair relation can't read as green."""
    from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs

    sf = _gate_dirs()[0]
    pairs = all_specs()["phash_twin_audit"].builder(spark, sf)
    n_pairs = pairs.count()
    n_images = (load_table(spark, sf, "documents")
                .filter(F.col("doc_id") % 6 != 2).count())
    assert n_pairs == n_images, (
        f"{sf}: {n_pairs} twin edges for {n_images} images — a codec/"
        f"resample/DCT/banding drift dropped twins")
