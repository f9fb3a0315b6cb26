"""Differential correctness: every registered query vs the DuckDB oracle.

This mirrors the external driver's CORRECTNESS gate (row count + column
set + order-insensitive values, floats bit-exact) so oracle drift is
caught locally before a round runs.

Sharded by plan family (builder module): one pytest case per module,
its queries checked through a small thread pool.  Coverage is
identical to the old one-test-per-query parametrization — every
registered name is asserted, and the failure message carries the full
per-query report — but the wall-clock overlaps Spark job scheduling,
Arrow collection, and the DuckDB oracle across queries instead of
paying each latency serially.  Thread safety: ``check_query`` opens a
fresh DuckDB connection per call, Spark supports concurrent job
submission from threads, and the session-scoped plan cache holds a
per-name build lock (the same contract the threaded analyze sweep in
test_scale_plans relies on).
"""

from concurrent.futures import ThreadPoolExecutor

import pytest

from data_eng_taxi_ibis_dagster_spark.oracle import check_query
from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs

_SPECS = all_specs()

#: module-basename → sorted query names registered by it.
FAMILIES: dict[str, list[str]] = {}
for _name, _spec in sorted(_SPECS.items()):
    FAMILIES.setdefault(_spec.builder.__module__.rsplit(".", 1)[-1], []).append(_name)

_POOL = 8  # concurrent checks per shard; bounded so 8-core test sessions
           # overlap latency without oversubscribing executor threads.


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_matches_oracle(spark, sf_dir, family, plan_cache):
    names = FAMILIES[family]

    def one(name: str):
        return check_query(spark, name, sf_dir, df=plan_cache(name))

    with ThreadPoolExecutor(max_workers=min(_POOL, len(names))) as ex:
        reports = list(ex.map(one, names))
    bad = [r for r in reports if not r.ok]
    assert not bad, "\n".join(str(r) for r in bad)


def test_family_shards_cover_registry():
    """No query can silently fall out of the sharded sweep."""
    sharded = sorted(n for names in FAMILIES.values() for n in names)
    assert sharded == sorted(_SPECS)


def test_registry_contract():
    specs = all_specs()
    assert len(specs) >= 1
    for name, spec in specs.items():
        assert spec.builder is not None, name
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name
