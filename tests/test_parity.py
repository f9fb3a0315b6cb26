"""Differential correctness: every registered query vs the DuckDB oracle.

This mirrors the external driver's CORRECTNESS gate (row count + column
set + order-insensitive values, floats bit-exact) so oracle drift is
caught locally before a round runs.
"""

import pytest

from data_eng_taxi_ibis_dagster_spark.oracle import check_query
from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs

ALL = sorted(all_specs())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name, plan_cache):
    report = check_query(spark, name, sf_dir, df=plan_cache(name))
    assert report.ok, str(report)


def test_registry_contract():
    specs = all_specs()
    assert len(specs) >= 1
    for name, spec in specs.items():
        assert spec.builder is not None, name
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name
