import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from data_eng_taxi_ibis_dagster_spark.session import get_session

#: Scale-factor directory used by unit tests (override for deeper runs).
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_session(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
