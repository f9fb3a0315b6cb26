"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``data_eng_taxi_ibis_dagster_spark.plans.registry``): every registered
QuerySpec contributes a ``queries()`` entry, and its ANSI oracle SQL (when
SQL-expressible) an ``oracle_sql()`` entry. The flagship query is the
reference's own "avg fare by passenger count where fare > $50"
(/root/reference/README.md:47-48) mapped onto the lineitem fixture.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_eng_taxi_ibis_dagster_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.get("flagship_avg_price").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-able query."""
    return registry.oracle_sql()
