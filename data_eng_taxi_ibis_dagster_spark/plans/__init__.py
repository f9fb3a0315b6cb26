"""Named query plans — the engine's public query surface.

Each module registers :class:`~data_eng_taxi_ibis_dagster_spark.plans.registry.QuerySpec`
entries; ``registry.queries()`` / ``registry.oracle_sql()`` are the
driver-facing contract re-exported by ``/root/repo/__spark_entry__.py``.
"""

from data_eng_taxi_ibis_dagster_spark.plans.registry import (
    QuerySpec,
    all_specs,
    get,
    oracle_sql,
    queries,
)

__all__ = ["QuerySpec", "all_specs", "get", "oracle_sql", "queries"]
