"""Column-level helper functions (all JVM-side — no Python UDFs here)."""

from data_eng_taxi_ibis_dagster_spark.functions.exact import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

__all__ = ["davg", "dsum", "sql_davg", "sql_dsum"]
