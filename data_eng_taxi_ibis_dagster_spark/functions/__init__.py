"""Column-level helper functions (all JVM-side — no Python UDFs here)."""

from data_eng_taxi_ibis_dagster_spark.functions.exact import (
    davg,
    dsum,
    lavg,
    lsum,
    sql_davg,
    sql_dsum,
    sql_lavg,
    sql_lsum,
)

__all__ = ["davg", "dsum", "lavg", "lsum",
           "sql_davg", "sql_dsum", "sql_lavg", "sql_lsum"]
