"""Sources & sinks: parquet scans, fixture-table registry, writers."""

from data_eng_taxi_ibis_dagster_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
    scan_parquet,
)
from data_eng_taxi_ibis_dagster_spark.sources.sinks import (
    export_parquet,
    materialize_table,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "scan_parquet",
    "export_parquet",
    "materialize_table",
]
