"""Apache Iceberg table-format integration (gated on the runtime jar).

The north star names the storage layer "Parquet/Iceberg"
(``BASELINE.json``, ``spark_approach``). Everything in this repo writes
parquet through ``sources/sinks.py``; this module is the Iceberg
rendering of the same sinks — the DataFrameWriterV2 / MERGE INTO
surface a lakehouse deployment uses, expressed entirely through public
Spark APIs so it activates the moment an Iceberg catalog is configured
(``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``).

This container ships no Iceberg runtime jar, so every entry point is
gated: :func:`iceberg_available` probes the JVM classpath, callers
raise a clear error (and the tests skip) when the jar is absent — the
same honest gating as the Spark-4 stateful twin's protobuf dependency
(streaming/stateful.py). The parquet sinks remain the tested
first-class path; at 100 TB the Iceberg variants add what raw parquet
cannot: snapshot isolation for the incremental-merge pattern
(``plans/maintenance.incremental_agg_merge``), hidden partitioning,
and metadata-pruned scans replacing directory listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the session's JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:  # Py4JJavaError: class not found
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime jar not on the classpath — add "
            "org.apache.iceberg:iceberg-spark-runtime and configure a "
            "spark.sql.catalog.* entry to enable the Iceberg sinks"
        )


def write_table(df: DataFrame, table: str, *,
                partition_by: str | None = None) -> None:
    """CTAS into an Iceberg table (DataFrameWriterV2
    ``createOrReplace`` — atomic snapshot swap, unlike a parquet
    directory overwrite)."""
    _require(df.sparkSession)
    writer = df.writeTo(table).using("iceberg")
    if partition_by is not None:
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(F.col(partition_by))
    writer.createOrReplace()


def append_table(df: DataFrame, table: str) -> None:
    """Snapshot-isolated append — the exactly-once incremental-ingest
    twin of ``sinks.overwrite_partitions`` without partition rewrites."""
    _require(df.sparkSession)
    df.writeTo(table).append()


def merge_upsert(spark: SparkSession, table: str, updates: DataFrame,
                 key: str) -> None:
    """MERGE INTO upsert: the CDC-apply pattern of
    ``sinks.merge_upsert_partitioned`` with row-level semantics — the
    engine rewrites only affected data files, no manual partition
    bookkeeping."""
    _require(spark)
    updates.createOrReplaceTempView("_iceberg_updates")
    cols = updates.columns
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != key)
    vals = ", ".join(f"s.{c}" for c in cols)
    spark.sql(f"""
        MERGE INTO {table} t
        USING _iceberg_updates s
        ON t.{key} = s.{key}
        WHEN MATCHED THEN UPDATE SET {sets}
        WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) VALUES ({vals})
    """)
