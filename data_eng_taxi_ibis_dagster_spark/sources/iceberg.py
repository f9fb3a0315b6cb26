"""Apache Iceberg table-format integration (gated on the runtime jar).

The north star names the storage layer "Parquet/Iceberg"
(``BASELINE.json``, ``spark_approach``). Everything in this repo writes
parquet through ``sources/sinks.py``; this module is the Iceberg
rendering of the same sinks — the DataFrameWriterV2 / MERGE INTO
surface a lakehouse deployment uses, expressed entirely through public
Spark APIs so it activates the moment an Iceberg catalog is configured
(``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``).

This container ships no Iceberg runtime jar, and vendoring one was
attempted and is impossible here: outbound name resolution fails
(``repo1.maven.org`` and the pip index both unreachable, verified
2026-08-15), and no ``iceberg-spark-runtime`` jar or wheel exists
anywhere on the image. So every entry point is
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
    """True when the Iceberg runtime is on the session's JVM classpath.

    Probes through Spark's own loader
    (``org.apache.spark.util.Utils.classForName``) rather than
    ``java.lang.Class.forName``: jars added via ``spark.jars.packages``
    / ``--jars`` live in Spark's mutable URL classloader, which the
    py4j gateway loader can't see — the direct probe would report a
    false "jar absent" in otherwise-working deployments."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(  # noqa: SLF001
            "org.apache.iceberg.catalog.Catalog", False, True)
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
    if key not in updates.columns:
        raise ValueError(f"key column {key!r} not in updates: "
                         f"{updates.columns}")
    updates.createOrReplaceTempView("_iceberg_updates")
    cols = updates.columns
    non_key = [c for c in cols if c != key]

    def q(ident: str) -> str:  # backtick-quote identifiers
        return "`" + ident.replace("`", "``") + "`"

    # Iceberg table names are catalog.namespace.table paths — quote
    # each dotted part separately.
    qtable = ".".join(q(p) for p in table.split("."))
    matched = ""
    if non_key:  # key-only updates: MERGE is insert-if-absent
        sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_key)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets}"
    vals = ", ".join(f"s.{q(c)}" for c in cols)
    spark.sql(f"""
        MERGE INTO {qtable} t
        USING _iceberg_updates s
        ON t.{q(key)} = s.{q(key)}
        {matched}
        WHEN NOT MATCHED THEN INSERT ({', '.join(q(c) for c in cols)})
        VALUES ({vals})
    """)
