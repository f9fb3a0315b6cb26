"""Sinks: table materialization and parquet export.

Reference operators (SURVEY.md §2a):
  K1  CTAS / full-refresh table materialization —
      ``taxi_pipeline_native.py:42-46`` (DuckDB ``CREATE TABLE … AS``)
  K2  parquet export, overwrite semantics —
      ``taxi_pipeline_native.py:67-69`` (``COPY … TO`` one file)

The reference's single-file export is a local-pipeline quirk; at scale a
single output file serializes the whole job through one task, so
``single_file`` defaults to False and multi-part output (one file per
partition) is the norm. Writers return basic observability facts (rows,
bytes) mirroring the reference's Loguru logging (O2).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class WriteReport:
    path: str
    rows: int
    bytes: int


def _tree_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(p)
    )


def materialize_table(df: DataFrame, name: str, mode: str = "overwrite") -> int:
    """K1 — idempotent full-refresh materialization into the session
    catalog (parquet-backed managed table). Equivalent of the reference's
    drop-then-CTAS ingest."""
    df.write.mode(mode).format("parquet").saveAsTable(name)
    return df.sparkSession.table(name).count()


def export_parquet(df: DataFrame, path: str, single_file: bool = False,
                   partition_by: tuple[str, ...] = ()) -> WriteReport:
    """K2 — parquet export with overwrite semantics.

    ``single_file=True`` reproduces the reference's one-file ``COPY``
    (coalesce(1) — fine for small local outputs, wrong at scale);
    ``partition_by`` writes a hive-partitioned tree, the 100 TB shape.
    """
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    rows = df.sparkSession.read.parquet(path).count()
    return WriteReport(path=path, rows=rows, bytes=_tree_bytes(path))
