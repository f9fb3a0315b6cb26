"""Asset-DAG orchestration (SURVEY.md §2a O1/O2/O3).

The reference orchestrates ingest → export → analyse as a Dagster asset
graph with explicit deps and structured Loguru logging of row counts,
file sizes and wall-clock (``/root/reference/taxi_pipeline_native.py:
26-191``, ``taxi_pipeline.py:155-165``). Dagster itself is
infrastructure, not query capability — what the engine needs is the
*semantics*: named assets, dependency ordering, one materialization per
run, per-asset observability. This module provides exactly that as a
dependency-free mini-framework: an ``@asset`` decorator + a topological
runner.

Unlike the reference, assets share ONE SparkSession (the reference
stops and restarts the JVM per asset — a measurement and latency bug we
deliberately do not reproduce), and asset handoff can be in-memory
DataFrames rather than files, though file handoff (parquet) remains the
default between *pipelines* for restartability at scale.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger("data_eng_taxi_ibis_dagster_spark.pipeline")


@dataclass(frozen=True)
class Asset:
    name: str
    fn: Callable[..., Any]
    deps: tuple[str, ...] = ()
    compute_kind: str = "pyspark"
    description: str = ""


@dataclass
class AssetResult:
    name: str
    value: Any
    seconds: float
    rows: int | None = None


@dataclass
class Definitions:
    """A named collection of assets — the runnable pipeline."""

    assets: dict[str, Asset] = field(default_factory=dict)

    def asset(self, *, deps: tuple[str, ...] = (), compute_kind: str = "pyspark",
              name: str | None = None) -> Callable:
        """Register a function as an asset. The function receives the
        SparkSession and the materialized values of its declared deps,
        in declaration order."""

        def deco(fn: Callable) -> Callable:
            asset_name = name or fn.__name__
            if asset_name in self.assets:
                raise ValueError(f"duplicate asset: {asset_name}")
            self.assets[asset_name] = Asset(
                name=asset_name, fn=fn, deps=tuple(deps),
                compute_kind=compute_kind,
                description=(fn.__doc__ or "").strip(),
            )
            return fn

        return deco

    def order(self) -> list[str]:
        ts = TopologicalSorter({n: set(a.deps) for n, a in self.assets.items()})
        return list(ts.static_order())

    def materialize(self, spark: SparkSession,
                    selection: list[str] | None = None) -> dict[str, AssetResult]:
        """Run assets in dependency order (the reference's ``dagster
        materialize``), logging per-asset wall-clock and row counts —
        the O2 observability contract."""
        wanted = set(selection or self.assets)
        # pull in transitive deps of the selection
        frontier = list(wanted)
        while frontier:
            for dep in self.assets[frontier.pop()].deps:
                if dep not in wanted:
                    wanted.add(dep)
                    frontier.append(dep)

        results: dict[str, AssetResult] = {}
        for name in self.order():
            if name not in wanted:
                continue
            asset = self.assets[name]
            dep_values = [results[d].value for d in asset.deps]
            start = time.perf_counter()
            try:
                value = asset.fn(spark, *dep_values)
            except Exception:
                logger.exception("asset %s failed", name)
                raise
            seconds = time.perf_counter() - start
            rows = value.count() if isinstance(value, DataFrame) else None
            results[name] = AssetResult(name, value, seconds, rows)
            logger.info(
                "asset %s (%s) materialized in %.2fs%s",
                name, asset.compute_kind, seconds,
                f", rows={rows}" if rows is not None else "",
            )
        return results


def taxi_pipeline_definitions(sf_dir: str, out_dir: str) -> Definitions:
    """The reference pipeline rebuilt: ingest a parquet glob into a
    managed table, export it back to parquet, analyse it via both the
    DataFrame and SQL entry points (ingest → export → analyse DAG,
    reference ``taxi_pipeline_native.py:180-191``)."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.functions.exact import davg
    from data_eng_taxi_ibis_dagster_spark.sources.sinks import export_parquet
    from data_eng_taxi_ibis_dagster_spark.sources.tables import scan_parquet

    defs = Definitions()

    @defs.asset(compute_kind="pyspark")
    def ingest_trips(spark: SparkSession) -> DataFrame:
        """S1/K1: glob-scan the source parquet, materialize the working
        table (temp view here; saveAsTable in a warehouse deployment)."""
        df = scan_parquet(spark, f"{sf_dir}/lineitem.parquet")
        df.createOrReplaceTempView("trips")
        return df

    @defs.asset(deps=("ingest_trips",), compute_kind="pyspark")
    def export_trips(spark: SparkSession, trips: DataFrame):
        """K2: export the unified table as parquet (multi-part; the
        reference's single-file COPY is available via single_file=True)."""
        return export_parquet(trips, f"{out_dir}/trips_export")

    @defs.asset(deps=("ingest_trips",), compute_kind="pyspark")
    def analyse_dataframe(spark: SparkSession, trips: DataFrame) -> DataFrame:
        """The flagship analysis, DataFrame path."""
        return (
            trips.filter(F.col("l_extendedprice") > 30000)
            .groupBy("l_quantity")
            .agg(davg("l_extendedprice").alias("avg_price"))
        )

    @defs.asset(deps=("ingest_trips",), compute_kind="spark_sql")
    def analyse_sql(spark: SparkSession, trips: DataFrame) -> DataFrame:
        """The flagship analysis, SQL path over the registered view."""
        return spark.sql("""
            SELECT l_quantity,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE)
                       / COUNT(l_extendedprice) AS avg_price
            FROM trips
            WHERE l_extendedprice > 30000
            GROUP BY l_quantity
        """)

    return defs
