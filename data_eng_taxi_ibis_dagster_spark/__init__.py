"""data_eng_taxi_ibis_dagster_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
``DataBooth/data-eng-taxi-ibis-dagster`` (see ``SURVEY.md``), designed
Spark-first: the DataFrame API is the deferred query IR, Catalyst is the
only optimizer, and every logical query is defined once and rendered as
both a PySpark plan and an ANSI oracle SQL string (the portable-query
property the reference gets from Ibis, rebuilt as a test harness).

Layout:
  session    — SparkSession bootstrap (one shared session; AQE/Arrow on)
  sources    — parquet scans, fixture-table registry, sinks
  functions  — column-level helpers (exact decimal aggregates, text,
               vector math, JSON)
  operators  — composable DataFrame transforms (relational + LLM-pipeline:
               dedup, similarity, text analysis, multimodal)
  plans      — the query registry: named QuerySpec entries pairing a
               PySpark builder with its DuckDB oracle SQL
  streaming  — Structured Streaming over the events table
  pipeline   — minimal asset-DAG runner (orchestration parity)
"""

__version__ = "0.1.0"
