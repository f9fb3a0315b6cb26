"""DuckDB differential oracle — the engine's correctness harness.

The reference's thesis is "one query, many engines, identical results"
(``/root/reference/README.md:103-105``; Ibis on DuckDB + PySpark). Here
that property is a *test harness*: every registered QuerySpec with an
``oracle`` SQL string is executed on DuckDB over the same parquet
fixtures and compared to the PySpark result on row count, column set,
and order-insensitive values — the same discipline the external driver
applies (``__spark_entry__.py`` contract).

Comparison is STRICT: floats must match bit-for-bit. Queries achieve
this via order-independent aggregation (functions.exact) rather than by
loosening the comparator — a tolerance here would hide real divergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from data_eng_taxi_ibis_dagster_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str, tables: tuple[str, ...] = TABLES) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with each fixture table registered as a view —
    the same setup the driver uses for its oracle side."""
    con = duckdb.connect()
    for name in tables:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    """Normalize engine-specific dtypes to a comparable canonical form:
    ints → int64 (nullable), floats → float64, timestamps → datetime64[us],
    everything else → string. Column order = sorted by name."""
    out = {}
    for col in sorted(pdf.columns):
        s = pdf[col]
        if pd.api.types.is_bool_dtype(s):
            out[col] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.astype("datetime64[us]")
        else:
            out[col] = s.map(lambda v: None if v is None or v is pd.NA else str(v))
    return pd.DataFrame(out)


def _sort_key(row: tuple) -> tuple:
    return tuple(
        (1, "") if v is None or v is pd.NA or v != v else (0, repr(v)) for v in row
    )


@dataclass
class ParityReport:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems:
            msg += f"\n    - {p}"
        return msg


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                   max_diffs: int = 5) -> ParityReport:
    report = ParityReport(name, True, len(spark_pdf), len(oracle_pdf))

    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        report.ok = False
        report.problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return report
    if len(spark_pdf) != len(oracle_pdf):
        report.ok = False
        report.problems.append("row count mismatch")
        return report

    # The external driver hashes values AS RENDERED STRINGS, so an
    # integer column on one engine vs a float column on the other
    # ("95" vs "95.0") fails there even when the values are equal.
    # DuckDB's usual offender: SUM(BIGINT) → HUGEINT → pandas float64.
    # Flag the dtype-kind skew here so it never reaches the driver.
    def _kind(s: pd.Series) -> str:
        if pd.api.types.is_bool_dtype(s):
            return "bool"
        if pd.api.types.is_integer_dtype(s):
            return "int"
        if pd.api.types.is_float_dtype(s):
            return "float"
        if pd.api.types.is_datetime64_any_dtype(s):
            return "ts"
        return "other"

    for col in s_cols:
        sk, ok_ = _kind(spark_pdf[col]), _kind(oracle_pdf[col])
        if {sk, ok_} == {"int", "float"}:
            report.ok = False
            report.problems.append(
                f"column {col!r}: dtype kind skew spark={sk} oracle={ok_}"
                " (driver string-hash would mismatch; CAST the oracle"
                " aggregate, e.g. CAST(SUM(x) AS BIGINT))")
    if not report.ok:
        return report

    s = _canonical(spark_pdf)
    o = _canonical(oracle_pdf)
    s_rows = sorted((tuple(r) for r in s.itertuples(index=False, name=None)), key=_sort_key)
    o_rows = sorted((tuple(r) for r in o.itertuples(index=False, name=None)), key=_sort_key)

    def _eq(a, b) -> bool:
        a_null = a is None or a is pd.NA or a != a
        b_null = b is None or b is pd.NA or b != b
        if a_null or b_null:
            return a_null and b_null
        if isinstance(a, float) and isinstance(b, float):
            return np.float64(a) == np.float64(b)
        return a == b

    n_bad = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not all(_eq(a, b) for a, b in zip(sr, orow)):
            n_bad += 1
            if len(report.problems) < max_diffs:
                report.problems.append(f"row {i}: spark={sr} oracle={orow}")
    if n_bad:
        report.ok = False
        report.problems.append(f"{n_bad} differing rows (cols={s_cols})")
    return report


def check_query(spark, name: str, sf_dir: str, df=None) -> ParityReport:
    """Run one registered query on both engines and compare. ``df``
    optionally supplies an already-built DataFrame for the query (the
    suite's session-scoped plan cache — building some plans costs
    seconds of analysis/eager jobs, and three registry-wide sweeps
    would otherwise each rebuild all of them); it must be the result
    of ``get(name).builder(spark, sf_dir)`` for the same arguments."""
    from data_eng_taxi_ibis_dagster_spark.plans.registry import get

    spec = get(name)
    spark_pdf = (df if df is not None
                 else spec.builder(spark, sf_dir)).toPandas()
    if spec.oracle is None:
        return ParityReport(name, len(spark_pdf) >= 0, len(spark_pdf), -1,
                            ["rows-only (no oracle)"])
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    return compare_frames(name, spark_pdf, oracle_pdf)
