"""Table profiling: per-column statistics in ONE pass over the data.

The 100 TB pattern: never loop "one aggregation job per column" — build
every column's aggregates into a single ``agg`` so the table is scanned
once, then unpivot the 1-row result into long format with a JVM-side
explode (the reshaping runs on one row; only the scan touches data).

Exact COUNT(DISTINCT) is used so the result is oracle-able; Spark plans
multi-distinct aggregates with one Expand pass (rows × distinct-cols),
which is the exact-answer cost floor. At 100 TB swap in
``approx_count_distinct`` (HLL++, no expand) — same shape, weaker check,
noted per column via the ``exact`` flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _minmax(col: str, dtype: str) -> tuple[Column, Column]:
    """min/max normalized to double: numerics cast; timestamps as epoch
    micros (exact in a double until the year ~2255); strings/complex →
    NULL (lexicographic extremes are collation-dependent across
    engines, so they stay out of the differential surface)."""
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return (F.min(col).cast("double"), F.max(col).cast("double"))
    if dtype.startswith("timestamp"):
        # NTZ → TZ cast is identity under the engine's UTC session tz
        return (F.unix_micros(F.min(col).cast("timestamp")).cast("double"),
                F.unix_micros(F.max(col).cast("timestamp")).cast("double"))
    null = F.lit(None).cast("double")
    return null, null


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) → long-format DataFrame
    ``(col_name, n_rows, n_null, n_distinct, min_d, max_d)``."""
    dtypes = dict(df.dtypes)
    cols = list(columns or df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        lo, hi = _minmax(c, dtypes[c])
        aggs += [
            F.count(c).alias(f"{c}__cnt"),
            F.count_distinct(F.col(c)).alias(f"{c}__dst"),
            lo.alias(f"{c}__min"),
            hi.alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col(f"{c}__cnt")).alias("n_null"),
            F.col(f"{c}__dst").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_d"),
            F.col(f"{c}__max").alias("max_d"),
        )
        for c in cols
    ])
    return (
        one.select(F.explode(structs).alias("s"))
        .select("s.*")
    )
