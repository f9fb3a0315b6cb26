"""Order-independent (exact) float aggregation.

Floating-point SUM/AVG over a distributed dataset is not deterministic:
partial aggregates combine in partition order, so the same query can
produce results differing in the last ulp run-to-run and engine-to-engine.
The differential harness (driver CORRECTNESS gate, SURVEY.md §5) hash-
compares our values against DuckDB, so aggregates must be *bit-exact*
across engines.

The fix is the classic exact-decimal trick: cast to a fixed-point DECIMAL
before aggregating. Decimal sums are integer arithmetic — associative,
commutative, order-independent — so Spark and DuckDB agree exactly, and
the single final DECIMAL→DOUBLE conversion is deterministic. AVG is
computed as exact-sum ÷ count (double ÷ long, one deterministic fp op)
rather than the engines' native AVG.

Scale choice: fixture money columns are 2-decimal; scale=2 keeps the
unscaled sum far below 2^53 so the final double conversion is lossless
even at large SF. For raw uniform doubles (events.value, l_discount) use
scale=6: the quantization is the *defined semantic* of the query (applied
identically in the oracle SQL), not an approximation of it.

At 100 TB this costs one widened column per aggregate — still whole-stage
codegen, still map-side partial aggregation; no Python, no shuffle change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: str | Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column, returned as double.

    The final DECIMAL→DOUBLE conversion goes through a STRING: the
    round-10 sf1 sweep caught DuckDB's direct decimal→double cast
    double-rounding (``double(unscaled) / 10^scale`` — two roundings)
    once the unscaled sum exceeds 2^53, while the JVM's
    BigDecimal→double is correctly rounded, a 1-ulp divergence
    invisible at gate scale. Rendering the exact decimal and parsing
    it is ONE correct rounding on both engines at any magnitude (both
    string→double parsers are correctly rounded, and parsing is
    value-based so rendering differences can't matter); the cost is
    one string per GROUP. Values below 2^53 unscaled are bit-identical
    to the old direct cast."""
    return (F.sum(_col(c).cast(f"decimal(38,{scale})"))
            .cast("string").cast("double"))


def davg(c: str | Column, scale: int = 2) -> Column:
    """Order-independent AVG of a double column, returned as double."""
    col = _col(c)
    return dsum(col, scale) / F.count(col)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """ANSI rendering of :func:`dsum` for the DuckDB oracle (same
    string-mediated final conversion — see :func:`dsum`)."""
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) "
            f"AS VARCHAR) AS DOUBLE)")


def sql_davg(expr: str, scale: int = 2) -> str:
    """ANSI rendering of :func:`davg` for the DuckDB oracle."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


# ---------------------------------------------------------------------------
# Long-quantized fast path
# ---------------------------------------------------------------------------
# Decimal(38) aggregation is exact at any scale but runs on JVM Decimal
# objects (~4× slower than primitive sums). When the quantized unscaled
# sum provably fits a long, summing `floor(x·10^s + 0.5)` as BIGINT is
# equally exact/order-independent and stays in whole-stage codegen's
# primitive path. Headroom: scale 2 overflows past ~9.2e16 "cents" —
# ≈ 9e14 in column units, three orders of magnitude above a 100 TB fact
# table of prices — and scale 4 still leaves ~9e12. Use decimal (dsum)
# for scale ≥ 6 or unbounded-magnitude columns. Note the rounding
# convention is half-toward-+inf (floor(x+0.5)) — applied identically in
# both engines, it is the *defined* quantization of the query.

def lsum(c: str | Column, scale: int = 2) -> Column:
    """Order-independent SUM via long-quantized accumulation (fast path)."""
    unit = 10 ** scale
    q = F.floor(_col(c) * unit + F.lit(0.5)).cast("long")
    return F.sum(q) / F.lit(float(unit))


def lavg(c: str | Column, scale: int = 2) -> Column:
    """Order-independent AVG via long-quantized accumulation (fast path)."""
    return lsum(c, scale) / F.count(_col(c))


def sql_lsum(expr: str, scale: int = 2) -> str:
    # CAST AS DOUBLE divisor: a bare `100.0` literal is DOUBLE in DuckDB
    # but DECIMAL(4,1) in Spark SQL — the cast keeps the one SQL string
    # valid (and double-typed) on both parsers.
    unit = 10 ** scale
    return (f"SUM(CAST(FLOOR(({expr}) * {unit} + 0.5) AS BIGINT)) "
            f"/ CAST({unit} AS DOUBLE)")


def sql_lavg(expr: str, scale: int = 2) -> str:
    return f"{sql_lsum(expr, scale)} / COUNT({expr})"
