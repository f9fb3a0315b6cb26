"""Order-independent (exact) float aggregation.

Floating-point SUM/AVG over a distributed dataset is not deterministic:
partial aggregates combine in partition order, so the same query can
produce results differing in the last ulp run-to-run and engine-to-engine.
The differential harness (driver CORRECTNESS gate, SURVEY.md §5) hash-
compares our values against DuckDB, so aggregates must be *bit-exact*
across engines.

The fix is fixed-point quantization before aggregating: each element
becomes the integer ``FLOOR(x·10^scale + 0.5)`` (multiply, add, floor —
all IEEE-correctly-rounded, hence bit-identical on every engine for
every double; see :func:`dsum` for why a double→DECIMAL cast is NOT
engine-portable), and integer/decimal sums are associative, commutative,
and order-independent, so Spark and DuckDB agree exactly.  AVG is
computed as exact-sum ÷ count (one deterministic fp op per step) rather
than the engines' native AVG.

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


def _qfloor(c: Column, unit: int) -> Column:
    """``FLOOR(x·unit + 0.5)`` with a LOUD domain guard: Spark's
    double→long floor silently SATURATES at ±2^63−1 (even under ANSI),
    where DuckDB's ``CAST(FLOOR(…) AS BIGINT)`` errors — without the
    guard an out-of-domain value (|x|·unit ≥ 2^63, e.g. ±1e308) would
    silently mis-sum on one engine and fail on the other.
    ``assert_true`` keeps both engines loud; NULL inputs pass through
    (SUM skips them), NaN fails the predicate and raises — matching
    DuckDB's NaN→BIGINT cast error."""
    pre = c * unit + F.lit(0.5)
    ok = c.isNull() | (F.abs(pre) < F.lit(float(2 ** 63)))
    guard = F.assert_true(ok, F.lit(
        f"exact quantization out of int64 domain (|x|*{unit} >= 2^63)"))
    return F.when(guard.isNull(), F.floor(pre))


def dsum(c: str | Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column, returned as double.

    Per-element quantization is ``FLOOR(x·10^scale + 0.5)`` — the same
    half-toward-+inf rule :func:`lsum` documents — NOT a double→DECIMAL
    cast.  The round-12 adversarial sweep caught the cast diverging
    across engines: Spark rounds the EXACT binary expansion of the
    double (HALF_UP via BigDecimal), DuckDB rounds its SHORTEST decimal
    representation (half-even), so any double whose shortest repr ties
    at the quantization scale (planted: 99999999.995 · 0.95 =
    94999999.99525000154972…, shortest repr "…99525") quantizes
    differently — a real wrong-answer class for sub-cent products at
    scale.  ``FLOOR(x·u + 0.5)`` is multiply + add + floor, each
    IEEE-correctly-rounded and therefore bit-identical on both engines
    for EVERY double; the result is an integer-valued BIGINT whose
    DECIMAL(38,0) cast is exact (no rounding → no tie rule to
    diverge).

    The quantized element domain is |x|·10^scale < 2^63 — beyond it
    both engines fail LOUD (Spark ANSI floor-overflow, DuckDB BIGINT
    cast error), never silently; at scale 4 that is |x| < 9.2e14,
    three orders of magnitude above a 100 TB money column.  The
    DECIMAL(38,0) accumulator keeps the SUM itself unbounded by row
    count.  The final DECIMAL→DOUBLE conversion goes through a STRING
    (round-10: DuckDB's direct decimal→double cast double-rounds past
    2^53 unscaled; both engines' string→double parsers are correctly
    rounded), then one deterministic double division by 10^scale.
    For unscaled sums below 2^53 the result is bit-identical to the
    pre-round-12 decimal-cast form (division of exact operands is
    correctly rounded, same as parsing the pointed rendering) —
    verified empirically over all 22 affected queries at sf0.01."""
    unit = 10 ** scale
    q = _qfloor(_col(c), unit).cast("decimal(38,0)")
    return F.sum(q).cast("string").cast("double") / F.lit(float(unit))


def davg(c: str | Column, scale: int = 2) -> Column:
    """Order-independent AVG of a double column, returned as double."""
    col = _col(c)
    return dsum(col, scale) / F.count(col)


def dquant(c: str | Column, scale: int = 2) -> Column:
    """Element-level quantization of ONE double to ``scale`` decimals,
    returned as double — the same engine-identical FLOOR rule as
    :func:`dsum`, for hash-stabilizing emitted scalars (e.g. the final
    PageRank vector).  floor→BIGINT is exact; BIGINT→double is one
    correctly-rounded conversion on both engines."""
    unit = 10 ** scale
    return _qfloor(_col(c), unit).cast("double") / F.lit(float(unit))


def sql_dquant(expr: str, scale: int = 2) -> str:
    """ANSI rendering of :func:`dquant` for the DuckDB oracle."""
    unit = 10 ** scale
    return (f"(CAST(CAST(FLOOR(({expr}) * {unit} + 0.5) AS BIGINT) "
            f"AS DOUBLE) / CAST({unit} AS DOUBLE))")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """ANSI rendering of :func:`dsum` for the DuckDB oracle (same
    floor quantization and string-mediated final conversion — see
    :func:`dsum`).  The CAST AS DOUBLE on the divisor keeps the one
    SQL string double-typed on both parsers (same note as
    :func:`sql_lsum`)."""
    unit = 10 ** scale
    # outer parens: the rendering ends in a division, so an unwrapped
    # substitution into "A - B * C / n" would reassociate (round-12:
    # 1-ulp stddev divergence in stats_aggregates)
    return (f"(CAST(CAST(SUM(CAST(CAST(FLOOR(({expr}) * {unit} + 0.5) "
            f"AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) "
            f"/ CAST({unit} AS DOUBLE))")


def sql_davg(expr: str, scale: int = 2) -> str:
    """ANSI rendering of :func:`davg` for the DuckDB oracle."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"


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
    q = _qfloor(_col(c), unit).cast("long")
    return F.sum(q) / F.lit(float(unit))


def lavg(c: str | Column, scale: int = 2) -> Column:
    """Order-independent AVG via long-quantized accumulation (fast path)."""
    return lsum(c, scale) / F.count(_col(c))


def sql_lsum(expr: str, scale: int = 2) -> str:
    # CAST AS DOUBLE divisor: a bare `100.0` literal is DOUBLE in DuckDB
    # but DECIMAL(4,1) in Spark SQL — the cast keeps the one SQL string
    # valid (and double-typed) on both parsers.
    unit = 10 ** scale
    return (f"(SUM(CAST(FLOOR(({expr}) * {unit} + 0.5) AS BIGINT)) "
            f"/ CAST({unit} AS DOUBLE))")


def sql_lavg(expr: str, scale: int = 2) -> str:
    return f"({sql_lsum(expr, scale)} / COUNT({expr}))"
