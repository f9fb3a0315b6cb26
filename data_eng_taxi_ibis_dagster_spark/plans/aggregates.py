"""Extended aggregate surface (E8/E7 breadth): conditional and boolean
aggregates, arg-min/max, median, bitwise aggregates, sorted string
concatenation, and exact bivariate linear statistics (corr / covariance /
regression slope) computed order-independently.

The reference's only aggregates are AVG and COUNT(*)
(`/root/reference/taxi_pipeline_native.py:93,47`); this module is the
EXT breadth a real engine needs. Every query here is strictly
oracle-checked. Determinism notes per query:

* ``min_by``/``max_by`` are only deterministic when the ordering key is
  unique within each group — we order by ``o_orderkey`` (globally
  unique), so Spark's and DuckDB's tie-breaking never diverges.
* ``median`` interpolates the two middle values; over integers (cents)
  the average is exactly representable, so both engines agree
  bit-for-bit.
* Native ``corr``/``covar_samp`` stream doubles through Welford-style
  co-moment updates whose result depends on partition order — not
  oracle-able. ``agg_exact_linear_stats`` instead quantizes to integer
  units, takes exact integer sums (decimal(38) where a long could
  overflow), and applies ONE textually identical closed-form double
  expression in both engines; every fp op is IEEE-defined, so the
  results are bit-equal. Tests assert the native functions agree with
  the exact form to ~1e-9 relative.

At 100 TB all of these remain single-shuffle hash aggregates with
map-side partials and whole-stage codegen (integer/boolean paths); the
decimal(38) sum is the only widened accumulator and only where the
long-quantized fast path could overflow (see functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "agg_conditional_bool",
    oracle="""
        SELECT o_orderpriority,
               CAST(count_if(o_totalprice > CAST(200000 AS DOUBLE)) AS BIGINT)
                   AS n_big,
               CAST(count_if(o_custkey % 2 = 1) AS BIGINT) AS n_odd_cust,
               bool_and(o_totalprice > CAST(0 AS DOUBLE)) AS all_positive,
               bool_or(o_totalprice > CAST(450000 AS DOUBLE)) AS any_huge
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("E8",),
)
def agg_conditional_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family: ``count_if``, ``bool_and``,
    ``bool_or`` per order priority. All integer/boolean accumulators —
    fully deterministic, partial-aggregated map-side."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.count_if(F.col("o_custkey") % 2 == 1).alias("n_odd_cust"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 450000).alias("any_huge"),
    )


@query(
    "agg_argminmax_median_bits",
    oracle="""
        SELECT o_orderstatus,
               arg_min(o_orderpriority, o_orderkey) AS first_prio,
               arg_max(o_orderpriority, o_orderkey) AS last_prio,
               median(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS med_price_cents,
               bit_and(o_custkey) AS cust_band,
               bit_or(o_custkey) AS cust_bor,
               bit_xor(o_custkey) AS cust_bxor
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("E8",),
)
def agg_argminmax_median_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``min_by``/``max_by`` (deterministic: ordering key o_orderkey is
    unique), exact ``median`` over integer cents (middle-pair average is
    exactly representable → cross-engine bit-equal), and the bitwise
    aggregate family."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderpriority", "o_orderkey").alias("first_prio"),
        F.max_by("o_orderpriority", "o_orderkey").alias("last_prio"),
        F.median(cents).alias("med_price_cents"),
        F.bit_and("o_custkey").alias("cust_band"),
        F.bit_or("o_custkey").alias("cust_bor"),
        F.bit_xor("o_custkey").alias("cust_bxor"),
    )


@query(
    "agg_string_concat_sorted",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation
        GROUP BY n_regionkey
    """,
    tags=("E8",),
)
def agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): collect_list is
    order-nondeterministic under parallelism, so the deterministic form
    is collect → ``array_sort`` → ``array_join`` — equivalent to SQL
    ``string_agg(x ORDER BY x)``. Grouped concat of unbounded groups is
    a driver-killer at 100 TB; this is for bounded dimension rollups
    (25 nations) — the plan is a tiny two-phase hash agg."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",")
        .alias("nations_csv"),
        F.count("*").alias("n_nations"),
    )


def _linear_stats_sql() -> str:
    # ONE closed-form rendering shared (textually) with the Spark side:
    # identical operation order → identical IEEE rounding in both engines.
    nd = "CAST(COUNT(*) AS DOUBLE)"
    sx = "CAST(SUM(qx) AS DOUBLE)"
    sy = "CAST(SUM(qy) AS DOUBLE)"
    sxy = "CAST(SUM(qx * qy) AS DOUBLE)"
    sxx = "CAST(SUM(qx * qx) AS DOUBLE)"
    # qy² multiplies in DECIMAL(19,0) — BIGINT·BIGINT overflows LOUD on
    # both engines at qy ≥ ~3e9 cents (round-12 adversarial 1e8-scale
    # price), while 19+19 stays within both engines' 38-digit product
    # rule; the sum→double conversion is string-mediated because a
    # direct decimal→double cast double-rounds past 2^53 on DuckDB
    # (the round-10 class).
    syy = ("CAST(CAST(SUM(CAST(qy AS DECIMAL(19,0)) "
           "* CAST(qy AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)")
    cov_n = f"({nd} * {sxy} - {sx} * {sy})"
    var_x = f"({nd} * {sxx} - {sx} * {sx})"
    var_y = f"({nd} * {syy} - {sy} * {sy})"
    return f"""
        WITH q AS (
            SELECT l_returnflag,
                   CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qx,
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS qy
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {cov_n} / ({nd} * ({nd} - 1.0)) AS covar_samp_cents,
               {cov_n} / SQRT({var_x} * {var_y}) AS corr_qty_price,
               {cov_n} / {var_x} AS slope_cents_per_qty
        FROM q
        GROUP BY l_returnflag
    """


@query(
    "agg_exact_linear_stats",
    oracle=_linear_stats_sql(),
    tags=("E8",),
)
def agg_exact_linear_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bivariate statistics (sample covariance, Pearson
    correlation, OLS slope) of quantity vs price-in-cents per return
    flag, from order-independent integer sums — the oracle-able
    counterpart of native ``corr``/``covar_samp``/``regr_slope`` (whose
    streaming co-moment accumulation is partition-order-dependent).

    Sum magnitudes: qx ≤ 50, qy ≤ ~1e7, so Σqx·qy ≤ ~5e8·rows and fits
    a long far past 100 TB; Σqy² ≤ 1e14·rows overflows a long around
    ~1e5 rows, so that one sum runs as decimal(38,0). The closed-form
    double expression is textually mirrored in the oracle: every +,-,
    *,/,sqrt is a correctly-rounded IEEE op, so results are bit-equal
    across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qx"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .alias("qy"),
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qy").cast("decimal(19,0)")
              * F.col("qy").cast("decimal(19,0)")).alias("syy"),
    )
    nd = F.col("n_items").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    # string-mediated, mirroring the oracle's VARCHAR hop (see
    # _linear_stats_sql: direct decimal→double diverges past 2^53)
    syy = F.col("syy").cast("string").cast("double")
    cov_n = nd * sxy - sx * sy
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return agg.select(
        "l_returnflag",
        "n_items",
        (cov_n / (nd * (nd - F.lit(1.0)))).alias("covar_samp_cents"),
        (cov_n / F.sqrt(var_x * var_y)).alias("corr_qty_price"),
        (cov_n / var_x).alias("slope_cents_per_qty"),
    )


@query(
    "agg_bitwise_flags",
    oracle="""
        SELECT o_orderpriority,
               bit_and(o_custkey)::BIGINT AS flags_and,
               bit_or(o_custkey)::BIGINT AS flags_or,
               bit_xor(o_custkey)::BIGINT AS flags_xor,
               bit_count(bit_or(o_custkey))::INT AS popcount_or
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("E8", "EXT"),
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (BIT_AND / BIT_OR / BIT_XOR +
    popcount) — the flag-mask rollup shape (feature bitmaps, permission
    masks, bloom-ish presence sets). All three are associative/
    commutative integer reductions: map-side partials combine
    losslessly, one shuffle on the group key, and results are exact by
    construction on every engine."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_custkey").alias("flags_and"),
        F.bit_or("o_custkey").alias("flags_or"),
        F.bit_xor("o_custkey").alias("flags_xor"),
        F.bit_count(F.bit_or("o_custkey")).cast("int").alias("popcount_or"),
    )
