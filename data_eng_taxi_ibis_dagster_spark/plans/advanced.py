"""Advanced relational coverage: statistical aggregates, pivot,
subqueries/CTE/HAVING, explode/lateral, grouping sets, and the E15
Python-UDF surface (pandas UDFs / applyInPandas).

Statistical aggregates use explicit sum-of-squares formulations over
exact decimal sums so results are order-independent and bit-identical
across engines (native STDDEV implementations differ in both algorithm
and accumulation order).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import (
    dsum,
    lavg,
    lsum,
    sql_dsum,
    sql_lavg,
    sql_lsum,
)
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_lsum('l_quantity')} AS sum_qty,
               {sql_lsum('l_extendedprice')} AS sum_base_price,
               {sql_lsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
               {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
               {sql_lavg('l_quantity')} AS avg_qty,
               {sql_lavg('l_extendedprice')} AS avg_price,
               {sql_lavg('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("2a", "A1", "A2"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the classic full-aggregate
    sweep (derived expressions, multiple exact sums/avgs, 6-ary group).
    One scan, partial agg collapses 600k rows to 6 before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum("l_quantity").alias("sum_qty"),
            lsum("l_extendedprice").alias("sum_base_price"),
            lsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            lavg("l_quantity").alias("avg_qty"),
            lavg("l_extendedprice").alias("avg_price"),
            lavg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               {sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
    """,
    tags=("E1", "E3"),
    bench=True,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter, two-fact join, revenue
    aggregation, top-10. The filtered customer side is SF-scaling, so
    its broadcast is stats/AQE's call, not a forced hint; the
    lineitem⋈orders join is the only large shuffle; TakeOrdered caps
    the sort at k rows."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey"))
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(lsum(revenue, 4).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "order_priority_check",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
          AND o.o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
    """,
    tags=("E1",),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS → left-semi join): count orders
    per priority that had at least one line item shipped after the order
    date. The fixture lacks commit/receipt dates, so "late" is
    l_shipdate > o_orderdate. The EXISTS decorrelates to a single
    semi-join shuffle on orderkey; the date filter prunes orders before
    the join, and only (l_orderkey, l_shipdate) is read from lineitem."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "customer_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    tags=("E1", "A1"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer. Left outer
    join with a filter in the ON clause (kept on the join, NOT pushed to
    WHERE — pushing it would drop order-less customers and change the
    histogram's zero bucket), then two aggregations: per-customer count,
    then count-of-counts. The second agg's input is one row per customer,
    so its shuffle is small; COUNT(o_orderkey) counts only matched rows
    per SQL null-skipping semantics."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "promo_revenue_share",
    oracle=f"""
        SELECT CAST(100 AS DOUBLE) *
               ({sql_lsum("CASE WHEN p.p_type LIKE 'PROMO%' "
                          "THEN l.l_extendedprice * (1 - l.l_discount) "
                          "ELSE 0 END", 4)}) /
               ({sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)})
               AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
          AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("E1", "E7"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo parts in one month.
    Conditional aggregation over a fact⋈dim join; part joins by
    stats/AQE choice (broadcast while it fits — no
    fact shuffle at all — the global agg is a single partial+final pass).
    Division happens once, after both exact sums, so the ratio is
    bit-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    p = (load_table(spark, sf_dir, "part")
                    .select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * lsum(promo, 4) / lsum(rev, 4))
            .alias("promo_revenue_pct"))
    )


@query(
    "local_supplier_volume",
    oracle=f"""
        SELECT n.n_name,
               {sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
    tags=("E1",),
    bench=True,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the supplier and the
    customer share a nation, suppliers restricted to one region, orders
    to one year. Six tables: nation/region broadcast-hinted (fixed 25/5
    rows), supplier unhinted (SF-scaling; AQE decides),
    so the only large shuffle is lineitem⋈orders; the c↔s nation
    equality rides the supplier join as an extra key pair instead of a
    post-join filter."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = (load_table(spark, sf_dir, "supplier")
                    .select("s_suppkey", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation")
                    .select("n_nationkey", "n_name", "n_regionkey"))
    r = F.broadcast(load_table(spark, sf_dir, "region")
                    .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(lsum(rev, 4).alias("revenue"))
    )


@query(
    "returned_items_top_customers",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
    tags=("E1", "E3"),
)
def returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. The returnflag filter pushes into the lineitem scan and the
    quarter filter into orders; nation broadcasts; TakeOrdered caps the
    final sort at 20 rows."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = F.broadcast(load_table(spark, sf_dir, "nation")
                    .select("n_nationkey", "n_name"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(lsum(rev, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def _profile_oracle_col(col: str, kind: str) -> str:
    if kind == "num":
        lo, hi = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
    elif kind == "ts":
        lo, hi = (f"CAST(epoch_us(MIN({col})) AS DOUBLE)",
                  f"CAST(epoch_us(MAX({col})) AS DOUBLE)")
    else:
        lo = hi = "CAST(NULL AS DOUBLE)"
    return f"""
        SELECT '{col}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({col}) AS n_null,
               COUNT(DISTINCT {col}) AS n_distinct,
               {lo} AS min_d,
               {hi} AS max_d
        FROM orders"""


@query(
    "profile_orders",
    oracle=" UNION ALL ".join(
        _profile_oracle_col(c, k) for c, k in [
            ("o_orderkey", "num"), ("o_custkey", "num"),
            ("o_orderstatus", "str"), ("o_totalprice", "num"),
            ("o_orderdate", "ts"), ("o_orderpriority", "str"),
        ]),
    tags=("E8", "A3"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator over orders: every column's null count,
    exact distinct count and min/max in ONE scan (operators.profile).
    The oracle is the naive per-column UNION ALL — six table scans —
    demonstrating exactly the multi-pass shape the operator avoids."""
    from data_eng_taxi_ibis_dagster_spark.operators.profile import profile

    return profile(load_table(spark, sf_dir, "orders"))


@query(
    "stats_aggregates",
    oracle=f"""
        SELECT c_mktsegment,
               MIN(c_acctbal) AS min_bal,
               MAX(c_acctbal) AS max_bal,
               sqrt(({sql_dsum('c_acctbal * c_acctbal', 4)} - {sql_dsum('c_acctbal')} * {sql_dsum('c_acctbal')} / COUNT(c_acctbal))
                    / (COUNT(c_acctbal) - 1)) AS stddev_bal,
               COUNT(*) AS n
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("E8", "A2"),
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX plus sample standard deviation in the explicit
    sum-of-squares form over exact decimal sums: order-independent,
    unlike native STDDEV (Welford accumulation order varies by engine
    and partitioning)."""
    c = load_table(spark, sf_dir, "customer")
    sq = dsum(F.col("c_acctbal") * F.col("c_acctbal"), 4)
    s = dsum("c_acctbal")
    n = F.count("c_acctbal")
    return c.groupBy("c_mktsegment").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.sqrt((sq - s * s / n) / (n - F.lit(1))).alias("stddev_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "pivot_status_by_priority",
    oracle=f"""
        SELECT o_orderpriority,
               {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_sales,
               {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_sales,
               {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_sales
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("E6",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — at scale always
    pin the pivot values; value discovery is an extra pass and an
    unbounded-width risk. Oracle renders the same thing as CASE sums."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("f_sales"),
        F.col("O").alias("o_sales"),
        F.col("P").alias("p_sales"),
    )


@query(
    "subquery_cte_having",
    oracle="""
        WITH seg_stats AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                       / CAST(100 AS DOUBLE) / COUNT(c_acctbal) AS seg_avg
            FROM customer
            GROUP BY c_mktsegment
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS n_above
        FROM customer c
        JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
        WHERE c.c_acctbal > s.seg_avg
          AND c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        GROUP BY c.c_mktsegment
        HAVING COUNT(*) > 10
    """,
    tags=("Q2", "E1"),
)
def subquery_cte_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + IN-subquery + HAVING through the SQL entry point (the
    reference's Q2 surface generalized): customers above their segment's
    average balance who placed a large order. Catalyst rewrites the IN
    as a left-semi join and decorrelates the CTE join."""
    from data_eng_taxi_ibis_dagster_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql("""
        WITH seg_stats AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                       / CAST(100 AS DOUBLE) / COUNT(c_acctbal) AS seg_avg
            FROM customer
            GROUP BY c_mktsegment
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS n_above
        FROM customer c
        JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
        WHERE c.c_acctbal > s.seg_avg
          AND c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        GROUP BY c.c_mktsegment
        HAVING COUNT(*) > 10
    """)


@query(
    "scalar_subquery_fraction",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM orders) AS frac
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("Q2",),
)
def scalar_subquery_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (share-of-total) — planned as a
    one-row broadcast, not a recompute-per-row."""
    from data_eng_taxi_ibis_dagster_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM orders) AS frac
        FROM orders
        GROUP BY o_orderstatus
    """)


@query(
    "grouping_sets_sql",
    oracle=f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("E6", "Q2"),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (rollup/cube's general form)."""
    from data_eng_taxi_ibis_dagster_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@query(
    "explode_tokens",
    oracle="""
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
        HAVING COUNT(*) > 100
    """,
    tags=("E7", "E12"),
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode → frequency count (the word-count shape). At
    scale the explode multiplies rows ~100×; the partial agg right after
    collapses them again before any shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 100)
    )


# ---------------------------------------------------------------------------
# E15 — Python UDF surface (pandas UDFs, applyInPandas)
# ---------------------------------------------------------------------------

@query(
    "pandas_udf_scalar",
    oracle="""
        SELECT o_orderkey,
               o_totalprice * 0.9 + 5.0 AS adjusted_price
        FROM orders
        WHERE o_totalprice > 400000
    """,
    tags=("E15",),
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized). Deterministic elementwise
    float math → oracle-checkable even through the Python boundary.
    Built-ins beat this 10-100× (see scalar_* queries) — it exists to
    prove the E15 surface, filtered to a small slice for exactly that
    reason."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def adjust(p: pd.Series) -> pd.Series:
        return p * 0.9 + 5.0

    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", adjust("o_totalprice").alias("adjusted_price"))
    )


@query(
    "pandas_udf_grouped",
    oracle="""
        SELECT c_mktsegment,
               MAX(c_acctbal) - MIN(c_acctbal) AS bal_range
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("E15",),
)
def pandas_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (max-min spread — order-independent,
    so exactly comparable). The group shuffle feeds Arrow batches per
    group into Python; state never exceeds one group's column."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def bal_range(bal: pd.Series) -> float:
        return float(bal.max() - bal.min())

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(bal_range("c_acctbal").alias("bal_range"))


@query(
    "apply_in_pandas_zscore",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal >= seg_max THEN 1 ELSE 0 END AS is_seg_max
        FROM (
            SELECT c_custkey, c_acctbal,
                   MAX(c_acctbal) OVER (PARTITION BY c_mktsegment) AS seg_max
            FROM customer
        )
    """,
    tags=("E15",),
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: arbitrary per-group pandas logic with an explicit
    output schema (flag the max-balance customer per segment — integer
    output keeps the oracle exact). The Spark-native rendering is the
    window in the oracle; the UDF path exists for logic that genuinely
    can't be expressed relationally."""
    c = load_table(spark, sf_dir, "customer")

    def flag_max(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["c_acctbal"].max()
        return pd.DataFrame({
            "c_custkey": pdf["c_custkey"],
            "is_seg_max": (pdf["c_acctbal"] >= m).astype("int32"),
        })

    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(flag_max, schema="c_custkey long, is_seg_max int")
    )


_CHUNK = 32


@query(
    "udtf_chunk_documents",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(least({_CHUNK}, len(tk) - i*{_CHUNK}) AS BIGINT)
                   AS n_tokens,
               array_to_string(tk[i*{_CHUNK}+1 : (i+1)*{_CHUNK}], ' ')
                   AS chunk_text
        FROM t, LATERAL (
            SELECT unnest(generate_series(0, (len(tk)-1)//{_CHUNK})) AS i
        )
    """,
    tags=("E15", "EXT"),
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined *table* function, the one UDF class
    the other E15 queries don't cover): chunk each document into
    fixed-size token windows — the RAG/pretraining chunking op — via a
    lateral join, one input row fanning out to ceil(n_tokens/32) rows.
    UDTFs are row-at-a-time Python (the slow path; the oracle shows the
    same op relationally) — the value here is the API surface: arbitrary
    generator logic with a declared schema, parallel per input split.
    """
    from pyspark.sql.functions import udtf

    from data_eng_taxi_ibis_dagster_spark.sources.tables import register_views

    @udtf(returnType=(
        "doc_id bigint, chunk_idx bigint, n_tokens bigint, "
        "chunk_text string"))
    class ChunkDoc:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = text.split(" ")
            for i in range((len(toks) - 1) // _CHUNK + 1):
                w = toks[i * _CHUNK:(i + 1) * _CHUNK]
                yield doc_id, i, len(w), " ".join(w)

    register_views(spark, sf_dir, ["documents"])
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.* FROM documents, LATERAL chunk_doc(doc_id, text) AS c"
    )


@query(
    "arrow_python_udf",
    oracle="""
        SELECT o_orderkey,
               (o_orderkey * 31 + 7) % 1000 AS bucket_id
        FROM orders
        WHERE o_totalprice > 450000
    """,
    tags=("E15",),
)
def arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``): row-logic Python
    with Arrow-batched transfer — the middle rung between legacy
    pickled row-at-a-time UDFs (never used in this repo) and pandas
    UDFs. Integer math keeps it oracle-exact; filtered to a small slice
    because built-ins remain the hot-path answer."""
    mix = F.udf(lambda k: (k * 31 + 7) % 1000, "long", useArrow=True)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey", mix("o_orderkey").alias("bucket_id"))
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_mktsegment = 'BUILDING'
"""


@query(
    "lateral_topn_per_customer",
    oracle=_LATERAL_SQL,
    tags=("E1", "Q2", "EXT"),
)
def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 lateral derived table,
    Spark 3.2+): the two highest-value orders per BUILDING-segment
    customer, written as a per-row dependent subquery with ORDER BY +
    LIMIT — the SQL-surface twin of the `topk_per_group` DataFrame
    shape. Catalyst decorrelates the lateral into a join + per-key
    limit rather than executing a subquery per row, so the plan scales
    like the window formulation; the oracle runs the IDENTICAL text on
    DuckDB (both engines implement standard lateral semantics)."""
    from data_eng_taxi_ibis_dagster_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_SQL)


@query(
    "variant_props_stats",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        WHERE props IS NOT NULL
        GROUP BY event_type
    """,
    tags=("E7", "EXT"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` turns the events ``props`` JSON into a variant
    (parsed ONCE into a binary representation at the scan — repeated
    path accesses don't re-parse the string, the practical advantage
    over per-access ``get_json_object``), then ``variant_get`` with a
    typed path extracts the metric. The oracle uses DuckDB's JSON
    pointer on the same column — integer extraction + integer
    aggregates keep the comparison exact."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull())
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("k").alias("sum_k"),
             F.max("k").alias("max_k"))
    )
