"""Remaining TPC-H query shapes (Q2, Q6-Q9, Q11, Q12, Q15-Q22), adapted
to the fixture schema.

Together with ``pricing_summary`` (Q1), ``shipping_priority`` (Q3),
``order_priority_check`` (Q4), ``local_supplier_volume`` (Q5),
``returned_items_top_customers`` (Q10), ``customer_order_distribution``
(Q13) and ``promo_revenue_share`` (Q14) this completes all 22 TPC-H
query *shapes* — the standard relational coverage matrix the reference
never had (it runs one query; ``/root/reference/README.md:47-48``).

Fixture adaptations (the testdata is TPC-H-ish, not TPC-H):

* no ``partsupp`` table → supplier↔part relationships derive from
  ``lineitem`` (the observed shipping graph); supply cost is modeled as
  ``0.6 * p_retailprice`` where Q9 needs a cost term.
* no ``l_commitdate``/``l_receiptdate`` → "late" is defined against
  ``o_orderdate + INTERVAL <n> DAY`` (Q12, Q21).
* no ``c_phone`` → Q22's country code is the last two digits of
  ``c_name`` (uniformly distributed in the fixture).
* no ``p_container``/``p_mfgr`` → predicates use ``p_type``/``p_brand``.

Every aggregate uses the order-independent exact paths
(``functions.exact``) so results hash-match the DuckDB oracle
bit-for-bit; thresholds are ratios or calibrated to fixture
distributions so the queries stay selective-but-nonempty across scale
factors.

Scale notes (100 TB posture) are in each docstring: which side
broadcasts, where the one big shuffle is, what AQE handles at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import (
    lavg,
    lsum,
    sql_lavg,
    sql_lsum,
)
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (min-per-group join-back)
# ---------------------------------------------------------------------------

@query(
    "min_cost_supplier",
    oracle="""
        WITH eligible AS (
            SELECT DISTINCT p.p_partkey, s.s_name, s.s_acctbal, n.n_name
            FROM part p
            JOIN lineitem l ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE p.p_type = 'STANDARD' AND p.p_size = 15
              AND r.r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey
        FROM (
            SELECT *, MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
            FROM eligible
        )
        WHERE s_acctbal = min_bal
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("E1", "E3", "E5"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD/size-15 part, the cheapest
    (lowest-acctbal, standing in for supply cost — no partsupp table)
    European supplier that has actually shipped it. The correlated MIN
    subquery is expressed as a window min + filter, so the per-part
    minimum computes in one pass with no self-join. part/supplier/
    nation/region all broadcast; lineitem provides the part↔supplier
    edges and is reduced to distinct pairs before the window."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") == 15))
        .select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    s = (load_table(spark, sf_dir, "supplier")
                    .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation")
                    .select("n_nationkey", "n_name", "n_regionkey"))
    r = F.broadcast(load_table(spark, sf_dir, "region")
                    .filter(F.col("r_name") == "EUROPE").select("r_regionkey"))
    eligible = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan-aggregate)
# ---------------------------------------------------------------------------

@query(
    "forecast_revenue",
    oracle=f"""
        SELECT {sql_lsum('l_extendedprice * l_discount', 4)} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
          AND l_quantity < 24
    """,
    tags=("F1", "A1"),
    bench=True,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue gain if small-quantity mid-discount trips were
    uncharged. Pure scan→filter→global-sum: no shuffle beyond the final
    single-row partial/final agg merge, every predicate pushes to the
    parquet scan (shipdate range prunes row groups on min/max), only
    four columns read. This is the scan-throughput benchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(lsum(F.col("l_extendedprice") * F.col("l_discount"), 4)
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@query(
    "volume_shipping",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               {sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY sn.n_name, cn.n_name, l_year
    """,
    tags=("E1", "E7"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, in
    both directions. supplier+nation broadcast (the supplier-side
    nation filter prunes lineitem rows before the big join); the
    disjunctive nation-pair predicate is applied after the cheap
    broadcast joins so the only large shuffle is lineitem⋈orders."""
    sn = (
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(load_table(spark, sf_dir, "nation")
              .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
              .select("n_nationkey", F.col("n_name").alias("supp_nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation"))
    cn = (
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(load_table(spark, sf_dir, "nation")
              .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
              .select("n_nationkey", F.col("n_name").alias("cust_nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "cust_nation"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(lsum(_rev(), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@query(
    "national_market_share",
    oracle=f"""
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               ({sql_lsum("CASE WHEN sn.n_name = 'NATION_5' "
                          "THEN l.l_extendedprice * (1 - l.l_discount) "
                          "ELSE 0 END", 4)}) /
               ({sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)})
               AS mkt_share
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_year
    """,
    tags=("E1", "E7"),
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of AMERICA-region PROMO-part
    revenue per order year. The share is a ratio of two exact
    conditional sums computed in ONE aggregation pass (no second scan,
    no join of two aggregates). part/supplier/nation/region/customer
    broadcast; lineitem⋈orders is the single large shuffle."""
    p = (load_table(spark, sf_dir, "part")
                    .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    s = (
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(load_table(spark, sf_dir, "nation")
              .select("n_nationkey", F.col("n_name").alias("supp_nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation"))
    c = (
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        .join(load_table(spark, sf_dir, "nation")
              .select("n_nationkey", "n_regionkey"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(load_table(spark, sf_dir, "region")
              .filter(F.col("r_name") == "AMERICA").select("r_regionkey"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    nation5_rev = F.when(F.col("supp_nation") == "NATION_5", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((lsum(nation5_rev, 4) / lsum(_rev(), 4)).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit
# ---------------------------------------------------------------------------

@query(
    "product_type_profit",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               {sql_lsum('l.l_extendedprice * (1 - l.l_discount) '
                         '- CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity', 4)}
               AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_type = 'LARGE'
        GROUP BY nation, o_year
    """,
    tags=("E1", "E7"),
    bench=True,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on LARGE-type parts by supplier nation and
    order year. No partsupp table, so unit cost is defined as
    0.6·p_retailprice (the fixture's cost semantic, applied identically
    in the oracle). part/supplier/nation broadcast; lineitem⋈orders is
    the one big shuffle, and profit can go negative so the exact sum
    uses signed long quantization."""
    p = (load_table(spark, sf_dir, "part")
                    .filter(F.col("p_type") == "LARGE")
                    .select("p_partkey", "p_retailprice"))
    s = (load_table(spark, sf_dir, "supplier")
                    .select("s_suppkey", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation")
                    .select("n_nationkey", F.col("n_name").alias("nation")))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
    profit = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(lsum(profit, 4).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important part volume (HAVING vs global scalar)
# ---------------------------------------------------------------------------

@query(
    "important_part_volume",
    oracle=f"""
        WITH base AS (
            SELECT l.l_partkey, l.l_extendedprice, l.l_discount
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
        )
        SELECT l_partkey, {sql_lsum(_SQL_REV, 4)} AS part_value
        FROM base
        GROUP BY l_partkey
        HAVING {sql_lsum(_SQL_REV, 4)} >
               (SELECT {sql_lsum(_SQL_REV, 4)} * CAST(0.001 AS DOUBLE) FROM base)
    """,
    tags=("E1", "A1"),
)
def important_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_3-supplied revenue exceeds
    0.1% of that nation's total (partsupp value → lineitem revenue).
    The global total is a scalar aggregate cross-joined (broadcast, one
    row) onto the per-part aggregate — the filtered base is computed
    once and feeds both aggregations; at scale the base does one
    shuffle for the per-part agg plus a one-row global reduce."""
    s = (
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .join(load_table(spark, sf_dir, "nation")
              .filter(F.col("n_name") == "NATION_3").select("n_nationkey"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    base = li.join(s, li.l_suppkey == s.s_suppkey)
    per_part = base.groupBy("l_partkey").agg(lsum(_rev(), 4).alias("part_value"))
    total = base.agg((lsum(_rev(), 4) * F.lit(0.001)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q12 — late shipment priority impact
# ---------------------------------------------------------------------------

@query(
    "late_shipment_priority",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
    """,
    tags=("E1", "E7"),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among 1997 shipments that went out more than 90
    days after ordering (no commit/receipt dates in the fixture —
    lateness is ship-vs-order + interval), how many lines belonged to
    high- vs low-priority orders, per line status. The lateness
    predicate is a theta condition evaluated on the equi-join output;
    conditional counts avoid a second pass."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (agg vs scalar max)
# ---------------------------------------------------------------------------

@query(
    "top_supplier",
    oracle=f"""
        WITH revenue0 AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_lsum(_SQL_REV, 4)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-07-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue0 r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    tags=("E1", "A1"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter. The CTE's "view" is computed once: per-supplier exact sums,
    then a one-row MAX cross-joined back (broadcast) to select the
    argmax — no self-join of the aggregate, no unpartitioned window.
    Exact sums make the float equality against MAX deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    revenue0 = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
                .agg(lsum(_rev(), 4).alias("total_revenue")))
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    s = (load_table(spark, sf_dir, "supplier")
                    .select("s_suppkey", "s_name"))
    return (
        revenue0.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (anti-join + count distinct)
# ---------------------------------------------------------------------------

@query(
    "parts_supplier_relationship",
    oracle="""
        SELECT p.p_brand, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_type <> 'PROMO'
          AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_size
    """,
    tags=("E1", "E4"),
)
def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, size) of non-PROMO parts in a size list, excluding
    suppliers with negative balances (the fixture's "complaints"
    analogue). The NOT IN renders as a broadcast anti-join; the
    count-distinct is a two-phase partial-distinct aggregation over the
    shuffled (brand, size) keys."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
        .select("p_partkey", "p_brand", "p_size"))
    bad = (load_table(spark, sf_dir, "supplier")
                      .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG)
# ---------------------------------------------------------------------------

@query(
    "small_quantity_revenue",
    oracle=f"""
        SELECT {sql_lsum('l1.l_extendedprice')} / CAST(7 AS DOUBLE) AS avg_yearly
        FROM lineitem l1
        JOIN part p ON p.p_partkey = l1.l_partkey
        WHERE p.p_brand = 'Brand#23' AND p.p_type = 'SMALL'
          AND l1.l_quantity < CAST(0.2 AS DOUBLE) * (
              SELECT {sql_lavg('l2.l_quantity')}
              FROM lineitem l2
              WHERE l2.l_partkey = l1.l_partkey
          )
    """,
    tags=("E1", "A2"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue lost if small-quantity orders
    (below 20% of the part's average order quantity) of Brand#23 SMALL
    parts were not taken. The correlated AVG subquery decorrelates into
    a per-part aggregate joined back on partkey — one extra shuffle of
    the (small) per-part aggregate instead of a per-row subquery. The
    average uses the exact quantized path so the 0.2·avg threshold is
    the same double in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = (li.groupBy(F.col("l_partkey").alias("pk"))
                .agg(lavg("l_quantity").alias("avg_qty")))
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL"))
        .select("p_partkey"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((lsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING semi-join)
# ---------------------------------------------------------------------------

@query(
    "large_volume_customers",
    oracle="""
        WITH order_qty AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_totalprice, q.sum_qty
        FROM order_qty q
        JOIN orders o ON o.o_orderkey = q.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    tags=("E1", "E3", "A1"),
    bench=True,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the 100 largest orders above 200 total units
    (threshold calibrated to the fixture's ~4 lines/order). The
    textbook IN-subquery form scans and aggregates lineitem twice;
    here the per-order quantity aggregate is computed ONCE and carries
    its sum through the join (the oracle CTE mirrors this), so the
    plan is: one lineitem shuffle on orderkey → filter → join orders
    (same key, AQE-local) → broadcast customers → TakeOrdered k=100.
    Quantities are integral in the fixture so BIGINT sums are exact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
           .filter(F.col("sum_qty") > 200))
    o = load_table(spark, sf_dir, "orders")
    c = (load_table(spark, sf_dir, "customer")
                    .select("c_custkey", "c_name"))
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue on brand/size/quantity bands (disjunctive)
# ---------------------------------------------------------------------------

@query(
    "brand_quantity_revenue",
    oracle=f"""
        SELECT {sql_lsum(_SQL_REV, 4)} AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("E1", "F1"),
)
def brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue over three OR'd brand/size/quantity
    bands (no p_container in the fixture). The disjunction mixes
    part-side and lineitem-side predicates, so it must evaluate on the
    join output — but Catalyst still derives the prunable implied
    predicates (brand IN (...), size ≤ 15, quantity ≤ 30) and pushes
    them into both scans; part broadcasts so there is no shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = (load_table(spark, sf_dir, "part")
                    .select("p_partkey", "p_brand", "p_size"))
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bands = (
        ((br == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(bands)
        .agg(lsum(_rev(), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential promotion suppliers (semi-join chain)
# ---------------------------------------------------------------------------

@query(
    "promo_part_suppliers",
    oracle="""
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
          AND s.s_suppkey IN (
              SELECT l.l_suppkey
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_type = 'PROMO'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l.l_suppkey, l.l_partkey
              HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50
          )
    """,
    tags=("E1",),
)
def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_7 suppliers who moved real volume
    (>50 units of some PROMO part in 1997) — no partsupp availqty, so
    the "excess stock" test becomes a shipped-volume test. The inner
    query aggregates per (supplier, part) then collapses to a supplier
    id set; both the HAVING aggregate and the final semi-join shuffle
    on supplier-side keys only (part broadcasts)."""
    n = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7").select("n_nationkey"))
    s = load_table(spark, sf_dir, "supplier")
    p = (load_table(spark, sf_dir, "part")
                    .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    volume_supp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey").distinct()
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(volume_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting
# ---------------------------------------------------------------------------

@query(
    "waiting_supplier_check",
    oracle="""
        WITH per_supp AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY l.l_orderkey, l.l_suppkey
        ),
        per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
            FROM per_supp
            GROUP BY l_orderkey
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM per_supp ps
        JOIN per_order po ON ps.l_orderkey = po.l_orderkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE ps.late = 1 AND po.n_supp > 1 AND po.n_late = 1
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    tags=("E1", "E3"),
)
def waiting_supplier_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders (late = shipped >120 days after
    ordering; the fixture has no commit/receipt dates). The classic
    EXISTS + NOT EXISTS double self-join is re-expressed as ONE
    (orderkey, suppkey) aggregation pass with per-order counts as
    window functions over it — a groupBy-then-join-back would make
    Spark compute the whole per-supplier subtree twice (no common-
    subplan sharing across a self-join; verified in the physical
    plan), which doubles the dominant join at scale. The explicit
    repartition on orderkey satisfies BOTH the aggregate's clustering
    requirement (orderkey is a subset of the grouping keys) and the
    window's partitioning, so the pass costs a single shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAY"),
        1).otherwise(0)
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    s = (load_table(spark, sf_dir, "supplier")
                    .select("s_suppkey", "s_name"))
    return (
        per_supp
        .withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1)
                & (F.col("n_late") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + scalar subquery)
# ---------------------------------------------------------------------------

@query(
    "global_sales_opportunity",
    oracle=f"""
        WITH rich_idle AS (
            SELECT substr(c_name, length(c_name) - 1, 2) AS cntrycode,
                   c_acctbal, c_custkey
            FROM customer
            WHERE substr(c_name, length(c_name) - 1, 2)
                  IN ('01', '12', '23', '04', '15', '26', '07')
              AND c_acctbal > (
                  SELECT {sql_lavg('c_acctbal')} FROM customer
                  WHERE c_acctbal > 0
              )
        )
        SELECT cntrycode, COUNT(*) AS numcust,
               {sql_lsum('c_acctbal')} AS totacctbal
        FROM rich_idle
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = rich_idle.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01'
        )
        GROUP BY cntrycode
    """,
    tags=("E1", "E4", "E7"),
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in seven
    "country codes" (last two digits of c_name — the fixture has no
    phone column) with no order since 1999 (dormant accounts; the pure
    never-ordered form is empty in a fixture where nearly every
    customer orders). Scalar AVG broadcast as a one-row cross join;
    NOT EXISTS renders as an anti-join against the filtered orders
    custkey set. At scale the anti-join shuffles on custkey;
    everything upstream of it is a pruned single-column scan."""
    c = load_table(spark, sf_dir, "customer")
    code = F.expr("substr(c_name, length(c_name) - 1, 2)")
    codes = ("01", "12", "23", "04", "15", "26", "07")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg(lavg("c_acctbal").alias("avg_bal")))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
         .select("o_custkey"))
    return (
        c.select(code.alias("cntrycode"), "c_acctbal", "c_custkey")
        .filter(F.col("cntrycode").isin(*codes))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"),
             lsum("c_acctbal").alias("totacctbal"))
    )
