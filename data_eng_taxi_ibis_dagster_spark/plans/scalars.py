"""E7 — scalar function pack (string / date / math / conditional / JSON /
array), exercised as registered queries so each function family has an
oracle. All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "scalar_string_funcs",
    oracle="""
        SELECT p_partkey,
               LOWER(p_brand) AS brand_lc,
               UPPER(p_name) AS name_uc,
               SUBSTRING(p_type, 1, 5) AS type_head,
               LENGTH(p_name) AS name_len,
               CONCAT(p_brand, ':', p_type) AS brand_type,
               REPLACE(p_type, ' ', '_') AS type_snake,
               TRIM(p_name) AS name_trim
        FROM part
    """,
    tags=("E7",),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        F.upper("p_name").alias("name_uc"),
        F.substring("p_type", 1, 5).alias("type_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
    )


@query(
    "scalar_regexp",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
               regexp_matches(p_brand, 'Brand#[0-9]+') AS is_brandish,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
        FROM part
    """,
    tags=("E7",),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family. Patterns restricted to the POSIX-compatible subset
    where Java (Spark) and RE2-style (DuckDB) semantics agree; note
    DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all default."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.col("p_brand").rlike(r"Brand#[0-9]+").alias("is_brandish"),
        F.regexp_replace("p_name", r"[aeiou]", "").alias("name_novowel"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
               date_diff('day', o_orderdate, TIMESTAMP '2025-01-01') AS days_to_2025
        FROM orders
    """,
    tags=("E7",),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over orders. Date-valued results are rendered as
    strings so cross-engine value hashing is type-stable (oracle-parity
    caveat in FIXTURES.md §3)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long").alias("days_to_2025"),
    )


@query(
    "scalar_math_case",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price,
               ABS(l_discount - 0.05) AS disc_dev,
               FLOOR(l_quantity / 10) AS qty_bucket,
               CEIL(l_tax * 100) AS tax_pct,
               SQRT(l_quantity) AS qty_sqrt,
               CASE WHEN l_quantity >= 40 THEN 'bulk'
                    WHEN l_quantity >= 10 THEN 'mid'
                    ELSE 'small' END AS qty_class
        FROM lineitem
    """,
    tags=("E7",),
)
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE family. sqrt/abs/floor/ceil are IEEE-correctly-rounded
    in both engines; round(x, 2) on doubles follows the same
    half-away-from-zero convention."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round-half-up via floor: ROUND() diverges across engines on
        # doubles whose shortest repr sits exactly on a .xx5 boundary
        # (Spark rounds the repr, DuckDB the exact binary value); the
        # floor formulation is pure IEEE arithmetic — bit-identical.
        (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / 100)
        .alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10).cast("double").alias("qty_bucket"),
        F.ceil(F.col("l_tax") * 100).cast("double").alias("tax_pct"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small").alias("qty_class"),
    )


@query(
    "scalar_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
               json_extract_string(props, '$.missing') AS prop_missing
        FROM events
    """,
    tags=("E7",),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (string JSON). get_json_object
    is evaluated JVM-side with a streaming parser — no UDF."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')[:5])), ',') AS first5_sorted,
               string_split(text, ' ')[1] AS first_token
        FROM documents
    """,
    tags=("E7", "E12"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split / size / slice / array_distinct / sort / join.
    All native ArrayType kernels (no explode→regroup round trip)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.array_sort(F.array_distinct(F.slice(toks, 1, 5))), ",")
        .alias("first5_sorted"),
        toks.getItem(0).alias("first_token"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
        SELECT o_orderkey,
               o_totalprice AS price_val,
               2 AS n_keys,
               'cust,price' AS keys_sorted,
               CASE WHEN o_totalprice > CAST(100000 AS DOUBLE)
                    THEN 2 ELSE 1 END AS n_large,
               CAST(o_custkey AS DOUBLE) + o_totalprice AS merged_sum
        FROM orders
        WHERE o_orderkey < 500
    """,
    tags=("E7",),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: create_map, element_at, map_keys (sorted
    via array_sort for deterministic order — map key order is
    engine-internal), map_filter with a lambda, map_concat +
    aggregate over map_values. The oracle states the expected VALUES
    directly (DuckDB's MAP type has different construction syntax;
    the comparison proves the map ops compute the right answers, which
    is the contract). All map expressions are Catalyst built-ins —
    codegen'd, no Python."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    m = F.create_map(
        F.lit("price"), F.col("o_totalprice"),
        F.lit("cust"), F.col("o_custkey").cast("double"))
    big = F.map_filter(m, lambda k, v: v > 100000)
    merged = F.map_concat(
        F.create_map(F.lit("a"), F.col("o_custkey").cast("double")),
        F.create_map(F.lit("b"), F.col("o_totalprice")))
    return o.select(
        "o_orderkey",
        F.element_at(m, F.lit("price")).alias("price_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        # count of entries in {price, cust} exceeding 100k, plus 1 if the
        # cust id itself is small — rendered as: custkey (< 500 orders →
        # custkey can exceed 100k only at huge SF) never exceeds, price may
        (F.size(F.map_keys(big)) + F.lit(1)).alias("n_large"),
        F.aggregate(F.map_values(merged), F.lit(0.0),
                    lambda acc, x: acc + x).alias("merged_sum"),
    )
