"""Second scalar-function pack (E7 breadth): cryptographic hashes,
binary encodings, string-distance, string splitting, and the
struct/positional-explode surface.

The reference exercises zero scalar functions (SURVEY.md §2a: the only
expression is one `>` predicate); this pack plus plans/scalars.py is the
EXT function library. All expressions are Catalyst built-ins — per-row
map work inside whole-stage codegen, no shuffle, no Python — so at
100 TB they cost exactly one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "scalar_hash_encode",
    oracle="""
        SELECT c_custkey,
               md5(c_name) AS name_md5,
               sha256(c_name) AS name_sha256,
               to_base64(encode(c_name)) AS name_b64,
               hex(c_name) AS name_hex,
               decode(unhex(hex(c_name))) AS hex_roundtrip,
               levenshtein(c_name, reverse(c_name)) AS lev_self_rev,
               split_part(c_name, '#', 2) AS name_num,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
               COALESCE(
                   array_to_string(regexp_extract_all(c_name, '[1-9][0-9]*'),
                                   ','), '') AS name_digits
        FROM customer
        WHERE c_custkey < 300
    """,
    tags=("E7",),
)
def scalar_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encoding family: md5, sha2-256, base64, hex + unhex
    round-trip, levenshtein distance, split_part, translate, and
    regexp_extract_all (array result joined to a string so the
    cross-engine compare sees one canonical rendering). Both engines
    emit uppercase hex and standard base64, so outputs compare
    bit-for-bit."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.md5(name).alias("name_md5"),
        F.sha2(name, 256).alias("name_sha256"),
        F.base64(name.cast("binary")).alias("name_b64"),
        F.hex(name).alias("name_hex"),
        F.decode(F.unhex(F.hex(name)), "UTF-8").alias("hex_roundtrip"),
        F.levenshtein(name, F.reverse(name)).alias("lev_self_rev"),
        F.split_part(name, F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou")
        .alias("seg_translated"),
        F.array_join(
            F.regexp_extract_all(name, F.lit("[1-9][0-9]*"), 0), ","
        ).alias("name_digits"),
    )


@query(
    "scalar_struct_explode",
    oracle="""
        WITH arr AS (
            SELECT o_orderkey,
                   o_totalprice,
                   o_orderpriority,
                   [o_custkey, o_orderkey % 7, o_orderkey % 3] AS l
            FROM orders
            WHERE o_orderkey < 200
        )
        SELECT o_orderkey,
               o_totalprice AS s_price,
               o_orderpriority AS s_prio,
               generate_subscripts(l, 1) - 1 AS pos,
               unnest(l) AS val
        FROM arr
    """,
    tags=("E7",),
)
def scalar_struct_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (``named_struct`` / dot
    access) and positional explode: each order's 3-element array becomes
    (pos, val) rows — ``posexplode`` in Spark, unnest +
    generate_subscripts in the oracle. Generators cannot nest inside
    expressions (UNSUPPORTED_GENERATOR), so the explode is its own
    projection step; the struct fields prove dot-access survives
    alongside a generator in the same select."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    s = F.struct(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    arr = F.array(
        F.col("o_custkey"),
        F.col("o_orderkey") % 7,
        F.col("o_orderkey") % 3,
    )
    staged = o.select("o_orderkey", s.alias("s"), arr.alias("l"))
    return staged.select(
        "o_orderkey",
        F.col("s.price").alias("s_price"),
        F.col("s.prio").alias("s_prio"),
        F.posexplode("l").alias("pos", "val"),
    )


@query(
    "scalar_try_funcs",
    oracle="""
        WITH s AS (
            SELECT o_orderkey,
                   CASE WHEN o_custkey % 3 = 0 THEN 'x' || o_custkey::VARCHAR
                        ELSE o_custkey::VARCHAR END AS keystr,
                   string_split(o_orderpriority, '-') AS prio_parts,
                   o_totalprice, o_custkey
            FROM orders
        )
        SELECT o_orderkey,
               CASE WHEN o_custkey % 5 = 0 THEN NULL
                    ELSE o_totalprice / (o_custkey % 5) END AS safe_div,
               TRY_CAST(keystr AS BIGINT) AS parsed_key,
               prio_parts[2] AS elem2,
               prio_parts[3] AS elem3
        FROM s
    """,
    tags=("E7", "EXT"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe (`try_*`) function semantics: division by zero,
    unparseable casts, and out-of-bounds array access all yield NULL
    instead of failing the job — the ANSI-mode safety valves a
    production pipeline needs when `spark.sql.ansi.enabled` is on
    (Spark 4's default). The oracle states the same semantics with
    explicit guards; a drift in any NULL-production rule breaks the
    hash."""
    o = load_table(spark, sf_dir, "orders")
    keystr = F.when(F.col("o_custkey") % 3 == 0,
                    F.concat(F.lit("x"), F.col("o_custkey").cast("string"))
                    ).otherwise(F.col("o_custkey").cast("string"))
    parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5)
        .alias("safe_div"),
        keystr.try_cast("long").alias("parsed_key"),
        F.try_element_at(parts, F.lit(2)).alias("elem2"),
        F.try_element_at(parts, F.lit(3)).alias("elem3"),
    )
