"""Seventh batch: pipeline governance ops — data-contract validation
and incremental dedup against a prior corpus.

* ``constraint_check`` — the declarative data-quality gate every
  production ingest runs before publishing a table: referential
  integrity (orphan FKs), key uniqueness, and null-rate checks,
  emitted in long format (metric, value) so adding a rule never
  changes the schema. Each rule is one aggregate over one scan — no
  rule needs a second pass.
* ``dedup_incremental`` — the arriving-batch shape of near-dedup: new
  documents are checked against the *existing* corpus's fingerprint
  index instead of re-deduping the whole corpus (at 100 TB the index
  is a compact (fingerprint, canonical_id) table that lives alongside
  the corpus; each crawl joins against it, not against history's raw
  text). Fingerprint = winnowing-style min-md5 over 5-gram shingles
  (operators/text.py), robust to local edits — and engine-neutral, so
  the whole query is strictly oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import text as T
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "constraint_check",
    oracle="""
        SELECT 'total_orders' AS metric,
               CAST(COUNT(*) AS BIGINT) AS value FROM orders
        UNION ALL
        SELECT 'orphan_orders',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'dup_orderkeys',
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'null_priority',
               CAST(COUNT(*) FILTER (o_orderpriority IS NULL) AS BIGINT)
        FROM orders
    """,
    tags=("E1", "E4", "EXT"),
)
def constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation gate: referential integrity
    (orders→customer anti-join), o_orderkey uniqueness, and a null-rate
    rule, in long (metric, value) format. The FK check is the only
    join — an anti-join whose build side is the customer *key column*
    (broadcast at dim scale, shuffled-hash beyond); the uniqueness and
    null rules ride one aggregate each. A failed contract is a nonzero
    value — the pipeline runner gates publication on `value == 0`."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def one(metric: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(metric).alias("metric"),
                         F.col("value").cast("long").alias("value"))

    total = one("total_orders",
                o.agg(F.count(F.lit(1)).alias("value")))
    orphans = one(
        "orphan_orders",
        o.join(c.select("c_custkey"),
               o.o_custkey == c.c_custkey, "left_anti")
         .agg(F.count(F.lit(1)).alias("value")))
    dups = one(
        "dup_orderkeys",
        o.agg((F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
              .alias("value")))
    nulls = one(
        "null_priority",
        o.agg(F.count(F.when(F.col("o_orderpriority").isNull(), 1))
              .alias("value")))
    return total.unionByName(orphans).unionByName(dups).unionByName(nulls)


_FP_N = 5


@query(
    "dedup_incremental",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ),
        f AS (
            SELECT doc_id,
                   {T.sql_shingle_fingerprint("tk", _FP_N)} AS fp
            FROM t
        ),
        idx AS (
            SELECT fp, MIN(doc_id) AS canonical_id
            FROM f WHERE doc_id % 10 < 8
            GROUP BY fp
        )
        SELECT f.doc_id, idx.canonical_id, f.fp
        FROM f JOIN idx USING (fp)
        WHERE f.doc_id % 10 >= 8
    """,
    tags=("E10", "EXT"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup of an arriving batch (doc_id % 10 ≥ 8)
    against the existing corpus's fingerprint index (% 10 < 8):
    winnowing min-md5 fingerprints on both sides, the corpus side
    collapsed to (fp, canonical_id), then one equi-join — new documents
    that fingerprint-match history are reported with their canonical
    representative. At 100 TB the index is maintained incrementally
    (it is itself the MERGE target) and the arriving batch is small,
    so the join broadcasts the batch, never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        T.shingle_fingerprint(T.tokens("text"), _FP_N).alias("fp"),
    )
    idx = (
        f.filter(F.col("doc_id") % 10 < 8)
        .groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    )
    return (
        f.filter(F.col("doc_id") % 10 >= 8)
        .join(idx, "fp")
        .select("doc_id", "canonical_id", "fp")
    )
