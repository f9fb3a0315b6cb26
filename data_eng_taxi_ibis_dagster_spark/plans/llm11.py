"""Eleventh batch: null-safe equality join and an oracle-checked
iterative hierarchy traversal.

* ``join_null_safe_priority`` — the ``<=>`` (IS NOT DISTINCT FROM)
  join, the last E1 equality variant without coverage: NULL keys match
  each other instead of dropping out.
* ``hierarchy_pointer_doubling`` — transitive ancestor closure (root +
  depth per node) computed in O(log depth) self-join rounds. Spark has
  no recursive CTE; pointer doubling is the idiomatic distributed
  answer, and because the result is pure integer arithmetic it is
  checked against DuckDB's ``WITH RECURSIVE`` — a *strictly
  oracle-checked* iterative query, unlike the float-iterative
  ``kmeans_lloyd``.

The reference has no joins or iteration (SURVEY.md §2a "explicitly
absent"); both are EXT rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "join_null_safe_priority",
    oracle="""
        WITH a AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS k,
                          COUNT(*) AS n_a
                   FROM orders GROUP BY 1),
             b AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k,
                          COUNT(*) AS n_b
                   FROM orders GROUP BY 1)
        SELECT a.k AS k_a, b.k AS k_b, n_a, n_b
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("E1",),
)
def join_null_safe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): two
    priority histograms with different values NULLed out, joined so
    the NULL buckets pair up instead of vanishing (a plain equi-join
    returns 3 rows here, the null-safe one 4 — exactly the difference
    this query pins down). Null-safe equality is still a hash key
    (NULL hashes to a bucket), so the plan is a normal shuffled hash
    join, not a BNLJ; at scale beware: `<=>` funnels ALL nulls to one
    key — a null-heavy column needs the same salting as any other hot
    key."""
    o = load_table(spark, sf_dir, "orders")
    a = (o.groupBy(F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("k"))
         .agg(F.count(F.lit(1)).alias("n_a")))
    b = (o.groupBy(F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("k"))
         .agg(F.count(F.lit(1)).alias("n_b")))
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k_a"), b["k"].alias("k_b"), "n_a", "n_b")
    )


_DOUBLING_ROUNDS = 4  # covers hierarchies up to 2^4 = 16 levels deep


@query(
    "hierarchy_pointer_doubling",
    oracle="""
        WITH RECURSIVE users AS (
            SELECT DISTINCT user_id FROM events
        ), walk AS (
            SELECT user_id AS node, user_id AS cur, 0 AS d FROM users
            UNION ALL
            SELECT node, cur // 2, d + 1 FROM walk WHERE cur > 0
        )
        SELECT node, MAX(d) AS depth, 0 AS root_id
        FROM walk
        GROUP BY node
    """,
    tags=("E1", "EXT"),
)
def hierarchy_pointer_doubling(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Transitive ancestor closure by pointer doubling: each round
    joins the reach-table with itself (``anc ↦ anc-of-anc``, step
    counts add), so covered path length doubles per round — depth-16
    hierarchies in 4 self-joins, depth-64 in 6, versus one join *per
    level* for naive iteration. The synthetic forest is
    ``parent(u) = u DIV 2`` (root 0) over the distinct event users;
    the oracle walks the same forest with a recursive CTE, making this
    iterative query strictly integer-oracle-checked. The root self-loop
    ``(0, 0, 0)`` absorbs finished chains: once a node's ancestor hits
    the root, further rounds add 0 steps — no frontier bookkeeping.
    At 100 TB each round is one self-join shuffle on the ancestor key.
    Two structural guards (round 4): (1) converged rows — ancestor
    already at the root — bypass the join via union, which removes both
    the late-round root-key skew and their join volume; (2) each
    round's state is lazily ``localCheckpoint``-ed, because the round
    plan references the previous state THREE times (converged split ×2
    + hop side) and without truncation the lineage — and the number of
    source scans — grows exponentially in the round count (16 scans at
    4 rounds, measured)."""
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    # state: node → (anc = ancestor reached, d = steps to it)
    state = users.select(
        F.col("user_id").alias("node"),
        F.when(F.col("user_id") > 0, F.expr("user_id DIV 2"))
        .otherwise(F.lit(0)).cast("bigint").alias("anc"),
        F.when(F.col("user_id") > 0, F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("d"),
    ).localCheckpoint(eager=False)
    for _ in range(_DOUBLING_ROUNDS):
        done = state.filter(F.col("anc") == 0)
        active = state.filter(F.col("anc") != 0)
        hop = state.select(F.col("node").alias("h_node"),
                           F.col("anc").alias("h_anc"),
                           F.col("d").alias("h_d"))
        state = (
            active.join(hop, active["anc"] == hop["h_node"])
            .select("node",
                    F.col("h_anc").alias("anc"),
                    (F.col("d") + F.col("h_d")).alias("d"))
            .unionByName(done)
            .localCheckpoint(eager=False)
        )
    return state.select(
        "node",
        F.col("d").alias("depth"),
        F.col("anc").alias("root_id"),
    )
