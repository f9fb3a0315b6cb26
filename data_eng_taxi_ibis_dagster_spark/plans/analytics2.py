"""Advanced-analytics queries, round 4 (cont. 3): triangle counting
over the token co-occurrence graph, 2-D skyline (Pareto frontier),
MAD-based robust outlier detection, and per-entity LOCF gap filling —
four classic warehouse/data-science operators the reference's portable
surface (``/root/reference/taxi_pipeline.py:89-147``) never reaches,
each with a strict DuckDB oracle.

Scale shapes:

* **Triangles** — the edge relation is oriented (``a < b``) so every
  triangle is generated exactly once by two equi-joins; the per-vertex
  count is one aggregate. Orientation is the standard degree-bounding
  trick: each wedge is enumerated from its lowest vertex only, keeping
  the join fan-out bounded by the oriented out-degree, not the raw
  degree.
* **Skyline** — the 2-D Pareto frontier reduces to: collapse to one
  row per distinct x (max y), then an exclusive running-max over the
  distinct-x relation via
  :func:`operators.order.distributed_prefix_max` — range-bucketed, so
  no single-partition stage exists even when |distinct x| grows with
  the corpus (continuous prices).
* **MAD outliers** — two :func:`distributed_rank` passes (median, then
  median absolute deviation) replace the global percentile window; the
  medians travel as 1-row broadcasts. No transcendental math → the
  flag threshold is engine-exact.
* **LOCF** — per-user hourly scaffold (explode of a sequence), left
  join to the sparse hourly aggregate, forward fill with
  ``last(..., ignorenulls=True)`` over a per-user window — bounded by
  a user's own span, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import lsum, sql_lsum
from data_eng_taxi_ibis_dagster_spark.operators.order import (
    distributed_prefix_sum,
    distributed_rank,
)
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------

@query(
    "graph_triangle_tokens",
    oracle="""
        WITH dt AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), e0 AS (
            SELECT a.tok AS ta, b.tok AS tb, COUNT(*) AS w
            FROM dt a JOIN dt b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2
        ), eq AS (
            SELECT w, ta, tb,
                   row_number() OVER (ORDER BY w, ta, tb) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM e0
        ), thr AS (
            SELECT w AS t FROM eq
            WHERE rn = CAST(ceiling(0.6 * cnt) AS BIGINT)
        ), e AS (
            SELECT ta, tb FROM e0, thr WHERE e0.w >= thr.t
        ), tri AS (
            SELECT e1.ta AS a, e1.tb AS b, e2.tb AS c
            FROM e e1
            JOIN e e2 ON e2.ta = e1.tb
            JOIN e e3 ON e3.ta = e1.ta AND e3.tb = e2.tb
        )
        SELECT token, COUNT(*) AS n_triangles
        FROM (
            SELECT a AS token FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        GROUP BY token
    """,
    tags=("E12", "graph"),
    bench=True,
)
def graph_triangle_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the token co-occurrence graph
    (edge = token pair whose co-occurrence count reaches the 60th
    percentile of all pair weights — a data-relative cut that keeps the
    graph sparse at every corpus size). The oriented-edge
    two-join enumeration (``a<b<c`` wedges closed by the third edge) is
    THE distributed triangle algorithm — each triangle materializes
    once, and all three joins are hash equi-joins on vertex keys. The
    co-occurrence relation itself is one exploded self-join shuffled on
    doc_id with per-doc fan-out bounded by distinct-token count."""
    # _right_size (scan-parallelism fan-out, no-op at scale) +
    # explicit no-op isNotNull on tok: the three triangle join sides
    # push isnotnull on DIFFERENT columns (b / a,c) into their copies
    # of the e0 subtree, and asymmetric filters defeat the AQE stage
    # reuse that evaluates the co-occurrence aggregate once (the
    # round-13 containment/dsir finding)
    from data_eng_taxi_ibis_dagster_spark.operators.dedup import (
        _right_size,
    )

    d = _right_size(load_table(spark, sf_dir, "documents"))
    dt = (d.select(
              "doc_id", F.explode(F.split("text", " ")).alias("tok"))
          .filter(F.col("tok").isNotNull() & F.col("doc_id").isNotNull())
          .distinct())
    a = dt.select("doc_id", F.col("tok").alias("ta"))
    b = dt.select("doc_id", F.col("tok").alias("tb"))
    # Round 13: the localCheckpoint(eager=False) "materialize once"
    # here executed at PLAN-BUILD time under AQE — real work outside
    # bench.py's timed window (round-12 order.py finding; kept one
    # round for record comparability, now re-based).  Honest sharing:
    # every consumer (the threshold rank pass's three references, the
    # edge filter, the three triangle join sides) prunes identically
    # below the (ta, tb) aggregate — grouping keys are not prunable —
    # so AQE stage reuse evaluates the exploded co-occurrence self-join
    # once at runtime and each consumer re-reads its exchange.
    e0 = (
        a.join(b, "doc_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # Exact 60th-percentile weight cut — the threshold adapts to corpus
    # density instead of hard-coding an absolute co-occurrence count.
    # Round 13: the cut no longer RANKS every edge.  The oracle's
    # row_number orders by (w, ta, tb), so the w at global rank
    # ceil(0.6·N) is fully determined by the per-weight HISTOGRAM:
    # it is the smallest w whose cumulative edge count reaches the
    # target — the (ta, tb) tiebreaks only order rows WITHIN a w tie
    # group and can never move the boundary between groups.  The
    # histogram groupBy shares e0's aggregate exchange (AQE stage
    # reuse — same subtree), and the prefix machinery now runs over
    # |distinct w| rows (a count-distribution support, ~sqrt-ish of
    # the edge count) instead of the full edge relation: the previous
    # distributed_rank shuffled EVERY edge through its bucket windows
    # just to read one row back (round-12: ~6 serial stage rounds over
    # edge-scale data; now over histogram-scale data).
    hw = e0.groupBy("w").agg(F.count(F.lit(1)).alias("_hn"))
    target = F.ceil(F.lit(0.6) * F.col("_n"))
    thr = (
        distributed_prefix_sum(
            hw, F.col("w"), F.col("_hn"), name="_cum", total_name="_n")
        .filter((F.col("_cum") >= target)
                & (F.col("_cum") - F.col("_hn") < target))
        .select(F.col("w").alias("_thr"))
    )
    e = (
        e0.join(F.broadcast(thr))
        .filter(F.col("w") >= F.col("_thr"))
        .select("ta", "tb")
    )
    e1 = e.select(F.col("ta").alias("a"), F.col("tb").alias("b"))
    e2 = e.select(F.col("ta").alias("b"), F.col("tb").alias("c"))
    e3 = e.select(F.col("ta").alias("a"), F.col("tb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    verts = (
        tri.select(F.col("a").alias("token"))
        .unionAll(tri.select(F.col("b").alias("token")))
        .unionAll(tri.select(F.col("c").alias("token")))
    )
    return verts.groupBy("token").agg(F.count(F.lit(1)).alias("n_triangles"))


# ---------------------------------------------------------------------------
# 2-D skyline / Pareto frontier
# ---------------------------------------------------------------------------

@query(
    "skyline_pareto_parts",
    oracle="""
        SELECT p_partkey, p_retailprice, p_size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size)
        )
    """,
    tags=("EXT", "skyline"),
    bench=True,
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts Pareto-optimal under (minimize retail price,
    maximize size). The oracle states the semantics as the O(n²)
    NOT-EXISTS dominance test; the Spark plan is the O(n log n)
    sort-based reduction — collapse to max-size per distinct price,
    running max over the price-sorted distinct relation, keep a part
    iff its size equals its price-group max AND strictly exceeds every
    cheaper group's max. The running max over the collapsed relation is
    :func:`operators.order.distributed_prefix_max` (range-bucketed —
    no single-partition stage even when |distinct prices| scales with
    the corpus), and the final membership test is a semi-join of
    frontier keys against the fact — unhinted, because the Pareto
    frontier's size is data-dependent; AQE broadcasts it from its
    observed (typically tiny) size."""
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_prefix_max,
    )

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("_ms"))
    frontier = (
        # bounds from one raw-scan min/max instead of a third
        # evaluation of the per_price aggregate (round 13 — see
        # weighted_median_price)
        distributed_prefix_max(
            per_price, F.col("p_retailprice"), F.col("_ms"), name="_prev",
            bounds=p.select(F.min("p_retailprice"), F.max("p_retailprice")))
        .filter(F.col("_prev").isNull() | (F.col("_ms") > F.col("_prev")))
        .select("p_retailprice", F.col("_ms").alias("p_size"))
    )
    return p.join(frontier, ["p_retailprice", "p_size"],
                  "left_semi").select("p_partkey", "p_retailprice", "p_size")


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------

@query(
    "anomaly_mad_outliers",
    oracle="""
        WITH med AS (
            SELECT quantile_disc(o_totalprice, 0.5) AS m FROM orders
        ), dev AS (
            SELECT o_orderkey, o_totalprice,
                   abs(o_totalprice - m) AS deviation, m
            FROM orders, med
        ), mad AS (
            SELECT quantile_disc(deviation, 0.5) AS md FROM dev
        )
        SELECT o_orderkey, o_totalprice, m AS med, md AS mad, deviation
        FROM dev, mad
        WHERE deviation > 1.8 * md
    """,
    tags=("EXT", "anomaly"),
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: flag orders whose |price − median|
    exceeds 1.8× the median absolute deviation (tuned to flag a nontrivial tail of the fixture distribution). Both medians are EXACT
    discrete percentiles (smallest value with cume_dist ≥ ½ —
    ``quantile_disc`` semantics) computed by
    :func:`operators.order.distributed_rank` selection at position
    ⌈n/2⌉ — no global percentile window, no approximation. The two
    1-row medians broadcast onto the fact scan; every comparison is
    exact double arithmetic, so the flag set is engine-identical."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")

    def disc_median(df: DataFrame, col: str) -> DataFrame:
        ranked = distributed_rank(
            df, F.col(col), F.col("o_orderkey"),
            name="_pos", total_name="_tot")
        return (
            ranked.filter(
                F.col("_pos") == F.ceil(F.col("_tot") * F.lit(0.5)))
            .select(F.col(col).alias("_median"))
        )

    med = disc_median(o, "o_totalprice")
    dev = (
        o.join(F.broadcast(med))
        .select("o_orderkey", "o_totalprice",
                F.col("_median").alias("med"),
                F.abs(F.col("o_totalprice") - F.col("_median"))
                .alias("deviation"))
    )
    mad = disc_median(dev, "deviation").select(
        F.col("_median").alias("mad"))
    return (
        dev.join(F.broadcast(mad))
        .filter(F.col("deviation") > F.lit(1.8) * F.col("mad"))
        .select("o_orderkey", "o_totalprice", "med", "mad", "deviation")
    )


# ---------------------------------------------------------------------------
# LOCF gap filling
# ---------------------------------------------------------------------------

_HOUR_US = 3600 * 1000 * 1000


@query(
    "events_locf_value",
    oracle=f"""
        WITH agg AS (
            SELECT user_id,
                   epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws_us,
                   {sql_lsum('value')} AS total
            FROM events GROUP BY 1, 2
        ), b AS (
            SELECT user_id, min(ws_us) AS lo, max(ws_us) AS hi
            FROM agg GROUP BY 1
        ), scaffold AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, {_HOUR_US})) AS ws_us
            FROM b
        ), j AS (
            SELECT s.user_id, s.ws_us, a.total
            FROM scaffold s
            LEFT JOIN agg a ON s.user_id = a.user_id AND s.ws_us = a.ws_us
        )
        SELECT user_id, ws_us,
               last_value(total IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ws_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value,
               total IS NULL AS is_gap
        FROM j
    """,
    tags=("E14", "E7", "timeseries"),
)
def events_locf_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly LOCF (last-observation-carried-forward): gap-fill
    each user's hourly spend between their own first and last active
    hour, carrying the previous hour's exact total across empty hours —
    the resample-and-ffill primitive of feature-store pipelines. The
    scaffold explodes per-user (bounded by the user's span, generated
    distributed); the fill window partitions by user, so no task ever
    sees more than one user's timeline."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.expr(f"ts_us DIV {_HOUR_US}") * _HOUR_US).alias("ws_us")
    agg = ev.groupBy("user_id", bucket).agg(lsum("value").alias("total"))
    scaffold = (
        agg.groupBy("user_id")
        .agg(F.min("ws_us").alias("lo"), F.max("ws_us").alias("hi"))
        .select("user_id",
                F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US)))
                .alias("ws_us"))
    )
    j = scaffold.join(agg, ["user_id", "ws_us"], "left")
    w = Window.partitionBy("user_id").orderBy("ws_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return j.select(
        "user_id", "ws_us",
        F.last("total", ignorenulls=True).over(w).alias("filled_value"),
        F.col("total").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence test
# ---------------------------------------------------------------------------

@query(
    "chi2_type_by_hour",
    oracle="""
        WITH cont AS (
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) % 24 AS hod,
                   COUNT(*) AS o
            FROM events GROUP BY 1, 2
        ), rt AS (
            SELECT event_type, SUM(o)::BIGINT AS r FROM cont GROUP BY 1
        ), ct AS (
            SELECT hod, SUM(o)::BIGINT AS c FROM cont GROUP BY 1
        ), n AS (
            SELECT SUM(o)::BIGINT AS n FROM cont
        ), cells AS (
            SELECT cont.event_type, cont.o,
                   CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)
                       / CAST(n.n AS DOUBLE) AS e
            FROM cont
            JOIN rt ON cont.event_type = rt.event_type
            JOIN ct ON cont.hod = ct.hod
            CROSS JOIN n
        )
        SELECT event_type,
               CAST(SUM(o) AS BIGINT) AS n_obs,
               CAST(CAST(SUM(CAST(CAST(FLOOR(
                   ((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e)
                   * 1000000 + 0.5) AS BIGINT) AS DECIMAL(38,0)))
                   AS VARCHAR) AS DOUBLE) / CAST(1000000 AS DOUBLE)
                   AS chi2_part
        FROM cells
        GROUP BY event_type
    """,
    tags=("EXT", "statistics"),
)
def chi2_type_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and hour of
    day — the categorical-association screen of feature analysis. The
    contingency table is |types|×24 cells (scalar-scale after ONE
    corpus aggregate); expected counts use textually mirrored double
    arithmetic, and the per-type χ² partial sums are decimal-quantized
    so the reduction is partition-order-independent → engine-exact.
    Row/column marginals travel as broadcast joins of the tiny
    contingency relation."""
    from data_eng_taxi_ibis_dagster_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events")
    cont = (
        ev.select(
            "event_type",
            (F.expr("ts_us DIV 3600000000") % 24).alias("hod"))
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = cont.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cont.groupBy("hod").agg(F.sum("o").alias("c"))
    n = cont.agg(F.sum("o").alias("n"))
    e = (F.col("r").cast("double") * F.col("c").cast("double")
         / F.col("n").cast("double"))
    cells = (
        cont.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hod")
        .join(F.broadcast(n))
        .select("event_type", "o", e.alias("e"))
    )
    contrib = ((F.col("o").cast("double") - F.col("e")) ** 2
               / F.col("e"))
    return (
        cells.select("event_type", "o", contrib.alias("_c"))
        .groupBy("event_type")
        .agg(F.sum("o").alias("n_obs"), dsum("_c", 6).alias("chi2_part"))
    )


# ---------------------------------------------------------------------------
# ABC / Pareto revenue classification
# ---------------------------------------------------------------------------

@query(
    "abc_pareto_customers",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       ::BIGINT AS rev_cents
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT o_custkey, rev_cents,
                   CAST(SUM(rev_cents) OVER (
                       ORDER BY rev_cents DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS DOUBLE)
                   / CAST(SUM(rev_cents) OVER () AS DOUBLE) AS cum_share
            FROM rev
        )
        SELECT o_custkey, rev_cents, cum_share,
               CASE WHEN cum_share <= 0.7 THEN 'A'
                    WHEN cum_share <= 0.9 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    """,
    tags=("EXT", "pareto"),
    bench=True,
)
def abc_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: customers ranked by revenue, the
    top tier covering 70 % of cumulative revenue is class A, the next
    20 % B, the tail C. The oracle states it as a global running-sum
    window; the Spark plan is
    :func:`operators.order.distributed_prefix_sum` — range-bucketed
    value cumsum (per-bucket totals + broadcast offsets + within-bucket
    running sums), so NO single-partition sort touches the customer
    relation. Revenue is exact integer cents; the share division is
    one IEEE op → classification is engine-identical."""
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_prefix_sum,
    )

    o = load_table(spark, sf_dir, "orders")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("long")).alias("rev_cents"))
    )
    ranked = distributed_prefix_sum(
        rev, -F.col("rev_cents"), F.col("rev_cents"), F.col("o_custkey"),
        name="_cum", total_name="_tot",
    )
    share = F.col("_cum").cast("double") / F.col("_tot").cast("double")
    return ranked.select(
        "o_custkey", "rev_cents", share.alias("cum_share"),
        F.when(share <= 0.7, F.lit("A"))
        .when(share <= 0.9, F.lit("B"))
        .otherwise(F.lit("C")).alias("abc_class"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient
# ---------------------------------------------------------------------------

@query(
    "gini_customer_revenue",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       ::BIGINT AS rev_cents
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT rev_cents,
                   row_number() OVER (ORDER BY rev_cents, o_custkey) AS pos,
                   COUNT(*) OVER () AS n
            FROM rev
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
               (2.0 * CAST(SUM(CAST(pos AS DECIMAL(38,0))
                               * CAST(rev_cents AS DECIMAL(38,0)))
                           AS DOUBLE))
                   / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(rev_cents) AS DOUBLE))
               - (CAST(MAX(n) AS DOUBLE) + 1.0) / CAST(MAX(n) AS DOUBLE)
                   AS gini
        FROM ranked
    """,
    tags=("EXT", "statistics"),
    bench=True,
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the exact
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted
    revenue — the inequality measure behind "top 1 % of domains hold
    40 % of tokens" corpus audits. Ranks come from
    :func:`operators.order.distributed_rank` (no single-partition
    sort); the rank-weighted sum accumulates in DECIMAL(38) so the
    reduction is order-independent and overflow-proof at any corpus
    size; the final expression is textually mirrored double math."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("long")).alias("rev_cents"))
    )
    ranked = distributed_rank(
        rev, F.col("rev_cents"), F.col("o_custkey"),
        name="pos", total_name="n")
    wsum = F.sum(F.col("pos").cast("decimal(38,0)")
                 * F.col("rev_cents").cast("decimal(38,0)"))
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.sum("rev_cents").alias("total_cents"),
        ((F.lit(2.0) * wsum.cast("double"))
         / (F.max("n").cast("double") * F.sum("rev_cents").cast("double"))
         - (F.max("n").cast("double") + F.lit(1.0))
         / F.max("n").cast("double")).alias("gini"),
    )
