"""Ninth batch: mixture resampling, n-gram LM counts, exact quantiles,
per-entity mode, and full-outer coverage.

Extends the EXT surface (SURVEY.md §2b) with the remaining
training-data-pipeline staples:

* ``data_mixture_resample`` — reweight a multi-source corpus toward an
  explicit target mixture by deterministic hash selection (the
  "downsample CommonCrawl, keep Wikipedia" op every pretraining
  pipeline runs).
* ``ngram_bigram_counts`` — corpus bigram frequency table (the n-gram
  LM / repetition-analysis primitive), built zero-shuffle-per-row with
  ``zip_with`` over the token array rather than a per-document window.
* ``percentile_disc_price`` — exact discrete percentiles by rank
  selection (the oracle-able twin of ``percentile_approx``; E8's exact
  counterpart for quantiles beyond the median).
* ``mode_event_type_per_user`` — per-entity modal value with a total
  deterministic tiebreak (count desc, then lexicographic).
* ``join_full_outer_nation_presence`` — FULL OUTER equi-join, the one
  E1 join type without a standalone oracle query until now.

The reference never goes beyond AVG/COUNT (SURVEY.md §2a,
``/root/reference/taxi_pipeline_native.py:92-97`` is its whole query
surface); these are EXT rows mandated by the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.order import grouped_rank
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "data_mixture_resample",
    oracle="""
        WITH target AS (
            SELECT source, n_chars, doc_id,
                   (1 + (COALESCE(TRY_CAST(substr(source, 4) AS BIGINT), 3)
                         % 4)) / 4.0 AS frac
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM target
        WHERE (doc_id * 2654435761) % 4294967296 < frac * 4294967296
        GROUP BY source
    """,
    tags=("E7", "EXT"),
)
def data_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling: each source gets a target
    keep-fraction (here ¼·(1 + suffix mod 4) ∈ {.25,.5,.75,1.0} as a
    stand-in for a real mixture spec), applied by multiplicative hash
    of doc_id — the same Knuth hash as ``train_test_split``, so
    selection is bit-identical across engines, runs, and partitionings
    (randomSplit/sample are not). Row-local filter then partial agg:
    no shuffle before the 20-group final agg. At 100 TB this is THE
    shape you want — the filter prunes at scan speed, and upweighting
    (frac > 1) would become an `explode(sequence(...))` fan-out with
    the same hash deciding the fractional copy."""
    d = load_table(spark, sf_dir, "documents")
    # try_cast + keep-all default (round-12 adversarial sweep): a
    # source name without a numeric suffix is an unknown mixture key —
    # it keeps frac 1.0 instead of failing the whole job on an ANSI
    # CAST error (one unrecognized source in a 100 TB corpus must not
    # be a poison pill; a real spec would be a broadcast config map
    # with exactly this default).
    suffix = F.coalesce(
        F.substring("source", 4, 10).try_cast("bigint"), F.lit(3))
    frac = (1 + suffix % 4) / F.lit(4.0)
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    return (
        d.filter(h < frac * F.lit(4294967296))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("n_chars").alias("total_chars"))
    )


@query(
    "ngram_bigram_counts",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ), big AS (
            SELECT tok || ' ' || lead(tok)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
            FROM toks
        )
        SELECT bigram, COUNT(*) AS n
        FROM big
        WHERE bigram IS NOT NULL
        GROUP BY bigram
        HAVING COUNT(*) >= 20
    """,
    tags=("E7", "E12", "EXT"),
)
def ngram_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (n-gram LM counts / repetition
    analysis). Built row-locally: ``zip_with(toks[0:n-1], toks[1:n])``
    forms each document's bigrams inside whole-stage codegen — no
    per-document window, no doc_id shuffle (the oracle uses the
    window formulation; same multiset). The only shuffle is the final
    count agg, after map-side partial collapse of the ~100× explode.
    The HAVING bound keeps output scale-independent-small."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )


@query(
    "percentile_disc_price",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
            FROM lineitem
        )
        SELECT l_returnflag,
               MAX(CASE WHEN rn = CAST(ceiling(0.25 * cnt) AS BIGINT)
                        THEN l_extendedprice END) AS p25,
               MAX(CASE WHEN rn = CAST(ceiling(0.50 * cnt) AS BIGINT)
                        THEN l_extendedprice END) AS p50,
               MAX(CASE WHEN rn = CAST(ceiling(0.75 * cnt) AS BIGINT)
                        THEN l_extendedprice END) AS p75,
               MAX(CASE WHEN rn = CAST(ceiling(0.90 * cnt) AS BIGINT)
                        THEN l_extendedprice END) AS p90
        FROM ranked
        GROUP BY l_returnflag
    """,
    tags=("E5", "E8", "EXT"),
)
def percentile_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p25/50/75/90) by rank selection:
    lower PERCENTILE_DISC semantics, rn == ceil(p·n). Selecting an
    actual data value (no interpolation arithmetic) keeps the result
    bit-exact across engines even on doubles — the reliable exact twin
    of ``percentile_approx`` (E8). The rank comes from
    :func:`grouped_rank`, NOT a bare per-flag window: l_returnflag has
    3 values, so a plain ``PARTITION BY l_returnflag`` window funnels
    N/3 rows through one task. grouped_rank range-buckets each group's
    prices into 256 deterministic buckets — every window group is
    ≈ N/(3·256) rows and the per-group offsets window orders ≤ 257
    count rows, at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    ranked = grouped_rank(
        li.select("l_returnflag", "l_extendedprice",
                  "l_orderkey", "l_linenumber"),
        ["l_returnflag"],
        F.col("l_extendedprice"),
        F.col("l_orderkey"), F.col("l_linenumber"),
        name="rn", total_name="cnt",
    )

    def pick(p: float, name: str):
        at = F.ceil(F.lit(p) * F.col("cnt")).cast("bigint")
        return F.max(
            F.when(F.col("rn") == at, F.col("l_extendedprice"))
        ).alias(name)

    return ranked.groupBy("l_returnflag").agg(
        pick(0.25, "p25"), pick(0.50, "p50"),
        pick(0.75, "p75"), pick(0.90, "p90"),
    )


@query(
    "mode_event_type_per_user",
    oracle="""
        WITH pe AS (
            SELECT user_id, event_type, COUNT(*) AS n,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY COUNT(*) DESC, event_type
                   ) AS rk
            FROM events
            GROUP BY user_id, event_type
        )
        SELECT user_id, event_type AS mode_event_type, n AS n_events
        FROM pe
        WHERE rk = 1
    """,
    tags=("E5", "EXT"),
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity mode with a total tiebreak (count desc, then value
    asc) — deterministic unlike a bare ``mode()``. Count-then-rank:
    the agg collapses events to (user, type) pairs BEFORE the window,
    so the window input is bounded by |users|×|types|, not |events| —
    the order matters at 100 TB. Both shuffles hash the same user_id
    key; Catalyst reuses the partitioning, so it's one exchange."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id",
                F.col("event_type").alias("mode_event_type"),
                F.col("n").alias("n_events"))
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
        WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
                   FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
                   FROM supplier GROUP BY 1)
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    tags=("E1",),
)
def join_full_outer_nation_presence(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join (the E1 variant not covered by the
    semi/anti/left queries): nations by customer vs supplier presence,
    nulls from either side coalesced to zero counts. Aggregate first,
    join after — the outer join runs on |nations|-sized inputs, not
    the raw tables. Full outer can't broadcast (both sides must be
    null-producible), so Spark sort-merges; pre-aggregation makes that
    merge trivially small at any scale."""
    c = (load_table(spark, sf_dir, "customer")
         .groupBy(F.col("c_nationkey").alias("nk_c"))
         .agg(F.count(F.lit(1)).alias("n_customers")))
    s = (load_table(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("nk_s"))
         .agg(F.count(F.lit(1)).alias("n_suppliers")))
    return (
        c.join(s, c["nk_c"] == s["nk_s"], "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "percentile_cont_price",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
            FROM lineitem
        )
        SELECT l_returnflag,
               MAX(CASE WHEN rn = CAST(floor((cnt-1)*0.25 + 1) AS BIGINT)
                        THEN l_extendedprice END)
               + MAX((cnt-1)*0.25 + 1 - floor((cnt-1)*0.25 + 1))
               * (MAX(CASE WHEN rn = CAST(ceiling((cnt-1)*0.25 + 1) AS BIGINT)
                           THEN l_extendedprice END)
                  - MAX(CASE WHEN rn = CAST(floor((cnt-1)*0.25 + 1) AS BIGINT)
                             THEN l_extendedprice END)) AS p25,
               MAX(CASE WHEN rn = CAST(floor((cnt-1)*0.5 + 1) AS BIGINT)
                        THEN l_extendedprice END)
               + MAX((cnt-1)*0.5 + 1 - floor((cnt-1)*0.5 + 1))
               * (MAX(CASE WHEN rn = CAST(ceiling((cnt-1)*0.5 + 1) AS BIGINT)
                           THEN l_extendedprice END)
                  - MAX(CASE WHEN rn = CAST(floor((cnt-1)*0.5 + 1) AS BIGINT)
                             THEN l_extendedprice END)) AS p50,
               MAX(CASE WHEN rn = CAST(floor((cnt-1)*0.75 + 1) AS BIGINT)
                        THEN l_extendedprice END)
               + MAX((cnt-1)*0.75 + 1 - floor((cnt-1)*0.75 + 1))
               * (MAX(CASE WHEN rn = CAST(ceiling((cnt-1)*0.75 + 1) AS BIGINT)
                           THEN l_extendedprice END)
                  - MAX(CASE WHEN rn = CAST(floor((cnt-1)*0.75 + 1) AS BIGINT)
                             THEN l_extendedprice END)) AS p75
        FROM ranked
        GROUP BY l_returnflag
    """,
    tags=("E8", "EXT"),
)
def percentile_cont_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE_CONT (linear interpolation between the two
    bracketing order statistics, SQL-2003 h = (n−1)q + 1) — the
    continuous twin of ``percentile_disc_price``. Both order
    statistics come from the same :func:`grouped_rank` pass (per-group
    range-bucketed rank — no N/3-row window group; see
    ``percentile_disc_price``); the interpolation is textually
    mirrored double arithmetic, so the result is bit-identical across
    engines (no reliance on either engine's native quantile
    implementation)."""
    li = load_table(spark, sf_dir, "lineitem")
    ranked = grouped_rank(
        li.select("l_returnflag", "l_extendedprice",
                  "l_orderkey", "l_linenumber"),
        ["l_returnflag"],
        F.col("l_extendedprice"),
        F.col("l_orderkey"), F.col("l_linenumber"),
        name="rn", total_name="cnt",
    )

    def cont(q: float):
        h = (F.col("cnt") - 1) * q + 1
        x_lo = F.max(F.when(F.col("rn") == F.floor(h).cast("long"),
                            F.col("l_extendedprice")))
        x_hi = F.max(F.when(F.col("rn") == F.ceil(h).cast("long"),
                            F.col("l_extendedprice")))
        frac = F.max(h - F.floor(h))
        return x_lo + frac * (x_hi - x_lo)

    return ranked.groupBy("l_returnflag").agg(
        cont(0.25).alias("p25"), cont(0.5).alias("p50"),
        cont(0.75).alias("p75"))
