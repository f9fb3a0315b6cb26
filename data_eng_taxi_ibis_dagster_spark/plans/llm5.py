"""Fifth LLM-pipeline batch: metadata scrubbing, corpus vocabulary
statistics, repetition-based quality scoring, distinctive-term
extraction, and two event-funnel analytics.

Extends the reference's capability surface (SURVEY.md §2b) with ops a
pretraining-data pipeline runs alongside dedup/quality/packing
(plans/llm.py…llm4.py):

* ``pii_redact_digits`` — identifier scrubbing: mask numeric runs in
  event metadata and account for every redaction (the shape of a PII
  scrub pass — the regex set is swappable; digits are what the fixture
  carries).
* ``heavy_hitter_tokens`` — exact global top-k vocabulary (the exact
  twin of sketch-based heavy hitters; at 100 TB the same plan holds
  because map-side partial aggregation collapses each partition to its
  local vocabulary before the shuffle).
* ``quality_repetition`` — Gopher-style repetition rules (duplicate
  bigram fraction, dominant-token count) in pure integer arithmetic.
* ``tfidf_top_term`` — per-document most-distinctive term by exact
  (tf desc, df asc, token asc) ranking — a TF-IDF argmax without
  floating-point logs, so it stays bit-exact cross-engine.
* ``events_funnel_conversion`` — classic view→click→purchase funnel on
  first-touch timestamps.
* ``events_new_users_daily`` — first-seen cohorting by day.

All six are strictly oracle-checked (integers, timestamps, strings —
no float drift surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import text as T
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

_DIGIT_RUN = "[0-9]+"


@query(
    "pii_redact_digits",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(len(regexp_extract_all(props, '{_DIGIT_RUN}')))
                    AS BIGINT) AS n_redacted_runs,
               CAST(COUNT(DISTINCT regexp_replace(props, '{_DIGIT_RUN}',
                                                  '#', 'g'))
                    AS BIGINT) AS n_masked_forms
        FROM events
        GROUP BY event_type
    """,
    tags=("E7", "E12", "EXT"),
)
def pii_redact_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier-scrub accounting: mask every numeric run in the event
    metadata (``props``) and report, per event type, how many runs were
    redacted and how many distinct masked templates remain. This is the
    shape of a PII-redaction pass (swap the digit regex for
    email/phone/SSN patterns in production): one codegen'd projection,
    one hash aggregate — no Python in the row path, no second shuffle.
    The masked-template cardinality doubles as a leak check: templates
    ≪ events means the scrub collapsed the identifying variation."""
    e = load_table(spark, sf_dir, "events")
    masked = e.select(
        "event_type",
        F.regexp_count("props", F.lit(_DIGIT_RUN)).alias("_runs"),
        F.regexp_replace("props", _DIGIT_RUN, "#").alias("_masked"),
    )
    return masked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_runs").alias("n_redacted_runs"),
        F.countDistinct("_masked").alias("n_masked_forms"),
    )


_TOP_K = 20


@query(
    "heavy_hitter_tokens",
    oracle=f"""
        SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
              FROM documents)
        GROUP BY t
        ORDER BY n_occurrences DESC, token ASC
        LIMIT {_TOP_K}
    """,
    tags=("E3", "E12", "EXT"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide top-20 vocabulary with document frequencies —
    the exact twin of a count-min/SpaceSaving heavy-hitter sketch.
    Scale shape: explode is a per-row map; the aggregate's map-side
    partial combine collapses each partition to its local vocabulary
    (bounded by |vocab|, not |tokens|) before the shuffle, and the
    final top-k is TakeOrderedAndProject — only k rows reach the
    driver. Deterministic tie-break on token keeps the LIMIT stable
    cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(T.tokens("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(_TOP_K)
    )


@query(
    "quality_repetition",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ),
        big AS (
            SELECT doc_id,
                   len(tk) - 1 AS n_bigrams,
                   len(list_distinct([tk[i] || ' ' || tk[i+1]
                        for i in generate_series(1, len(tk)-1)]))
                       AS n_distinct_bigrams
            FROM toks WHERE len(tk) >= 2
        ),
        dom AS (
            SELECT doc_id, MAX(c) AS max_token_count
            FROM (SELECT doc_id, COUNT(*) AS c
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                        FROM documents)
                  GROUP BY doc_id, t)
            GROUP BY doc_id
        )
        SELECT big.doc_id,
               CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(n_distinct_bigrams AS BIGINT) AS n_distinct_bigrams,
               CAST(max_token_count AS BIGINT) AS max_token_count,
               (n_distinct_bigrams * 10 < n_bigrams * 7) AS is_repetitive
        FROM big JOIN dom USING (doc_id)
    """,
    tags=("E12", "EXT"),
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition scoring: per document, the total and
    distinct bigram counts, the dominant token's occurrence count, and
    a repetition flag (distinct/total < 0.7, tested as the integer
    cross-product so no float enters the contract). The bigram stats
    are a single codegen'd projection over the token array (no explode,
    no shuffle); the dominant-token count is one two-key aggregate that
    re-partitions by doc_id — at 100 TB both sides stay linear and the
    doc_id join is co-partitioned after the aggregates."""
    d = load_table(spark, sf_dir, "documents")
    tk = T.tokens("text")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(tk) - 2),
        lambda i: F.concat_ws(" ", F.element_at(tk, i + 1),
                              F.element_at(tk, i + 2)),
    )
    big = d.filter(F.size(tk) >= 2).select(
        "doc_id",
        (F.size(tk) - 1).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(windows)).cast("long")
         .alias("n_distinct_bigrams"),
    )
    dom = (
        d.select("doc_id", F.explode(tk).alias("t"))
        .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("max_token_count"))
    )
    return big.join(dom, "doc_id").select(
        "doc_id", "n_bigrams", "n_distinct_bigrams", "max_token_count",
        (F.col("n_distinct_bigrams") * 10 < F.col("n_bigrams") * 7)
            .alias("is_repetitive"),
    )


@query(
    "tfidf_top_term",
    oracle="""
        WITH tf AS (
            SELECT doc_id, t AS token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM documents)
            GROUP BY doc_id, t
        ),
        df AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY token
        )
        SELECT doc_id, token, tf, df
        FROM (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                         ORDER BY tf.tf DESC, df.df ASC, tf.token ASC)
                         AS rn
              FROM tf JOIN df USING (token))
        WHERE rn = 1
    """,
    tags=("E5", "E12", "EXT"),
    bench=True,
)
def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document most-distinctive term: argmax over (term frequency
    desc, document frequency asc, token asc) — the TF-IDF ranking
    order without the floating-point ``log``, so the result is
    bit-exact against the oracle. Plan: one doc×token aggregate, a
    token-keyed df aggregate REUSED from the tf relation (not a second
    scan), a df join left to AQE (the df table is vocabulary-sized —
    sub-linear but data-dependent, so no forced hint), and a
    per-doc WindowGroupLimit that prunes to rank 1 before the final
    projection. The doc_id partitioning from the tf aggregate carries
    into the window — one shuffle on token, one on doc_id, total."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(T.tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token"))
    return (
        tf.join(df_, "token")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "token", "tf", "df")
    )


@query(
    "textrank_keywords",
    oracle=None,  # iterative PageRank — not SQL-expressible (rows-only);
                  # decimal-quantized sums make it run-deterministic
    tags=("E12", "EXT"),
    bench=True,
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: weighted PageRank over the token
    co-occurrence graph (adjacent-pair edges, both directions), top 25
    tokens by rank. The corpus-curation centrality signal — the same
    pagerank operator runs over page/link graphs for crawl quality
    weighting. Iterations are pregel-by-join DataFrame rounds with
    integer-exact decimal combines (operators/graph.py), so output is
    bit-stable across runs despite being float-iterative."""
    from data_eng_taxi_ibis_dagster_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    d = load_table(spark, sf_dir, "documents")
    edges = cooccurrence_edges(d, T.tokens("text"), min_count=2)
    ranks = pagerank(edges, weight="w", damping=0.85, iters=8)
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("vertex").asc())
        .limit(25)
        .select(F.col("vertex").alias("token"), "rank")
    )


@query(
    "pagerank_cooccurrence",
    oracle=None,  # iterative PageRank — not SQL-expressible (rows-only);
                  # decimal-quantized sums make it run-deterministic
    tags=("E12", "EXT"),
    bench=True,
)
def pagerank_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full weighted PageRank over the token co-occurrence graph — the
    whole (vertex, rank) relation, unlike ``textrank_keywords``'s top-25
    projection, so the bench tracks the iterative pregel-by-join rounds
    end-to-end including the final full-relation quantization (the
    top-k truncation in textrank can mask a regression in the tail).
    Emitted ranks are decimal-quantized → bit-stable run-to-run."""
    from data_eng_taxi_ibis_dagster_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    d = load_table(spark, sf_dir, "documents")
    edges = cooccurrence_edges(d, T.tokens("text"), min_count=2)
    return (
        pagerank(edges, weight="w", damping=0.85, iters=8)
        .orderBy(F.col("rank").desc(), F.col("vertex").asc())
        .select(F.col("vertex").alias("token"), "rank")
    )


@query(
    "events_funnel_conversion",
    oracle="""
        WITH first_touch AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(COUNT(t_view) AS BIGINT) AS n_viewed,
               CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clicked_after_view,
               CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_view
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_full_funnel
        FROM first_touch
    """,
    tags=("E7", "E14", "EXT"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click→purchase funnel on first-touch timestamps: users who
    viewed, users whose first click followed their first view, and
    users whose first purchase followed that click. One conditional
    pivot-aggregate per user (map-side combine on user_id), then a
    single global fold — output is one row regardless of scale.
    NULL-safe by construction: a missing stage makes the comparison
    NULL → the CASE contributes 0, identically in both engines."""
    e = load_table(spark, sf_dir, "events")

    def first(t: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    ft = e.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = (F.col("t_purchase") > F.col("t_click")) & clicked
    return ft.agg(
        F.count("t_view").alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0))
            .alias("n_clicked_after_view"),
        F.sum(F.when(purchased, 1).otherwise(0)).alias("n_full_funnel"),
    )


@query(
    "events_new_users_daily",
    oracle="""
        SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_new_users
        FROM (SELECT user_id, MIN(ts) AS first_ts
              FROM events GROUP BY user_id)
        GROUP BY 1
    """,
    tags=("E7", "E14", "EXT"),
)
def events_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user cohorts: each user's first-seen timestamp,
    truncated to day. Two stacked aggregates — the first partial-combines
    per partition before shuffling on user_id; the second groups the
    (already small) per-user relation by day. At 100 TB the user_id
    aggregate is the only real shuffle and AQE coalesces the day-level
    one."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
        .groupBy(F.date_trunc("day", "first_ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_new_users"))
    )
