"""Eighth batch: warehouse temporality and edit-distance near-dup.

* ``scd2_user_value`` — slowly-changing-dimension type-2
  interval-ization of an event stream: each (user, event) becomes a
  version row with ``[valid_from, valid_to)`` bounds and an
  ``is_current`` flag, via lead() over the per-user timeline. This is
  the standard "eventize → interval table" transform behind AS OF
  queries and dimension history; downstream range joins hit the
  intervals directly.
* ``dedup_edit_distance`` — the edit-distance family of near-dedup
  (complements MinHash/SimHash/n-gram Jaccard/embedding-cosine):
  blocked all-pairs Levenshtein on a cheap block key. Both engines
  implement classic Levenshtein, so unlike the hash-based variants
  this one is strictly oracle-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


@query(
    "scd2_user_value",
    oracle="""
        SELECT user_id,
               event_id,
               value,
               epoch_us(ts) AS valid_from_us,
               lead(epoch_us(ts)) OVER w AS valid_to_us,
               (lead(epoch_us(ts)) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)
    """,
    tags=("E5", "E14", "EXT"),
)
def scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval-ization: every event opens a version valid
    until the user's next event (half-open ``[from, to)``; the last
    version per user is current/unbounded). One window over
    (user_id, ts, event_id) — a single shuffle on user_id; the
    event_id tiebreak makes the ordering total, so the intervals are
    deterministic and bit-comparable. At 100 TB this partitions by the
    natural entity key and each user's timeline stays within one
    task — no skew unless one entity dominates the stream (then:
    pre-split by time and stitch boundaries)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lead_ts = F.lead("ts_us").over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts_us").alias("valid_from_us"),
        lead_ts.alias("valid_to_us"),
        lead_ts.isNull().alias("is_current"),
    )


_EDIT_K = 10
_EDIT_SALTS = 16


@query(
    "dedup_edit_distance",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, text, length(text) AS n
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
        FROM d a JOIN d b
          ON a.source = b.source
         AND a.doc_id < b.doc_id
         AND abs(a.n - b.n) <= {_EDIT_K}
        WHERE levenshtein(a.text, b.text) <= {_EDIT_K}
    """,
    tags=("E10", "E2", "EXT"),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked all-pairs Levenshtein near-dup: pairs within the same
    source block whose lengths differ by ≤ k (a free lower bound on
    edit distance — |len(a)−len(b)| ≤ lev(a,b) — pruning BEFORE the
    O(n·m) distance), verified at lev ≤ k. Block key bounds the
    quadratic blow-up exactly like pairwise_jaccard; at corpus scale
    the block key comes from LSH buckets or the fingerprint index
    instead of metadata. Levenshtein runs in codegen on the JVM —
    no Python in the pair loop.

    SALTED pair generation (round 8): this join's OUTPUT is quadratic
    in the block size while its shuffle INPUT is one corpus row per
    side — and AQE sizes post-shuffle partitions by input bytes, so
    with a low-cardinality block key it coalesced every block's pair
    work into ONE task (measured: the sf0.1 strict sweep ground a
    single-task Levenshtein stage for ~10 min; sf0.1's hottest block
    is 250 docs ⇒ ~31k verifications per block, all serial). The left
    side carries ``_salt = doc_a % 16`` and the right side replicates
    row-locally across all 16 salts (explode — no join), so each
    block's pair work spreads over 16 tasks; the explicit
    ``repartition(n, _blk, _salt)`` (user-specified partition count —
    exempt from AQE coalescing, n = the session's shuffle
    parallelism) keeps it spread. Same (doc_a, doc_b) pair set: a's
    salt is a function of doc_a, and b matches at exactly that salt.
    ``test_scale_plans.test_edit_distance_pair_stage_is_salted``
    pins the shape."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("n"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = d.select(F.col("source").alias("_blk"),
                 F.col("doc_id").alias("doc_a"),
                 F.col("text").alias("ta"), F.col("n").alias("na"),
                 F.pmod(F.col("doc_id"), F.lit(_EDIT_SALTS))
                 .alias("_salt")).repartition(n_part, "_blk", "_salt")
    b = d.select(F.col("source").alias("_blk"),
                 F.col("doc_id").alias("doc_b"),
                 F.col("text").alias("tb"), F.col("n").alias("nb"),
                 F.explode(F.array(*[F.lit(i) for i in range(_EDIT_SALTS)]))
                 .alias("_salt")).repartition(n_part, "_blk", "_salt")
    pairs = a.join(
        b,
        [a["_blk"] == b["_blk"], a["_salt"] == b["_salt"],
         F.col("doc_a") < F.col("doc_b"),
         F.abs(F.col("na") - F.col("nb")) <= _EDIT_K],
    )
    return (
        pairs.select(
            "doc_a", "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") <= _EDIT_K)
    )
