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

from data_eng_taxi_ibis_dagster_spark.operators import dedup as D
from data_eng_taxi_ibis_dagster_spark.operators import text as T
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


@query(
    "dedup_edit_distance",
    oracle=f"""
        WITH {T.sql_winnow_sel("documents")}{T.sql_winnow_cands(D.WINNOW_MAX_DF)}
        SELECT doc_a, doc_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
        FROM cand
        JOIN documents a ON a.doc_id = doc_a
        JOIN documents b ON b.doc_id = doc_b
        WHERE abs(length(a.text) - length(b.text)) <= {_EDIT_K}
          AND levenshtein(a.text, b.text) <= {_EDIT_K}
    """,
    tags=("E10", "E2", "EXT"),
    bench=True,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup over WINNOWING-FINGERPRINT-blocked
    candidates: pairs sharing a content fingerprint whose lengths
    differ by ≤ k (a free lower bound on edit distance —
    |len(a)−len(b)| ≤ lev(a,b) — pruning BEFORE the O(n·m) distance),
    verified at lev ≤ k. Levenshtein runs in codegen on the JVM — no
    Python in the pair loop.

    Re-blocked in round 9 (was `source`, salted): the metadata block
    key's size grew linearly with corpus, so pair generation was
    O(n²/|sources|) — the r8 salt fixed task PLACEMENT (10 min → 61 s
    at sf0.1) but not the asymptote. The winnowing fingerprint
    (operators/dedup.winnow_fingerprints, k=8 w=4: any shared run of
    ≥ 11 tokens shares a fingerprint — documents within lev ≤ 10 of
    each other share many) is df-capped (WINNOW_MAX_DF), so candidate
    output is bounded per key and LINEAR in corpus; no salt needed —
    the key is a high-entropy hash. The oracle reproduces the md5
    selection literally (engine-portable, unlike xxhash64 bands), so
    the comparison set is IDENTICAL by construction and the check
    stays strict. Bonus: cross-source near-dups the old block missed
    are now found (25 vs 1 rows at sf0.01)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cands = D.winnow_candidate_pairs(D.winnow_fingerprints(d))
    return D.levenshtein_verify(cands, d, max_dist=_EDIT_K)
