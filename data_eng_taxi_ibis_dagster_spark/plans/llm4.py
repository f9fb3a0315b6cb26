"""Fourth LLM-pipeline batch: benchmark decontamination, Gopher-style
quality rules, and deterministic global shuffle order.

Three more ops a pretraining-data pipeline runs between dedup and
packing (plans/llm.py…llm3.py): (1) *decontamination* — remove training
documents that share n-grams with an evaluation set, the standard
defense against benchmark leakage; (2) *rule-based quality filtering* —
the cheap per-document heuristics popularized by the Gopher/C4 corpus
recipes (word-count bounds, mean word length, symbol ratio, alpha-word
fraction); (3) *global shuffle* — a deterministic pseudo-random total
order for training-example streaming, computed WITHOUT a
single-partition sort (operators/order.py).

All three are strictly oracle-checked: the rules are pure integer
arithmetic, and the shuffle's md5 sort key is identical in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import text as T
from data_eng_taxi_ibis_dagster_spark.operators.order import global_sort_index
from data_eng_taxi_ibis_dagster_spark.operators.sampling import U_DENOM, aes_priority
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

# Eval-set membership: a pure function of doc_id so both engines carve
# the identical benchmark subset (~1% of the corpus).
_EVAL_MOD = 97
_NGRAM = 3


@query(
    "decontaminate_ngram",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest({T.sql_shingles("string_split(text, ' ')", _NGRAM)})
                       AS s
            FROM documents
        ),
        ev AS (
            SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0
        ),
        tr AS (
            SELECT doc_id, s FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
        )
        SELECT tr.doc_id,
               CAST(COUNT(DISTINCT tr.s) AS BIGINT)
                   AS n_contaminated_shingles
        FROM tr JOIN ev ON tr.s = ev.s
        GROUP BY tr.doc_id
    """,
    tags=("E10", "E12", "EXT"),
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    3-gram shingle with the evaluation subset (doc_id % 97 == 0),
    reporting how many distinct shingles leak. Spark plan: explode
    shingles once, split eval/train on the id predicate, then a
    BROADCAST join against the distinct eval-shingle set — eval
    benchmarks are tiny relative to a 100 TB corpus, so the train side
    is never shuffled (at extreme eval sizes the same shape runs as a
    shuffled semi-join, or a Bloom-filter prefilter built from the eval
    set). Count-distinct per doc is one hash aggregate."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(T.shingles(T.tokens("text"), _NGRAM)).alias("s")
    )
    ev = (
        sh.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("s")
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_contaminated_shingles"))
    )


@query(
    "quality_gopher_rules",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   (CAST(length(text) AS DOUBLE)
                        - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1.0))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)
                       AS mean_word_len,
                   CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                        AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) AS symbol_ratio,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> regexp_matches(t, '[a-zA-Z]')))
                        AS DOUBLE)
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)
                       AS alpha_word_frac
            FROM documents
        )
        SELECT doc_id, n_words, mean_word_len, symbol_ratio,
               alpha_word_frac,
               (n_words >= 15 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 12.0
                AND symbol_ratio < 0.1
                AND alpha_word_frac > 0.8) AS keep
        FROM m
    """,
    tags=("E12", "EXT"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule-based quality filter: word-count bounds,
    mean word length window, symbol-character ratio, fraction of words
    containing a letter — each an integer-derived double (identical
    op order in the oracle → bit-equal), combined into a boolean
    ``keep``. Pure per-row map over one scan; at 100 TB this is the
    cheapest filter in the pipeline and runs fused with ingest."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n_words = F.size(toks)
    n_words_d = n_words.cast("double")
    mean_word_len = (
        F.length("text").cast("double") - (n_words_d - F.lit(1.0))
    ) / n_words_d
    symbol_ratio = (
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).cast("double")
        / F.length("text").cast("double")
    )
    alpha_word_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast("double")
        / n_words_d
    )
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_word_frac.alias("alpha_word_frac"),
    )
    keep = (
        (F.col("n_words") >= 15) & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 12.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_word_frac") > 0.8)
    )
    return m.withColumn("keep", keep)


@query(
    "global_shuffle_order",
    oracle="""
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS shuffle_pos
        FROM documents
    """,
    tags=("E5", "EXT"),
)
def global_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order streaming: every
    document gets a stable pseudo-random position = its global rank
    under md5(doc_id). The oracle is a global ROW_NUMBER; the Spark
    plan is operators/order.py:global_sort_index — hash-prefix range
    buckets + per-bucket window + broadcast cumulative offsets — so no
    single task ever sees the whole dataset (the naive global window
    would). Reshuffling between epochs = salt the hash input."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.col("doc_id").cast("string"))
    return global_sort_index(
        d, h, F.col("doc_id"), name="shuffle_pos"
    ).select("doc_id", "shuffle_pos")


_SAMPLE_K = 100


@query(
    "weighted_sample_aes",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                        ::UBIGINT::DOUBLE + 1.0) / {U_DENOM!r} AS u
            FROM documents
        )
        SELECT doc_id, CAST(w AS BIGINT) AS weight
        FROM m
        ORDER BY ln(u) / w DESC, doc_id
        LIMIT {_SAMPLE_K}
    """,
    tags=("E5", "EXT"),
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each document draws a deterministic uniform u from its md5 (so both
    engines — and every epoch — agree), gets priority ln(u)/w for
    weight w = token count, and the k largest priorities form an exact
    weighted sample. The mixture-construction primitive: 'sample 10M
    docs ∝ quality score'.

    Scale shape: priority is a row-local expression (one scan, no
    shuffle), and top-k-by-priority plans as TakeOrderedAndProject —
    per-partition heaps of k rows then a k·partitions merge, never a
    global sort. Bigger samples (k beyond driver comfort) switch to
    the distributed_rank machinery with a priority threshold; the
    priority expression is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    w = F.size(T.tokens("text")).cast("double")
    key = aes_priority(F.col("doc_id"), w)
    return (
        d.select("doc_id", w.alias("_w"), key.alias("_key"))
        .orderBy(F.col("_key").desc(), F.col("doc_id"))
        .limit(_SAMPLE_K)
        .select("doc_id", F.col("_w").cast("long").alias("weight"))
    )
