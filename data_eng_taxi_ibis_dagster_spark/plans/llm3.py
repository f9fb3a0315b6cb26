"""Third LLM-pipeline batch: training-sequence packing, per-label
stratified sampling, and deterministic hash train/test split.

These are the last-mile ops of a training-data pipeline — after dedup,
quality filtering, and similarity pruning (plans/llm.py, llm2.py), the
surviving corpus is split, stratified, and packed into fixed-token-
budget sequences for the trainer. All three are pure window/aggregate
compositions (no UDFs, whole-stage codegen throughout) and fully
deterministic, so each carries a strict DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import order as O
from data_eng_taxi_ibis_dagster_spark.operators import text as T
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

# Token-count proxy: ceil(chars/4) — the classic chars-per-token rule of
# thumb. A production pipeline counts real BPE tokens offline (or via the
# tokenize pandas-UDF in operators/text.py); packing only needs *a*
# deterministic per-doc count, and using the n_chars column keeps this a
# three-column scan with no text decode.
_SQL_TOKENS = "GREATEST(1, CAST(CEIL(n_chars / 4.0) AS BIGINT))"
_PACK_BUDGET = 4096


def _tokens() -> F.Column:
    return F.greatest(F.lit(1).cast("long"),
                      F.ceil(F.col("n_chars") / F.lit(4.0)).cast("long"))


@query(
    "bpe_learn_merges",
    oracle=None,  # iterative argmax sequence — not SQL-expressible;
                  # integer counts + total tiebreak ⇒ run-deterministic
    tags=("E12", "EXT"),
    bench=True,
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (operators/bpe.py): ONE corpus-scale
    token-frequency aggregate, then merge rounds over the bounded
    vocabulary relation — each round one explode+aggregate plus a 1-row
    argmax (the merge rule, driver-sized by nature). Emits the learned
    merge table with per-rule pair counts plus the resulting mean
    units-per-word over the vocabulary — the compression the tokenizer
    achieves."""
    from data_eng_taxi_ibis_dagster_spark.operators.bpe import (
        learn_bpe_merges,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    # return_state: the trainer's final (cnt, syms) relation IS the
    # per-word segmentation — no corpus re-scan or merge replay needed
    merges, state = learn_bpe_merges(d, toks, n_merges=12,
                                     return_state=True)
    stats = state.agg(
        F.count(F.lit(1)).alias("_vocab"),
        F.sum(F.size("syms")).alias("_units"),
    )
    mtab = spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long")
    return (
        mtab.join(F.broadcast(stats))
        .select(
            "rank", "left", "right", "merged", "pair_count",
            (F.col("_units").cast("double") / F.col("_vocab"))
            .alias("mean_units_per_word"),
        )
        .orderBy("rank")
    )


@query(
    "pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, {_SQL_TOKENS} AS n_tokens
            FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) // {_PACK_BUDGET} AS pack_id,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) % {_PACK_BUDGET} AS pack_offset
        FROM toks
    """,
    tags=("E5", "EXT"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: assign each document to a fixed
    token-budget pack (4096 tokens) by cumulative token offset within
    its language stream — the offset-chunking form of greedy packing
    (a pack may overrun the budget by less than one document; the
    deterministic, single-window semantic trainers actually use for
    "concat then split" data loading). The per-lang running
    offset is computed with ``grouped_prefix_sum`` (range-bucketed:
    per-(lang, bucket) partial sums + a ≤256-row per-lang offsets
    window), so a mega-language stream never funnels through one
    task — the window groups are ≈ N_lang/256 at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _tokens().alias("n_tokens"))
    # inclusive per-lang prefix via bounded range-bucketed windows
    # (group size ≈ N_lang/256 instead of the whole language stream
    # through one task); the exclusive offset is prefix − n_tokens
    pref = O.grouped_prefix_sum(
        docs, ["lang"], F.col("doc_id"), F.col("n_tokens"), name="_cum")
    cum_before = F.col("_cum") - F.col("n_tokens")
    return pref.select(
        "doc_id", "lang", "n_tokens",
        (cum_before / F.lit(_PACK_BUDGET)).cast("long").alias("pack_id"),
        (cum_before % F.lit(_PACK_BUDGET)).alias("pack_offset"),
    )


@query(
    "stratified_sample_label",
    oracle="""
        SELECT vec_id, label, strat_rn
        FROM (
            SELECT vec_id, label,
                   ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id)
                       AS strat_rn
            FROM embeddings
        )
        WHERE strat_rn % 10 = 1
    """,
    tags=("E5", "EXT"),
)
def stratified_sample_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10% sample with EXACT per-stratum rates: every 10th
    vector per label by id order (systematic sampling within strata —
    the deterministic, oracle-able counterpart of sampleBy's Bernoulli
    draw). Guarantees each label's sample fraction is ⌈n/10⌉/n rather
    than a random variable — what class-balanced eval-set carving
    actually wants. The per-label rank runs on
    ``grouped_rank`` (range-bucketed: rank window keyed by (label,
    bucket), per-label offsets window over ≤256 count rows), so a
    dominant label never funnels through one task."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ranked = O.grouped_rank(e, ["label"], F.col("vec_id"), name="strat_rn")
    return ranked.filter(F.col("strat_rn") % 10 == 1)


@query(
    "train_test_split",
    oracle="""
        WITH hashed AS (
            SELECT doc_id, n_chars,
                   (doc_id * 2654435761) % 4294967296 AS h
            FROM documents
        )
        SELECT CASE WHEN h < 0.9 * 4294967296 THEN 'train' ELSE 'test' END
                   AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM hashed
        GROUP BY split
    """,
    tags=("E7", "EXT"),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by multiplicative hashing
    (Knuth's 2654435761 mod 2^32) of doc_id — stable across runs,
    engines, and repartitioning, unlike randomSplit. Emitted as
    per-split counts; the row-level form is the same expression as a
    filter. Long arithmetic only (no float hash) so the split is
    bit-identical everywhere; ids beyond ~3.4e9 would need the
    multiply done mod 2^32 first (documented here, irrelevant below
    that). A real pipeline splitting on string keys uses xxhash64 —
    same shape, engine-internal hash → rows-only check instead."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    split = (F.when(h < F.lit(0.9) * F.lit(4294967296), "train")
             .otherwise("test"))
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
    )
