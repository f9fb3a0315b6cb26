"""LLM-data-pipeline queries, round 4: corpus-statistics quality
signals (bigram LM familiarity, cross-document n-gram novelty) and the
BPE *apply* path (tokenize the corpus with a learned merge table) —
closing the train→apply tokenizer loop that llm3's
``bpe_learn_merges`` opened.

Scale shapes: familiarity and novelty are the canonical
explode → vocab-bounded aggregate → co-partitioned equi-join → per-doc
aggregate pipeline — the corpus shuffles on the n-gram key once, the
statistic relation is vocabulary-sized, and every arithmetic emission
is integer-derived (counts + one double division) so the DuckDB oracle
matches bit-for-bit. BPE encoding joins the corpus against the
vocabulary-sized segmentation table via broadcast — the corpus itself
never reshuffles to get tokenized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import bpe as B
from data_eng_taxi_ibis_dagster_spark.operators import multimodal as M
from data_eng_taxi_ibis_dagster_spark.operators import text as T
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

_TOKS_SQL = "string_split(text, ' ')"


def _bigrams(text_col: str) -> F.Column:
    """All adjacent-token bigrams (with repetition — LM statistics count
    occurrences, unlike dedup shingles which are distinct)."""
    t = T.tokens(text_col)
    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i),
                                  F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "lm_bigram_familiarity",
    oracle=f"""
        WITH bg AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len({_TOKS_SQL})),
                       i -> {_TOKS_SQL}[i] || ' ' || {_TOKS_SQL}[i+1]))
                       AS bigram
            FROM documents
        ),
        cnt AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram)
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(c) AS BIGINT) AS total_c,
               CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS familiarity
        FROM bg JOIN cnt USING (bigram)
        GROUP BY doc_id
    """,
    tags=("E12", "EXT"),
)
def lm_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM familiarity score per document: train a bigram count
    model on the corpus (one vocab-bounded aggregate) and score each
    document by the mean corpus frequency of its bigrams — the cheap
    analog of LM-perplexity filtering (low familiarity ≈ high
    perplexity ≈ boilerplate-free but possibly noise; the standard
    curation triage axis). Integer counts + one double division →
    bit-exact vs the oracle."""
    d = load_table(spark, sf_dir, "documents")
    bg = d.select("doc_id", F.explode(_bigrams("text")).alias("bigram"))
    cnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    return (
        bg.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum("c").alias("total_c"))
        .select(
            "doc_id", "n_bigrams", "total_c",
            (F.col("total_c").cast("double")
             / F.col("n_bigrams").cast("double")).alias("familiarity"),
        )
    )


@query(
    "ngram_novelty",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest({T.sql_shingles(_TOKS_SQL, 3)}) AS s
            FROM documents
        ),
        first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
        SELECT doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_seen_before,
               CAST(1 AS DOUBLE)
                   - CAST(SUM(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END)
                          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM sh JOIN first USING (s)
        GROUP BY doc_id
    """,
    tags=("E10", "E12", "EXT"),
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document n-gram novelty: fraction of a document's distinct
    trigram shingles not already seen in any earlier document (by
    doc_id order — ingestion order in a real pipeline). The sequential
    'seen before' semantics distribute as a min-aggregate: first
    occurrence per shingle is MIN(doc_id), no ordered scan required.
    The repetition-aware cousin of near-dedup — low novelty flags
    template/boilerplate tails that pairwise Jaccard misses."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id",
                  F.explode(T.shingles(T.tokens("text"), 3)).alias("s"))
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    seen = F.sum(
        F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0))
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             seen.alias("n_seen_before"))
        .select(
            "doc_id", "n_shingles", "n_seen_before",
            (F.lit(1.0)
             - F.col("n_seen_before").cast("double")
             / F.col("n_shingles").cast("double")).alias("novelty"),
        )
    )


@query(
    "multimodal_phash_dedup",
    oracle=None,  # real image decode + DCT perceptual hash — not
                  # SQL-expressible; fully deterministic (no RNG, fixed
                  # tables, exact integer banding + popcount verify)
    tags=("E10", "E13", "EXT"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dedup across formats and resolutions: the media
    corpus is unioned with resized-and-PNG-normalized twins of every
    image (resize_media with convert_to — the standard preprocessing
    shape), each image gets a 64-bit DCT perceptual hash, and the
    shared banded-hamming join (the SimHash core) emits near-dup pairs.
    Every original must pair with its own twin (pHash is invariant to
    NN resampling and lossless re-encode — including JPEG sources,
    whose hash is computed from decoded pixels on both sides), proving
    cross-format duplicate detection; unrelated noise textures sit at
    hamming ≥ 8 on this fixture, outside the threshold. Signatures are
    row-local; only (id, long) relations shuffle — at 100 TB the
    payload bytes never leave the hashing stage."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthetic_media(docs)
    twins = (
        M.resize_media(media, target_width=32, target_height=32,
                       convert_to="image/png")
        .withColumn("media_id", F.col("media_id") + F.lit(1_000_000))
    )
    corpus = media.unionByName(twins)
    return (
        M.phash_near_dup_pairs(corpus, max_hamming=6)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "multimodal_audio_dedup",
    oracle=None,  # real WAV decode + FFT spectral fingerprint — not
                  # SQL-expressible; fully deterministic (no window
                  # function, no RNG, integer banding + popcount)
    tags=("E10", "E13", "EXT"),
)
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-dedup: 64-bit spectral fingerprints (log-banded FFT
    energy signs, Haitsma-Kalker shape — amplitude-invariant) over the
    WAV payloads, joined through the same banded-hamming core as
    SimHash (text) and pHash (image). The fixture's synthetic clips
    repeat tone classes, so every same-class pair must surface at
    hamming 0 (identical payloads ⇒ identical fingerprints), and
    immediately-neighboring tones land within the tight threshold —
    the three signature families prove one shared scale shape:
    row-local signatures, (id, long) shuffles only."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthetic_media(docs)
    return (
        M.audio_near_dup_pairs(media, max_hamming=2)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "bpe_encode_corpus",
    oracle=None,  # applies an iteratively-learned merge table — not
                  # SQL-expressible; deterministic (integer-count argmax
                  # training + rank-ordered replay)
    tags=("E12", "E15", "EXT"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer APPLY path: learn 10 BPE merges on the corpus
    (llm3's trainer), segment the vocabulary once (vocab-sized
    relation), then tokenize every document via a broadcast join on the
    word — the corpus is never reshuffled to get encoded. Emits per-doc
    token and BPE-unit counts plus the achieved compression ratio
    (units per token); train and apply share the same merge fold
    (operators/bpe.py) so they cannot disagree."""
    d = load_table(spark, sf_dir, "documents")
    merges = B.learn_bpe_merges(d, T.tokens("text"), n_merges=10)
    seg = B.segment_words(d, T.tokens("text"), merges)
    tokd = d.select("doc_id", F.explode(T.tokens("text")).alias("w"))
    return (
        tokd.join(F.broadcast(seg.select("w", "n_units")), "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum("n_units").alias("n_bpe_units"))
        .select(
            "doc_id", "n_tokens", "n_bpe_units",
            (F.col("n_bpe_units").cast("double")
             / F.col("n_tokens").cast("double")).alias("units_per_token"),
        )
        .orderBy("doc_id")
    )
