"""LLM-data-pipeline query plans (E9–E13): text analysis, dedup,
similarity search, multimodal columns — the north-star extension
surface over the documents/embeddings fixture tables.

Oracle policy: everything expressible with engine-shared primitives
(md5, list ops, exact integer-derived arithmetic, fold-identical dot
products) carries a strict DuckDB oracle; operators built on Spark's
xxhash64 (MinHash, SimHash, SRP-LSH) are deterministic but engine-
specific → rows-only check, with their *verifiers* (exact Jaccard,
exact cosine) oracle-checked through the sibling queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import dedup as D
from data_eng_taxi_ibis_dagster_spark.operators import multimodal as M
from data_eng_taxi_ibis_dagster_spark.operators import similarity as S
from data_eng_taxi_ibis_dagster_spark.operators import text as T
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# E12 — text analysis
# ---------------------------------------------------------------------------

@query(
    "text_stats",
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
               {T.sql_bpe_token_count('text')} AS n_bpe_tokens,
               (CAST(length(text) AS DOUBLE) - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1.0))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
               {T.sql_fingerprint('text')} AS fp
        FROM documents
    """,
    tags=("E12",),
    bench=True,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), type counts, average
    token length, whole-doc fingerprint — one codegen'd projection, no
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n_tokens = F.size(toks).cast("double")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        ((F.length("text").cast("double") - (n_tokens - F.lit(1.0))) / n_tokens)
        .alias("avg_token_len"),
        T.fingerprint("text").alias("fp"),
    )


@query(
    "text_lang_id",
    oracle=f"""
        SELECT doc_id, lang,
               {T.sql_lang_pred("string_split(text, ' ')")} AS lang_pred,
               {T.sql_lang_score("string_split(text, ' ')", 'en')} AS en_hits
        FROM documents
    """,
    tags=("E12",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic): per-language
    multiset stopword hits, argmax with fixed tie order. Emits the true
    label alongside for accuracy eval."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return d.select(
        "doc_id",
        "lang",
        T.lang_pred(toks).alias("lang_pred"),
        T.lang_score(toks, "en").alias("en_hits"),
    )


@query(
    "text_quality",
    oracle=f"""
        SELECT doc_id,
               {T.sql_quality_score('text')} AS quality,
               CASE WHEN {T.sql_quality_score('text')} >= 0.5 THEN 'keep' ELSE 'drop' END AS verdict
        FROM documents
    """,
    tags=("E12",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus quality gate: deterministic [0,1] score +
    keep/drop verdict."""
    d = load_table(spark, sf_dir, "documents")
    q = T.quality_score("text")
    return d.select(
        "doc_id",
        q.alias("quality"),
        F.when(q >= 0.5, "keep").otherwise("drop").alias("verdict"),
    )


@query(
    "text_shingle_fingerprint",
    oracle=f"""
        SELECT doc_id,
               {T.sql_shingle_fingerprint("string_split(text, ' ')", 5)} AS rolling_fp
        FROM documents
    """,
    tags=("E12", "E10"),
)
def text_shingle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling fingerprint (min md5 over 5-gram
    shingles) — the cheap near-dup prefilter key."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.shingle_fingerprint(T.tokens("text"), 5).alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# E9 / E10 — dedup
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle=f"""
        SELECT {T.sql_fingerprint('text')} AS fp,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM documents
        )
        GROUP BY 1
    """,
    tags=("E9",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint, deterministic representative
    (min doc_id). The fixture has no exact duplicates, so the corpus is
    unioned with a shifted copy of itself — every group must collapse
    2→1, which exercises the semantics rather than the no-op."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return D.exact_dedup(doubled)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH {T.sql_winnow_sel("documents")}{T.sql_winnow_cands(D.WINNOW_MAX_DF)},
        sh AS (
            SELECT doc_id,
                   {T.sql_shingles("string_split(text, ' ')", 3)} AS s
            FROM documents
        )
        SELECT doc_a, doc_b,
               CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
                   / CAST(len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
                   AS jaccard_sim
        FROM cand
        JOIN sh a ON a.doc_id = doc_a
        JOIN sh b ON b.doc_id = doc_b
        WHERE CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
                  / CAST(len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
              >= 0.5
    """,
    tags=("E10",),
    bench=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs over WINNOWING-
    FINGERPRINT-blocked candidates — the oracle-checked verifier that
    MinHash candidates are tested against. Fixture plants true
    near-dups (J up to ~0.99); the winnow block recovers ALL of them
    (100% recall vs the global all-pairs truth at both gate SFs,
    pinned by ``test_winnow_block_recall``) including CROSS-source
    pairs the former same-source blocking missed (25 vs 1 at sf0.01).

    Re-blocked in round 9: the `source` block key had FIXED
    cardinality, so block size grew linearly with corpus and pair
    generation as O(n²/|sources|) — the salting fix (r8) spread the
    work but not the asymptote. The winnowing fingerprint is a
    content hash whose per-key df is capped (WINNOW_MAX_DF), so
    the candidate relation grows LINEARLY with the corpus; the
    comparison set is engine-portable (md5 grams — unlike xxhash64
    LSH bands) and the oracle restricts to the IDENTICAL allowed
    set, so the check stays strict with no fixture-recall argument."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cands = D.winnow_candidate_pairs(D.winnow_fingerprints(d))
    return D.jaccard_verify(cands, d, n=3, threshold=0.5)


@query(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-based — deterministic but Spark-specific
    tags=("E10",),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8×4) near-dup pairs, exact-Jaccard-verified at
    0.6. Candidate generation is a band-bucket equi-join (no all-pairs);
    tests assert recall against the exact `dedup_ngram_jaccard` pairs."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_near_dup_pairs(d, threshold=0.6).orderBy("doc_a", "doc_b")


@query(
    "dedup_cluster_pick",
    oracle=None,  # iterative connected components — non-SQL-expressible
    tags=("E10",),
)
def dedup_cluster_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization: MinHash pairs → connected
    components (min-label propagation, join+agg per round, lineage
    truncated per iteration) → one canonical doc per cluster. The
    iterative-algorithm case of the driver contract."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(d, threshold=0.6)
    return D.dedup_clusters(pairs).orderBy("doc_id")


@query(
    "dedup_simhash",
    oracle=None,  # xxhash64-based
    tags=("E10",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at hamming ≤ 3 via 4×16-bit bands
    (pigeonhole-complete for the radius)."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(d, max_hamming=3).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# E11 — similarity search
# ---------------------------------------------------------------------------

@query(
    "similarity_cosine_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS match_id, embedding AS cv FROM embeddings),
             scored AS (
                 SELECT query_id, match_id,
                        {S.sql_cosine('qv', 'cv')} AS cosine_sim
                 FROM q CROSS JOIN c
                 WHERE query_id != match_id
             )
        SELECT query_id, match_id, cosine_sim, rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, match_id ASC) AS rnk
            FROM scored
        )
        WHERE rnk <= 10
    """,
    tags=("E11",),
    bench=True,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors — the
    verifiable ANN baseline. The fold-based dot product bit-matches
    DuckDB's list_dot_product, so even the similarity VALUES are
    oracle-checked, not just the ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=10)


@query(
    "similarity_ann_srp",
    oracle=None,  # hash-derived hyperplanes — Spark-specific
    tags=("E11",),
)
def similarity_ann_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 4 sign-random-projection hash tables
    (8 planes each): bucket equi-join prunes candidates, exact cosine
    re-ranks. Tests measure recall vs the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        S.ann_topk_srp(emb.filter(F.col("vec_id") < 5), emb, k=10)
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# E13 — multimodal columns
# ---------------------------------------------------------------------------

@query(
    "multimodal_features",
    oracle="""
        SELECT doc_id AS media_id,
               'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum
        FROM documents
    """,
    tags=("E13", "E15"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: documents → media records (binary +
    typed metadata) → Arrow-batched mapInPandas feature extraction.
    Byte counts and checksums are oracle-checked; the decode step is the
    deterministic stub (real codecs are drop-in — operators.multimodal).
    feat_mean_byte is excluded from the oracle projection to keep the
    check engine-shared (DuckDB has no byte-fold)."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    return M.extract_features(media).select("media_id", "mime", "n_bytes", "checksum")


@query(
    "multimodal_decode_stats",
    oracle=None,  # real BMP/PPM/WAV/PNG decode — not SQL-expressible
    tags=("E13", "E15"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path: deterministic BMP / PPM / WAV / PNG payloads
    generated from doc_ids (operators.multimodal.synthetic_media —
    genuine format bytes through the real encoders, PNG via
    filtered+deflated scanlines), decoded by the real stdlib+numpy
    decoders inside Arrow-batched mapInPandas, then aggregated per mime:
    decoded dimensions, durations, and per-pixel/per-sample means.
    Deterministic across runs (no RNG anywhere), rows-only checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthetic_media(docs)
    feats = M.extract_features(media)
    return (
        feats.groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
            F.max("duration_ms").alias("max_duration_ms"),
            # decoded per-pixel/sample means, quantized for stability
            F.floor(F.avg("feat_mean") * 1000).cast("long").alias("avg_feat_x1000"),
        )
        .orderBy("mime")
    )
