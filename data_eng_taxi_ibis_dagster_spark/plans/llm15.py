"""LLM-data-pipeline queries, round 4 (cont. 2): web-corpus text
cleaning and model-based curation — HTML boilerplate stripping, a
hashed-feature linear quality classifier (the fastText-style scoring
stage of C4/CCNet-like pipelines, made engine-exact), URL parsing
analytics over ``parse_url``, and SemDeDup semantic deduplication
(k-means blocking + within-cluster cosine pruning; Abbas et al. 2023).

The reference's surface is engine-portable analytics over parquet
(``/root/reference/taxi_pipeline.py:89-147``); these queries extend the
same portable-pair contract (Spark DataFrame plan + DuckDB oracle) to
the text-cleaning stages every web-scale training corpus runs first.

Engine-parity notes:

* The fixture corpus is plain text, so the HTML/URL queries DERIVE the
  markup deterministically in BOTH renderings (same concat of the same
  columns) before exercising the strip/parse operators — the operators
  are what is under test, and the derivation keeps them strictly
  oracle-checkable instead of vacuously matching on a tag-free corpus.
* The classifier's per-token weights come from md5 (the cross-engine
  hash): ``('0x' || md5[:2]) % 17 − 8`` ∈ [−8, 8]. Integer sums, then
  ONE double division — IEEE division of exact integers is
  bit-identical across engines, so the score is strictly checkable
  with no transcendental functions in the path.

Scale shapes: cleaning/classification are pure row-local Column
expressions (whole-stage codegen, zero shuffles, zero Python); the URL
query's only shuffle is the final per-host aggregate; SemDeDup's
pairwise work is confined to within-cluster equi-joins (see
operators/similarity.semdedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import similarity as S
from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# HTML boilerplate stripping
# ---------------------------------------------------------------------------

_TAG_RE = "<[^>]*>"
_ENTITY_RE = "&(amp|lt|gt);"


def _html_render(doc_id: Column, source: Column, text: Column) -> Column:
    """Deterministic HTML rendering of a document (mirrored in SQL)."""
    return F.concat(
        F.lit("<html><head><title>"), source,
        F.lit("</title></head><body><h1>Doc "), doc_id.cast("string"),
        F.lit("</h1><p>"),
        F.replace(text, F.lit(" table "), F.lit(" &lt;table&gt; ")),
        F.lit("</p><br/></body></html>"),
    )


_SQL_HTML = (
    "'<html><head><title>' || source || '</title></head><body><h1>Doc ' "
    "|| doc_id::VARCHAR || '</h1><p>' "
    "|| replace(text, ' table ', ' &lt;table&gt; ') "
    "|| '</p><br/></body></html>'"
)


@query(
    "text_html_strip",
    oracle=f"""
        WITH rendered AS (
            SELECT doc_id, {_SQL_HTML} AS html FROM documents
        ), stripped AS (
            SELECT doc_id, html,
                   regexp_replace(html, '{_TAG_RE}', '', 'g') AS no_tags
            FROM rendered
        )
        SELECT doc_id,
               len(regexp_extract_all(html, '{_TAG_RE}')) AS tag_count,
               len(regexp_extract_all(no_tags, '{_ENTITY_RE}')) AS entity_count,
               length(trim(regexp_replace(
                   replace(replace(replace(no_tags, '&lt;', '<'),
                                   '&gt;', '>'),
                           '&amp;', '&'),
                   '\\s+', ' ', 'g'))) AS clean_len,
               md5(trim(regexp_replace(
                   replace(replace(replace(no_tags, '&lt;', '<'),
                                   '&gt;', '>'),
                           '&amp;', '&'),
                   '\\s+', ' ', 'g'))) AS clean_md5
        FROM stripped
    """,
    tags=("E12", "text-cleaning"),
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction: tag removal, entity decoding, whitespace
    normalization — the first stage of every web-crawl corpus pipeline
    (C4/CCNet boilerplate strip). The corpus is rendered to HTML
    deterministically first (same derivation in the oracle) so the
    strip path is exercised on every row. Pure row-local regexp over
    built-ins: zero shuffles, whole-stage codegen, no Python."""
    d = load_table(spark, sf_dir, "documents")
    html = _html_render(F.col("doc_id"), F.col("source"), F.col("text"))
    no_tags = F.regexp_replace(html, _TAG_RE, "")
    decoded = F.replace(
        F.replace(F.replace(no_tags, F.lit("&lt;"), F.lit("<")),
                  F.lit("&gt;"), F.lit(">")),
        F.lit("&amp;"), F.lit("&"))
    clean = F.trim(F.regexp_replace(decoded, r"\s+", " "))
    return d.select(
        "doc_id",
        F.regexp_count(html, F.lit(_TAG_RE)).alias("tag_count"),
        F.regexp_count(no_tags, F.lit(_ENTITY_RE)).alias("entity_count"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

from data_eng_taxi_ibis_dagster_spark.operators.text import (  # noqa: E402
    hashed_linear_score_num,
    sql_hashed_linear_score_num,
)


@query(
    "quality_classifier_linear",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   {sql_hashed_linear_score_num('text')} AS score_num
            FROM documents
        )
        SELECT doc_id, n_tokens, score_num,
               score_num / n_tokens AS quality_score,
               score_num / n_tokens >= 2.0 AS keep
        FROM scored
    """,
    tags=("E12", "quality-model"),
    bench=True,
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed bag-of-words features —
    the fastText-style model-based curation stage (score each document
    with a weight table indexed by token hash, keep above threshold).
    Weights are md5-derived integers so the score is ENGINE-EXACT: the
    per-document sum is an integer fold (``F.aggregate``, JVM-side),
    and the only float op is one IEEE division. At 100 TB this is a
    pure map — no shuffle, no Python, no model file to ship (a real
    weight table would broadcast as a map literal or join on a
    broadcast dim, same row-local shape)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score_num = hashed_linear_score_num("text")
    out = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        score_num.alias("score_num"),
    )
    quality = F.col("score_num") / F.col("n_tokens")
    return out.select(
        "doc_id", "n_tokens", "score_num",
        quality.alias("quality_score"),
        (quality >= 2.0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# URL parsing analytics
# ---------------------------------------------------------------------------

def _url_render(doc_id: Column, source: Column, lang: Column) -> Column:
    return F.concat(
        F.lit("https://"), source, F.lit(".example.com/docs/"),
        (doc_id % 100).cast("string"), F.lit("/"), doc_id.cast("string"),
        F.lit("?lang="), lang, F.lit("&sect="), (doc_id % 7).cast("string"),
    )


_SQL_URL = (
    "'https://' || source || '.example.com/docs/' || (doc_id % 100)::VARCHAR "
    "|| '/' || doc_id::VARCHAR || '?lang=' || lang "
    "|| '&sect=' || (doc_id % 7)::VARCHAR"
)


@query(
    "url_parse_stats",
    oracle=f"""
        WITH urls AS (
            SELECT doc_id, {_SQL_URL} AS url FROM documents
        ), parsed AS (
            SELECT doc_id,
                   regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                   regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
                   regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
            FROM urls
        )
        SELECT host,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT lang_param) AS n_langs,
               COUNT(DISTINCT path) AS n_paths
        FROM parsed
        GROUP BY host
    """,
    tags=("E7", "url"),
)
def url_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl statistics via ``parse_url`` (HOST / PATH /
    QUERY-key extraction) — the domain-level accounting stage of a
    crawl pipeline (blocklists, per-domain caps, language mix). URLs
    are derived deterministically (mirrored in the oracle, which
    parses with equivalent regexes — a genuine cross-implementation
    check of Spark's URL parser). One aggregate shuffle on the
    host key; parsing itself is row-local JVM code."""
    d = load_table(spark, sf_dir, "documents")
    url = _url_render(F.col("doc_id"), F.col("source"), F.col("lang"))
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang_param").alias("n_langs"),
        F.countDistinct("path").alias("n_paths"),
    )


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

@query(
    "semdedup_prune",
    tags=("E10", "E11", "semantic-dedup"),  # rows-only: k-means float
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-blocked semantic near-dedup over the embedding
    corpus (cluster with Lloyd, drop any vector whose cluster holds a
    lower-id neighbor with cosine ≥ 0.95). The corpus is unioned with
    an id-shifted copy of itself so every original/copy pair is an
    exact semantic duplicate the op MUST flag — exercising the drop
    path on a fixture with no natural near-dups (same pattern as
    ``dedup_exact``). Rows-only check (float k-means is outside the
    strict-SQL class); determinism + recall asserted in
    tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doubled = e.unionByName(
        e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"))
    return S.semdedup(doubled, threshold=0.95, k=8, iters=2)


# ---------------------------------------------------------------------------
# MJPEG video frame sampling
# ---------------------------------------------------------------------------

@query(
    "multimodal_video_frames",
    tags=("E13", "E15"),  # rows-only: real JPEG decode, not SQL-expressible
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path: deterministic MJPEG containers (back-to-back
    baseline JPEGs of per-frame-shifted patterns) are demuxed
    structurally, every 2nd frame decoded through the real JPEG
    decoder, and the sampled frames aggregated per frame index —
    the keyframe-extraction stage of a video-training pipeline
    (operators.multimodal.synthetic_video / sample_video_frames).
    Deterministic across runs; frame counts, geometry, and stats
    pinned in tests/test_multimodal_video.py."""
    from data_eng_taxi_ibis_dagster_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0)  # sample the corpus: video is heavy
    media = M.synthetic_video(docs)
    frames = M.sample_video_frames(media, stride=2, max_frames=3)
    return (
        frames.groupBy("frame_index")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.min("width").alias("min_width"),
             F.max("height").alias("max_height"),
             F.sum("feat_mean_x1000").alias("sum_feat_x1000"))
        .orderBy("frame_index")
    )
