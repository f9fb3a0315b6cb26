"""E15 round-5 continuation: the ARROW-NATIVE Python boundary.

The E15 surface so far crosses JVM→Python through pandas
(``pandas_udf_scalar``/``apply_in_pandas_zscore``/``udtf_chunk_documents``,
plans/advanced.py) or through the Arrow-serialized row UDF
(``arrow_python_udf``). Spark's fastest Python boundary skips the
pandas conversion entirely: ``DataFrame.mapInArrow`` hands the worker
raw ``pyarrow.RecordBatch``es and ``GroupedData.applyInArrow`` hands it
one ``pyarrow.Table`` per group — no pandas object allocation, no
copy out of Arrow memory, and ``pyarrow.compute`` kernels run
vectorized C++ over the batch. For byte-level work (the multimodal
tier, tokenizer byte counting) this is the boundary a 100 TB pipeline
wants: the only per-row Python cost is the kernel dispatch.

Reference parity: the reference's Python-boundary surface is the Ibis
UDF escape hatch (``/root/reference/taxi_pipeline.py:89-147`` runs the
same logical query on DuckDB and PySpark backends); these queries keep
that two-engine property strict — the Arrow kernels compute exact
integer byte/char/space counts, so the DuckDB oracle matches
bit-for-bit.

Scale shape: ``map_in_arrow_stats`` is embarrassingly parallel (one
Arrow batch in, one batch out, no state) followed by a lang-keyed
partial aggregate — the per-doc relation never shuffles, only the
~|langs| partial rows do. ``apply_in_arrow_group_stats`` shuffles the
corpus once on the group key (the operator's definition); group count
is |langs|-bounded, so skew is the per-group table size — for a
hot-lang corpus, pre-aggregate with the salted two-stage pattern
(``agg_salted_hot_key``) before the Arrow boundary instead.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import query
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa


def _doc_byte_stats(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
    """mapInArrow worker: exact per-document byte/codepoint/space
    counts via vectorized pyarrow.compute kernels — no pandas, no
    per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("lang"),
                pc.cast(pc.binary_length(text), pa.int64()),   # bytes
                pc.cast(pc.utf8_length(text), pa.int64()),     # codepoints
                pc.cast(pc.count_substring(text, pattern=" "), pa.int64()),
            ],
            names=["doc_id", "lang", "n_bytes", "n_chars_utf", "n_spaces"],
        )


@query(
    "map_in_arrow_stats",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT)  AS docs,
               CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
               CAST(SUM(length(text)
                        - length(replace(text, ' ', ''))) AS BIGINT)
                   AS sum_spaces
        FROM documents
        WHERE text IS NOT NULL
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("E15", "E12", "EXT"),
    bench=True,
)
def map_in_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus byte accounting through ``mapInArrow``
    (module docstring): RecordBatch-in/RecordBatch-out worker running
    ``pyarrow.compute`` kernels, then a lang-keyed partial aggregate.
    All outputs are exact integers, so the DuckDB oracle (``strlen`` =
    bytes, ``length`` = codepoints, replace-difference = spaces) is
    strict."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang")
        .filter(F.col("text").isNotNull())
    )
    per_doc = docs.mapInArrow(
        _doc_byte_stats,
        schema=("doc_id long, lang string, n_bytes long, "
                "n_chars_utf long, n_spaces long"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.sum("n_chars_utf").alias("sum_chars"),
            F.sum("n_spaces").alias("sum_spaces"),
        )
        .orderBy("lang")
    )


def _group_char_stats(table: "pa.Table") -> "pa.Table":
    """applyInArrow worker: one group's (lang) summary from the
    already-grouped Arrow table — min/max/sum via pyarrow.compute
    aggregate kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n_chars = table.column("n_chars")
    mm = pc.min_max(n_chars).as_py()
    return pa.table(
        {
            "lang": [table.column("lang")[0].as_py()],
            "docs": pa.array([table.num_rows], pa.int64()),
            "min_chars": pa.array([mm["min"]], pa.int64()),
            "max_chars": pa.array([mm["max"]], pa.int64()),
            "total_chars": pa.array([pc.sum(n_chars).as_py()], pa.int64()),
        }
    )


@query(
    "apply_in_arrow_group_stats",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT)     AS docs,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("E15", "EXT"),
)
def apply_in_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Arrow-table UDF through ``GroupedData.applyInArrow``:
    the corpus shuffles once on ``lang`` (the operator's definition),
    each group arrives as one ``pyarrow.Table``, and the summary is
    computed by Arrow aggregate kernels. Integer outputs keep the
    oracle strict."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    out = docs.groupBy("lang").applyInArrow(
        _group_char_stats,
        schema=("lang string, docs long, min_chars long, "
                "max_chars long, total_chars long"),
    )
    return out.orderBy("lang")


# ---------------------------------------------------------------------------
# Corpus frequency-distribution diagnostics (Zipf fit + hapax profile)
# ---------------------------------------------------------------------------

_ZIPF_R = 256       # top ranks entering the log-log slope fit
_ZIPF_Q = 1_000_000  # ln-value quantization (1e-6 resolution)


@query(
    "zipf_vocab_profile",
    oracle=f"""
        WITH tf AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS t
                  FROM documents WHERE text IS NOT NULL)
            GROUP BY t
        ), ranked AS (
            SELECT freq,
                   CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, t)
                        AS BIGINT) AS rnk
            FROM tf
        ), q AS (
            SELECT rnk, freq,
                   CAST(floor(ln(CAST(rnk AS DOUBLE)) * {_ZIPF_Q} + 0.5)
                        AS BIGINT) AS lx,
                   CAST(floor(ln(CAST(freq AS DOUBLE)) * {_ZIPF_Q} + 0.5)
                        AS BIGINT) AS ly
            FROM ranked
        ), s AS (
            SELECT
                CAST(COUNT(*) AS BIGINT) AS vocab_size,
                CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS hapax_count,
                CAST(SUM(freq) AS BIGINT) AS total_tokens,
                CAST(SUM(CASE WHEN rnk <= {_ZIPF_R} THEN 1 ELSE 0 END)
                     AS BIGINT) AS fit_points,
                CAST(SUM(CASE WHEN rnk <= {_ZIPF_R} THEN lx ELSE 0 END)
                     AS BIGINT) AS sx,
                CAST(SUM(CASE WHEN rnk <= {_ZIPF_R} THEN ly ELSE 0 END)
                     AS BIGINT) AS sy,
                CAST(SUM(CASE WHEN rnk <= {_ZIPF_R} THEN lx * ly ELSE 0 END)
                     AS BIGINT) AS sxy,
                CAST(SUM(CASE WHEN rnk <= {_ZIPF_R} THEN lx * lx ELSE 0 END)
                     AS BIGINT) AS sxx
            FROM q
        )
        SELECT vocab_size, hapax_count, total_tokens, fit_points,
               (CAST(fit_points AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(fit_points AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS zipf_slope
        FROM s
    """,
    tags=("E12", "EXT"),
    bench=True,
)
def zipf_vocab_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus frequency-distribution health check: vocabulary size,
    hapax-legomenon count, total token mass, and the Zipf log-log
    slope fitted over the top-256 frequency ranks — the one-row
    diagnostic a pretraining-corpus build gates on (a slope far from
    −1 or a collapsed hapax fraction flags boilerplate flooding or a
    broken dedup upstream).

    Exactness: ln values are quantized to 1e-6 BEFORE summation
    (`floor(ln·1e6 + 0.5)` — the ``agg_exact_linear_stats`` trick), so
    every regression sum is an exact 64-bit integer on both engines
    and the closing slope is one identically-shaped double expression
    over identical integers. Scale shape: the token-frequency relation
    is vocab-bounded; its global rank comes from
    :func:`operators.order.distributed_rank` (affine-bucketed, no
    single-partition sort); everything after is one aggregate over
    that bounded relation."""
    from data_eng_taxi_ibis_dagster_spark.operators import text as T
    from data_eng_taxi_ibis_dagster_spark.operators.order import distributed_rank

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull()))
    tf = (docs.select(F.explode(T.tokens("text")).alias("t"))
          .groupBy("t").agg(F.count(F.lit(1)).alias("freq")))
    ranked = distributed_rank(
        tf, (-F.col("freq")).cast("double"), F.col("t"), name="rnk"
    ).select(F.col("freq"), F.col("rnk").cast("long").alias("rnk"))

    lx = F.floor(F.log(F.col("rnk").cast("double")) * _ZIPF_Q + F.lit(0.5)) \
          .cast("long")
    ly = F.floor(F.log(F.col("freq").cast("double")) * _ZIPF_Q + F.lit(0.5)) \
          .cast("long")
    infit = F.col("rnk") <= _ZIPF_R
    zero = F.lit(0).cast("long")
    s = (ranked.withColumn("lx", lx).withColumn("ly", ly)
         .agg(
             F.count(F.lit(1)).alias("vocab_size"),
             F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
              .cast("long").alias("hapax_count"),
             F.sum("freq").alias("total_tokens"),
             F.sum(F.when(infit, 1).otherwise(0)).cast("long")
              .alias("fit_points"),
             F.sum(F.when(infit, F.col("lx")).otherwise(zero))
              .alias("sx"),
             F.sum(F.when(infit, F.col("ly")).otherwise(zero))
              .alias("sy"),
             F.sum(F.when(infit, F.col("lx") * F.col("ly")).otherwise(zero))
              .alias("sxy"),
             F.sum(F.when(infit, F.col("lx") * F.col("lx")).otherwise(zero))
              .alias("sxx"),
         ))
    n_d = F.col("fit_points").cast("double")
    slope = (
        (n_d * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (n_d * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double"))
    )
    return s.select(
        "vocab_size", "hapax_count", "total_tokens", "fit_points",
        slope.alias("zipf_slope"),
    )
