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
