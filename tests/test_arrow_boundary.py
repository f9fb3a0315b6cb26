"""Arrow-native Python boundary (plans/llm19.py) — unit coverage the
fixture corpus can't provide: the sf* documents are single-spaced and
may be pure ASCII, where bytes == codepoints and the
``binary_length`` / ``utf8_length`` distinction silently collapses.
These tests drive the workers with multi-byte UTF-8 (2-, 3-, and
4-byte sequences) and multi-space runs so each kernel's semantics are
pinned independently of the parity harness."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.llm19 import (
    _doc_byte_stats,
    _group_char_stats,
)

TEXTS = [
    "plain ascii words",          # bytes == chars
    "héllo wörld",                # 2-byte UTF-8 sequences
    "中文 文本 处理",               # 3-byte sequences
    "emoji \U0001f600 end",       # 4-byte sequence
    "double  space   runs",       # count_substring over space runs
    "",                           # empty text
]


def _expected(s: str) -> tuple[int, int, int]:
    return len(s.encode("utf-8")), len(s), s.count(" ")


def test_doc_byte_stats_kernels_match_python_semantics():
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(range(len(TEXTS)), pa.int64()),
            pa.array(TEXTS, pa.string()),
            pa.array(["xx"] * len(TEXTS), pa.string()),
        ],
        names=["doc_id", "text", "lang"],
    )
    (out,) = list(_doc_byte_stats(iter([batch])))
    assert out.schema.names == [
        "doc_id", "lang", "n_bytes", "n_chars_utf", "n_spaces"]
    for i, s in enumerate(TEXTS):
        nb, nc, ns = _expected(s)
        assert out.column("n_bytes")[i].as_py() == nb, s
        assert out.column("n_chars_utf")[i].as_py() == nc, s
        assert out.column("n_spaces")[i].as_py() == ns, s


def test_doc_byte_stats_preserves_batch_boundaries():
    batches = [
        pa.RecordBatch.from_arrays(
            [pa.array([i], pa.int64()),
             pa.array([t], pa.string()),
             pa.array(["xx"], pa.string())],
            names=["doc_id", "text", "lang"],
        )
        for i, t in enumerate(TEXTS[:3])
    ]
    outs = list(_doc_byte_stats(iter(batches)))
    assert len(outs) == 3 and all(b.num_rows == 1 for b in outs)


def test_group_char_stats_single_group_summary():
    table = pa.table(
        {
            "lang": ["fr"] * 4,
            "n_chars": pa.array([10, 3, 99, 7], pa.int64()),
        }
    )
    out = _group_char_stats(table)
    row = {c: out.column(c)[0].as_py() for c in out.schema.names}
    assert row == {
        "lang": "fr", "docs": 4, "min_chars": 3,
        "max_chars": 99, "total_chars": 119,
    }


@pytest.mark.usefixtures("spark")
def test_map_in_arrow_multibyte_end_to_end(spark):
    """The Spark mapInArrow path itself (not just the worker) on
    non-ASCII rows: per-doc outputs must match Python's UTF-8
    accounting after the Arrow round-trip."""
    df = spark.createDataFrame(
        [(i, t, "xx") for i, t in enumerate(TEXTS)],
        "doc_id long, text string, lang string",
    )
    out = df.mapInArrow(
        _doc_byte_stats,
        schema=("doc_id long, lang string, n_bytes long, "
                "n_chars_utf long, n_spaces long"),
    ).orderBy("doc_id").collect()
    assert len(out) == len(TEXTS)
    for row, s in zip(out, TEXTS):
        nb, nc, ns = _expected(s)
        assert (row.n_bytes, row.n_chars_utf, row.n_spaces) == (nb, nc, ns), s
