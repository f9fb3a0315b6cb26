"""Deterministic sampling primitives shared by the query registry and
the pipeline DAG.

The A-ES (Efraimidis–Spirakis) priority lives here so the
oracle-checked query (plans/llm4.weighted_sample_aes) and the
LLM-prep DAG stage (pipeline.mixture_sample) evaluate the SAME
expression — a change to the hash-to-uniform mapping cannot
desynchronize the twins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^52 + 1 — maps the 13-hex-digit md5 prefix into u ∈ (0, 1].
U_DENOM = 4503599627370497.0


def md5_uniform(id_col: Column) -> Column:
    """Deterministic uniform u ∈ (0, 1] from an id column: the first 13
    hex digits of md5(id) scaled. Identical in DuckDB as
    ``(('0x' || substr(md5(id::VARCHAR),1,13))::UBIGINT::DOUBLE + 1.0)
    / 4503599627370497.0`` — both engines agree bit-for-bit."""
    m = F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 13), 16, 10
    ).cast("double")
    return (m + F.lit(1.0)) / F.lit(U_DENOM)


def aes_priority(id_col: Column, weight: Column) -> Column:
    """A-ES sampling priority ln(u)/w: the k LARGEST priorities form an
    exact weighted-without-replacement sample of size k. Row-local —
    pairs with ``orderBy(desc).limit(k)`` (TakeOrderedAndProject, no
    global sort)."""
    return F.log(md5_uniform(id_col)) / weight.cast("double")
