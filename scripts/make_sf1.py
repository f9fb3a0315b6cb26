#!/usr/bin/env python
"""Derive a deterministic sf1 dataset (10× sf0.1) for stretch-scale
bench smokes, written to ``.sfdata/sf1/`` (gitignored).

Why derive instead of generate: the driver ships fixtures only at
sf ≤ 0.1; super-linear blowups (LSH bucket occupancy, window state,
block pair counts) only show at a larger scale, so we replicate sf0.1
ten times with consistent key offsets. Referential integrity is
preserved by offsetting every key column of a copy by the same
copy-index stride (max key + 1 of the base table), so joins fan out
exactly like the base dataset. ``region``/``nation`` stay fixed — as
in TPC-H, they are scale-invariant dims.

Text gets a per-copy suffix token so near-dup structure is preserved
(each copy's planted near-dups stay near-dups) without creating
10-way exact-duplicate groups that would quadratically inflate LSH
verify pairs beyond what a real corpus at 10× would show.
Embeddings keep their vectors (ANN/brute-force cost is corpus-size
driven); vec_ids offset.

Usage: python scripts/make_sf1.py [copies]   (default 10)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".sfdata", "sf1")

#: table → columns that must be offset per copy (consistently across tables)
_KEY_STRIDES = {
    "c_custkey": None, "s_suppkey": None, "p_partkey": None,
    "o_orderkey": None, "l_orderkey": None, "l_partkey": None,
    "l_suppkey": None, "o_custkey": None,
    "event_id": None, "user_id": None, "doc_id": None, "vec_id": None,
}

#: key-family: every column in a family shares one stride so FKs stay valid
_FAMILY = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "event_id", "user_id": "user_id",
    "doc_id": "doc_id", "vec_id": "vec_id",
}


def _strides(spark, tables: dict[str, DataFrame]) -> dict[str, int]:
    """One stride per key family = max(base key) + 1."""
    out: dict[str, int] = {}
    probe = {
        "custkey": ("customer", "c_custkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "partkey": ("part", "p_partkey"),
        "orderkey": ("orders", "o_orderkey"),
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
        "doc_id": ("documents", "doc_id"),
        "vec_id": ("embeddings", "vec_id"),
    }
    for fam, (table, col) in probe.items():
        out[fam] = tables[table].agg(F.max(col)).collect()[0][0] + 1
    return out


def replicate(df: DataFrame, copies: int, strides: dict[str, int],
              text_col: str | None = None) -> DataFrame:
    parts = []
    for i in range(copies):
        c = df
        for col in df.columns:
            fam = _FAMILY.get(col)
            if fam is not None and i > 0:
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[fam]))
        if text_col is not None and i > 0:
            c = c.withColumn(text_col,
                             F.concat(F.col(text_col), F.lit(f" copymark{i}")))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from data_eng_taxi_ibis_dagster_spark.session import get_session

    spark = get_session(app_name="make_sf1")
    tables = {
        t: spark.read.parquet(f"{SRC}/{t}.parquet")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")
    }
    strides = _strides(spark, tables)
    os.makedirs(DST, exist_ok=True)
    for t, df in tables.items():
        if t in ("region", "nation"):
            big = df  # scale-invariant dims
        else:
            big = replicate(df, copies, strides,
                            text_col="text" if t == "documents" else None)
        # one flat parquet file-set per table, same layout as the fixtures
        big.repartition(8).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())


if __name__ == "__main__":
    main()
