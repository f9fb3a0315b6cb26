"""Deterministic md5-selected subset fixtures for the 100x strict sweep.

The nine all-pairs DuckDB oracle twins (exact Jaccard / cosine /
skyline NOT-EXISTS over the full corpus) are O(n^2) by design and time
out on COST at sf1 (~1.8 B pair evaluations at 50 k docs) while their
banded/blocked Spark sides finish in seconds -- that asymmetry is the
scale evidence, but it leaves those queries' sf1 runs un-hash-checked.
This module closes the hole with a subset-strict differential: filter
the one corpus table each query reads to the rows whose
``md5(cast(id AS varchar))`` starts with a fixed hex-prefix class
(1-in-8 -- landing each table at or below the size where its full
oracle already completed at sf0.1), then run the UNCHANGED registered
plan and the UNCHANGED registered oracle on the subset directory.
Both engines compute md5 of the identical decimal string rendering, so
the restriction is deterministic and engine-shared; the task itself
("dedup/cluster/skyline this corpus") is simply posed on the smaller
corpus, exercising the same plan shapes at a checkable oracle cost.

Usage (also invoked automatically by scripts/strict_sweep.py):

    python scripts/make_subset.py .sfdata/sf1 .sfdata/sf1_subset
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# table -> id column hashed for membership.  One hex char in PREFIXES
# keeps 1/8 of the rows; every other table is shared unfiltered (the
# nine subset-strict queries each read exactly one of these three).
SUBSET_IDS = {"documents": "doc_id", "embeddings": "vec_id",
              "part": "p_partkey"}
PREFIXES = ("0", "1")


def table_glob(sf_dir: str, table: str) -> str:
    """Parquet path for a fixture table: single file at the driver
    gates, spark-written part directory from make_sf1.py."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    return os.path.join(p, "*.parquet") if os.path.isdir(p) else p


def make_subset(sf_dir: str, out_dir: str) -> str:
    """Materialize the subset fixture dir; idempotent (skips if the
    marker file already records the same source + prefix class)."""
    sf_dir, out_dir = os.path.abspath(sf_dir), os.path.abspath(out_dir)
    marker = os.path.join(out_dir, ".subset_spec")
    spec = f"src={sf_dir} prefixes={','.join(PREFIXES)}\n"
    if os.path.exists(marker) and open(marker).read() == spec:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    pred = " OR ".join(
        f"substr(md5(cast({{id}} AS varchar)), 1, 1) = '{p}'"
        for p in PREFIXES)
    for t in TABLES:
        src = table_glob(sf_dir, t)
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.isdir(dst):
            import shutil
            shutil.rmtree(dst)
        elif os.path.lexists(dst):
            os.remove(dst)
        if t in SUBSET_IDS:
            where = pred.format(id=SUBSET_IDS[t])
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') "
                f"WHERE {where} ORDER BY {SUBSET_IDS[t]}) "
                f"TO '{dst}' (FORMAT PARQUET)")
        else:
            # unfiltered tables are shared by symlink -- same bytes,
            # no copy of the 6 M-row lineitem at sf1
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), dst)
    with open(marker, "w") as fh:
        fh.write(spec)
    return out_dir


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    make_subset(src, dst)
    con = duckdb.connect()
    for t in SUBSET_IDS:
        n = con.execute(f"SELECT count(*) FROM read_parquet("
                        f"'{table_glob(dst, t)}')").fetchone()[0]
        print(f"{t}: {n} rows")
