"""PageRank operator: validation against a dense power-iteration
reference, determinism, and the co-occurrence edge construction."""

import pytest
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.graph import (
    cooccurrence_edges,
    pagerank,
)


def test_pagerank_matches_power_iteration(spark):
    import numpy as np

    edges = [(0, 1, 1.0), (0, 2, 2.0), (1, 2, 1.0), (2, 0, 1.0),
             (3, 2, 1.0), (1, 3, 3.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r["vertex"]: r["rank"]
           for r in pagerank(df, weight="w", damping=0.85, iters=12).collect()}

    n, d = 4, 0.85
    P = np.zeros((n, n))
    out = {}
    for s, t, w in edges:
        out[s] = out.get(s, 0.0) + w
    for s, t, w in edges:
        P[t, s] += w / out[s]
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        r = (1 - d) / n + d * (P @ r)
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-2)


def test_pagerank_dangling_mass_conserved(spark):
    """Graphs with sinks (every web crawl) must conserve total rank:
    dangling mass redistributes uniformly each iteration."""
    import numpy as np

    edges = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]  # 2 is dangling
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r["vertex"]: r["rank"]
           for r in pagerank(df, weight="w", damping=0.85, iters=15).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    n, d = 3, 0.85
    P = np.zeros((n, n))
    P[1, 0] = 0.5
    P[2, 0] = 0.5
    P[2, 1] = 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        r = (1 - d) / n + d * (P @ r + r[2] / n)  # vertex 2's mass spreads
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-9), v


def test_pagerank_zero_weight_edges_treated_dangling(spark):
    """A vertex whose out-edges all have zero weight must behave as
    dangling — rank still sums to 1 (no silent leak through _p = w/0),
    and the zero-weight edge's endpoints stay in the vertex set."""
    edges = [(0, 1, 1.0), (1, 2, 0.0), (1, 3, 0.0), (2, 0, 2.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r["vertex"]: r["rank"]
           for r in pagerank(df, weight="w", damping=0.85, iters=12).collect()}
    assert set(got) == {0, 1, 2, 3}          # dst 3 only named by a 0-edge
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # equivalent graph with the zero edges dropped but vertices kept
    # must produce identical ranks (zero edges carry no probability)
    ref_edges = [(0, 1, 1.0), (2, 0, 2.0), (3, 3, 0.0)]
    ref_df = spark.createDataFrame(ref_edges, ["src", "dst", "w"])
    ref = {r["vertex"]: r["rank"]
           for r in pagerank(ref_df, weight="w", damping=0.85, iters=12).collect()}
    for v in got:
        assert got[v] == pytest.approx(ref[v], abs=1e-12), v


def test_pagerank_empty_edges_returns_empty(spark):
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    empty = spark.createDataFrame(
        [], StructType([StructField("src", LongType()),
                        StructField("dst", LongType()),
                        StructField("w", DoubleType())]))
    assert pagerank(empty, weight="w").count() == 0


def test_cooccurrence_min_count_applies_to_undirected_total(spark):
    """'x y' in one doc and 'y x' in another is TWO co-occurrences of
    {x,y}: min_count=2 must keep the edge (counts merge before the
    threshold, not per-direction)."""
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], ["doc_id", "text"])
    toks = F.split(F.col("text"), " ")
    got = {(r["src"], r["dst"]): r["w"]
           for r in cooccurrence_edges(docs, toks, min_count=2).collect()}
    assert got == {("x", "y"): 2, ("y", "x"): 2}


def test_pagerank_deterministic_across_partitionings(spark):
    edges = [(i % 7, (i * 3) % 7, float(1 + i % 4)) for i in range(60)]
    a = spark.createDataFrame(edges, ["src", "dst", "w"]).repartition(1)
    b = spark.createDataFrame(list(reversed(edges)),
                              ["src", "dst", "w"]).repartition(16)
    ra = sorted(map(tuple, pagerank(a, weight="w", iters=6).collect()))
    rb = sorted(map(tuple, pagerank(b, weight="w", iters=6).collect()))
    assert ra == rb  # decimal combines ⇒ partition-order independent


def test_cooccurrence_edges_symmetric_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c")], ["doc_id", "text"])
    toks = F.split(F.col("text"), " ")
    got = {(r["src"], r["dst"]): r["w"]
           for r in cooccurrence_edges(docs, toks, min_count=1).collect()}
    # adjacent pairs: (a,b)x2, (b,c)x2, (c,a)x1 — symmetric
    assert got[("a", "b")] == got[("b", "a")] == 2
    assert got[("b", "c")] == got[("c", "b")] == 2
    assert got[("c", "a")] == got[("a", "c")] == 1
    assert all(u != v for (u, v) in got)
