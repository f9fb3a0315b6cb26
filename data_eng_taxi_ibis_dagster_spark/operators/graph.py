"""Iterative graph analytics as DataFrame rounds: weighted PageRank.

Complements the other iterative operators (Lloyd k-means in
``similarity.py``, min-label connected components in ``dedup.py``) with
the damped-random-surfer class — the standard quality/centrality signal
for link-structured corpora (web-crawl curation) and, over token
co-occurrence graphs, the TextRank keyword extractor.

Spark-first shape per iteration (classic pregel-by-join):

* contribution pass — ranks join edges on src (one hash shuffle keyed
  by vertex), each edge carries ``rank · w/out_w`` to its dst;
* combine pass — one groupBy(dst) aggregate with map-side combine.

State between iterations is one (vertex, rank) relation — never
collected to the driver. Rank sums are quantized-decimal
(functions/exact.py) so the combine is associative in *integer* space:
results are bit-identical run-to-run regardless of partition order,
which keeps the operator in the deterministic rows-only check class.
Lineage is truncated with ``localCheckpoint`` every few rounds, same as
the connected-components loop — at 100 TB the per-iteration cost is the
edge-relation shuffle, so edges should be pre-partitioned by src (the
rank join then reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import dsum

#: decimal places carried through rank accumulation — integer-exact sums.
_RANK_SCALE = 12


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             weight: str | None = None, damping: float = 0.85,
             iters: int = 10,
             checkpoint_every: int = 4) -> DataFrame:
    """Weighted PageRank over a directed edge list. Returns
    ``(vertex, rank)`` with ranks summing to ~1.

    Dangling vertices (no out-edges) redistribute their mass uniformly
    each iteration — a 1-row aggregate broadcast back into the update,
    so total rank is conserved on any graph shape. ``weight=None``
    treats every edge as weight 1. An empty edge list returns an empty
    result rather than dividing by the zero vertex count.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e_all = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                         w.alias("_w"))
    # Zero/negative-weight edges carry no transition probability: drop
    # them before normalization. A src whose weights all quantize to 0
    # at the dsum scale is likewise treated as dangling (the _out > 0
    # filter) — otherwise _p = _w/0 goes NULL and its rank mass would
    # silently leak instead of redistributing.
    e = e_all.filter(F.col("_w") > 0)
    # normalized transition weight per edge: w / total out-weight(src)
    out_w = (e.groupBy("_src").agg(dsum("_w", 6).alias("_out"))
             .filter(F.col("_out") > 0))
    trans = (
        e.join(out_w, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_out")).alias("_p"))
    )
    # vertex set comes from ALL edges (zero-weight ones still name
    # vertices — they just contribute no transitions)
    vertices = (
        e_all.select(F.col("_src").alias("vertex"))
        .unionByName(e_all.select(F.col("_dst").alias("vertex")))
        .distinct()
    )
    # Checkpoint the vocab-sized loop-invariant relations so they
    # materialize ONCE. They derive from the edge list — often a
    # corpus-scale extraction (token co-occurrence explode) — and every
    # iteration's lineage references them, so without truncation the
    # final action would re-derive the edges once per iteration. Lazy
    # (eager=False): blocks are stored at first computation inside the
    # caller's action, and after that the corpus is never touched
    # again; iterations shuffle only vocabulary-sized state.
    trans = trans.localCheckpoint(eager=False)
    vertices = vertices.localCheckpoint(eager=False)
    n = vertices.count()  # bounded scalar (vocab/site count, not corpus)
    if n == 0:
        return vertices.select("vertex", F.lit(0.0).alias("rank"))
    # vertices WITH out-edges; everyone else is dangling (trans only
    # holds srcs with positive quantized out-weight — see filters above)
    has_out = (trans.select(F.col("_src").alias("vertex")).distinct()
               .localCheckpoint(eager=False))
    ranks = vertices.select("vertex", F.lit(1.0 / n).alias("rank"))

    teleport = (1.0 - damping) / n
    for i in range(iters):
        contrib = (
            trans.join(ranks, trans["_src"] == ranks["vertex"])
            .select(F.col("_dst").alias("vertex"),
                    (F.col("rank") * F.col("_p")).alias("_c"))
            .groupBy("vertex")
            .agg(dsum("_c", _RANK_SCALE).alias("_in"))
        )
        # dangling vertices have no out-edges: their mass redistributes
        # uniformly (1-row aggregate, broadcast back — the standard
        # correction; without it total rank leaks every iteration)
        dang = (
            ranks.join(has_out, "vertex", "left_anti")
            .agg(F.coalesce(dsum("rank", _RANK_SCALE), F.lit(0.0))
                 .alias("_dm"))
        )
        ranks = (
            vertices.join(contrib, "vertex", "left")
            .join(F.broadcast(dang))
            .select(
                "vertex",
                (F.lit(teleport)
                 + F.lit(damping)
                 * (F.coalesce("_in", F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n))))
                .alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    # quantize the emitted rank so the output itself is hash-stable
    # (dquant: the engine-identical FLOOR rule — a double→DECIMAL cast
    # rounds the exact expansion on Spark but the shortest repr on
    # DuckDB, divergent at repr ties; round-12 adversarial sweep)
    from data_eng_taxi_ibis_dagster_spark.functions.exact import dquant

    return ranks.select(
        "vertex",
        dquant("rank", _RANK_SCALE).alias("rank"),
    )


def cooccurrence_edges(docs: DataFrame, tokens_col, *,
                       min_count: int = 2) -> DataFrame:
    """Undirected token co-occurrence edges from adjacent token pairs
    (window = 1, the TextRank construction): explode each document's
    consecutive pairs, count, emit both directions. The edge relation
    is vocabulary², but in practice count-filtered to the observed
    pairs — one explode + one aggregate, corpus-bounded shuffle."""
    pairs = docs.select(
        F.explode(
            F.zip_with(
                tokens_col,
                F.slice(tokens_col, 2, F.greatest(
                    F.size(tokens_col) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("u"), b.alias("v")),
            )
        ).alias("p")
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    # canonicalize each adjacent pair to (min, max) BEFORE counting so
    # "x y" and "y x" occurrences merge; min_count then applies to the
    # true undirected co-occurrence count, not a per-direction split
    counted = (
        # zip_with pads to the longer side: the final element pairs with
        # NULL — drop it (and self-loops)
        pairs.filter(F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_count)
    )
    return (
        counted.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionByName(
            counted.select(F.col("v").alias("src"), F.col("u").alias("dst"),
                           "w"))
    )
