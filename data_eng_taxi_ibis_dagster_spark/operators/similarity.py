"""Embedding similarity search (EXT E11): exact cosine top-k as the
verifiable baseline, sign-random-projection LSH as the scale path.

Vector math is expressed with ``zip_with`` / ``aggregate`` higher-order
functions — JVM-evaluated, no UDF, and the sequential left-fold matches
DuckDB's ``list_dot_product`` *bit-for-bit* (verified empirically), so
the exact path is strictly oracle-checkable.

Scale shape: queries are the small side and are broadcast; candidates
stream. Exact top-k is one broadcast-NL join + per-query window — at
100 TB the LSH variant prunes candidates to matching hyperplane-sign
buckets first, turning the scan into an equi-join on bucket signature.
The hyperplanes themselves are data-independent and *derived from
hashes* (no RNG, no fitted model to ship), so the operator stays a pure
DataFrame transform — deterministic across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: str | Column) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, TOTAL over the embedding domain: a zero-norm
    side (the all-zero vector, or one whose squared components all
    underflow to 0 — IEEE-identical across engines) yields 0.0 instead
    of 0/0.  Without the guard, one poison row in a trillion-row corpus
    kills the whole job under ANSI mode (DIVIDE_BY_ZERO) and yields
    engine-dependent NaN ordering otherwise — caught by the round-12
    adversarial fixture sweep (zero vector planted in embeddings).

    ``try_divide`` + ``coalesce`` rather than a CASE guard: the CASE
    form referenced the denominator twice, and the norm folds are
    higher-order-function expressions outside codegen's subexpression
    elimination — the fold ran twice per pair (a measured 1.35× on
    cosine_topk).  try_divide evaluates its operands once and yields
    NULL exactly on a zero divisor; for nonzero norms the division is
    the identical IEEE op."""
    return F.coalesce(
        F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b)), F.lit(0.0))


def sql_cosine(a: str, b: str) -> str:
    """DuckDB rendering with the identical operation order, including
    the identical zero-norm guard (see :func:`cosine`)."""
    denom = (
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
    )
    return (
        f"COALESCE(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) "
        f"/ NULLIF({denom}, 0), 0.0)"
    )


def cosine_with_norms(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """Precomputed-norm cosine with the same zero-norm guard as
    :func:`cosine` — one fold (the dot) per pair instead of three;
    bit-identical to the naive expression for nonzero norms."""
    return F.coalesce(F.try_divide(dot(va, vb), na * nb), F.lit(0.0))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: broadcast queries × corpus scan,
    per-query window top-k (WindowGroupLimit keeps only k rows per
    query per partition). Emits (query_id, match_id, cosine_sim, rnk)."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("match_id"), as_double(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id",
                cosine(F.col("qv"), F.col("cv")).alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# LSH (sign random projection) — the ANN scale path
# ---------------------------------------------------------------------------

def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    xxhash64(plane, dim) scaled. Data-independent, reproducible, and
    computable inside codegen — no model artifact to distribute."""
    h = F.xxhash64(F.lit(plane), F.lit(dim))
    return (h.cast("double") / F.lit(float(2 ** 63)))


#: plane index → evaluated [component]*dim, memoized per process.
_PLANE_CACHE: dict[tuple[int, int], list[float]] = {}


def _plane_array(plane: int, dim: int) -> Column:
    """The full hyperplane as ONE array literal. The components are
    constants (xxhash64 of two literals), but leaving them as 64
    expression subtrees per plane made Catalyst ANALYSIS the dominant
    cost of every SRP plan — ~25 s/side at 8 tables × 4 planes, paid
    again by every test that re-builds the query (round-9 suite
    profile). Evaluating the family once per process through a 1-row
    job and inlining ``F.lit(values)`` collapses each plane to a
    single Literal node — IDENTICAL values (same xxhash64, same
    scaling, evaluated by the same engine), so signatures, buckets,
    and results are bit-for-bit unchanged; only analysis cost moves.
    Falls back to the expression form when no session is active."""
    key = (plane, dim)
    if key not in _PLANE_CACHE:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        if spark is None:
            return F.array(*[_plane_component(plane, d)
                             for d in range(dim)])
        row = spark.range(1).select(*[
            _plane_component(plane, d).alias(f"c{d}")
            for d in range(dim)]).collect()[0]
        _PLANE_CACHE[key] = [row[f"c{d}"] for d in range(dim)]
    return F.lit(_PLANE_CACHE[key])


def srp_signature(vec: Column, *, num_planes: int, dim: int,
                  table: int = 0) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane
    (sign of <v, plane>), packed into a long. ``table`` offsets the
    plane index space so multiple independent hash tables come from one
    deterministic plane family."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = table * num_planes + p
        proj = F.aggregate(
            F.zip_with(
                vec,
                _plane_array(plane, dim),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return sig


def ann_topk_srp(queries: DataFrame, corpus: DataFrame, k: int = 10, *,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 num_planes: int = 4, dim: int = 64,
                 num_tables: int = 8) -> DataFrame:
    """Approximate cosine top-k: ``num_tables`` independent SRP hash
    tables; candidates = corpus vectors sharing a bucket with the query
    in ANY table (union via stack + distinct), then exact cosine + top-k
    over candidates only. Recall rises with tables, cost with bucket
    size — both knobs are explicit. Emits (query_id, match_id,
    cosine_sim, rnk)."""

    def with_sigs(df: DataFrame, idname: str) -> DataFrame:
        v = as_double(vec_col)
        return df.select(
            F.col(id_col).alias(idname),
            v.alias(f"_v_{idname}"),
            *[
                srp_signature(v, num_planes=num_planes, dim=dim, table=t)
                .alias(f"sig{t}")
                for t in range(num_tables)
            ],
        )

    q = with_sigs(queries, "query_id")
    c = with_sigs(corpus, "match_id")
    q_stacked = q.select(
        "query_id", f"_v_query_id",
        F.stack(F.lit(num_tables),
                *[x for t in range(num_tables) for x in (F.lit(t), F.col(f"sig{t}"))])
        .alias("table", "bucket"),
    )
    c_stacked = c.select(
        "match_id", f"_v_match_id",
        F.stack(F.lit(num_tables),
                *[x for t in range(num_tables) for x in (F.lit(t), F.col(f"sig{t}"))])
        .alias("table", "bucket"),
    )
    cands = (
        q_stacked.join(c_stacked, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", "_v_query_id", "_v_match_id")
        .dropDuplicates(["query_id", "match_id"])
    )
    scored = cands.select(
        "query_id", "match_id",
        cosine(F.col("_v_query_id"), F.col("_v_match_id")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


#: Target expected rows per centroid block when ``n_blocks`` is
#: derived from the corpus (n_blocks ≈ n / this): bounds per-block
#: pair work at ~TARGET²/2 comparisons independent of corpus size.
COSINE_BLOCK_TARGET_ROWS = 256


def cosine_threshold_pairs_blocked(df: DataFrame, threshold: float, *,
                                   id_col: str = "vec_id",
                                   vec_col: str = "embedding",
                                   n_blocks: int | None = None) -> DataFrame:
    """EXACT cosine threshold self-join (all pairs with cosine ≥
    ``threshold``) without broadcasting or cross-joining the corpus.

    Scale shape: the naive form broadcasts the full table against itself
    (broadcast side grows with the corpus — dies first at 100 TB). Here:

    1. ``n_blocks`` deterministic centroids (lowest-id vectors) are
       broadcast; every vector is assigned to its angularly-nearest
       centroid (row-local argmax over B cosines, no shuffle).
    2. Per-block angular radius ``r = max θ(v, centroid)`` — one tiny
       B-row aggregate.
    3. Block-pair pruning by the spherical triangle inequality:
       ``θ(a,b) ≥ θ(c_x,c_y) − r_x − r_y`` for a∈x, b∈y, so any block
       pair whose lower bound exceeds ``arccos(threshold)`` cannot hold
       a qualifying pair and is dropped — with NO false negatives, so
       the result is bit-identical to the all-pairs form.
    4. Candidates flow through two shuffle equi-joins on the block-pair
       key; per-task memory is bounded by block size, never corpus size.

    Worst case (one giant block) degenerates to distributed all-pairs —
    still an equi-join, not a broadcast. Emits (vec_a, vec_b,
    cosine_sim) with ``vec_a < vec_b``.

    The K-SCALING CONTRACT (round-9 verdict #3): raising ``n_blocks``
    IS this operator's salt — expected block size is n/n_blocks, so k
    must grow WITH the corpus or the blocked join quietly degenerates
    to O(n²). When ``n_blocks`` is None (the default, and what the
    registered query uses) it is derived at plan build from the corpus
    count: ``max(8, ceil(n / COSINE_BLOCK_TARGET_ROWS))`` — one
    O(1)-result count() action at build (the Lloyd-training precedent:
    quantizer sizing is the offline half), after which expected
    per-block pair work is a CONSTANT ~TARGET²/2 regardless of corpus
    size and total pair work grows linearly with surviving block
    pairs. ``tests/test_order_rank.py::test_cosine_block_k_scaling``
    pins the derivation and the non-degeneracy on a 10×-gate corpus.
    Passing an explicit ``n_blocks`` (tests, tuned deployments)
    bypasses the count.
    """
    if n_blocks is None:
        import math
        n_blocks = max(8, math.ceil(df.count() / COSINE_BLOCK_TARGET_ROWS))
    theta_max = F.acos(F.lit(float(threshold)))  # qualifying angular cap
    clamp = lambda c: F.greatest(F.lit(-1.0), F.least(F.lit(1.0), c))

    # one materialization, many readers: the centroid probe, the
    # assignment scan, and both join sides all consume this relation
    vecs = df.select(F.col(id_col).alias("_id"),
                     as_double(vec_col).alias("_v")).localCheckpoint(eager=False)
    centroids = F.broadcast(
        vecs.orderBy("_id").limit(n_blocks)
        .select(F.col("_id").alias("_cid"), F.col("_v").alias("_cv"))
    )

    # 1. nearest-centroid assignment + angle to it (row-local over B)
    scored = vecs.crossJoin(centroids).select(
        "_id", "_v", "_cid",
        F.acos(clamp(cosine(F.col("_v"), F.col("_cv")))).alias("_ang"),
    )
    w = Window.partitionBy("_id").orderBy(F.col("_ang").asc(), F.col("_cid").asc())
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        # Precompute the L2 norm once per vector: the pairwise stage then
        # pays ONE fold (the dot) per pair instead of three. dot/(na*nb)
        # is the same float expression the naive cosine evaluates, so the
        # output stays bit-identical to the all-pairs oracle.
        .select("_id", "_v", F.col("_cid").alias("_block"), "_ang",
                l2_norm(F.col("_v")).alias("_n"))
    )

    # 2. per-block angular radius (B rows)
    radii = assigned.groupBy("_block").agg(F.max("_ang").alias("_r"))

    # 3. directional block-pair list, triangle-inequality pruned (≤ B²
    #    rows). The ε absorbs acos round-off, which is AMPLIFIED near
    #    θ≈0 (d/dx acos = -1/sin θ): a ~1e-13 cosine fold error on a
    #    tight near-duplicate block becomes ~1e-7 in angle space, so ε
    #    must sit well above that — 1e-6 of slack costs essentially no
    #    pruning power (block-pair angles are O(1)) and preserves the
    #    zero-false-negative guarantee.
    cx = centroids.select(F.col("_cid").alias("_bx"), F.col("_cv").alias("_cvx"))
    cy = centroids.select(F.col("_cid").alias("_by"), F.col("_cv").alias("_cvy"))
    pairs = (
        cx.crossJoin(cy)
        .select("_bx", "_by",
                F.acos(clamp(cosine(F.col("_cvx"), F.col("_cvy")))).alias("_tcc"))
        .join(F.broadcast(radii.select(F.col("_block").alias("_bx"),
                                       F.col("_r").alias("_rx"))), "_bx")
        .join(F.broadcast(radii.select(F.col("_block").alias("_by"),
                                       F.col("_r").alias("_ry"))), "_by")
        .filter(F.col("_tcc") - F.col("_rx") - F.col("_ry")
                <= theta_max + F.lit(1e-6))
        .select("_bx", "_by")
    )

    # 4. equi-join candidates through the pair list, exact re-check
    a = assigned.select(F.col("_id").alias("vec_a"), F.col("_v").alias("_va"),
                        F.col("_n").alias("_na"), F.col("_block").alias("_bx"))
    b = assigned.select(F.col("_id").alias("vec_b"), F.col("_v").alias("_vb"),
                        F.col("_n").alias("_nb"), F.col("_block").alias("_by"))
    return (
        a.join(F.broadcast(pairs), "_bx")
        .join(b, "_by")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                cosine_with_norms(F.col("_va"), F.col("_vb"),
                                  F.col("_na"), F.col("_nb"))
                .alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def squared_l2(a: Column, b: Column) -> Column:
    """Sequential-fold squared euclidean distance between two vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lloyd_assignments(df: DataFrame, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", k: int = 4,
                      iters: int = 3) -> DataFrame:
    """The Lloyd E/M loop, returning the post-final-E-step assignment
    relation ``(_id, _v, cluster, _d2)`` — shared by the k-means summary
    query and SemDeDup's cluster-blocked pruning stage (the two
    consumers must agree on assignments, so they share the loop).

    Spark-first shape per iteration:

    * **E-step** — assignment is a row-local ``argmin`` over a
      broadcast-literal centroid array (k·d doubles inlined into the
      plan; no join, no shuffle, whole-stage codegen).
    * **M-step** — new centroids via ``posexplode`` → exact decimal
      mean per (cluster, dim) cell: ONE shuffle bounded by k·d cells
      regardless of corpus size, then a k·d-row collect to the driver
      (the only driver traffic; centroids are intrinsically tiny).

    Determinism: seeds are the k lowest-id vectors, argmin breaks ties
    toward the lowest cluster index, and the decimal M-step is
    partition-order-independent — so repeated runs produce identical
    assignments (asserted in tests) even though float distances keep
    the op out of the strict SQL-oracle class.

    At 100 TB: per-iteration cost is one scan + one k·d-cell shuffle;
    the scan dominates, so cache the assigned frame (or checkpoint
    every few iterations) and raise k·d freely — the M-step keyspace
    is skew-proof by construction.
    """
    from data_eng_taxi_ibis_dagster_spark.functions.exact import davg

    # materialize the normalized vector relation ONCE: the dim/seed
    # probes and every iteration's E-step + M-step action would
    # otherwise each re-run the parquet scan + double-cast (iters + 2
    # corpus scans instead of 1) — the "cache the assigned frame"
    # advice below, applied to the loop-invariant input
    vecs = df.select(F.col(id_col).alias("_id"),
                     as_double(vec_col).alias("_v")).localCheckpoint(eager=True)
    dim = len(vecs.select("_v").first()[0])
    centroids = [r["_v"] for r in vecs.orderBy("_id").limit(k).collect()]

    assigned = None
    for _ in range(iters):
        dists = F.array(*[
            squared_l2(F.col("_v"),
                       F.array(*[F.lit(float(x)) for x in c]))
            for c in centroids
        ])
        cluster = (F.array_position(dists, F.array_min(dists)) - 1
                   ).cast("int")
        assigned = vecs.select(
            "_id", "_v", cluster.alias("cluster"),
            F.array_min(dists).alias("_d2"),  # dist to assigned centroid
        )
        cells = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(davg("x", 8).alias("m"))
            .collect()
        )
        by_cluster: dict[int, list[float]] = {}
        for row in cells:
            by_cluster.setdefault(row["cluster"], [0.0] * dim)[row["pos"]] \
                = row["m"]
        # empty clusters keep their previous centroid
        centroids = [by_cluster.get(j, centroids[j]) for j in range(k)]

    return assigned


def kmeans_lloyd(df: DataFrame, *, vec_col: str = "embedding",
                 id_col: str = "vec_id", k: int = 4,
                 iters: int = 3) -> DataFrame:
    """Fixed-iteration Lloyd k-means summary — the registry's
    representative *iterative* algorithm (driver loop of deterministic
    DataFrame rounds; the class the oracle harness checks rows-only,
    like SGD/PageRank/label-propagation). The E/M loop itself lives in
    :func:`lloyd_assignments`; this wrapper reduces the assignment
    relation to the per-cluster summary."""
    from data_eng_taxi_ibis_dagster_spark.functions.exact import dsum

    assigned = lloyd_assignments(
        df, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"),
             F.min("_id").alias("min_vec_id"),
             # J after the final E-step (distance to the centroids that
             # produced the assignment); decimal-quantized so the sum is
             # partition-order-independent → bit-reproducible output
             dsum("_d2", 6).alias("sse"))
        .select(F.col("cluster").alias("cluster_id"),
                "n_vectors", "min_vec_id", "sse")
    )


def semdedup(df: DataFrame, *, threshold: float = 0.95,
             vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 8, iters: int = 2) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine
    pruning. A vector is dropped when a LOWER-id vector in the SAME
    cluster has cosine ≥ ``threshold`` (deterministic keep-lowest-id
    rule; the paper keeps an arbitrary representative per near-dup
    group — min-id is the reproducible choice of exactly that).

    Scale shape — this is the whole point of the algorithm: pairwise
    comparison happens ONLY inside a cluster, so the self-join is an
    equi-join on ``cluster`` whose per-task cost is bounded by cluster
    size, never corpus size. The E-step is row-local against
    broadcast-literal centroids (:func:`lloyd_assignments`), so the
    full pipeline is: iters × (scan + k·d-cell shuffle) for
    clustering, then ONE equi-join shuffle on the cluster key. At
    100 TB raise k so clusters stay task-sized (the paper uses
    k≈10⁴–10⁵ for web-scale corpora); a degenerate giant cluster
    degrades to a distributed within-key join, never a broadcast.

    Emits one row per vector: ``(vec_id, cluster_id, is_dup,
    dup_of)`` where ``dup_of`` is the lowest qualifying lower-id
    neighbor (NULL for keepers).
    """
    assigned = lloyd_assignments(
        df, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    # Precompute norms once, and checkpoint: this relation feeds the
    # a-side, the b-side, AND the final left join — without truncation
    # each consumer re-runs the full E-step argmin over the corpus.
    vecs = assigned.select(
        "_id", "_v", "cluster", l2_norm(F.col("_v")).alias("_n")
    ).localCheckpoint(eager=False)

    a = vecs.select(F.col("_id").alias("_ida"), F.col("_v").alias("_va"),
                    F.col("_n").alias("_na"), "cluster")
    b = vecs.select(F.col("_id").alias("_idb"), F.col("_v").alias("_vb"),
                    F.col("_n").alias("_nb"), "cluster")
    dup_edges = (
        a.join(b, "cluster")
        .filter(F.col("_idb") < F.col("_ida"))  # only lower-id keepers
        .filter(cosine_with_norms(F.col("_va"), F.col("_vb"),
                                  F.col("_na"), F.col("_nb"))
                >= F.lit(float(threshold)))
        .groupBy(F.col("_ida").alias("_id"))
        .agg(F.min("_idb").alias("dup_of"))
    )
    return (
        vecs.join(dup_edges, "_id", "left")
        .select(F.col("_id").alias("vec_id"),
                F.col("cluster").alias("cluster_id"),
                F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of")
    )


# -- exact covariance sufficient statistics / PCA --------------------------

def quantized_components(vec: str | Column, *, scale: int = 1_000_000) -> Column:
    """Integer-quantized components: ``FLOOR(x·scale + 0.5)`` per
    element — the order-independent exact-sum pattern of
    ``agg_exact_linear_stats`` (plans/aggregates.py) lifted to vectors.
    ``floor(+0.5)`` is round-half-up in Spark AND DuckDB (unlike
    ``round``/``CAST``, whose half-way / truncation semantics differ),
    so both engines see identical integers."""
    return F.transform(
        as_double(vec), lambda x: F.floor(x * scale + F.lit(0.5)))


def covariance_sums(df: DataFrame, *, vec_col: str = "embedding",
                    scale: int = 1_000_000) -> tuple[DataFrame, DataFrame]:
    """Exact integer sufficient statistics of the d×d covariance matrix
    in one corpus pass: ``pairs`` = (i, j, n_vec, sij) for the upper
    triangle 1 ≤ i ≤ j ≤ d with sij = Σ qᵢqⱼ as decimal(38,0), and
    ``dims`` = (i, n_vec, si) with si = Σ qᵢ.

    The O(n·d²) multiply-add kernel runs as an Arrow-batched integer
    GEMM (``QᵀQ`` in int64 numpy per batch) — the dense-linear-algebra
    boundary where a vectorized kernel beats row-expression codegen by
    orders of magnitude (the first JVM formulation exploded n·d²/2
    struct rows through a hash aggregate: 46 s vs ~1 s at sf0.1 for
    d=64). Each batch emits ONE d(d+1)/2-row partial, so the exchange
    carries (#batches)·d²/2 rows regardless of corpus size — partial
    aggregation happens inside the kernel, not the hash map. Exactness
    is unchanged: the quantization ``floor(x·scale + 0.5)`` is the same
    IEEE op in numpy as in SQL, per-batch int64 sums cannot overflow
    (|qᵢqⱼ| ≤ scale² = 10¹², Arrow batches ≤ ~10⁴ rows), and
    cross-batch accumulation is decimal(38,0) — order-independent far
    past 10^12 rows."""
    import numpy as np
    import pandas as pd

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * scale + 0.5).astype(np.int64)
            n, d = q.shape
            g = q.T @ q
            iu, ju = np.triu_indices(d)
            s = q.sum(axis=0)
            yield pd.DataFrame({
                "kind": np.concatenate([np.zeros(len(iu), np.int32),
                                        np.ones(d, np.int32)]),
                "i": np.concatenate([iu + 1, np.arange(1, d + 1)]),
                "j": np.concatenate([ju + 1, np.zeros(d, np.int64)]),
                "n": np.full(len(iu) + d, n, np.int64),
                "v": np.concatenate([g[iu, ju], s]),
            })

    parts = df.select(vec_col).mapInPandas(
        _partials, "kind int, i long, j long, n long, v long")
    pairs = (
        parts.filter(F.col("kind") == 0)
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n_vec"),
             F.sum(F.col("v").cast("decimal(38,0)")).alias("sij"))
    )
    dims = (
        parts.filter(F.col("kind") == 1)
        .groupBy("i")
        .agg(F.sum("n").alias("n_vec"),
             F.sum(F.col("v").cast("decimal(38,0)")).alias("si"))
    )
    return pairs, dims


def pca_top_components(df: DataFrame, *, vec_col: str = "embedding",
                       n_components: int = 2, scale: int = 1_000_000,
                       iters: int = 500) -> tuple[list[list[float]], list[float], list[float]]:
    """Top principal components of the embedding column via power
    iteration with deflation. The DISTRIBUTED work is the single
    covariance-statistics pass of :func:`covariance_sums`; only the
    d×d matrix (d(d+1)/2 + d scalars — a bounded artifact, like
    k-means centroids) ever reaches the driver, where the tiny
    eigen-iteration runs in numpy. Deterministic: fixed start vector
    (uniform 1/√d), fixed iteration count, no RNG.

    Returns (components, eigenvalues, mean) — components are unit
    vectors in original (un-quantized) units."""
    import numpy as np

    pairs, dims = covariance_sums(df, vec_col=vec_col, scale=scale)
    dim_rows = dims.collect()
    d = len(dim_rows)
    n = int(dim_rows[0]["n_vec"])
    s = np.zeros(d)
    for r in dim_rows:
        s[r["i"] - 1] = float(r["si"])
    cov = np.zeros((d, d))
    for r in pairs.collect():
        i, j = r["i"] - 1, r["j"] - 1
        c = (n * float(r["sij"]) - s[i] * s[j]) / (n * n) / (scale * scale)
        cov[i, j] = cov[j, i] = c
    mean = (s / n / scale).tolist()

    comps: list[list[float]] = []
    eigs: list[float] = []
    work = cov.copy()
    for _ in range(n_components):
        v = np.full(d, 1.0 / np.sqrt(d))
        for _ in range(iters):
            v = work @ v
            # re-orthogonalize against found components every step:
            # deflation alone re-admits numerical leakage when the
            # spectral gap is small (random embeddings are nearly
            # isotropic), and Gram-Schmidt keeps it out
            for c in comps:
                cv = np.array(c)
                v = v - (cv @ v) * cv
            v = v / np.linalg.norm(v)
        lam = float(v @ work @ v)
        comps.append(v.tolist())
        eigs.append(lam)
        work = work - lam * np.outer(v, v)
    return comps, eigs, mean
