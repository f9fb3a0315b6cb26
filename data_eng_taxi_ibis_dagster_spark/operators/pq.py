"""Product quantization for billion-scale vector search.

PQ (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 33(1)) splits each d-dim vector into
``m`` subvectors, vector-quantizes every subspace against its own
``k``-entry codebook, and stores only the ``m`` code bytes — a
d·4-byte float row becomes ``m`` bytes (32× at d=64, m=8), which is
what makes a 100 TB embedding corpus fit the memory/IO budget of a
nearest-neighbor scan. Search reconstructs (or table-looks-up) the
quantized vector and scores it against the query in full precision.

Spark-first shape — the codebook is a *DataFrame* ``(sub, code,
cvec)``, never a corpus-sized artifact:

* **train** — either per-subspace Lloyd (``train_codebooks_lloyd``:
  E-step row-local against broadcast-literal centroids, M-step ONE
  shuffle bounded by k·d cells — the same discipline as
  ``similarity.lloyd_assignments``), or the lossless "identity"
  codebook of distinct subvectors (``train_codebooks_exact``) used by
  the strict audit: reconstruction is then bit-exact, so the whole
  encode→reconstruct→score pipeline is provably equal to brute force.
* **encode** — slice row-locally, broadcast-join the codebook per
  subspace, ``min_by`` the nearest centroid: corpus×m compact rows
  through a broadcast hash join, one ``groupBy(id)`` shuffle to
  reassemble the code array. No all-pairs stage anywhere.
* **search** — reconstruct row-locally from the broadcast codebook,
  then exact sequential-fold cosine against the broadcast query set +
  per-query window top-k (``WindowGroupLimit`` prunes to k per
  partition). Mathematically identical to ADC with a full-precision
  lookup table, but keeps the 64-dim dot product a single sequential
  fold — bit-compatible with DuckDB ``list_dot_product`` so the audit
  twin hash-matches.

At 100 TB: codebook is m·k rows (broadcast, KBs); encode shuffles
corpus×m rows of (id, sub, code) — 1/32nd the byte volume of the raw
vectors; search scans the *codes* relation and reconstructs inside
codegen, so the scan cost is the compressed size. Raising m or k
changes only the broadcast and the literal sizes, never the shuffle
key-space shape.

Parity note: reference repo has no vector ops (SURVEY.md §2a
"explicitly absent"); this is EXT row E11 (BASELINE.json north star:
similarity search for LLM data pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_eng_taxi_ibis_dagster_spark.operators.similarity import (
    as_double,
    cosine,
    cosine_topk,
    squared_l2,
)


def subvector(vec: Column, *, sub: Column | int, m: int, dim: int) -> Column:
    """Slice subspace ``sub`` (0-based) out of a ``dim``-dim vector."""
    d = dim // m
    s = F.lit(sub) if isinstance(sub, int) else sub
    return F.slice(vec, s * d + 1, d)


def explode_subvectors(df: DataFrame, *, vec_col: str = "embedding",
                       id_col: str = "vec_id", m: int = 8,
                       dim: int = 64) -> DataFrame:
    """Long-form ``(_id, sub, subvec)`` relation: row-local slice +
    posexplode — corpus×m compact rows, no shuffle."""
    v = as_double(vec_col)
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.array(*[
            subvector(v, sub=s, m=m, dim=dim) for s in range(m)
        ])).alias("sub", "subvec"),
    )


def train_codebooks_exact(df: DataFrame, *, vec_col: str = "embedding",
                          id_col: str = "vec_id", m: int = 8,
                          dim: int = 64) -> DataFrame:
    """Lossless "identity" codebook: one centroid per DISTINCT
    subvector per subspace, codes assigned by lexicographic rank of
    the subvector (deterministic in both engines — Spark array
    ordering and DuckDB list ordering are both elementwise).

    This is the audit configuration: encode→reconstruct round-trips
    bit-exactly, pinning the production encode/reconstruct/score
    machinery to a brute-force SQL oracle. (It is also the correct
    codebook when a subspace's value set is genuinely small — e.g.
    int8-quantized or one-hot-ish dimensions.)"""
    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        grouped_rank,
    )
    longf = explode_subvectors(df, vec_col=vec_col, id_col=id_col,
                               m=m, dim=dim)
    distinct = longf.select("sub", F.col("subvec").alias("cvec")).distinct()
    # Per-sub lexicographic rank WITHOUT a per-sub window over the
    # whole distinct relation (for continuous floats that is
    # corpus-sized): grouped_rank range-buckets each subspace by the
    # subvector's FIRST element and ranks within (sub, bucket), with
    # the full array as the tiebreak — ordering by (cvec[0], cvec) ≡
    # ordering by cvec, so codes are identical to the naive window.
    # The codebook relation can still be corpus-sized for continuous
    # floats (this remains the audit/small-value-set configuration —
    # production is train_codebooks_lloyd's m·k output), but no single
    # task sees more than ≈ |distinct|/(m·buckets) rows.
    ranked = grouped_rank(
        distinct, ["sub"], F.element_at("cvec", 1).cast("double"),
        F.col("cvec"), name="_code1")
    return ranked.select(
        "sub", (F.col("_code1") - 1).cast("int").alias("code"), "cvec")


def train_codebooks_lloyd(df: DataFrame, *, vec_col: str = "embedding",
                          id_col: str = "vec_id", m: int = 8,
                          dim: int = 64, k: int = 16,
                          iters: int = 3) -> DataFrame:
    """Per-subspace Lloyd, all m subspaces in ONE DataFrame loop.

    E-step: row-local argmin against the full m·k centroid table
    inlined as a literal array of structs, pre-filtered to the row's
    subspace — whole-stage codegen, no join. M-step: one shuffle of
    m·k·(d/m) = k·d cells (``davg`` exact-decimal means, partition-
    order-independent), then a k·d-cell collect — the only driver
    traffic, bounded regardless of corpus size. Seeds: the k
    lowest-id rows' subvectors per subspace; empty clusters keep
    their previous centroid. Deterministic end-to-end."""
    from data_eng_taxi_ibis_dagster_spark.functions.exact import davg

    d = dim // m
    longf = explode_subvectors(df, vec_col=vec_col, id_col=id_col,
                               m=m, dim=dim).localCheckpoint(eager=True)
    seed_rows = (longf.filter(F.col("_id").isNotNull())
                 .orderBy("_id").limit(k * m)  # k lowest ids × m subs
                 .collect())
    books: dict[int, list[list[float]]] = {s: [] for s in range(m)}
    for r in sorted(seed_rows, key=lambda r: (r["sub"], r["_id"])):
        if len(books[r["sub"]]) < k:
            books[r["sub"]].append(list(r["subvec"]))
    # corpora smaller than k seed fewer centroids — shrink k instead of
    # indexing past the seed list in the M-step merge
    k = min([k] + [len(b) for b in books.values()])
    books = {s: b[:k] for s, b in books.items()}
    if k == 0:
        raise ValueError("empty training input for PQ codebooks")

    spark = df.sparkSession
    for _ in range(iters):
        assigned = assign_codes(longf, books)
        cells = (
            assigned.select("sub", "code",
                            F.posexplode("subvec").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(davg("x", 8).alias("mval"))
            .collect()
        )
        new: dict[tuple[int, int], list[float]] = {}
        for row in cells:
            new.setdefault((row["sub"], row["code"]), [0.0] * d)[row["pos"]] \
                = row["mval"]
        books = {
            s: [new.get((s, j), books[s][j]) for j in range(k)]
            for s in range(m)
        }

    rows = [(s, j, books[s][j]) for s in range(m) for j in range(k)]
    return spark.createDataFrame(rows, "sub int, code int, cvec array<double>")


def _centroid_literal(books: dict[int, list[list[float]]]) -> Column:
    """m·k centroids as a literal array of (sub, code, cvec) structs."""
    return F.array(*[
        F.struct(F.lit(s).alias("sub"), F.lit(j).alias("code"),
                 F.array(*[F.lit(float(x)) for x in c]).alias("cvec"))
        for s, cents in books.items() for j, c in enumerate(cents)
    ])


def assign_codes(longf: DataFrame,
                 books: dict[int, list[list[float]]]) -> DataFrame:
    """Row-local E-step over the long-form relation: nearest centroid
    of the row's own subspace, ties toward the lowest code. Pure
    codegen — the centroid table is a plan literal, no join."""
    cands = F.filter(_centroid_literal(books),
                     lambda c: c["sub"] == F.col("sub"))
    dists = F.transform(cands, lambda c: squared_l2(F.col("subvec"), c["cvec"]))
    code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return longf.withColumn("code", code)


def pq_encode(df: DataFrame, codebook: DataFrame, *,
              vec_col: str = "embedding", id_col: str = "vec_id",
              m: int = 8, dim: int = 64) -> DataFrame:
    """Corpus → ``(_id, codes array<int>)``: slice row-locally,
    broadcast-join the codebook within each subspace, keep the nearest
    centroid per (row, sub) via ``min_by``, reassemble with one
    ``groupBy(_id)``. Shuffle volume: corpus×m rows of three ints."""
    longf = explode_subvectors(df, vec_col=vec_col, id_col=id_col,
                               m=m, dim=dim)
    scored = longf.join(F.broadcast(codebook), "sub").select(
        "_id", "sub", "code",
        squared_l2(F.col("subvec"), F.col("cvec")).alias("_dist"),
    )
    per_sub = scored.groupBy("_id", "sub").agg(
        # nearest centroid; deterministic tie-break toward lowest code
        F.min_by(F.col("code"), F.struct(F.col("_dist"), F.col("code")))
        .alias("code"))
    return (
        per_sub.groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code")))
             .alias("_sc"))
        .select("_id", F.transform("_sc", lambda x: x["code"]).alias("codes"))
    )


def pq_reconstruct(codes: DataFrame, codebook: DataFrame) -> DataFrame:
    """``(_id, codes)`` → ``(_id, recon array<double>)``: explode the
    code array, broadcast-join the codebook on (sub, code), reassemble
    subspace slices in order. One groupBy(_id) shuffle of code-sized
    rows; the float payload re-enters only from the broadcast side."""
    longf = codes.select(
        "_id", F.posexplode("codes").alias("sub", "code"))
    joined = longf.join(F.broadcast(codebook), ["sub", "code"])
    return (
        joined.groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cvec")))
             .alias("_sv"))
        .select("_id",
                F.flatten(F.transform("_sv", lambda x: x["cvec"]))
                .alias("recon"))
    )


def _topk_window():
    """The declared result ordering of every PQ-family search: best
    similarity first, lowest match id on ties. (Built lazily — Window
    specs need an active session, and this module imports before one
    exists under pytest collection.)"""
    return Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc())


def _refine_topk(shortlist: DataFrame, queries: DataFrame,
                 corpus: DataFrame, k: int, *, id_col: str,
                 vec_col: str) -> DataFrame:
    """Shared exact-refinement stage (FAISS ``IndexRefineFlat``): the
    |Q|·k·refine shortlist joins the broadcast query vectors and the
    corpus scan on id — full vectors are read once, never shuffled
    corpus-wide — then the declared window re-ranks to the final k.
    One implementation so the three search backends cannot drift."""
    full = corpus.select(F.col(id_col).alias("match_id"),
                         as_double(vec_col).alias("cv"))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   as_double(vec_col).alias("qv")))
    rescored = (
        shortlist.select("query_id", "match_id")
        .join(q, "query_id")  # recover the query vector (broadcast side)
        .join(full, "match_id")
        .select("query_id", "match_id",
                cosine(F.col("qv"), F.col("cv")).alias("cosine_sim"))
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(_topk_window()))
        .filter(F.col("rnk") <= k)
    )


def pq_topk(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
            k: int = 10, *, id_col: str = "vec_id",
            vec_col: str = "embedding", m: int = 8,
            dim: int = 64, refine: int = 1) -> DataFrame:
    """PQ search: encode the corpus against ``codebook``, reconstruct
    row-locally, score full-precision queries against reconstructions
    (sequential-fold cosine — DuckDB-bit-compatible), per-query window
    top-k. Emits (query_id, match_id, cosine_sim, rnk).

    ``refine > 1`` adds the standard refinement stage (the FAISS
    ``IndexRefineFlat`` pattern): shortlist ``k·refine`` candidates by
    quantized score, then re-rank ONLY the shortlist against the
    original full-precision vectors. The expensive full-vector read
    touches |queries|·k·refine rows instead of the corpus — the
    compressed scan does the winnowing, the exact pass fixes the
    ordering, and recall rises steeply with ``refine``.

    With a Lloyd codebook this is classic approximate PQ search (the
    scan reads 1/32nd the bytes); with the exact codebook the
    reconstruction is lossless and the result provably equals brute
    force — the audit configuration."""
    codes = pq_encode(corpus, codebook, vec_col=vec_col, id_col=id_col,
                      m=m, dim=dim)
    recon = pq_reconstruct(codes, codebook)
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")))
    scored = (
        q.crossJoin(recon.select(F.col("_id").alias("match_id"),
                                 F.col("recon")))
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id",
                cosine(F.col("qv"), F.col("recon")).alias("cosine_sim"))
    )
    w = _topk_window()
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k * refine)
    )
    if refine <= 1:
        return shortlist
    return _refine_topk(shortlist, queries, corpus, k,
                        id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists over PQ codes (FAISS IVFPQ shape)
# ---------------------------------------------------------------------------

def coarse_centroids(corpus: DataFrame, *, n_centroids: int = 8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer: the n lowest-id corpus vectors
    (a real deployment trains k-means offline — ``lloyd_assignments``
    — and broadcasts the result; the join shape downstream is
    identical either way)."""
    return F.broadcast(
        corpus.orderBy(id_col).limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"),
                as_double(vec_col).alias("cent")))


def _assign_lists(df: DataFrame, cents: DataFrame, idname: str, *,
                  id_col: str, vec_col: str, topn: int) -> DataFrame:
    """Nearest-``topn`` coarse lists per row: row-relative window over
    the broadcast centroid cross product (groups are n_centroids-sized
    — bounded by construction)."""
    scored = (
        df.select(F.col(id_col).alias(idname),
                  as_double(vec_col).alias("_v"))
        .crossJoin(cents)
        .select(idname, "_v", "centroid_id",
                cosine(F.col("_v"), F.col("cent")).alias("_csim"))
    )
    w = Window.partitionBy(idname).orderBy(
        F.col("_csim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("_crnk", F.row_number().over(w))
        .filter(F.col("_crnk") <= topn)
        .drop("_csim", "_crnk")
    )


def ivfpq_topk(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
               *, n_centroids: int = 8, nprobe: int = 2, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               m: int = 8, dim: int = 64, refine: int = 1) -> DataFrame:
    """IVF-PQ search — the two-axis scale play a 100 TB corpus needs
    BOTH of: the coarse inverted file prunes which fraction of the
    corpus is read (nprobe/n_centroids of the lists), and PQ prunes
    how many bytes each read row costs (m code bytes vs d·4 floats).

    Plan shape: corpus → one coarse list each (bounded window over the
    broadcast centroid product) + PQ codes; the probe join is a plain
    equi-join on ``centroid_id``, so each corpus code row is touched
    only when its list is probed. Candidates are scored against
    row-local reconstructions, then optionally refined against the
    original vectors (``refine``, as in :func:`pq_topk`). Each corpus
    vector lives in exactly one list, so no candidate dedup is needed.

    Audit configuration: ``nprobe = n_centroids`` + the identity
    codebook makes the candidate set the full corpus and the
    reconstruction lossless ⇒ the result is PROVABLY brute force, and
    a brute-force SQL oracle hash-pins the whole pipeline (coarse
    assignment, probe join, encode/decode, re-rank).

    Emits (query_id, match_id, cosine_sim, rnk)."""
    cents = coarse_centroids(corpus, n_centroids=n_centroids,
                             id_col=id_col, vec_col=vec_col)
    lists = _assign_lists(corpus, cents, "match_id",
                          id_col=id_col, vec_col=vec_col, topn=1) \
        .select("match_id", "centroid_id")
    codes = pq_encode(corpus, codebook, vec_col=vec_col, id_col=id_col,
                      m=m, dim=dim).withColumnRenamed("_id", "match_id")
    inv = lists.join(codes, "match_id")  # the inverted file
    probes = _assign_lists(queries, cents, "query_id",
                           id_col=id_col, vec_col=vec_col, topn=nprobe) \
        .withColumnRenamed("_v", "qv")
    # IVF pruning applies to the DECODE stage too: restrict the
    # inverted file to probed lists (bounded ≤ n_centroids-row
    # broadcast semi-join) BEFORE reconstructing, so unprobed rows
    # never pay the decode joins — not just the scoring join
    inv_probed = inv.join(
        F.broadcast(probes.select("centroid_id").distinct()),
        "centroid_id", "left_semi")
    recon = pq_reconstruct(
        inv_probed.select(F.col("match_id").alias("_id"), "codes"),
        codebook).withColumnRenamed("_id", "match_id")
    scored = (
        probes.join(inv_probed.select("match_id", "centroid_id"),
                    "centroid_id")
        .filter(F.col("query_id") != F.col("match_id"))
        .join(recon, "match_id")
        .select("query_id", "match_id",
                cosine(F.col("qv"), F.col("recon")).alias("cosine_sim"))
    )
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(_topk_window()))
        .filter(F.col("rnk") <= k * refine)
    )
    if refine <= 1:
        return shortlist
    return _refine_topk(shortlist, queries, corpus, k,
                        id_col=id_col, vec_col=vec_col)


def write_ivfpq_index(corpus: DataFrame, codebook: DataFrame, path: str,
                      *, n_centroids: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding", m: int = 8,
                      dim: int = 64) -> None:
    """Materialize the inverted file as ``partitionBy(centroid_id)``
    parquet — the storage layout that makes IVF real on a cluster:
    a probe reads ONLY its lists' partitions (Spark partition pruning;
    asserted in tests via ``PartitionFilters``), so search I/O is
    nprobe/n_centroids of the code bytes, which are themselves 32×
    smaller than the raw vectors. The codebook and coarse centroids
    persist as small side tables under the same root."""
    cents = coarse_centroids(corpus, n_centroids=n_centroids,
                             id_col=id_col, vec_col=vec_col)
    lists = _assign_lists(corpus, cents, "match_id",
                          id_col=id_col, vec_col=vec_col, topn=1) \
        .select("match_id", "centroid_id")
    codes = pq_encode(corpus, codebook, vec_col=vec_col, id_col=id_col,
                      m=m, dim=dim).withColumnRenamed("_id", "match_id")
    (lists.join(codes, "match_id")
     .write.mode("overwrite").partitionBy("centroid_id")
     .parquet(f"{path}/lists"))
    codebook.write.mode("overwrite").parquet(f"{path}/codebook")
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def search_ivfpq_index(spark: SparkSession, path: str, queries: DataFrame,
                       *, nprobe: int = 2, k: int = 10,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       probe_ids: list[int] | None = None) -> DataFrame:
    """Search a materialized IVF-PQ index. The probed list ids are
    resolved first (bounded collect: |queries|·nprobe ints) and pushed
    into the scan as a ``centroid_id IN (...)`` partition filter, so
    unprobed partitions are never listed, opened, or read."""
    cents = F.broadcast(spark.read.parquet(f"{path}/centroids"))
    codebook = spark.read.parquet(f"{path}/codebook")
    # materialize once: the probe relation feeds both the probe_ids
    # collect and the search join — without truncation the
    # query-scan + centroid window would execute twice
    probes = _assign_lists(queries, cents, "query_id",
                           id_col=id_col, vec_col=vec_col, topn=nprobe) \
        .withColumnRenamed("_v", "qv").localCheckpoint(eager=True)
    if probe_ids is None:
        probe_ids = [r["centroid_id"] for r in
                     probes.select("centroid_id").distinct().collect()]
    inv = (spark.read.parquet(f"{path}/lists")
           .filter(F.col("centroid_id").isin(probe_ids)))
    recon = pq_reconstruct(
        inv.select(F.col("match_id").alias("_id"), "codes"), codebook) \
        .withColumnRenamed("_id", "match_id")
    scored = (
        probes.join(inv.select("match_id", "centroid_id"), "centroid_id")
        .filter(F.col("query_id") != F.col("match_id"))
        .join(recon, "match_id")
        .select("query_id", "match_id",
                cosine(F.col("qv"), F.col("recon")).alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# ADC kernel: lookup-table scoring over the raw code matrix (numpy)
# ---------------------------------------------------------------------------

def pq_topk_adc(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
                k: int = 10, *, id_col: str = "vec_id",
                vec_col: str = "embedding", m: int = 8, dim: int = 64,
                refine: int = 1) -> DataFrame:
    """Asymmetric-distance PQ search with the classic lookup-table
    kernel (Jégou et al. 2011 §IV-A): per query, an m×k table of
    partial dot products (and one of centroid squared norms) is
    precomputed once, and scoring a corpus row is m table gathers + a
    sum — no per-row arithmetic on vectors at all. The Arrow batch
    form: ``mapInPandas`` over the CODES relation, numpy fancy-indexed
    gathers over the whole batch (LUT[sub, C] for the n×m code matrix
    C), so the inner loop is a handful of BLAS-free vectorized ops per
    batch, not per row.

    Scale shape: the only distributed input is the (id, codes)
    relation — m bytes/row; the LUTs are |Q|·m·k doubles built from
    two bounded collects (codebook m·k rows, probe set |Q| rows —
    the same bounded-probe contract as every brute-force scorer
    here). Each partition emits its local top-(k·refine) per query
    (n_partitions·|Q|·k·refine rows), and one small window finishes
    the global cut; with ``refine`` the exact re-rank restores
    full-precision cosines for the survivors.

    Versus :func:`pq_topk`'s reconstruct-and-fold plan: identical
    candidate semantics, but the scan never materializes a
    reconstructed vector column and never joins — the kernel is the
    throughput path for corpus-scale scans. ADC partial sums use
    numpy's (deterministic) pairwise summation, so results are
    reproducible but not bit-identical to the sequential fold — this
    backend is for rows-only/bench paths; the strict audits pin the
    fold-based twin."""
    import numpy as np
    import pandas as pd

    d = dim // m
    book_rows = codebook.collect()
    kk = 1 + max(r["code"] for r in book_rows)
    cent = np.zeros((m, kk, d), dtype=np.float64)
    for r in book_rows:
        cent[r["sub"], r["code"]] = r["cvec"]
    cent_norm2 = (cent * cent).sum(axis=2)          # m×k
    q_rows = (queries.select(F.col(id_col).alias("qid"),
                             as_double(vec_col).alias("qv")).collect())
    qids = np.array([r["qid"] for r in q_rows])
    Q = np.stack([np.asarray(r["qv"]) for r in q_rows])      # |Q|×dim
    qnorm = np.sqrt((Q * Q).sum(axis=1))                     # |Q|
    # LUT[qi, sub, code] = <q_sub, centroid(sub, code)>
    lut = np.einsum("qsd,skd->qsk", Q.reshape(len(qids), m, d), cent)

    codes = pq_encode(corpus, codebook, vec_col=vec_col, id_col=id_col,
                      m=m, dim=dim)
    shortn = k * refine
    subs = np.arange(m)

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy())            # n×m
            ids = pdf["_id"].to_numpy()
            norm2 = cent_norm2[subs[None, :], C].sum(axis=1)  # n
            denom = np.sqrt(norm2)
            out_q, out_m, out_s = [], [], []
            for qi in range(len(qids)):
                dots = lut[qi][subs[None, :], C].sum(axis=1)  # n
                # zero-norm guard, same contract as similarity.cosine:
                # a zero query or zero reconstruction scores 0.0 (never
                # NaN, which would shortlist nondeterministically)
                d_all = qnorm[qi] * denom
                sim = np.divide(dots, d_all,
                                out=np.zeros_like(dots), where=d_all != 0)
                mask = ids != qids[qi]
                sim_m, ids_m = sim[mask], ids[mask]
                take = min(shortn, len(ids_m))
                if take == 0:
                    continue
                # exact (sim DESC, id ASC) selection, partial-sort
                # cost: partition to the k-th sim value, keep EVERY
                # row tied with it, then lexsort only that subset —
                # argpartition alone would break boundary ties
                # arbitrarily and diverge from the declared ordering
                if take < len(sim_m):
                    kth = np.partition(-sim_m, take - 1)[take - 1]
                    cand = np.nonzero(-sim_m <= kth)[0]
                else:
                    cand = np.arange(len(sim_m))
                order = cand[np.lexsort((ids_m[cand], -sim_m[cand]))][:take]
                out_q.extend([int(qids[qi])] * take)
                out_m.extend(ids_m[order].tolist())
                out_s.extend(sim_m[order].tolist())
            yield pd.DataFrame({
                "query_id": pd.array(out_q, dtype="int64"),
                "match_id": pd.array(out_m, dtype="int64"),
                "cosine_sim": pd.array(out_s, dtype="float64"),
            })

    local = codes.mapInPandas(
        _score, schema="query_id long, match_id long, cosine_sim double")
    shortlist = (local.withColumn("rnk", F.row_number().over(_topk_window()))
                 .filter(F.col("rnk") <= shortn))
    if refine <= 1:
        return shortlist.filter(F.col("rnk") <= k)
    return _refine_topk(shortlist, queries, corpus, k,
                        id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# Three-stage retrieval stack (matryoshka shortlist → PQ re-rank → MaxSim)
# ---------------------------------------------------------------------------

def retrieval_stack(queries: DataFrame, corpus: DataFrame,
                    codebook: DataFrame, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", m: int = 8, dim: int = 64,
                    shortlist: int = 50, pq_keep: int = 15, k: int = 5,
                    facets: int = 4) -> DataFrame:
    """The realistic serving pipeline, composed end-to-end: each stage
    reads less data per candidate than the one before it winnowed.

    1. **Matryoshka shortlist** — brute-force cosine on the first
       ``dim/4`` dims (quarter-width scan; with prefix-pruned storage,
       quarter the scan I/O) keeps ``shortlist`` candidates per query.
    2. **PQ re-rank** — the shortlist's candidate ids semi-join the
       corpus (broadcast — ≤ |Q|·shortlist ids), ONLY those rows are
       encoded/reconstructed against the codebook, and the quantized
       cosine keeps ``pq_keep`` per query. With a Lloyd codebook this
       is the production approximate pass; with the identity codebook
       (``train_codebooks_exact``) reconstruction is lossless and the
       stage provably equals a full-precision re-rank — the audit
       configuration, same trick as ``similarity_pq_audit``.
    3. **MaxSim final** — the survivors are scored with the
       late-interaction rule over ``facets`` sliced token-vectors of
       the ORIGINAL full-precision embeddings (fixed-order CASE-pivot
       sum, so no nondeterministic float reduction), and the declared
       window emits the final top-``k``.

    Scale shape: stage 1 is the only corpus-wide scan and it reads
    prefix bytes; stages 2-3 touch ≤ |Q|·shortlist rows, reached via
    broadcast semi-joins on candidate ids — the corpus full-width
    vectors are read only for those rows. No corpus-wide shuffle
    anywhere; every window partitions by query_id with ≤ shortlist
    rows per group.

    Emits (query_id, match_id, maxsim, rnk); ordering is
    (maxsim DESC, match_id ASC) per query."""
    prefix = dim // 4
    fw = dim // facets
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   as_double(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("match_id"),
                      as_double(vec_col).alias("cv"))

    # stage 1: quarter-width shortlist — the shared brute-force top-k
    # operator on prefix-sliced vectors (same broadcast × scan shape,
    # same (sim DESC, id ASC) tie-break, WindowGroupLimit thinning);
    # tests/test_pq.py asserts the stack's shortlist equals exactly
    # this call, so share the code instead of mirroring it.
    short = cosine_topk(
        queries.select(id_col, F.slice(as_double(vec_col), 1, prefix)
                       .alias(vec_col)),
        corpus.select(id_col, F.slice(as_double(vec_col), 1, prefix)
                      .alias(vec_col)),
        k=shortlist, id_col=id_col, vec_col=vec_col,
    ).select("query_id", "match_id")

    # stage 2: PQ re-rank of the candidate union only
    cand = short.select(F.col("match_id").alias(id_col)).distinct()
    sub = corpus.join(F.broadcast(cand), id_col, "left_semi")
    recon = pq_reconstruct(
        pq_encode(sub, codebook, vec_col=vec_col, id_col=id_col,
                  m=m, dim=dim),
        codebook).withColumnRenamed("_id", "match_id")
    pq_scored = (
        short.join(q, "query_id")
        .join(recon, "match_id")
        .select("query_id", "match_id",
                cosine(F.col("qv"), F.col("recon")).alias("sim_pq"))
    )
    w_pq = Window.partitionBy("query_id").orderBy(
        F.col("sim_pq").desc(), F.col("match_id").asc())
    keep = (pq_scored.withColumn("prnk", F.row_number().over(w_pq))
            .filter(F.col("prnk") <= pq_keep)
            .select("query_id", "match_id"))

    # stage 3: MaxSim late interaction over the survivors. `keep`
    # appears ONCE (broadcast against the corpus relation — the join
    # restricts c to the ≤ |Q|·pq_keep survivor rows before the facet
    # explode); a separate distinct/semi-join branch would re-execute
    # stages 1-2 a second time for the same restriction.
    qs = q.select(
        "query_id",
        F.posexplode(F.array(*[F.slice("qv", s * fw + 1, fw)
                               for s in range(facets)])).alias("qsub", "qsv"))
    cs = (
        F.broadcast(keep).join(c, "match_id")
        .select("query_id", "match_id",
                F.explode(F.array(*[F.slice("cv", s * fw + 1, fw)
                                    for s in range(facets)])).alias("csv"))
    )
    # ONE aggregate: per-facet conditional maxes (MAX is exact and
    # order-independent, so folding the per-(q,m,qsub) max and the
    # facet pivot into a single groupBy is bit-identical to the
    # two-aggregate form) summed in fixed facet order — one exchange
    # on (query_id, match_id) instead of two chained ones.
    sim = cosine(F.col("qsv"), F.col("csv"))
    facet = [F.max(F.when(F.col("qsub") == s, sim)).alias(f"_f{s}")
             for s in range(facets)]
    maxsim = F.col("_f0")
    for s in range(1, facets):
        maxsim = maxsim + F.col(f"_f{s}")
    scored = (
        cs.join(F.broadcast(qs), "query_id")
        .groupBy("query_id", "match_id")
        .agg(*facet)
        .select("query_id", "match_id", maxsim.alias("maxsim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )
