"""Mergeable k-minimum-values (KMV) distinct sketch — the
INTERSECTABLE companion of the HLL rollup pattern
(``sketch_rollup_uniques``) and the quantile-histogram sketch
(operators/qsketch): persist the k smallest distinct content hashes
per slice as DATA, roll any union of slices up by re-selecting the k
smallest over the pooled arrays, and — the capability HLL lacks —
estimate set INTERSECTIONS (returning users, audience overlap,
cross-split contamination) directly from two sketches' hash samples
(Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD 2007).

Why this shape at 100 TB: a KMV sketch is a bottom-k order-statistics
sample of a uniform hash space. Its merge is EXACT by construction —
the k smallest hashes of A ∪ B are a subset of (k smallest of A) ∪
(k smallest of B), so ``merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)``
bit-for-bit under any partitioning and any merge order, the same
determinism contract the strict differential harness needs from the
quantile sketch. The estimator has a built-in EXACT REGIME: while a
slice's distinct count stays below ``k`` the sketch holds the entire
hash set, so distinct counts, unions, and intersections read off it
are exact — which is what makes the registered queries strictly
oracle-able (the ``quantile_sketch_exact_audit`` width-1 trick, (c)
in the family's audit pattern). Beyond the regime the reads degrade
gracefully to the (k−1)/frac(kth-min) estimator with ~1/sqrt(k)
relative error, fuzz-pinned in ``tests/test_operators.py``.

Scale shape: a sketch is ≤ ``k`` hashes per group — a PARAMETER
bound, not corpus-scaling. Building one is a distinct aggregate
(map-side combined) followed by a rank-limited window that Spark
executes with WindowGroupLimit: every map partition pre-thins to its
own k smallest BEFORE the shuffle, so the post-shuffle group is
≤ k·n_partitions rows at any corpus size. Merging pools
|fine groups|·k array elements, never raw rows; set-operation reads
are array expressions over two ≤k arrays.

Portability: the hash is md5 hex (``kmv_hash``). Lexicographic order
on the fixed-width lowercase hex string IS numeric order of the
128-bit value, and DuckDB's ``md5()`` renders identically, so a SQL
oracle reproduces the sketch's selection literally — the same
engine-parity argument as the winnowing fingerprints
(operators/dedup.winnow_fingerprints), unlike the engine-private
xxhash64.

Reference basis: the reference's distinct-count surface is a
single-node exact ``COUNT(*)`` observability probe
(``/root/reference/taxi_pipeline_native.py:47``); this module
re-expresses distinct accounting as the persist-and-merge sketch
columns an incremental 100 TB pipeline needs, plus the intersection
reads no union-only sketch can serve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Hex digits of the hash used by the estimator's fraction — 13
#: nibbles = 52 bits, exactly representable in a double, and
#: ``conv``-safe (no int64 overflow: 16^13 < 2^53).
_FRAC_HEX = 13
_FRAC_DEN = float(16 ** _FRAC_HEX)


def kmv_hash(value: Column) -> Column:
    """Portable 128-bit content hash as lowercase hex. String-cast
    first so BIGINT keys render identically in Spark and the SQL
    oracle (decimal digits, no locale/float formatting)."""
    return F.md5(value.cast("string"))


def _hash_frac(h: Column) -> Column:
    """Map a hex hash to its position in [0, 1): the leading 52 bits
    as a double. Pure-integer ``conv`` then one division — no float
    parsing of the full 128-bit value."""
    return (F.conv(F.substring(h, 1, _FRAC_HEX), 16, 10).cast("double")
            / F.lit(_FRAC_DEN))


def _collect_bottom_k(distinct_hashes: DataFrame, group_cols: list[str],
                      k: int) -> DataFrame:
    """(group..., _kmv_h) distinct-hash rows → (group..., _kmv) sorted
    bottom-k arrays. The rank window partitions by the operator-owned
    ``_kmv_g_<i>`` renames (callers' business columns never inherit
    the lint exemption) and its ``row_number ≤ k`` filter is the
    WindowGroupLimit trigger — map-side pre-thin to k rows per group
    per partition, the plan shape ``test_scale_plans`` pins."""
    gmap = {g: f"_kmv_g_{i}" for i, g in enumerate(group_cols)}
    d = distinct_hashes.select(
        *[F.col(g).alias(gmap[g]) for g in group_cols], "_kmv_h")
    w = (Window.partitionBy(*[gmap[g] for g in group_cols])
         .orderBy("_kmv_h"))
    topk = (d.withColumn("_kmv_rn", F.row_number().over(w))
            .filter(F.col("_kmv_rn") <= k))
    return (topk.groupBy(*[gmap[g] for g in group_cols])
            .agg(F.sort_array(F.collect_list("_kmv_h"))
                 .alias("_kmv", metadata={"kmv_k": k}))
            .select(*[F.col(gmap[g]).alias(g) for g in group_cols],
                    "_kmv"))


def kmv_sketch(df: DataFrame, value: Column, *, k: int,
               group_cols: list[str] | None = None) -> DataFrame:
    """Build the sketch relation ``(*group_cols, _kmv)``: per group,
    the sorted array of the k lexicographically-smallest distinct
    md5 hashes of ``value``. NULLs are dropped (COUNT DISTINCT
    semantics). ``k`` is stamped into ``_kmv``'s column metadata
    (``{"kmv_k": k}``) so merges and reads resolve the parameter from
    the relation itself instead of trusting callers to repeat it —
    the qsketch width-stamp contract."""
    group_cols = list(group_cols or [])
    d = (df.filter(value.isNotNull())
         .select(*group_cols, kmv_hash(value).alias("_kmv_h"))
         .distinct())
    return _collect_bottom_k(d, group_cols, k)


def _resolve_k(sk: DataFrame, k: int | None) -> int:
    meta = sk.schema["_kmv"].metadata or {}
    stamped = meta.get("kmv_k")
    if k is None:
        if stamped is None:
            raise ValueError(
                "kmv: no k given and the sketch carries no kmv_k "
                "metadata on _kmv — rebuild it with kmv_sketch or "
                "pass k explicitly")
        return int(stamped)
    if stamped is not None and int(stamped) != k:
        raise ValueError(
            f"kmv: k={k} contradicts the sketch's own parameter "
            f"(kmv_k={int(stamped)}) — estimates would be scaled by "
            "the wrong factor")
    return k


def merge_kmv(sk: DataFrame, group_cols: list[str] | None = None, *,
              k: int | None = None) -> DataFrame:
    """Roll sketches up to coarser groups (day→week, week→all-time)
    by pooling the arrays and re-selecting the bottom k — exact by
    construction (the k smallest of a union are among the union of
    each side's k smallest), so rolled-up reads are identical to
    single-pass sketches over the union. Input is |fine groups|·k
    array elements, never raw rows."""
    group_cols = list(group_cols or [])
    k = _resolve_k(sk, k)
    pooled = (sk.select(*group_cols,
                        F.explode("_kmv").alias("_kmv_h"))
              .distinct())
    return _collect_bottom_k(pooled, group_cols, k)


def kmv_estimate(sketch: Column, *, k: int) -> Column:
    """Distinct-count read off one sketch array. Exact regime: a
    sketch holding fewer than k hashes has seen the WHOLE hash set,
    so the count is its size. Otherwise the classic bottom-k
    order-statistics estimator ``(k−1)/frac(kth smallest)``: the kth
    of n uniform points sits at ≈ k/n of the space. ``F.get`` is
    0-based and NULL-safe (no ANSI out-of-bounds error on the unused
    branch)."""
    n = F.size(sketch)
    kth = F.get(sketch, F.lit(k - 1))
    return F.when(n < F.lit(k), n.cast("double")).otherwise(
        F.lit(float(k - 1)) / _hash_frac(kth))


def estimate_from_hashes(hashes: list[str], *, k: int) -> float:
    """Driver/Python-side twin of :func:`kmv_estimate` for a
    materialized sorted bottom-k list (the stateful streaming
    operator's per-key state, ``streaming/stateful.py``). One
    definition of the fraction math (``_FRAC_HEX``/``_FRAC_DEN``)
    shared with the Column form so the twins cannot drift: in the
    exact regime both return the integer sketch size; beyond it both
    read (k−1)/frac(kth smallest) off the same leading 52 bits."""
    if len(hashes) < k:
        return float(len(hashes))
    return float(k - 1) / (int(hashes[k - 1][:_FRAC_HEX], 16) / _FRAC_DEN)


def kmv_intersect_estimate(a: Column, b: Column, *, k: int) -> Column:
    """|A ∩ B| read off two same-k sketches (Beyer et al. 2007): pool
    both samples; if the pooled union holds fewer than k hashes the
    whole union was seen and the intersection size is exact;
    otherwise take τ = the pooled kth-smallest hash (below τ the pool
    IS the union's bottom-k sample), ρ = the fraction of that sample
    present in both sides, and return ρ · (k−1)/frac(τ) — the Jaccard
    scaled by the union estimate. Degenerates bit-for-bit to the
    exact intersection count in the exact regime, so the strict
    queries run THIS expression, not a separate exact path — drift in
    the estimator's pooling or threshold logic breaks their hash
    match."""
    pooled = F.array_sort(F.array_union(a, b))
    nu = F.size(pooled)
    inter = F.array_intersect(a, b)
    tau = F.get(pooled, F.lit(k - 1))
    in_both_le_tau = F.size(F.filter(inter, lambda h: h <= tau))
    union_est = F.lit(float(k - 1)) / _hash_frac(tau)
    return F.when(nu < F.lit(k), F.size(inter).cast("double")).otherwise(
        in_both_le_tau.cast("double") / F.lit(float(k)) * union_est)


def kmv_difference_estimate(a: Column, b: Column, *, k: int) -> Column:
    """|A \\ B| read off two same-k sketches — the set-DIFFERENCE
    member of the family (|A \\ B| = |A ∪ B| − |A ∩ B| − |B \\ A|; like
    :func:`kmv_intersect_estimate` it reads the pooled bottom-k sample
    directly rather than differencing two independently-noisy reads):
    pool both samples; if the pooled union holds fewer than k hashes
    the whole union was seen and the difference is exact; otherwise
    τ = the pooled kth-smallest hash (below τ the pool IS the union's
    bottom-k sample), ρ = the fraction of that sample present in A but
    not B, and return ρ · (k−1)/frac(τ). Degenerates bit-for-bit to
    the exact difference count in the exact regime, so strict queries
    run THIS expression — drift in the pooling or threshold logic
    breaks their hash match (Beyer et al. 2007, same construction)."""
    pooled = F.array_sort(F.array_union(a, b))
    nu = F.size(pooled)
    only_a = F.array_except(a, b)
    tau = F.get(pooled, F.lit(k - 1))
    in_diff_le_tau = F.size(F.filter(only_a, lambda h: h <= tau))
    union_est = F.lit(float(k - 1)) / _hash_frac(tau)
    return F.when(nu < F.lit(k), F.size(only_a).cast("double")).otherwise(
        in_diff_le_tau.cast("double") / F.lit(float(k)) * union_est)
