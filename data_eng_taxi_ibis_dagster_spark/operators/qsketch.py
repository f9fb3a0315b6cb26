"""Mergeable quantile-histogram sketch — the percentile companion of
the HLL rollup pattern (``sketch_rollup_uniques``): persist per-slice
fixed-grid histograms as DATA, roll any union of slices up by adding
counts, and read lower-bound PERCENTILE_DISC quantiles off the merged
grid — never re-scanning raw rows.

Why this shape at 100 TB: a histogram over a fixed quantization grid
is the simplest sketch whose merge is EXACT (counts are additive —
``merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)`` bit-for-bit, any
partitioning, any order), so unlike t-digest/KLL the rollup introduces
no merge-order nondeterminism — the property the strict differential
harness needs, and the property that makes per-day sketch columns safe
to re-aggregate forever. The accuracy knob is the grid ``width``: the
estimate is the true quantile's bin lower bound, off by < ``width``;
with ``width`` at the data's native quantization (integer grids) the
estimate IS percentile_disc exactly — the sketch's exact regime,
pinned externally by ``quantile_sketch_exact_audit``.

Scale shape: a sketch is ≤ ``value_range / width`` rows per group — a
PARAMETER bound (like HLL's lgK), not corpus-scaling. Building it is
one map-side-combined count aggregate; merging is another; the
quantile read runs windows over the bounded grid only. Nothing in the
pipeline holds state proportional to the corpus.

Reference basis: the reference's quantile surface is single-node exact
aggregation (DuckDB ``quantile_disc``); this module re-expresses it as
the distributable two-level sketch the same queries need at cluster
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram_sketch(df: DataFrame, value: Column, *, width: int,
                     group_cols: list[str] | None = None) -> DataFrame:
    """Build the sketch relation ``(*group_cols, _qs_bin, _qs_n)``:
    per-group counts over the fixed grid ``bin = floor(value/width)``.
    NULL values are dropped (standard SQL aggregate semantics —
    ``percentile_disc`` ignores NULLs). One map-side-combined
    aggregate; emit is ≤ groups × (range/width) rows.

    The grid width is stamped into ``_qs_bin``'s column METADATA
    (``{"qs_width": width}``) so downstream reads can resolve it from
    the relation itself instead of trusting the caller to repeat the
    literal (a mismatched width silently rescales every quantile).
    Metadata rides the schema through aggregation and parquet
    round-trips, and costs nothing physical."""
    group_cols = group_cols or []
    return (
        df.filter(value.isNotNull())
        .groupBy(*group_cols,
                 F.floor(value / F.lit(width)).cast("long")
                 .alias("_qs_bin", metadata={"qs_width": width}))
        .agg(F.count(F.lit(1)).alias("_qs_n"))
    )


def merge_sketches(sk: DataFrame,
                   group_cols: list[str] | None = None) -> DataFrame:
    """Roll sketches up to coarser groups (day→month, month→all-time)
    by ADDING counts per bin — exact by construction, so rolled-up
    quantiles are identical to single-pass quantiles over the union
    (the property ``quantile_sketch_rollup``'s strict oracle pins:
    Spark merges per-month sketches, DuckDB bins the raw table once,
    the grids hash-match)."""
    group_cols = group_cols or []
    return (sk.groupBy(*group_cols, "_qs_bin")
            .agg(F.sum("_qs_n").alias("_qs_n")))


def sketch_quantiles(sk: DataFrame, pcts: list[int], *,
                     width: int | None = None,
                     group_cols: list[str] | None = None,
                     est_name: str = "est_lo",
                     n_name: str = "n_rows") -> DataFrame:
    """Read lower-bound PERCENTILE_DISC quantiles off a sketch:
    for each integer percent ``p``, the smallest bin whose cumulative
    count satisfies ``100·cum ≥ p·total`` (pure-integer comparison —
    bit-identical across engines, no float rank arithmetic), scaled
    back to the value domain (``bin · width`` = the quantile's bin
    lower bound; exact when ``width`` matches the data's quantization).

    Emits ``(*group_cols, pct, est_lo, n_rows)``. Every window here
    runs over the SKETCH grid — ≤ range/width rows per group by the
    sketch parameter contract — never over corpus rows. The windows
    partition by ``_qs_g_<i>`` RENAMES of the caller's group columns
    (restored on output): the plan lint whitelists the ``_qs_``
    namespace generically as grid-bounded, and keying the bound to
    operator-owned names means a caller's own window over raw corpus
    rows partitioned by the same business column is still flagged
    (a bare ``(l_returnflag,)`` whitelist entry would have laundered
    it).

    ``width`` resolves from the sketch's own ``_qs_bin`` metadata
    (stamped by :func:`histogram_sketch`, preserved by merges and
    parquet round-trips); passing it explicitly is allowed but must
    AGREE with the stamp — a silent mismatch would rescale every
    quantile by the wrong factor (round-8 advisor finding)."""
    meta = sk.schema["_qs_bin"].metadata or {}
    stamped = meta.get("qs_width")
    if width is None:
        if stamped is None:
            raise ValueError(
                "sketch_quantiles: no width given and the sketch "
                "carries no qs_width metadata on _qs_bin — rebuild it "
                "with histogram_sketch or pass width explicitly")
        width = int(stamped)
    elif stamped is not None and int(stamped) != width:
        raise ValueError(
            f"sketch_quantiles: width={width} contradicts the sketch's "
            f"own grid (qs_width={int(stamped)}) — quantiles would be "
            f"rescaled by the wrong factor")
    group_cols = group_cols or []
    gmap = {g: f"_qs_g_{i}" for i, g in enumerate(group_cols)}
    sk = sk.select(
        *[F.col(g).alias(gmap[g]) for g in group_cols],
        "_qs_bin", "_qs_n")
    grp = list(gmap.values())
    w_cum = (Window.partitionBy(*grp).orderBy("_qs_bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = (Window.partitionBy(*grp)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    c = (sk.withColumn("_qs_cum", F.sum("_qs_n").over(w_cum))
         .withColumn("_qs_total", F.sum("_qs_n").over(w_tot)))
    aggs = [
        F.min(F.when(F.col("_qs_cum") * 100
                     >= F.lit(p) * F.col("_qs_total"),
                     F.col("_qs_bin"))).alias(f"_qs_p{p}")
        for p in pcts
    ]
    row = (c.groupBy(*grp)
           .agg(*aggs, F.max("_qs_total").alias("_qs_nr"))
           # Global read over an EMPTY sketch: groupBy().agg() still
           # emits one all-NULL row — drop it so the empty corpus reads
           # as an empty result, consistent with the grouped path.
           .filter(F.col("_qs_nr").isNotNull()))
    stack = ", ".join(f"{p}, _qs_p{p}" for p in pcts)
    return (
        row.select(
            *grp,
            F.expr(f"stack({len(pcts)}, {stack}) AS (pct, _qs_bin)"),
            F.col("_qs_nr"),
        )
        .select(
            *[F.col(gmap[g]).alias(g) for g in group_cols],
            F.col("pct").cast("long").alias("pct"),
            (F.col("_qs_bin") * F.lit(width)).cast("long").alias(est_name),
            F.col("_qs_nr").cast("long").alias(n_name),
        )
    )
