"""Mergeable count-min sketch (CMS) — the FREQUENCY member of the
sketch-column family (HLL: distinct unions; KMV: distinct set
operations; quantile histogram: percentiles; CMS: per-key counts).
Persist a depth × width grid of counters per slice, merge any union
of slices by ADDING counters (the qsketch additivity contract —
bit-for-bit deterministic under any partitioning/merge order), and
answer "how often does key x occur?" without storing the keys:
``est(x) = min over rows of counter[row][hash_row(x)]`` (Cormode &
Muthukrishnan 2005). Always an overcount (collisions only add), with
``est ≤ true + εN`` at width ≈ e/ε with probability 1−exp(−depth).

Why this shape at 100 TB: the sketch is ≤ depth·width counter rows
per slice — a PARAMETER bound, not vocabulary- or corpus-scaling
(the exact `heavy_hitter_tokens` aggregate's map-side combine is
bounded by |vocab|; the CMS column is what you persist when even the
vocabulary is too big to keep per slice, and what lets yesterday's
token-frequency state merge with today's by pure addition). Building
it is two map-side-combined aggregates: raw rows collapse to
per-slice vocabulary counts first, then the vocabulary explodes over
the depth seed rows into bins — the ×depth blowup touches
vocab-sized data, never raw tokens.

Portability: bins are md5 HEX PREFIXES — ``bin = substr(md5(seed ||
':' || key), 1, hex_digits)``, so width = 16^hex_digits and a DuckDB
oracle reproduces the ENTIRE sketch literally (same winnowing-
fingerprint engine-parity argument). That makes the registered query
strict with NO exact-regime caveat: both engines build the identical
grid, estimates and all — drift in seeding, binning, merge, or the
min-read breaks the hash match. The ε-overcount bound is pinned in
``tests/test_cms.py`` against exact counts.

Reference basis: the reference's frequency surface is the exact
group-by count (``/root/reference/taxi_pipeline_native.py:92-97``);
this module re-expresses it as the bounded-state sketch column a
continuously-ingesting 100 TB pipeline persists per slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default depth (number of independent hash rows). Collision
#: probability of the min-read falls as (vocab/width)^depth.
CMS_DEPTH = 4

#: Default bin width as md5-hex-prefix digits: width = 16^3 = 4096
#: counters per row.
CMS_HEX_DIGITS = 3


def cms_bin(key: Column, seed: str, *, hex_digits: int = CMS_HEX_DIGITS
            ) -> Column:
    """Row-``seed``'s bin for ``key``: the first ``hex_digits`` of
    md5(seed ':' key) — uniform, engine-portable, and width is
    16^hex_digits by construction."""
    return F.substring(F.md5(F.concat(F.lit(seed + ":"), key)),
                       1, hex_digits)


def _seeds(depth: int) -> list[str]:
    return [f"s{i}" for i in range(depth)]


def cms_sketch(df: DataFrame, key: Column, *, depth: int = CMS_DEPTH,
               hex_digits: int = CMS_HEX_DIGITS,
               group_cols: list[str] | None = None) -> DataFrame:
    """Build the sketch relation ``(*group_cols, _cms_seed, _cms_bin,
    _cms_n)``. NULL keys are dropped (COUNT semantics). Stage 1
    collapses raw rows to per-group KEY counts (map-side combined,
    bounded by per-slice vocabulary); stage 2 explodes each key over
    the ``depth`` seed rows and sums counts into bins — so the ×depth
    multiplication happens on vocabulary-sized data. Parameters are
    stamped into ``_cms_bin``'s metadata (``cms_depth``/``cms_hex``)
    so merges and reads resolve them from the relation itself."""
    group_cols = list(group_cols or [])
    counts = (df.filter(key.isNotNull())
              .groupBy(*group_cols, key.alias("_cms_key"))
              .agg(F.count(F.lit(1)).alias("_n")))
    e = counts.select(
        *group_cols, "_n",
        F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("_cms_seed"),
                cms_bin(F.col("_cms_key"), s, hex_digits=hex_digits)
                .alias("_cms_bin"))
            for s in _seeds(depth)])).alias("_e"))
    return (e.groupBy(*group_cols, "_e._cms_seed",
                      F.col("_e._cms_bin").alias(
                          "_cms_bin",
                          metadata={"cms_depth": depth,
                                    "cms_hex": hex_digits}))
            .agg(F.sum("_n").alias("_cms_n")))


def _resolve_params(sk: DataFrame, depth: int | None,
                    hex_digits: int | None) -> tuple[int, int]:
    meta = sk.schema["_cms_bin"].metadata or {}
    sd, sh = meta.get("cms_depth"), meta.get("cms_hex")
    if depth is None:
        if sd is None:
            raise ValueError(
                "cms: no depth given and the sketch carries no "
                "cms_depth metadata on _cms_bin — rebuild it with "
                "cms_sketch or pass depth explicitly")
        depth = int(sd)
    elif sd is not None and int(sd) != depth:
        raise ValueError(
            f"cms: depth={depth} contradicts the sketch's own "
            f"parameter (cms_depth={int(sd)})")
    if hex_digits is None:
        if sh is None:
            raise ValueError(
                "cms: no hex_digits given and the sketch carries no "
                "cms_hex metadata on _cms_bin")
        hex_digits = int(sh)
    elif sh is not None and int(sh) != hex_digits:
        raise ValueError(
            f"cms: hex_digits={hex_digits} contradicts the sketch's "
            f"own parameter (cms_hex={int(sh)})")
    return depth, hex_digits


def merge_cms(sk: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """Roll sketches up to coarser groups by ADDING counters per
    (seed, bin) — exact by construction, so
    ``merge(cms(A), cms(B)) ≡ cms(A ⊎ B)`` bit-for-bit (multiset
    union: counts add). Input is |fine groups|·depth·width rows,
    never raw rows. Metadata rides through the aggregate."""
    group_cols = list(group_cols or [])
    return (sk.groupBy(*group_cols, "_cms_seed", "_cms_bin")
            .agg(F.sum("_cms_n").alias("_cms_n")))


def cms_lookup(sk: DataFrame, probes: DataFrame, probe_col: str, *,
               depth: int | None = None,
               hex_digits: int | None = None,
               est_name: str = "est_count") -> DataFrame:
    """Point-query a (merged, ungrouped) sketch for every probe key:
    each probe emits its ``depth`` (seed, bin) coordinates, joins the
    grid, and takes the MIN counter (absent bins count 0 — only
    possible for keys the sketch never saw). Output: the probe
    relation plus ``est_name``. The probe side is |probes|·depth rows
    — driver/broadcast-scale by contract (top-k lists, watchlists),
    never the corpus.

    Probes are treated as a SET of rows: the closing group-by is over
    the full probe row, so duplicate probe rows collapse to one output
    row (output cardinality = distinct probe rows, not len(probes)).
    Callers that need input cardinality preserved must carry their own
    distinct id column through ``probes`` (it rides along and keeps
    rows apart) — round-9 advisor, documented as the contract.

    The sketch must be UNGROUPED (exactly ``(_cms_seed, _cms_bin,
    _cms_n)``) — enforced, not just documented: a sketch still
    carrying group columns would left-join one row PER GROUP and the
    min would pick the smallest single group's counter, silently
    UNDERCOUNTING (the one direction CMS guarantees never happens);
    merge with :func:`merge_cms` first (round-9 review finding)."""
    extra = set(sk.columns) - {"_cms_seed", "_cms_bin", "_cms_n"}
    if extra:
        raise ValueError(
            f"cms_lookup: sketch still carries group columns "
            f"{sorted(extra)} — the per-group left join would take a "
            f"min over per-group counters and UNDERCOUNT; roll up "
            f"with merge_cms(sk) before the lookup")
    depth, hex_digits = _resolve_params(sk, depth, hex_digits)
    e = probes.select(
        "*",
        F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("_cms_seed"),
                cms_bin(F.col(probe_col), s, hex_digits=hex_digits)
                .alias("_cms_bin"))
            for s in _seeds(depth)])).alias("_e")
    ).select(*probes.columns, "_e._cms_seed", "_e._cms_bin")
    other = [c for c in probes.columns if c != probe_col]
    joined = e.join(sk, ["_cms_seed", "_cms_bin"], "left")
    return (joined.groupBy(probe_col, *other)
            .agg(F.min(F.coalesce(F.col("_cms_n"), F.lit(0)))
                 .alias(est_name)))
