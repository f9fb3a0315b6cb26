"""Hand-built bloom runtime filter (the big-small join pre-filter).

Spark's optimizer injects bloom runtime filters only under its own
heuristics (and ``bloom_filter_agg`` is not SQL-registered in 4.x), so
this operator makes the technique explicit and auditable: build a
fixed-size bitmap from the selective build side's keys, probe it
ROW-LOCALLY on the probe side before any shuffle, then exact-join the
survivors. False positives are removed by the exact join, so results
are identical to the plain join — the bloom stage only changes how
many probe rows reach the shuffle.

Scale shape: the bitmap build is explode → word-indexed ``bit_or``
aggregate — the shuffle carries at most m/64 rows (the BITMAP size,
independent of build-key count), and the collected artifact is O(m)
bytes (16 KiB at the default m), the same bounded-driver-artifact
class as k-means centroids. The probe is a codegen'd bit test against
a broadcast-literal array: the 100 TB fact side is filtered before it
ever shuffles, which is the entire point of a runtime filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bitmap size in bits (power of two) and number of hash probes.
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 3


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64 with distinct salts."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


#: 2^i as a long for i in 0..63 (PySpark's shiftleft only takes a
#: literal int shift, so bit masks for a *column* shift come from this
#: lookup; 1 << 63 wraps to long min, which is the correct sign bit).
def _bit_mask(shift: Column) -> Column:
    powers = F.array(*[
        F.lit((1 << i) - (1 << 64 if i == 63 else 0)).cast("long")
        for i in range(64)
    ])
    return F.element_at(powers, shift.cast("int") + 1)


def build_bloom(keys: DataFrame, key_col: str, *,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> list[int]:
    """Aggregate the build side into an m-bit bloom bitmap, returned as
    m/64 longs. Distributed cost: one explode (k rows per key) plus a
    ``bit_or`` aggregate keyed on the word index — the exchange carries
    ≤ m/64 rows no matter how many keys the build side has."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k)))
        .alias("p"))
    words = (
        pos.select((F.col("p") / 64).cast("int").alias("w"),
                   _bit_mask(F.col("p") % 64).alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def might_contain(bitmap: list[int], key: Column, *,
                  m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> Column:
    """Row-local bloom membership test against the literal bitmap: all
    k probed bits set. Pure codegen bit math — no join, no shuffle."""
    lit_map = F.array(*[F.lit(w) for w in bitmap])
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(lit_map, (p / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_mask(p % 64)) != 0)
    return cond
