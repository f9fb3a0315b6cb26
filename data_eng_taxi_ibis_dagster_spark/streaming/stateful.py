"""Custom stateful streaming operator (E14): per-user running spend via
``applyInPandasWithState``.

This is the escape hatch for operators the built-in windowed
aggregations can't express: arbitrary per-key state with explicit
timeout control. State here is one float + one count per user —
constant per key, the only kind of state that survives 100 TB of
events (the watermark/timeout bounds the key universe held in the
store).

Batch-equivalence contract: run over the full (static) backlog with
availableNow, the final per-user state must equal the batch groupBy
aggregate — asserted in tests/test_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_purchases long, total_spend double"
# State carries INTEGER cents (the exact-sum quantization), so the
# field type must be long: round 11's multi-batch harness
# (scripts/stateful_scale.py) found that storing a Python int into a
# DOUBLE state field comes back NULL from the state store on the NEXT
# micro-batch — invisible to every availableNow single-file run, where
# state is written but never read back.
STATE_SCHEMA = "n long, total_cents long"


def _split_fields(schema: str) -> list[tuple[str, str]]:
    """``"n long, hashes array<string>"`` → ``[("n","long"), ...]`` —
    top-level comma split (angle brackets nest) then one name/type
    cut."""
    fields, depth, cur = [], 0, []
    for ch in schema:
        depth += ch in "<(["
        depth -= ch in ">)]"
        if ch == "," and depth == 0:
            fields.append("".join(cur)); cur = []
        else:
            cur.append(ch)
    fields.append("".join(cur))
    return [tuple(f.strip().split(None, 1)) for f in fields if f.strip()]


_FLOAT_TYPES = ("double", "float")
_INT_TYPES = ("long", "int", "integer", "short", "byte", "bigint")


def _coerce_state_value(value, ftype: str, fname: str):
    ftype = ftype.strip().lower()
    if ftype in _FLOAT_TYPES:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise TypeError(
                f"state field {fname!r} ({ftype}) got "
                f"{type(value).__name__} {value!r}: only int/float are "
                "coercible to a float-typed state field")
        # THE round-11 failure class: a Python int written into a
        # double state field serializes, then reads back NULL on the
        # next micro-batch.  Coercing here fixes the divergence at the
        # chokepoint instead of relying on per-operator schema
        # discipline.
        return float(value)
    if ftype in _INT_TYPES and isinstance(value, float):
        raise TypeError(
            f"state field {fname!r} ({ftype}) got float {value!r}: "
            "store an int (floats silently truncate or corrupt "
            "integer-typed state)")
    if ftype.startswith("array<") and ftype.endswith(">") \
            and value is not None:
        elem = ftype[len("array<"):-1]
        if elem.strip().lower() in _FLOAT_TYPES + _INT_TYPES:
            return [None if v is None
                    else _coerce_state_value(v, elem, f"{fname}[]")
                    for v in value]
    return value


def checked_update(state: GroupState, schema: str, values: tuple) -> None:
    """Guarded ``state.update``: validate/coerce each Python value
    against the DECLARED state-schema field type before it reaches the
    state store.  Exists because the legacy state store's Python
    serialization does NOT coerce — an int stored into a ``double``
    field comes back NULL on the next micro-batch (found by round 11's
    multi-batch harness), and nothing errors at write time.  This
    chokepoint makes the coercion explicit (int → float for
    float-typed fields, including array elements) and turns the
    remaining mismatches into loud ``TypeError``s at write time, so a
    future operator storing numerics into a double field cannot
    re-import the silent-NULL class (round-12 advisor).  All operators
    in this module route their updates through here."""
    fields = _split_fields(schema)
    if len(values) != len(fields):
        raise TypeError(
            f"state update arity {len(values)} != schema arity "
            f"{len(fields)} for {schema!r}")
    state.update(tuple(
        _coerce_state_value(v, ftype, fname)
        for v, (fname, ftype) in zip(values, fields)))


def _accumulate(n: int, total_cents: int,
                batches: Iterator[pd.DataFrame]) -> tuple[int, int]:
    """Shared accumulation core for BOTH stateful APIs (legacy
    applyInPandasWithState and Spark-4 transformWithStateInPandas) —
    one definition so the twins cannot drift. Spend is summed in
    integer cents so the result is order-exact (same discipline as
    functions.exact.lsum)."""
    for pdf in batches:
        n += len(pdf)
        # positive values: int64 truncation == floor, matching lsum's
        # floor(x*100 + 0.5) quantization
        total_cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
    return n, total_cents


def _emit(user_id, n: int, total_cents: int) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [user_id],
        "n_purchases": [n],
        "total_spend": [total_cents / 100.0],
    })


def _update_user_spend(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Accumulate (count, cent-exact total) per user across micro-batches;
    emit the running state each time the key appears."""
    (user_id,) = key
    n, total_cents = _accumulate(*(state.get if state.exists else (0, 0)),
                                 batches)
    checked_update(state, STATE_SCHEMA, (n, total_cents))
    yield _emit(user_id, n, total_cents)


def running_user_spend(events: DataFrame) -> DataFrame:
    """Stateful per-user purchase accumulator. Works on both a stream
    (incremental state across micro-batches, update mode) and — for the
    equivalence check — a bounded stream consumed with availableNow."""
    purchases = events.filter(events.event_type == "purchase")
    return (
        purchases.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_spend,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` runner needs protobuf
    on the Python side; absent in this container, present in most
    production images. Gate, don't crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def _make_spend_processor():
    """Build the :class:`StatefulProcessor` for the Spark-4 path.
    Module-level (not closed over inside the plan builder) so the
    processor's state-handling logic is unit-testable with a mocked
    handle where the runner's protobuf dependency is absent — the class
    itself imports fine without protobuf; only executing the
    ``transformWithStateInPandas`` runner needs it."""
    from pyspark.sql.streaming import StatefulProcessor

    class _SpendProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("spend", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total_cents = _accumulate(
                *(self._state.get() if self._state.exists() else (0, 0)),
                rows)
            checked_update(self._state, STATE_SCHEMA, (n, total_cents))
            yield _emit(key[0], n, total_cents)

        def close(self) -> None:
            pass

    return _SpendProcessor()


def running_user_spend_tws(events: DataFrame) -> DataFrame:
    """The same accumulator on Spark 4's arbitrary-state API
    (``transformWithStateInPandas`` + ``StatefulProcessor``): typed
    ValueState instead of a tuple blob, explicit init/close lifecycle,
    and (unused here) timers and TTL — the forward path for custom
    stateful operators. Semantics are identical to
    :func:`running_user_spend` — both paths run through the shared
    :func:`_accumulate`/:func:`_emit` core, so the twins cannot drift;
    requires protobuf at runtime (:func:`tws_available`)."""
    purchases = events.filter(events.event_type == "purchase")
    return (
        purchases.groupBy("user_id")
        .transformWithStateInPandas(
            _make_spend_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Stateful KMV: continuous approximate-distinct with CONSTANT per-key
# state — the sketch family's custom-stateful-operator leg
# ---------------------------------------------------------------------------

KMV_K = 256
KMV_OUTPUT_SCHEMA = "day timestamp, sketch_size long, est_users double"
KMV_STATE_SCHEMA = "hashes array<string>"


def _update_day_uniques(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Pool the day's stored bottom-k hash sample with the batch's
    hashes, re-select the bottom k, emit the running distinct
    estimate. State is ≤ KMV_K hashes per day BY CONSTRUCTION —
    unlike a distinct-count accumulator (whose state grows with user
    cardinality), the sketch makes continuous uniques safe at any
    scale: merge(state, batch) ≡ sketch(everything seen), the
    operators/kmv exactness argument applied incrementally."""
    from data_eng_taxi_ibis_dagster_spark.operators.kmv import (
        estimate_from_hashes,
    )

    (day,) = key
    pooled = set(state.get[0]) if state.exists else set()
    for pdf in batches:
        pooled.update(pdf["h"])
    bottom = sorted(pooled)[:KMV_K]
    checked_update(state, KMV_STATE_SCHEMA, (bottom,))
    yield pd.DataFrame({
        "day": [day],
        "sketch_size": [len(bottom)],
        "est_users": [estimate_from_hashes(bottom, k=KMV_K)],
    })


def running_daily_uniques(events: DataFrame) -> DataFrame:
    """Continuous per-day distinct-user estimates via a stateful KMV
    sketch. The hash runs JVM-side (``operators/kmv.kmv_hash`` — the
    same md5 selection the batch sketch uses, so stream and batch see
    the same sample); only the ≤k-element bottom-k maintenance crosses
    into Python. Both emitted columns are monotone per day (the
    sample only grows toward k; the kth minimum only falls), so the
    last/update-mode-max emission per day IS the final state — the
    batch-equivalence contract ``test_stateful`` pins against
    ``kmv_sketch`` + ``kmv_estimate`` over the full backlog."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.kmv import kmv_hash

    keyed = events.filter(F.col("user_id").isNotNull()).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        kmv_hash(F.col("user_id")).alias("h"),
    )
    return (
        keyed.groupBy("day")
        .applyInPandasWithState(
            _update_day_uniques,
            outputStructType=KMV_OUTPUT_SCHEMA,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Stateful CMS: continuous heavy hitters with CONSTANT per-key state —
# the frequency sketch's custom-stateful-operator leg (the KMV twin
# above is the distinct sketch's)
# ---------------------------------------------------------------------------

CMS_N_CANDIDATES = 32
CMS_OUTPUT_SCHEMA = ("source string, rank long, token string, "
                     "est_count long")
CMS_STATE_SCHEMA = ("ckeys array<string>, cvals array<long>, "
                    "ctoks array<string>, cbins array<string>")


def _update_heavy_hitters(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Add the batch's (seed, bin) occurrences into the stored CMS
    counter grid, then re-rank a BOUNDED candidate list (stored
    candidates ∪ the batch's tokens) by their current min-over-seeds
    estimate and keep the top ``CMS_N_CANDIDATES``. State is ≤
    depth·width counters + N candidates per key BY CONSTRUCTION —
    where a true frequency table's state grows with vocabulary, the
    sketch caps it at the parameters (the CMS+heap classic; Cormode-
    Muthukrishnan). Counter updates are pure additions, so the stored
    grid equals the batch ``cms_sketch`` grid over everything seen,
    bit-for-bit — the additivity contract ``test_stateful`` pins.
    Candidate semantics are the standard sketch-heap ones: a token
    enters the list only in a batch where it appears (estimates only
    grow, so established heavy hitters never fall out to lighter
    ones)."""
    (source,) = key
    if state.exists:
        ckeys, cvals, ctoks, cbins = state.get
        counters = dict(zip(ckeys, cvals))
        cand: dict[str, str] = dict(zip(ctoks, cbins))
    else:
        counters, cand = {}, {}
    for pdf in batches:
        for (seed, bin_), grp in pdf.groupby(["seed", "bin"]):
            counters[f"{seed}|{bin_}"] = (
                counters.get(f"{seed}|{bin_}", 0) + len(grp))
        for tok, grp in pdf.groupby("tok"):
            if tok not in cand:
                by_seed = grp.drop_duplicates("seed").sort_values("seed")
                # store explicit seed|bin pairs: deriving the seed back
                # from enumerate order would silently misalign (and
                # break the >=-truth guarantee) if the depth ever
                # passed 10 or the seed naming changed
                cand[tok] = ",".join(
                    f"{s}|{b}" for s, b in
                    zip(by_seed["seed"], by_seed["bin"]))

    def est(tok: str) -> int:
        return min(counters.get(sb, 0) for sb in cand[tok].split(","))

    top = sorted(cand, key=lambda t: (-est(t), t))[:CMS_N_CANDIDATES]
    cand = {t: cand[t] for t in top}
    checked_update(state, CMS_STATE_SCHEMA,
                   (list(counters), [counters[k] for k in counters],
                    list(cand), [cand[t] for t in cand]))
    yield pd.DataFrame({
        "source": [source] * len(top),
        "rank": list(range(1, len(top) + 1)),
        "token": top,
        "est_count": [est(t) for t in top],
    })


def running_heavy_hitters(docs: DataFrame) -> DataFrame:
    """Continuous per-source heavy-hitter tokens via a stateful
    count-min sketch. The binning runs JVM-side (``operators/cms.
    cms_bin`` — the same md5-prefix selection the batch sketch uses,
    so stream and batch land in identical bins); Python maintains only
    the bounded counter grid and candidate list. The last update-mode
    emission per source reads off a grid equal to ``cms_sketch`` over
    the full backlog — pinned in ``test_stateful`` against the batch
    grid AND the batch ``cms_lookup`` estimates for the emitted
    tokens."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.cms import (
        CMS_DEPTH, CMS_HEX_DIGITS, _seeds, cms_bin,
    )
    from data_eng_taxi_ibis_dagster_spark.operators.text import tokens

    toks = docs.select(
        "source", F.explode(tokens("text")).alias("tok"))
    keyed = toks.select(
        "source", "tok",
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("seed"),
                     cms_bin(F.col("tok"), s,
                             hex_digits=CMS_HEX_DIGITS).alias("bin"))
            for s in _seeds(CMS_DEPTH)])).alias("_e"),
    ).select("source", "tok", "_e.seed", "_e.bin")
    return (
        keyed.groupBy("source")
        .applyInPandasWithState(
            _update_heavy_hitters,
            outputStructType=CMS_OUTPUT_SCHEMA,
            stateStructType=CMS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Stateful quantile-histogram: continuous percentiles with CONSTANT
# per-key state — completes the stateful sketch family (value state =
# running_user_spend, distinct = KMV, frequency = CMS, quantile = here)
# ---------------------------------------------------------------------------

QS_WIDTH = 1
QS_PCTS = (50, 95, 99)
QS_OUTPUT_SCHEMA = ("event_type string, n_rows long, "
                    "p50 long, p95 long, p99 long")
QS_STATE_SCHEMA = "bins array<long>, counts array<long>"


def _qs_read(counts: dict[int, int], pct: int) -> int:
    """Lower-bound PERCENTILE_DISC read off a bin→count map — the
    Python twin of ``operators/qsketch.sketch_quantiles``' pure-integer
    rule (smallest bin whose cumulative count satisfies
    ``100·cum ≥ p·total``), shared grid semantics so the stream's
    emissions equal the batch read bit-for-bit."""
    total = sum(counts.values())
    cum = 0
    for b in sorted(counts):
        cum += counts[b]
        if 100 * cum >= pct * total:
            return b * QS_WIDTH
    raise AssertionError("unreachable: pct <= 100 and total > 0")


def _update_value_quantiles(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Add the batch's bin counts into the stored fixed-grid histogram
    and emit the running p50/p95/p99 lower bounds. State is ≤
    value_range/width bins per key BY CONSTRUCTION (the qsketch
    parameter bound) — where an exact-percentile accumulator's state
    grows with distinct values, the grid caps it at the parameter.
    Counter updates are pure additions, so the stored grid equals the
    batch ``histogram_sketch`` over everything seen, bit-for-bit —
    the additivity contract ``test_stateful`` pins."""
    (event_type,) = key
    counts: dict[int, int] = (
        dict(zip(*state.get)) if state.exists else {})
    for pdf in batches:
        for b, grp in pdf.groupby("bin"):
            counts[int(b)] = counts.get(int(b), 0) + len(grp)
    checked_update(state, QS_STATE_SCHEMA,
                   (list(counts), [counts[b] for b in counts]))
    total = sum(counts.values())
    yield pd.DataFrame({
        "event_type": [event_type],
        "n_rows": [total],
        **{f"p{p}": [_qs_read(counts, p)] for p in QS_PCTS},
    })


def running_value_quantiles(events: DataFrame) -> DataFrame:
    """Continuous per-type value percentiles via a stateful
    quantile-histogram sketch. Binning runs JVM-side with the SAME
    grid expression the batch sketch uses
    (``floor(value / QS_WIDTH)`` — operators/qsketch.histogram_sketch),
    so stream and batch land in identical bins; Python maintains only
    the bounded grid. The last update-mode emission per type reads off
    a grid equal to the batch sketch over the full backlog — pinned in
    ``test_stateful`` against ``histogram_sketch`` +
    ``sketch_quantiles``."""
    from pyspark.sql import functions as F

    keyed = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") / F.lit(QS_WIDTH)).cast("long")
        .alias("bin"),
    )
    return (
        keyed.groupBy("event_type")
        .applyInPandasWithState(
            _update_value_quantiles,
            outputStructType=QS_OUTPUT_SCHEMA,
            stateStructType=QS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
