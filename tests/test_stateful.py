"""applyInPandasWithState: the custom stateful operator's final state
must equal the batch aggregate over the same data (update-mode streams
emit one row per key per batch — the LAST row per key is the final
state)."""

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table
from data_eng_taxi_ibis_dagster_spark.streaming.events import read_events_stream
from data_eng_taxi_ibis_dagster_spark.streaming.stateful import running_user_spend


def test_stateful_running_spend_matches_batch(spark, sf_dir):
    stream = running_user_spend(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory").queryName("user_spend")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update mode: keep the last emission per user
    got = (
        spark.table("user_spend")
        .groupBy("user_id")
        .agg(F.max("n_purchases").alias("n_purchases"),
             F.max("total_spend").alias("total_spend"))
        .toPandas().set_index("user_id").sort_index()
    )
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0)
             .alias("total_spend"))
        .toPandas().set_index("user_id").sort_index()
    )
    assert (got.index == want.index).all()
    assert (got["n_purchases"].values == want["n_purchases"].values).all()
    assert (got["total_spend"].values == want["total_spend"].values).all()


def test_stateful_tws_processor_with_mocked_handle():
    """Execute the Spark-4 StatefulProcessor's actual init /
    handleInputRows / close surface against a fake ValueState handle —
    so the transformWithStateInPandas wiring (state get/update tuple
    shapes, emission schema) has an executed assertion even where the
    runner's protobuf dependency is absent."""
    import pandas as pd

    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        _make_spend_processor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            assert isinstance(v, tuple) and len(v) == 2, v
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            # integer cents need a LONG state field: round 11's real
            # multi-batch run showed an int stored into a DOUBLE field
            # reads back NULL from the legacy state store
            assert schema == "n long, total_cents long"
            return self.states.setdefault(name, FakeValueState())

    proc = _make_spend_processor()
    handle = FakeHandle()
    proc.init(handle)
    # micro-batch 1: two purchases for user 7
    out1 = list(proc.handleInputRows(
        (7,), iter([pd.DataFrame({"value": [1.25, 2.50]})]), None))
    assert len(out1) == 1
    row = out1[0].iloc[0]
    assert (row["user_id"], row["n_purchases"], row["total_spend"]) == (7, 2, 3.75)
    # micro-batch 2: state carries — one more purchase accumulates
    out2 = list(proc.handleInputRows(
        (7,), iter([pd.DataFrame({"value": [0.25]})]), None))
    row = out2[0].iloc[0]
    assert (row["n_purchases"], row["total_spend"]) == (3, 4.00)
    assert handle.states["spend"].get() == (3, 400)  # integer cents
    proc.close()


def test_stateful_twins_emit_identically():
    """Drive BOTH stateful APIs' user code over the same micro-batch
    sequence — the legacy ``_update_user_spend`` against a fake
    GroupState and the Spark-4 processor against a fake ValueState
    handle — and assert frame-identical emissions at every step. This
    pins the twin contract itself (not just the shared core) without
    the runner's protobuf dependency."""
    import pandas as pd

    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        _make_spend_processor,
        _update_user_spend,
    )

    class FakeGroupState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            self.state = FakeValueState()
            return self.state

    legacy_state = FakeGroupState()
    proc = _make_spend_processor()
    handle = FakeHandle()
    proc.init(handle)

    batches = [[1.25, 2.50], [0.25], [9.99, 0.01, 3.33]]
    for vals in batches:
        legacy_out = list(_update_user_spend(
            (42,), iter([pd.DataFrame({"value": vals})]), legacy_state))
        tws_out = list(proc.handleInputRows(
            (42,), iter([pd.DataFrame({"value": vals})]), None))
        assert len(legacy_out) == len(tws_out) == 1
        pd.testing.assert_frame_equal(legacy_out[0], tws_out[0])
    assert legacy_state.get == handle.state.get()
    proc.close()


def test_stateful_tws_twin_matches_batch(spark, sf_dir):
    """Spark 4 arbitrary-state API twin (transformWithStateInPandas):
    identical semantics to the applyInPandasWithState path. Skipped
    where the runner's protobuf dependency is absent (this container);
    runs in full production images."""
    import pytest

    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        running_user_spend_tws,
        tws_available,
    )

    if not tws_available():
        # install attempted and impossible: `pip download protobuf`
        # fails at name resolution (no outbound network, verified
        # 2026-08-15) and no wheel exists on the image
        pytest.skip("transformWithStateInPandas needs protobuf (not in container)")

    stream = running_user_spend_tws(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory").queryName("user_spend_tws")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = (
        spark.table("user_spend_tws")
        .groupBy("user_id")
        .agg(F.max("n_purchases").alias("n_purchases"),
             F.max("total_spend").alias("total_spend"))
        .toPandas().set_index("user_id").sort_index()
    )
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0)
             .alias("total_spend"))
        .toPandas().set_index("user_id").sort_index()
    )
    assert (got.index == want.index).all()
    assert (got["n_purchases"].values == want["n_purchases"].values).all()
    assert (got["total_spend"].values == want["total_spend"].values).all()


def test_stateful_daily_uniques_matches_batch_sketch(spark, sf_dir):
    """The stateful KMV's final per-day state must equal the batch
    sketch over the same backlog: same md5 sample (kmv_hash runs
    JVM-side in both paths), same bottom-k, same estimator read
    (estimate_from_hashes is the Column twin's shared definition).
    Both emitted columns are monotone per day, so update-mode max ==
    final state. At fixture scale the sketch sits in its exact regime
    and est_users equals the true distinct count exactly."""
    from data_eng_taxi_ibis_dagster_spark.operators import kmv as K
    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        KMV_K,
        running_daily_uniques,
    )

    stream = running_daily_uniques(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory").queryName("daily_uniques")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = (
        spark.table("daily_uniques")
        .groupBy("day")
        .agg(F.max("sketch_size").alias("sketch_size"),
             F.max("est_users").alias("est_users"))
        .toPandas().set_index("day").sort_index()
    )
    ev = load_table(spark, sf_dir, "events")
    sk = K.kmv_sketch(
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id"),
        F.col("user_id"), k=KMV_K, group_cols=["day"])
    want = (
        sk.select("day", F.size("_kmv").alias("sketch_size"),
                  K.kmv_estimate(F.col("_kmv"), k=KMV_K).alias("est_users"))
        .toPandas().set_index("day").sort_index()
    )
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.countDistinct("user_id").alias("nd"))
        .toPandas().set_index("day").sort_index()
    )
    assert (got.index == want.index).all()
    assert (got["sketch_size"].values == want["sketch_size"].values).all()
    assert (got["est_users"].values == want["est_users"].values).all()
    # exact-regime sanity: the continuous estimate IS the true count
    in_regime = exact["nd"].values < KMV_K
    assert (got["est_users"].values[in_regime]
            == exact["nd"].values[in_regime]).all()


class FakeGroupState:
    """Minimal applyInPandasWithState GroupState double for driving the
    update function with MULTIPLE micro-batches (the single-file
    availableNow integration run below collapses to one batch, which
    would never exercise cross-batch state accumulation)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("no state")
        return self._v

    def update(self, v):
        self._v = v


def test_stateful_heavy_hitters_accumulates_across_batches(spark, sf_dir):
    """Two micro-batches through _update_heavy_hitters must leave a
    counter grid EQUAL to the batch cms_sketch over the union — the
    additivity contract that makes the stream's estimates identical
    to batch reads at any batch boundary."""
    import pandas as pd
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.cms import (
        CMS_DEPTH, CMS_HEX_DIGITS, _seeds, cms_bin, cms_sketch,
    )
    from data_eng_taxi_ibis_dagster_spark.operators.text import tokens
    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        _update_heavy_hitters,
    )

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("source") == "src0"))
    toks = docs.select("source", F.explode(tokens("text")).alias("tok"))
    keyed = toks.select(
        "tok",
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("seed"),
                     cms_bin(F.col("tok"), s,
                             hex_digits=CMS_HEX_DIGITS).alias("bin"))
            for s in _seeds(CMS_DEPTH)])).alias("_e"),
    ).select("tok", "_e.seed", "_e.bin").toPandas()
    # split into two "micro-batches" by row parity
    state = FakeGroupState()
    half = len(keyed) // 2
    # keep (tok, seed) groups intact within a batch split by slicing on
    # sorted tok so candidate bin capture sees every seed of a token
    keyed = keyed.sort_values(["tok", "seed"]).reset_index(drop=True)
    out = None
    for batch in (keyed.iloc[:half], keyed.iloc[half:]):
        out = list(_update_heavy_hitters(
            ("src0",), iter([batch]), state))[-1]
    ckeys, cvals, ctoks, cbins = state._v
    got = dict(zip(ckeys, cvals))
    want_rows = cms_sketch(toks, F.col("tok")).collect()
    want = {f"{r['_cms_seed']}|{r['_cms_bin']}": r["_cms_n"]
            for r in want_rows}
    assert got == want, "stream counter grid != batch cms_sketch grid"
    # emitted estimates must be >= true counts (CMS never undercounts)
    truth = dict(toks.groupBy("tok").count().collect())
    for t, e in zip(out["token"], out["est_count"]):
        assert e >= truth[t], (t, e, truth[t])


def test_stateful_heavy_hitters_stream_matches_batch(spark, sf_dir):
    """availableNow run over the documents backlog: every emitted
    (source, token) estimate must equal the batch cms_lookup read off
    the same-source batch grid, and each source's true top-1 token
    must be among its emitted candidates."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.cms import (
        cms_lookup, cms_sketch,
    )
    from data_eng_taxi_ibis_dagster_spark.operators.text import tokens
    from data_eng_taxi_ibis_dagster_spark.streaming.events import (
        read_documents_stream,
    )
    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        running_heavy_hitters,
    )

    stream = running_heavy_hitters(read_documents_stream(spark, sf_dir))
    q = (stream.writeStream.format("memory").queryName("hh")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("hh").toPandas()
    assert len(got) > 0
    # keep the LAST emission per (source, rank): later batches override
    got = got.drop_duplicates(["source", "rank"], keep="last")

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens("text")).alias("tok"))
    # one batch-side grid+lookup per source costs ~2 s; three sources
    # pin the contract without doubling the suite's streaming bill
    checked = sorted(got["source"].unique())[:3]
    for source, grp in got[got["source"].isin(checked)].groupby("source"):
        grid = (cms_sketch(
            toks.filter(F.col("source") == source), F.col("tok")))
        probes = spark.createDataFrame(
            [(t,) for t in grp["token"]], "token string")
        est = {r["token"]: r["est_count"]
               for r in cms_lookup(grid, probes, "token").collect()}
        for t, e in zip(grp["token"], grp["est_count"]):
            assert est[t] == e, (source, t, est[t], e)
        top1 = (toks.filter(F.col("source") == source)
                .groupBy("tok").count()
                .orderBy(F.desc("count"), "tok").first()["tok"])
        assert top1 in set(grp["token"]), (source, top1)


def test_stateful_quantiles_accumulate_across_batches(spark, sf_dir):
    """Two micro-batches through _update_value_quantiles must leave a
    grid EQUAL to the batch histogram_sketch over the union, and the
    emitted percentiles must equal the sketch_quantiles read off it —
    the additivity + shared-integer-rule contracts."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.qsketch import (
        histogram_sketch, sketch_quantiles,
    )
    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        QS_PCTS, QS_WIDTH, _update_value_quantiles,
    )

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase"))
    keyed = ev.filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value") / F.lit(QS_WIDTH)).cast("long")
        .alias("bin")).toPandas()
    state = FakeGroupState()
    half = len(keyed) // 2
    out = None
    for batch in (keyed.iloc[:half], keyed.iloc[half:]):
        out = list(_update_value_quantiles(
            ("purchase",), iter([batch]), state))[-1]
    bins, counts = state._v
    got = dict(zip(bins, counts))
    want_rows = histogram_sketch(ev, F.col("value"),
                                 width=QS_WIDTH).collect()
    want = {r["_qs_bin"]: r["_qs_n"] for r in want_rows}
    assert got == want, "stream grid != batch histogram_sketch grid"
    reads = sketch_quantiles(
        histogram_sketch(ev, F.col("value"), width=QS_WIDTH),
        list(QS_PCTS)).collect()
    batch_est = {r["pct"]: r["est_lo"] for r in reads}
    for p in QS_PCTS:
        assert out[f"p{p}"][0] == batch_est[p], (p, out, batch_est)


def test_stateful_quantiles_stream_matches_batch(spark, sf_dir):
    """availableNow run over the events backlog: the final emission
    per event_type must equal the batch sketch read over the same
    data, including the row count."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.qsketch import (
        histogram_sketch, sketch_quantiles,
    )
    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        QS_PCTS, QS_WIDTH, running_value_quantiles,
    )

    stream = running_value_quantiles(read_events_stream(spark, sf_dir))
    q = (stream.writeStream.format("memory").queryName("vq")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.table("vq").toPandas()
           .drop_duplicates("event_type", keep="last")
           .set_index("event_type").sort_index())
    assert len(got) > 0
    ev = load_table(spark, sf_dir, "events")
    sk = histogram_sketch(ev, F.col("value"), width=QS_WIDTH,
                          group_cols=["event_type"])
    reads = sketch_quantiles(sk, list(QS_PCTS),
                             group_cols=["event_type"]).toPandas()
    want = reads.pivot(index="event_type", columns="pct",
                       values="est_lo").sort_index()
    n_want = (ev.filter(F.col("value").isNotNull())
              .groupBy("event_type").count().toPandas()
              .set_index("event_type").sort_index())
    assert (got.index == want.index).all()
    assert (got["n_rows"].values == n_want["count"].values).all()
    for p in QS_PCTS:
        assert (got[f"p{p}"].values == want[p].values).all(), p


# ---------------------------------------------------------------------------
# REAL multi-batch state-store round-trips (round 11): availableNow
# over a single fixture file collapses to ONE micro-batch, so state is
# written but never read back — the class of bug that hides there
# (running_user_spend stored integer cents into a DOUBLE state field;
# the store returned NULL on the next batch and the accumulator
# crashed) needs a genuinely chunked stream to surface.  The sf0.1
# version of this drive (20 chunks, all four operators, state-bound
# metering) is scripts/stateful_scale.py.
# ---------------------------------------------------------------------------

def _chunked_stream_dir(spark, sf_dir, table, key, tmp_path, n=3):
    raw = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    out = str(tmp_path / table)
    raw.repartitionByRange(n, key).write.mode("overwrite").parquet(out)
    return out


def test_stateful_spend_multi_batch_roundtrip(spark, sf_dir, tmp_path):
    """Three real micro-batches through the state store: the final
    per-user state must equal the batch aggregate exactly (integer-cent
    quantization end-to-end)."""
    d = _chunked_stream_dir(spark, sf_dir, "events", "ts", tmp_path)
    stream = running_user_spend(
        read_events_stream(spark, sf_dir, stream_dir=d))
    q = (stream.writeStream.format("memory").queryName("spend_mb")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(q.recentProgress) >= 3, "stream collapsed to fewer batches"
    got = (spark.table("spend_mb").groupBy("user_id")
           .agg(F.max("n_purchases").alias("n"),
                F.max("total_spend").alias("t"))
           .toPandas().set_index("user_id").sort_index())
    ev = load_table(spark, sf_dir, "events")
    want = (ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"),
                 (F.sum(F.floor(F.col("value") * 100 + 0.5)) / 100)
                 .alias("t"))
            .toPandas().set_index("user_id").sort_index())
    assert (got.index == want.index).all()
    assert (got["n"].values == want["n"].values).all()
    assert (abs(got["t"].values - want["t"].values) < 1e-9).all()


def test_stateful_kmv_multi_batch_roundtrip(spark, sf_dir, tmp_path):
    """Three real micro-batches through the KMV store: the last
    emission per day must equal the batch sketch over the full backlog
    (bottom-k merge is order-insensitive, so chunking cannot change the
    final sample)."""
    from data_eng_taxi_ibis_dagster_spark.operators import kmv as K
    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        KMV_K,
        running_daily_uniques,
    )

    d = _chunked_stream_dir(spark, sf_dir, "events", "ts", tmp_path)
    stream = running_daily_uniques(
        read_events_stream(spark, sf_dir, stream_dir=d))
    q = (stream.writeStream.format("memory").queryName("kmv_mb")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(q.recentProgress) >= 3
    got = (spark.table("kmv_mb").groupBy("day")
           .agg(F.max("sketch_size").alias("sketch_size"),
                F.max("est_users").alias("est_users"))
           .toPandas().set_index("day").sort_index())
    ev = load_table(spark, sf_dir, "events")
    sk = K.kmv_sketch(
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id"),
        F.col("user_id"), k=KMV_K, group_cols=["day"])
    want = (sk.select("day", F.size("_kmv").alias("sketch_size"),
                      K.kmv_estimate(F.col("_kmv"), k=KMV_K)
                      .alias("est_users"))
            .toPandas().set_index("day").sort_index())
    assert (got.index == want.index).all()
    assert (got["sketch_size"].values == want["sketch_size"].values).all()
    assert (got["est_users"].values == want["est_users"].values).all()


def test_checked_update_coerces_and_rejects():
    """The chokepoint guard behind every ``state.update`` in
    streaming/stateful.py (round-12 advisor): the legacy state store
    silently NULLs a Python int written into a double field on the
    next read-back, so the guard (a) coerces int → float for
    float-typed fields (scalars AND array elements), (b) raises loudly
    on the mismatches it cannot fix, (c) enforces update arity."""
    import pytest

    from data_eng_taxi_ibis_dagster_spark.streaming.stateful import (
        checked_update,
    )

    class _FakeState:
        def update(self, values):
            self.stored = values

    st = _FakeState()
    # the round-11 failure class, now coerced at the chokepoint
    checked_update(st, "n long, total double", (3, 7))
    assert st.stored == (3, 7.0)
    assert isinstance(st.stored[1], float)
    # array<double> elements coerce too
    checked_update(st, "xs array<double>", ([1, 2.5, None],))
    assert st.stored == ([1.0, 2.5, None],)
    assert all(isinstance(v, float) for v in st.stored[0] if v is not None)
    # non-coercible mismatches fail AT WRITE TIME, not as a NULL later
    with pytest.raises(TypeError, match="float-typed"):
        checked_update(st, "total double", ("oops",))
    with pytest.raises(TypeError, match="store an int"):
        checked_update(st, "n long", (1.5,))
    with pytest.raises(TypeError, match="arity"):
        checked_update(st, "n long, m long", (1,))
    # non-numeric passthrough is untouched (string arrays: the KMV/CMS
    # state shape)
    checked_update(st, "hashes array<string>", (["a", "b"],))
    assert st.stored == (["a", "b"],)
