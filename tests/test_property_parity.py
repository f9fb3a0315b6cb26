"""Property-based differential testing: hypothesis generates small
tables, the same aggregation runs on Spark and DuckDB, results must be
bit-identical. This fuzzes the exact-aggregation machinery beyond the
fixture distributions (negatives, tiny/huge magnitudes, empty groups,
duplicate keys)."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.functions.exact import (
    dsum,
    lsum,
    sql_dsum,
    sql_lsum,
)

finite_money = st.decimals(
    min_value=-10**9, max_value=10**9, places=2,
    allow_nan=False, allow_infinity=False,
).map(float)

rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), finite_money),
    min_size=1, max_size=50,
)


@pytest.fixture(scope="module")
def _spark():
    from data_eng_taxi_ibis_dagster_spark.session import get_session
    return get_session("property-tests", 8)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_exact_sums_match_duckdb(_spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "x"])
    sdf = _spark.createDataFrame(pdf)
    got = (
        sdf.groupBy("k")
        .agg(dsum("x").alias("ds"), lsum("x").alias("ls"),
             F.count(F.lit(1)).alias("n"))
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"""
        SELECT k, {sql_dsum('x')} AS ds, {sql_lsum('x')} AS ls, COUNT(*) AS n
        FROM t GROUP BY k ORDER BY k
    """).fetch_df()
    con.close()
    assert list(got["k"]) == list(want["k"])
    assert (got["n"].values == want["n"].values).all()
    # bit-exact float comparison — the whole point of the exact paths
    assert (got["ds"].values == want["ds"].values).all(), (got, want)
    assert (got["ls"].values == want["ls"].values).all(), (got, want)


# ---------------------------------------------------------------------------
# Window-function semantics fuzz
# ---------------------------------------------------------------------------

win_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # partition key
        st.integers(min_value=0, max_value=9),    # order key (ties!)
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1, max_size=40,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=win_rows)
def test_window_functions_match_duckdb(_spark, rows):
    """row_number/rank/dense_rank/lag/running-sum under duplicate order
    keys: the tiebreak column makes the total order unique, so both
    engines must agree exactly (integer arithmetic throughout)."""
    pdf = pd.DataFrame(rows, columns=["k", "o", "v"])
    pdf["uid"] = range(len(pdf))  # unique tiebreak
    sdf = _spark.createDataFrame(pdf)

    from pyspark.sql.window import Window
    w = Window.partitionBy("k").orderBy("o", "uid")
    got = (
        sdf.select(
            "k", "uid",
            F.row_number().over(w).alias("rn"),
            F.rank().over(
                Window.partitionBy("k").orderBy("o")).alias("rk"),
            F.dense_rank().over(
                Window.partitionBy("k").orderBy("o")).alias("drk"),
            F.lag("v", 1).over(w).alias("lg"),
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, 0)).alias("rs"),
        )
        .toPandas().sort_values(["k", "uid"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute("""
        SELECT k, uid,
               row_number() OVER (PARTITION BY k ORDER BY o, uid) AS rn,
               rank() OVER (PARTITION BY k ORDER BY o) AS rk,
               dense_rank() OVER (PARTITION BY k ORDER BY o) AS drk,
               lag(v, 1) OVER (PARTITION BY k ORDER BY o, uid) AS lg,
               SUM(v) OVER (PARTITION BY k ORDER BY o, uid
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS rs
        FROM t ORDER BY k, uid
    """).fetch_df()
    con.close()
    for c in ("rn", "rk", "drk", "rs"):
        assert list(got[c]) == list(want[c]), c
    # lag: NULL for first row per partition — compare with NA-safe eq
    assert got["lg"].astype("Int64").equals(want["lg"].astype("Int64"))


# ---------------------------------------------------------------------------
# Null-key join semantics fuzz
# ---------------------------------------------------------------------------

nullable_key_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=0, max_size=25,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=nullable_key_rows, right=nullable_key_rows)
def test_null_key_joins_match_duckdb(_spark, left, right):
    """Inner/left/full equi-joins with NULL keys: NULL never matches
    NULL, unmatched rows null-extend. Both engines must produce the
    same multiset."""
    ls = _spark.createDataFrame(left, "k bigint, a bigint")
    rs = _spark.createDataFrame(right, "k bigint, b bigint")

    con = duckdb.connect()
    lp = pd.DataFrame(left, columns=["k", "a"]).astype(
        {"k": "Int64", "a": "Int64"})
    rp = pd.DataFrame(right, columns=["k", "b"]).astype(
        {"k": "Int64", "b": "Int64"})
    con.register("l", lp)
    con.register("r", rp)

    def nkey(t):
        return tuple((x is None, 0 if x is None else x) for x in t)

    for how, sql in (
        ("inner", "SELECT l.k AS lk, r.k AS rk, a, b FROM l JOIN r USING (k)"),
        ("left", "SELECT l.k AS lk, r.k AS rk, a, b FROM l LEFT JOIN r ON l.k = r.k"),
        ("full", "SELECT l.k AS lk, r.k AS rk, a, b FROM l FULL JOIN r ON l.k = r.k"),
    ):
        if how == "inner":
            j = ls.join(rs, "k").select(
                F.col("k").alias("lk"), F.col("k").alias("rk"), "a", "b")
        else:
            j = ls.join(rs, ls.k == rs.k, how).select(
                ls.k.alias("lk"), rs.k.alias("rk"), "a", "b")
        got = sorted(
            (tuple(None if pd.isna(x) else int(x) for x in row)
             for row in j.toPandas().itertuples(index=False, name=None)),
            key=nkey,
        )
        want = sorted(
            (tuple(None if pd.isna(x) else int(x) for x in row)
             for row in con.execute(sql).fetch_df().itertuples(
                 index=False, name=None)),
            key=nkey,
        )
        assert got == want, how
    con.close()


# ---------------------------------------------------------------------------
# Multiset set-operation semantics fuzz
# ---------------------------------------------------------------------------

pair_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=0, max_value=3)),
    min_size=0, max_size=20,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=pair_rows, b=pair_rows)
def test_multiset_setops_match_duckdb(_spark, a, b):
    """INTERSECT ALL / EXCEPT ALL bag semantics (min/count-difference of
    duplicates) — a classic cross-engine divergence point."""
    sa = _spark.createDataFrame(a, "x bigint, y bigint")
    sb = _spark.createDataFrame(b, "x bigint, y bigint")
    con = duckdb.connect()
    con.register("a", pd.DataFrame(a, columns=["x", "y"]))
    con.register("b", pd.DataFrame(b, columns=["x", "y"]))

    cases = (
        ("intersectAll", sa.intersectAll(sb),
         "SELECT x, y FROM a INTERSECT ALL SELECT x, y FROM b"),
        ("exceptAll", sa.exceptAll(sb),
         "SELECT x, y FROM a EXCEPT ALL SELECT x, y FROM b"),
        ("unionAll", sa.unionByName(sb),
         "SELECT x, y FROM a UNION ALL SELECT x, y FROM b"),
    )
    for name, sdf, sql in cases:
        got = sorted(map(tuple, sdf.collect()))
        want = sorted(
            map(tuple, con.execute(sql).fetch_df().itertuples(
                index=False, name=None)))
        assert got == want, name
    con.close()


# ---------------------------------------------------------------------------
# distributed_rank: property-based equivalence with the global window
# ---------------------------------------------------------------------------

score_strategy = st.lists(
    st.one_of(
        st.floats(min_value=-1e12, max_value=1e12,
                  allow_nan=False, allow_infinity=False),
        st.sampled_from([0.0, -0.0, 1.0, -1.0, 1e-300, -1e-300]),
    ),
    min_size=1, max_size=60,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=score_strategy)
def test_distributed_rank_property(_spark, vals):
    """Any finite score distribution — duplicates, negatives, subnormal
    magnitudes, ±0 — must rank identically to the single-partition
    global window."""
    from pyspark.sql.window import Window

    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_rank,
    )

    sdf = _spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "v"])
    got = {r["id"]: r["pos"] for r in distributed_rank(
        sdf, F.col("v"), F.col("id"), buckets=8, name="pos").collect()}
    want = {r["id"]: r["pos"] for r in sdf.withColumn(
        "pos", F.row_number().over(Window.orderBy("v", "id"))).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# tie_split prefix decompositions: property-based equivalence with the
# global window (point-mass-prone score pools, NULL scores included)
# ---------------------------------------------------------------------------

tie_rows = st.lists(
    st.tuples(
        st.one_of(st.none(),
                  st.sampled_from([-3.0, 0.0, 0.0, 0.0, 7.5, 7.5, 1e9])),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1, max_size=50,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=tie_rows)
def test_tie_split_prefix_ops_property(_spark, rows):
    """``distributed_prefix_sum/_max(tie_split=...)`` must equal the
    naive global window bit-for-bit on ANY distribution drawn from a
    point-mass-prone score pool (most draws collide on 0.0/7.5) with
    NULL scores mixed in — the decomposition's exactness argument
    (order-insensitive SUM within a tie group; idempotent MAX) fuzzed
    beyond the hand-picked cases in test_order_rank."""
    from pyspark.sql.window import Window

    from data_eng_taxi_ibis_dagster_spark.operators.order import (
        distributed_prefix_max,
        distributed_prefix_sum,
    )

    sdf = _spark.createDataFrame(
        [(i, s, v) for i, (s, v) in enumerate(rows)],
        "id long, s double, v long")
    w_inc = (Window.orderBy(F.col("s").asc_nulls_first(), "id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_exc = (Window.orderBy(F.col("s").asc_nulls_first(), "id")
             .rowsBetween(Window.unboundedPreceding, -1))

    got_sum = {r["id"]: r["cum"] for r in distributed_prefix_sum(
        sdf, F.col("s"), F.col("v"), buckets=4, name="cum",
        tie_split=F.col("id")).collect()}
    want_sum = {r["id"]: r["cum"] for r in sdf.withColumn(
        "cum", F.sum("v").over(w_inc)).collect()}
    assert got_sum == want_sum

    got_max = {r["id"]: r["pm"] for r in distributed_prefix_max(
        sdf, F.col("s"), F.col("v"), buckets=4, name="pm",
        tie_split=F.col("id")).collect()}
    want_max = {r["id"]: r["pm"] for r in sdf.withColumn(
        "pm", F.max("v").over(w_exc)).collect()}
    assert got_max == want_max


# ---------------------------------------------------------------------------
# Quantile-histogram sketch: property-based equivalence with exact
# discrete percentiles computed in plain Python
# ---------------------------------------------------------------------------

qs_rows = st.lists(st.integers(min_value=-500, max_value=500),
                   min_size=1, max_size=40)
qs_width = st.sampled_from([1, 3, 10, 250])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=qs_rows, width=qs_width)
def test_quantile_sketch_property(_spark, vals, width):
    """For ANY integer corpus and grid width: the sketch estimate is
    exactly floor(true_disc_percentile / width) · width — i.e. the
    true PERCENTILE_DISC value's own bin lower bound (⇒ the estimate
    equals the truth whenever width divides the data's grid, and
    brackets it within width always)."""
    import math

    from data_eng_taxi_ibis_dagster_spark.operators.qsketch import (
        histogram_sketch,
        sketch_quantiles,
    )

    sdf = _spark.createDataFrame([(v,) for v in vals], "v long")
    sk = histogram_sketch(sdf, F.col("v"), width=width)
    est = {r["pct"]: (r["est_lo"], r["n_rows"])
           for r in sketch_quantiles(sk, [25, 50, 75, 95],
                                     width=width).collect()}
    svals = sorted(vals)
    n = len(svals)
    for pct in (25, 50, 75, 95):
        true = svals[math.ceil(pct * n / 100) - 1]
        want = math.floor(true / width) * width
        assert est[pct] == (want, n), (pct, est[pct], want, n)


# ---------------------------------------------------------------------------
# Sketch merge-invariance fuzz (KMV + CMS)
# ---------------------------------------------------------------------------

sketch_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # arbitrary slice id
        st.integers(min_value=0, max_value=60),    # value (collisions!)
    ),
    min_size=1, max_size=60,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=sketch_rows)
def test_sketch_merge_invariant_under_slicing(_spark, rows):
    """For ANY assignment of rows to slices — empty slices, one mega
    slice, duplicated values across slices — merging per-slice
    sketches must equal the one-pass global sketch: KMV by ARRAY
    equality (bottom-k of a union is inside the union of bottom-ks),
    CMS by full grid equality (counter addition). This is the
    contract that makes persisted per-slice sketch columns safe to
    re-aggregate in any order at 100 TB."""
    from data_eng_taxi_ibis_dagster_spark.operators import cms as C
    from data_eng_taxi_ibis_dagster_spark.operators import kmv as K

    pdf = pd.DataFrame(rows, columns=["slice", "v"])
    sdf = _spark.createDataFrame(pdf).select(
        "slice", F.col("v").cast("string").alias("v"))

    k_merged = K.merge_kmv(
        K.kmv_sketch(sdf, F.col("v"), k=8, group_cols=["slice"]))
    k_direct = K.kmv_sketch(sdf, F.col("v"), k=8)
    assert k_merged.collect()[0]["_kmv"] == k_direct.collect()[0]["_kmv"]

    c_merged = {(r["_cms_seed"], r["_cms_bin"]): r["_cms_n"]
                for r in C.merge_cms(
                    C.cms_sketch(sdf, F.col("v"), depth=2, hex_digits=2,
                                 group_cols=["slice"])).collect()}
    c_direct = {(r["_cms_seed"], r["_cms_bin"]): r["_cms_n"]
                for r in C.cms_sketch(sdf, F.col("v"), depth=2,
                                      hex_digits=2).collect()}
    assert c_merged == c_direct
