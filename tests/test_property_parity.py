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
