"""The reference's signature property — one logical query, multiple
execution paths, provably identical results (Ibis on DuckDB + PySpark;
``/root/reference/taxi_pipeline.py:89-147``) — asserted across THREE
Spark entry points: DataFrame API, SQL-over-temp-view, and the pandas
API on Spark. The DuckDB side of the equivalence is the driver's
differential harness; this test covers the intra-Spark API surface."""

import pandas as pd

from data_eng_taxi_ibis_dagster_spark.plans.registry import get


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (pdf[sorted(pdf.columns)]
            .sort_values(sorted(pdf.columns))
            .reset_index(drop=True))


def test_flagship_three_api_paths_identical(spark, sf_dir):
    # 1. DataFrame API (the registered builder)
    df_api = _canon(get("flagship_avg_price").builder(spark, sf_dir).toPandas())

    # 2. SQL over a temp view — same exact-aggregation expression
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .createOrReplaceTempView("li_portability")
    sql_api = _canon(spark.sql("""
        SELECT l_quantity,
               SUM(CAST(FLOOR((l_extendedprice) * 100 + 0.5) AS BIGINT))
                   / CAST(100 AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               COUNT(1) AS n_items
        FROM li_portability
        WHERE l_extendedprice > 30000
        GROUP BY l_quantity
    """).toPandas())

    # 3. pandas API on Spark — same quantized-long exact mean, so all
    # three paths agree bit-for-bit (native .mean() would differ in
    # accumulation order on doubles)
    import pyspark.pandas as ps

    pdf = ps.read_parquet(f"{sf_dir}/lineitem.parquet")
    pdf = pdf[pdf.l_extendedprice > 30000][["l_quantity", "l_extendedprice"]]
    pdf["q"] = (pdf.l_extendedprice * 100 + 0.5).astype("int64")
    g = pdf.groupby("l_quantity").agg(qsum=("q", "sum"), n_items=("q", "count"))
    g = g.reset_index().to_pandas()
    g["avg_price"] = g.qsum / 100.0 / g.n_items
    ps_api = _canon(g[["l_quantity", "avg_price", "n_items"]])

    assert df_api.equals(sql_api), "DataFrame vs SQL path diverge"
    ps_api["n_items"] = ps_api["n_items"].astype(df_api["n_items"].dtype)
    assert df_api.equals(ps_api), "DataFrame vs pandas-on-Spark path diverge"
