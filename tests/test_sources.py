"""Source coverage: parquet glob, CSV/JSON round-trips with explicit
schemas, catalog views."""

from data_eng_taxi_ibis_dagster_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
    scan_csv,
    scan_json,
    scan_parquet,
)


def test_parquet_glob_scan(spark, sf_dir):
    df = scan_parquet(spark, f"{sf_dir}/*.parquet".replace("*", "nation"))
    assert df.count() == 25


def test_all_fixture_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name
    # events normalization contract
    ev = load_table(spark, sf_dir, "events")
    types = dict(ev.dtypes)
    assert types["ts"] == "timestamp"
    assert types["ts_us"] == "bigint"


def test_register_views_sql_addressable(spark, sf_dir):
    register_views(spark, sf_dir, ["region", "nation"])
    got = spark.sql("""
        SELECT r.r_name, COUNT(*) AS n FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name
    """)
    assert got.count() == 5


def test_csv_round_trip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = scan_csv(spark, path, schema=nation.schema)
    assert back.count() == 25
    assert back.schema == nation.schema
    assert nation.exceptAll(back).count() == 0


def test_json_round_trip(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_json")
    cust.write.mode("overwrite").json(path)
    back = scan_json(spark, path, schema=cust.schema)
    assert back.count() == cust.count()
    assert cust.exceptAll(back).count() == 0
