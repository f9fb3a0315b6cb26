"""Registry-wide strict differential at an arbitrary fixture dir —
the driver-simulation sweep generalized with per-query watchdogs, used
for the 10x (sf0.1) and 100x (sf1) executed-scale evidence recorded in
SCALE.md.

    python scripts/strict_sweep.py /root/testdata/sf0.1
    python scripts/strict_sweep.py .sfdata/sf1        # make_sf1.py output

Per query: run the Spark plan (cancel after --spark-timeout, default
900 s), then the DuckDB oracle (interrupt after --oracle-timeout,
default 150 s — the exact all-pairs oracle twins are O(n^2) by design
and time out on cost at 100x; their Spark sides completing IS the
scale asymmetry the banded/blocked plans exist to prove), and
hash-compare exactly like the external driver (sorted columns,
stringified rows, order-insensitive).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import threading
import time
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--spark-timeout", type=float, default=900.0)
    ap.add_argument("--oracle-timeout", type=float, default=150.0)
    ap.add_argument("--cpus", type=int, default=24)
    args = ap.parse_args()
    sf = os.path.abspath(args.sf_dir)

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("strict-sweep")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", str(2 * args.cpus))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = mod.queries(), mod.oracle_sql()

    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA memory_limit='32GB'")
    for t in TABLES:
        # fixture tables are single files at the driver gates and
        # spark-written part directories from make_sf1.py
        pat = (f"{sf}/{t}.parquet/*.parquet"
               if os.path.isdir(f"{sf}/{t}.parquet") else f"{sf}/{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    results: dict[str, str] = {}
    for name in sorted(qs):
        t0 = time.time()
        cancel = threading.Timer(args.spark_timeout,
                                 spark.sparkContext.cancelAllJobs)
        cancel.start()
        try:
            pdf = qs[name](spark, sf).toPandas()
        except Exception as ex:
            cancel.cancel()
            el = time.time() - t0
            tag = ("SPARK_TIMEOUT" if el >= args.spark_timeout - 5
                   else f"SPARK_ERROR {type(ex).__name__}: {str(ex)[:160]}")
            print(f"{name}: {tag} ({el:.0f}s)", flush=True)
            results[name] = tag
            continue
        cancel.cancel()
        t_spark = time.time() - t0
        if name not in osql:
            print(f"{name}: rows={len(pdf)} (rows-only) "
                  f"spark={t_spark:.1f}s", flush=True)
            results[name] = "rows_only"
            continue
        t1 = time.time()
        intr = threading.Timer(args.oracle_timeout, con.interrupt)
        intr.start()
        try:
            o = con.execute(osql[name]).fetch_df()
        except Exception as ex:
            intr.cancel()
            el = time.time() - t1
            tag = ("ORACLE_TIMEOUT(cost)"
                   if el >= args.oracle_timeout - 5
                   or "INTERRUPT" in str(ex).upper()
                   else f"ORACLE_ERROR {type(ex).__name__}: {str(ex)[:160]}")
            print(f"{name}: rows={len(pdf)} {tag} ({el:.0f}s) "
                  f"spark={t_spark:.1f}s", flush=True)
            results[name] = tag
            continue
        intr.cancel()
        cols_ok = sorted(pdf.columns) == sorted(o.columns)
        s = oo = None
        if cols_ok:
            s = (pdf[sorted(pdf.columns)].astype(str)
                 .apply(tuple, axis=1).sort_values().tolist())
            oo = (o[sorted(o.columns)].astype(str)
                  .apply(tuple, axis=1).sort_values().tolist())
        ok = cols_ok and len(pdf) == len(o) and s == oo
        print(f"{name}: rows={len(pdf)} {'MATCH' if ok else 'MISMATCH'} "
              f"spark={t_spark:.1f}s oracle={time.time() - t1:.1f}s",
              flush=True)
        results[name] = "MATCH" if ok else "MISMATCH"

    print("SUMMARY:", json.dumps(Counter(results.values())))
    bad = [n for n, v in results.items()
           if v == "MISMATCH"
           or v.startswith(("SPARK_ERROR", "ORACLE_ERROR", "SPARK_TIMEOUT"))]
    print("RESULT:", "CLEAN" if not bad else f"ISSUES: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
