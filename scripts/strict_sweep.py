"""Registry-wide strict differential at an arbitrary fixture dir —
the driver-simulation sweep generalized with per-query watchdogs, used
for the 10x (sf0.1) and 100x (sf1) executed-scale evidence recorded in
SCALE.md.

    python scripts/strict_sweep.py /root/testdata/sf0.1
    python scripts/strict_sweep.py .sfdata/sf1        # make_sf1.py output

Per query: run the Spark plan (cancelled via its own job group after
--spark-timeout, default 900 s), then the DuckDB oracle (interrupt
after --oracle-timeout, default 150 s), and hash-compare exactly like
the external driver (sorted columns, stringified rows,
order-insensitive).

The nine queries whose exact all-pairs oracle twins are O(n^2) on a
corpus table (curation/minhash/cluster/incremental-dedup families,
embedding cosine, the skyline NOT-EXISTS scan) additionally run a
SUBSET-STRICT differential at 100x: the full-corpus Spark run still
executes (its wall-clock IS the banded-vs-all-pairs scale evidence),
then the UNCHANGED plan and UNCHANGED oracle are both re-posed on the
deterministic md5-prefix subset fixture (scripts/make_subset.py,
1-in-8 of the one table each reads) where the oracle cost is at or
below its already-green sf0.1 level — so the sweep reads fully strict
with zero timeout lines.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_subset import TABLES, make_subset, table_glob  # noqa: E402

# Queries whose registered oracle is exact all-pairs over a corpus
# table: full-oracle cost is quadratic BY DESIGN (the asymmetry the
# banded plans exist to prove), so at scale they hash-check on the
# md5-subset fixture instead of timing out.
SUBSET_STRICT = frozenset({
    "curation_best_rep", "curation_pairs", "curation_stack",
    "dedup_allpairs_prefix", "dedup_cluster_audit",
    "dedup_embedding_cosine", "dedup_incremental_batch",
    "dedup_incremental_persisted", "dedup_minhash_audit",
    "skyline_pareto_parts",
})


def connect_views(sf: str):
    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA memory_limit='32GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_glob(sf, t)}')")
    return con


def hash_compare(pdf, o) -> bool:
    if sorted(pdf.columns) != sorted(o.columns) or len(pdf) != len(o):
        return False
    s = (pdf[sorted(pdf.columns)].astype(str)
         .apply(tuple, axis=1).sort_values().tolist())
    oo = (o[sorted(o.columns)].astype(str)
          .apply(tuple, axis=1).sort_values().tolist())
    return s == oo


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--spark-timeout", type=float, default=900.0)
    ap.add_argument("--oracle-timeout", type=float, default=150.0)
    ap.add_argument("--subset-oracle-timeout", type=float, default=600.0,
                    help="oracle budget for the subset-strict runs "
                         "(the recursive-CTE closure twins are the "
                         "costliest; the subset exists to make them "
                         "finish, not to race them)")
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--subset-dir", default=None,
                    help="md5-subset fixture dir for the all-pairs-"
                         "oracle queries (default: <sf_dir>_subset, "
                         "built on demand)")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to sweep "
                         "(default: all registered)")
    ap.add_argument("--no-subset", action="store_true",
                    help="disable subset-strict; all-pairs oracles "
                         "run (and may time out) on the full corpus")
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
             # the bare default (1g) OOMs the 100x eager CC builds;
             # match the session module's sizing
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
             .getOrCreate())
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs, osql = mod.queries(), mod.oracle_sql()
    if args.only:
        keep = set(args.only.split(","))
        missing = keep - set(qs)
        if missing:
            print(f"unknown query names: {sorted(missing)}")
            return 2
        qs = {n: f for n, f in qs.items() if n in keep}

    con = connect_views(sf)
    subset_sf = subset_con = None
    if not args.no_subset and SUBSET_STRICT & set(qs):
        subset_sf = make_subset(
            sf, os.path.abspath(args.subset_dir or sf + "_subset"))
        subset_con = connect_views(subset_sf)

    def run_spark(name, fn, fixture_dir):
        """Run one plan under its own job group so a fired watchdog
        can only ever cancel THIS query's jobs (round-10 advisory:
        cancelAllJobs racing timer teardown could kill the next
        query); timeouts classified by whether the timer actually
        fired, not elapsed-time heuristics."""
        group = f"sweep-{name}"
        fired = threading.Event()

        def cancel():
            fired.set()
            sc.cancelJobGroup(group)

        sc.setJobGroup(group, name, interruptOnCancel=True)
        timer = threading.Timer(args.spark_timeout, cancel)
        timer.start()
        t0 = time.time()
        try:
            return fn(spark, fixture_dir).toPandas(), time.time() - t0, None
        except Exception as ex:
            if not fired.is_set():
                import traceback
                traceback.print_exc()  # full stack into the log —
                # the truncated tag alone cost a round-11 diagnosis
            tag = ("SPARK_TIMEOUT" if fired.is_set()
                   else f"SPARK_ERROR {type(ex).__name__}: {str(ex)[:160]}")
            return None, time.time() - t0, tag
        finally:
            timer.cancel()
            sc.setLocalProperty("spark.jobGroup.id", None)

    def run_oracle(c, sql, budget=None):
        fired = threading.Event()

        def interrupt():
            fired.set()
            c.interrupt()

        timer = threading.Timer(budget or args.oracle_timeout, interrupt)
        timer.start()
        t0 = time.time()
        try:
            return c.execute(sql).fetch_df(), time.time() - t0, None
        except Exception as ex:
            tag = ("ORACLE_TIMEOUT(cost)"
                   if fired.is_set() or "INTERRUPT" in str(ex).upper()
                   else f"ORACLE_ERROR {type(ex).__name__}: {str(ex)[:160]}")
            return None, time.time() - t0, tag
        finally:
            timer.cancel()

    results: dict[str, str] = {}
    for name in sorted(qs):
        pdf, t_spark, tag = run_spark(name, qs[name], sf)
        if tag is not None:
            print(f"{name}: {tag} ({t_spark:.0f}s)", flush=True)
            results[name] = tag
            continue
        if name not in osql:
            print(f"{name}: rows={len(pdf)} (rows-only) "
                  f"spark={t_spark:.1f}s", flush=True)
            results[name] = "rows_only"
            continue
        if subset_con is not None and name in SUBSET_STRICT:
            # full-corpus Spark run above is the timing evidence; the
            # hash check re-poses plan AND oracle on the md5 subset
            spdf, t_sub, stag = run_spark(name, qs[name], subset_sf)
            if stag is not None:
                print(f"{name}: rows={len(pdf)} {stag} on subset "
                      f"({t_sub:.0f}s) spark={t_spark:.1f}s", flush=True)
                results[name] = stag
                continue
            o, t_o, otag = run_oracle(subset_con, osql[name],
                                      args.subset_oracle_timeout)
            if otag is not None:
                print(f"{name}: rows={len(pdf)} {otag} on subset "
                      f"({t_o:.0f}s) spark={t_spark:.1f}s", flush=True)
                results[name] = otag
                continue
            ok = hash_compare(spdf, o)
            print(f"{name}: rows={len(pdf)} "
                  f"{'MATCH' if ok else 'MISMATCH'}(subset-strict "
                  f"rows={len(spdf)}) spark={t_spark:.1f}s "
                  f"subset_spark={t_sub:.1f}s oracle={t_o:.1f}s",
                  flush=True)
            results[name] = ("MATCH(subset)" if ok
                             else "MISMATCH(subset)")
            continue
        o, t_o, otag = run_oracle(con, osql[name])
        if otag is not None:
            print(f"{name}: rows={len(pdf)} {otag} ({t_o:.0f}s) "
                  f"spark={t_spark:.1f}s", flush=True)
            results[name] = otag
            continue
        ok = hash_compare(pdf, o)
        print(f"{name}: rows={len(pdf)} {'MATCH' if ok else 'MISMATCH'} "
              f"spark={t_spark:.1f}s oracle={t_o:.1f}s", flush=True)
        results[name] = "MATCH" if ok else "MISMATCH"

    print("SUMMARY:", json.dumps(Counter(results.values())))
    bad = [n for n, v in results.items()
           if v.startswith(("MISMATCH", "SPARK_ERROR", "ORACLE_ERROR",
                            "SPARK_TIMEOUT", "ORACLE_TIMEOUT"))]
    print("RESULT:", "CLEAN" if not bad else f"ISSUES: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
