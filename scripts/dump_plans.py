#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to text files.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query — the optimization
rounds' plan-evidence artifacts (plans/r12/<q>_before.txt / _after.txt).
The plan is captured as a string via the same JVM call
DataFrame.explain() prints, so files hold exactly what explain shows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs
    from data_eng_taxi_ibis_dagster_spark.session import get_session

    spark = get_session(app_name="dump_plans")
    specs = all_specs()
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        text = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
