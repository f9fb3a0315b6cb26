"""Per-query shuffle-byte and output-row accounting for bench.py.

BASELINE.md §6 obligates the bench harness to record "rows in/out and
shuffle bytes", not wall-clock alone: shuffle-byte deltas are immune to
the 1.05-1.24x CPU-contention noise bands this box shows and catch
exchange-shape drift (a plan growing an extra shuffle, a broadcast
silently degrading to sort-merge) that wall-clock hides.

Runs as a SEPARATE process from the timed passes so the timing
environment stays byte-identical to every earlier round (the UI status
listener is only loaded here): builds a UI-enabled session, executes
each benched query once inside its own job group, and reads the public
REST status API (/api/v1/applications/<id>/jobs + /stages — the
documented Spark monitoring surface) to sum shuffle WRITE bytes over
the distinct stages of the query's jobs.  Output rows come from a
separate count() execution.

Prints one JSON line: {"shuffle_bytes": {q: N}, "rows_out": {q: N}}.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "true"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs
    from data_eng_taxi_ibis_dagster_spark.session import get_session

    spark = get_session(app_name="bench-metrics")
    sc = spark.sparkContext
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    specs = {n: s for n, s in all_specs().items() if s.bench}

    shuffle_bytes: dict[str, int] = {}
    rows_in: dict[str, int] = {}
    rows_out: dict[str, int] = {}
    for name in sorted(specs):
        group = f"metrics-{name}"
        # group set before builder(): eager-build queries (the CC
        # label loop) run jobs at plan-build time and that shuffle is
        # part of the query's honest exchange shape
        sc.setJobGroup(group, name)
        df = specs[name].builder(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        sc.setLocalProperty("spark.jobGroup.id", None)
        # rows_out OUTSIDE the group: count() plans its own partial-agg
        # stages whose shuffle is not part of the query's exchange shape
        rows_out[name] = df.count()
        stage_ids = set()
        for job in _get(f"{api}/jobs"):
            if job.get("jobGroup") == group:
                stage_ids.update(job["stageIds"])
        shuf = inrec = 0
        for st in _get(f"{api}/stages"):
            if st["stageId"] in stage_ids and st["status"] != "PENDING":
                shuf += st.get("shuffleWriteBytes", 0)
                inrec += st.get("inputRecords", 0)
                stage_ids.discard(st["stageId"])  # one attempt per stage
        shuffle_bytes[name] = shuf
        rows_in[name] = inrec
    print(json.dumps({"shuffle_bytes": shuffle_bytes,
                      "rows_in": rows_in,
                      "rows_out": rows_out}))


if __name__ == "__main__":
    main()
