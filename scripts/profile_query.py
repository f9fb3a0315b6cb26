"""Per-stage profile of one benched query: wall, shuffle, tasks.

Usage: python scripts/profile_query.py <query> [passes]

Runs the named registry query in a UI-enabled session (noop sink,
warmup pass first), then prints per-stage rows from the REST status
API sorted by executorRunTime — the guide §1 "which stage is slow"
loop without the interactive UI. Throwaway-friendly but committed so
optimization rounds share one instrument.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def main() -> None:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.environ["SPARK_GRAFT_UI"] = "true"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs
    from data_eng_taxi_ibis_dagster_spark.session import get_session

    spark = get_session(app_name=f"profile-{name}")
    sc = spark.sparkContext
    api = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    spec = all_specs()[name]

    # warmup (scan caches, codegen)
    spec.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()

    best, best_group = float("inf"), None
    for i in range(passes):
        group = f"profile-{name}-{i}"
        sc.setJobGroup(group, name)
        t_build = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        build_secs = time.perf_counter() - t_build
        tracker = sc.statusTracker()
        heavy_tasks = 0
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            for sid in (info.stageIds if info else ()):
                st = tracker.getStageInfo(sid)
                if st and st.numTasks > 1:
                    heavy_tasks += st.numTasks
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        # bench.py round-12 rule: multi-task build jobs (eager loops,
        # plan-build materializations) bill build+write; the 1-task
        # parquet schema-inference job every scan fires is exempt
        if heavy_tasks:
            wall += build_secs
        sc.setLocalProperty("spark.jobGroup.id", None)
        print(f"pass {i}: {wall:.3f}s"
              + (f" (build {build_secs:.3f}s, {heavy_tasks} heavy "
                 f"build tasks)" if heavy_tasks else ""))
        if wall < best:
            best, best_group = wall, group

    stage_ids = set()
    for job in _get(f"{api}/jobs"):
        if job.get("jobGroup") == best_group:
            stage_ids.update(job["stageIds"])
    rows = []
    for st in _get(f"{api}/stages"):
        if st["stageId"] in stage_ids and st["status"] != "PENDING":
            rows.append(st)
            stage_ids.discard(st["stageId"])
    rows.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"\nbest pass: {best:.3f}s — stages by executorRunTime (ms):")
    hdr = (f"{'stage':>6} {'run_ms':>8} {'cpu_ms':>8} {'tasks':>5} "
           f"{'in_rec':>9} {'sh_r_MB':>8} {'sh_w_MB':>8}  name")
    print(hdr)
    for st in rows:
        print(f"{st['stageId']:>6} {st.get('executorRunTime', 0):>8} "
              f"{st.get('executorCpuTime', 0) // 1_000_000:>8} "
              f"{st.get('numCompleteTasks', 0):>5} "
              f"{st.get('inputRecords', 0):>9} "
              f"{st.get('shuffleReadBytes', 0) / 1e6:>8.2f} "
              f"{st.get('shuffleWriteBytes', 0) / 1e6:>8.2f}  "
              f"{st.get('name', '')[:60]}")


if __name__ == "__main__":
    main()
