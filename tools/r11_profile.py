#!/usr/bin/env python
"""Per-query job/stage time attribution for the headline bench set.

For each query: bench-identical warm-up (2 untimed runs + GC), then ONE
timed noop-sink run; afterwards pull the status REST API and attribute
every job/stage that ran inside the timed window. Reports per stage:
wall (completion - submission), executorRunTime (sum over tasks),
executorCpuTime, shuffle bytes, task count, and the stage name line.

Usage: python tools/r11_profile.py [names...]   (default: HEADLINE)
Writes /tmp/r11_profile.json and prints a per-query summary.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE

    from batch_processing_new_spark.registry import all_specs
    from batch_processing_new_spark.session import get_spark
    from batch_processing_new_spark.sources.readers import TABLES, load_table

    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="r11_profile", ui=True)
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    base = f"{ui}/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(f"{base}/{path}") as r:
            return json.load(r)

    specs = all_specs()
    for t in TABLES:
        load_table(spark, SF_DIR, t).schema
    li = load_table(spark, SF_DIR, "lineitem")
    li.groupBy("l_returnflag").count().count()

    def _identity(batches):
        yield from batches

    spark.range(100).mapInPandas(_identity, schema="id long").count()

    def run_all(df):
        df.write.format("noop").mode("overwrite").save()

    report = {}
    for name in names:
        fn = specs[name].fn
        for _ in range(2):
            run_all(fn(spark, SF_DIR))
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        time.sleep(0.5)
        jobs_before = {j["jobId"] for j in get("jobs")}
        t0 = time.perf_counter()
        run_all(fn(spark, SF_DIR))
        wall = time.perf_counter() - t0
        jobs = [j for j in get("jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in get(f"stages/{sid}"):
                    if att["status"] != "COMPLETE":
                        continue
                    sub = att.get("firstTaskLaunchedTime") or att.get("submissionTime")
                    comp = att.get("completionTime")
                    stages.append(
                        {
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:90],
                            "tasks": att["numCompleteTasks"],
                            "wall_ms": _dt(comp) - _dt(sub) if sub and comp else None,
                            "run_ms": att["executorRunTime"],
                            "cpu_ms": att.get("executorCpuTime", 0) / 1e6,
                            "input_mb": round(att["inputBytes"] / 2**20, 2),
                            "sh_r_mb": round(att["shuffleReadBytes"] / 2**20, 2),
                            "sh_w_mb": round(att["shuffleWriteBytes"] / 2**20, 2),
                        }
                    )
            except urllib.error.HTTPError:
                continue
        report[name] = {"wall_s": round(wall, 3), "n_jobs": len(jobs), "stages": stages}
        print(f"\n=== {name}: {wall:.3f}s, {len(jobs)} jobs, {len(stages)} stages")
        for s in stages:
            print(
                f"  s{s['stage']:<4} tasks={s['tasks']:<3} wall={s['wall_ms']}ms "
                f"run={s['run_ms']}ms cpu={s['cpu_ms']:.0f}ms in={s['input_mb']}M "
                f"shR={s['sh_r_mb']}M shW={s['sh_w_mb']}M  {s['name']}"
            )
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        time.sleep(0.5)
    with open("/tmp/r11_profile.json", "w") as f:
        json.dump(report, f, indent=1)
    print("\nwrote /tmp/r11_profile.json")
    spark.stop()


def _dt(s: str) -> float:
    from datetime import datetime

    return datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000


if __name__ == "__main__":
    main()
