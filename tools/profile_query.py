"""Stage-level profiler for registered queries (optimization round 12).

Runs the requested queries once each in a tuned session WITH the Spark
UI enabled, then pulls per-stage task metrics from the UI REST API so
the time can be attributed per the optimization playbook: executor
compute vs shuffle read/write vs scheduling, plus input/shuffle bytes.

Usage:
    python tools/profile_query.py [--sf-dir DIR] [--top N] q313_... q199_...

Per query the report shows wall seconds, job/stage counts, and the top
N stages by total task time with their metrics.  Purely an instrument:
never imported by the engine, results go to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

UI_PORT = 4055


def fetch(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from bench import execute
    from health_data_transformation_spark.plans.analytics import REGISTRY
    from health_data_transformation_spark.session import get_spark

    spark = get_spark(
        app_name="hdt-profile",
        extra_confs={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "4000",
            "spark.ui.retainedJobs": "4000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    execute(REGISTRY["q03_pricing_summary"].fn(spark, args.sf_dir))  # warm

    app_id = spark.sparkContext.applicationId
    for name in args.queries:
        # stage-id watermark: only stages submitted after this point count
        before = {s["stageId"] for s in fetch(f"applications/{app_id}/stages")}
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        execute(REGISTRY[name].fn(spark, args.sf_dir))
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        stages = [
            s
            for s in fetch(f"applications/{app_id}/stages")
            if s["stageId"] not in before and s["status"] != "SKIPPED"
        ]
        tot = lambda k: sum(s.get(k, 0) for s in stages)  # noqa: E731
        print(f"\n=== {name}: wall {wall:.2f}s | stages {len(stages)} "
              f"(+{sum(1 for s in fetch(f'applications/{app_id}/stages') if s['stageId'] not in before and s['status']=='SKIPPED')} skipped) | "
              f"tasks {tot('numCompleteTasks')}")
        print(f"  totals: executorRunTime {tot('executorRunTime')/1e3:.1f}s | "
              f"cpuTime {tot('executorCpuTime')/1e9:.1f}s | "
              f"shuffleRead {tot('shuffleReadBytes')/1e6:.1f}MB | "
              f"shuffleWrite {tot('shuffleWriteBytes')/1e6:.1f}MB | "
              f"input {tot('inputBytes')/1e6:.1f}MB | "
              f"fetchWait {tot('shuffleFetchWaitTime')/1e3:.2f}s | "
              f"gc {tot('jvmGcTime')/1e3:.2f}s")
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        for s in stages[: args.top]:
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                pass
            print(
                f"  stage {s['stageId']}: runTime {s.get('executorRunTime',0)/1e3:7.2f}s"
                f" cpu {s.get('executorCpuTime',0)/1e9:6.2f}s"
                f" tasks {s.get('numCompleteTasks',0):4d}"
                f" in {s.get('inputBytes',0)/1e6:8.1f}MB"
                f" sR {s.get('shuffleReadBytes',0)/1e6:7.1f}MB"
                f" sW {s.get('shuffleWriteBytes',0)/1e6:7.1f}MB"
                f" | {s.get('name','')[:90]}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
