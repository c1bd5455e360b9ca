#!/usr/bin/env python
"""Warm job/task/wall probe for named queries (r12 measurement
harness): runs each query once cold (warm-up: JVM, codegen, artifact
builds), then N warm repetitions inside a job group, and reports
jobs/tasks/seconds per warm execution from the statusTracker. Job and
task counts are deterministic for a fixed plan, so they A/B reliably
where short-session wall-clock drifts.

Usage: python tools/probe_jobs.py <query> [<query>...] [--reps 3]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_session("probe_jobs")
    sc = spark.sparkContext
    qs = queries()
    for name in names:
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        walls = []
        tracker = sc.statusTracker()
        gid = f"probe_{name}"
        sc.setJobGroup(gid, name)
        t0 = time.perf_counter()
        for _ in range(reps):
            t1 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(time.perf_counter() - t1)
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(gid)
        n_tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_tasks += si.numTasks
        print(
            f"{name}: {len(job_ids)/reps:.1f} jobs/exec, "
            f"{n_tasks/reps:.1f} tasks/exec, "
            f"warm wall {sorted(walls)[len(walls)//2]:.3f}s "
            f"(min {min(walls):.3f})"
        )


if __name__ == "__main__":
    main()
