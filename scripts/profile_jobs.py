"""Per-query Spark job profiler (r06 workbench): run a declared query
once warm, then list every job it schedules with stage/task counts.
Job-count is the stable optimization signal on a host whose effective
core count swings between windows (wall time is not).

Usage: python scripts/profile_jobs.py <query> [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from datacanary_spark.session import get_spark

    spark = get_spark(app_name=f"profile_jobs:{name}", master="local[32]")
    sc = spark.sparkContext
    st = sc.statusTracker()

    import __spark_entry__ as e

    fn = e.queries()[name]
    fn(spark, sf_dir).collect()  # warm (codegen + schema cache)
    spark.catalog.clearCache()

    before = set(st.getJobIdsForGroup() or [])
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    jobs = sorted(set(st.getJobIdsForGroup() or []) - before)
    for j in jobs:
        ji = st.getJobInfo(j)
        if ji is None:  # evicted from the UI store (spark.ui.retainedJobs)
            print(f"job {j}: <evicted>")
            continue
        stages = [st.getStageInfo(s) for s in ji.stageIds]
        ntasks = sum(s.numTasks for s in stages if s)
        print(f"job {j}: stages={len(ji.stageIds)} tasks={ntasks}")
    print(f"{name}: wall={wall:.2f}s jobs={len(jobs)}")
    spark.stop()


if __name__ == "__main__":
    main()
