"""Per-query isolation harness for the r06 optimization round.

``bench.py`` is FROZEN (driver contract). This file is the guide-§1
workbench: it times individual declared queries (first + warm runs,
same protocol as bench.py), captures ``.explain("formatted")`` plans
to ``plans/r06/``, and counts Spark jobs per run so job-scheduling
overhead is visible separately from compute.

Usage::

    python bench_extra.py q1 q2 ...      # time + plan the named queries
    python bench_extra.py --all          # the full registry
    python bench_extra.py --plan-tag before q1   # write plan files
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("queries", nargs="*")
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--all", action="store_true")
    p.add_argument("--repeat", type=int, default=1,
                   help="extra warm runs; min is reported")
    p.add_argument("--plan-tag", default=None,
                   help="write plans/r06/<query>_<tag>.txt explain output")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from datacanary_spark.session import get_spark

    spark = get_spark(app_name="datacanary_bench_extra",
                      master=f"local[{args.cpus}]")
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod

    registry = entry_mod.queries()
    names = list(registry) if args.all else args.queries
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # warm-up identical in spirit to bench.py: scan every table once,
    # run the flagship once (python workers + broadcast)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").count()
    registry["heuristic_keep_by_lang"](spark, args.sf_dir).collect()
    spark.catalog.clearCache()

    tracker = sc.statusTracker()
    results = {}
    for name in names:
        sc.setJobDescription(f"bench_extra:{name}")
        # set-difference of job ids, not length deltas: the UI store
        # evicts old jobs past spark.ui.retainedJobs, which made raw
        # len() deltas under-report (or go negative) on --all runs
        jobs0 = set(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        df = registry[name](spark, args.sf_dir)
        t_build = time.perf_counter() - t0
        df.collect()
        t_first = time.perf_counter() - t0
        jobs1 = set(tracker.getJobIdsForGroup() or [])
        n_jobs_first = len(jobs1 - jobs0)
        best = float("inf")
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            registry[name](spark, args.sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        n_jobs_warm = len(set(tracker.getJobIdsForGroup() or []) - jobs1) \
            // max(1, args.repeat)
        results[name] = {
            "build_sec": round(t_build, 3),
            "first_sec": round(t_first, 3),
            "warm_sec": round(best, 3),
            "jobs_first": n_jobs_first,
            "jobs_warm": n_jobs_warm,
        }
        print(f"{name:45s} first={t_first:7.3f}s warm={best:7.3f}s "
              f"build={t_build:6.3f}s jobs={n_jobs_first}/{n_jobs_warm}",
              flush=True)
        if args.plan_tag:
            import contextlib
            import io
            os.makedirs("plans/r06", exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                registry[name](spark, args.sf_dir).explain("formatted")
            with open(f"plans/r06/{name}_{args.plan_tag}.txt", "w") as f:
                f.write(buf.getvalue())
        spark.catalog.clearCache()
        sc.setJobDescription(None)

    total = round(sum(r["warm_sec"] for r in results.values()), 3)
    print(f"TOTAL warm: {total}s over {len(results)} queries", flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
