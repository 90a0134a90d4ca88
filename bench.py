"""Benchmark harness (driver contract).

Runs the headline queries + the full quality-filter pipeline at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys carried in the same line: ``docs_per_sec`` (filter-pipeline
throughput — the north-rule headline number) and ``n_docs``.

Round-over-round comparability (fixed warm-up protocol, r02+): before
any timing, every input table is scanned once (``count()``) and the
flagship query runs once unmeasured — this removes the first-query
scan/JIT warm-up that polluted BENCH_r01 (its first profile query read
6.0 s of cold-cache noise). As of r04 the HEADLINE (``value`` /
``queries``) is the steady-state second run per query — first-run
times carry Catalyst/JIT compile noise that flagged phantom
regressions in r02/r03 — with first-run kept as
``queries_first_run``/``first_run_total`` (the r01–r03 headline
protocol). Per-query timings are then written to
``BENCH/bench_r{ROUND}.json`` (ROUND from ``--round`` /
``$SPARK_GRAFT_ROUND``, default "latest") in a stable format so the
next round can diff query-level regressions.

Usage: ``python bench.py [--sf-dir DIR] [--cpus N] [--repeat K] [--round N]``
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def warmup(spark, sf_dir: str) -> None:
    """Fixed warm-up: touch every table once (page cache + parquet footer
    + codegen), then one flagship run (python workers + broadcast)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    import __spark_entry__ as entry_mod

    entry_mod.queries()["heuristic_keep_by_lang"](spark, sf_dir).collect()


def parse_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def bench_filter_pipeline(spark, sf_dir: str) -> tuple[float, int]:
    """Full north-rule pipeline over the documents table reshaped as pages:
    heuristics + langid + perplexity + scrub + verdict, one action.

    The final agg touches keep, scrub_count and ppl so Catalyst cannot
    prune any UDF stage out of the measured plan.
    """
    from pyspark.sql import functions as F

    from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
    from datacanary_spark.sources.fixtures import docs_as_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs_as_pages(docs)
    bc = broadcast_models(spark)
    n_docs = docs.count()  # warms the scan cache fairly; excluded from timing

    def run():
        t0 = time.perf_counter()
        verdicts = filter_pages(pages, bc)
        row = verdicts.agg(
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.sum("scrub_count").alias("scrubs"),
            F.avg("ppl").alias("mean_ppl"),
        ).collect()[0]
        assert row["kept"] is not None
        return time.perf_counter() - t0

    run()  # warmup: python-worker spawn + model broadcast fetch (one-time
    #        per-executor costs on a real cluster; metric = steady state)
    # best-of-3: at test scale (5k docs) a single run is ±50% noisy on a
    # shared box; min of 3 is the stable steady-state estimator.
    return min(run() for _ in range(3)), n_docs


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--repeat", type=int, default=1,
                   help="steady-state repetitions per query AFTER the "
                        "first run; best (min) becomes the warm time")
    p.add_argument("--round", default=os.environ.get("SPARK_GRAFT_ROUND",
                                                     "latest"),
                   help="round tag for the BENCH/bench_r{N}.json artifact")
    p.add_argument("--min-host-eff", type=float, default=float(
        os.environ.get("SPARK_GRAFT_MIN_HOST_EFF", "0.5")),
                   help="healthy-host gate (r05, VERDICT r04 §next.3): "
                        "probe the md5 8->32-thread scaling efficiency "
                        "BEFORE the suite and wait for a window where it "
                        "reaches this floor, so round-over-round totals "
                        "compare like for like; 0 disables")
    p.add_argument("--max-wait-sec", type=float, default=float(
        os.environ.get("SPARK_GRAFT_MAX_WAIT_SEC", "300")),
                   help="upper bound on healthy-window waiting — after "
                        "this the bench runs anyway and records that the "
                        "gate did not pass (r05 measured eff ~0.10 "
                        "consistently across minutes: on this box the "
                        "~8-core ceiling is a steady condition, so an "
                        "unbounded wait would stall the driver, not find "
                        "a window)")
    args = p.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    # Healthy-host gate: a pure-C md5 probe (~seconds) before the
    # expensive suite. In a degraded window (eff near 0.25, i.e. 32
    # threads no faster than 8) every local[32] timing below carries
    # oversubscription noise — r04's 92.7 s headline was captured at
    # eff 0.118 and became a misleading comparison anchor. Bounded
    # wait: sleeps never extend past the deadline, so the stall is
    # capped at --max-wait-sec plus one final probe (~seconds).
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from hwcontrol import efficiency, md5_thread_secs

    gate_probes: list[float] = []
    if args.min_host_eff > 0:
        gate_deadline = time.time() + args.max_wait_sec
        while True:
            eff = efficiency(md5_thread_secs((8, 32)), 8, 32)
            gate_probes.append(eff)
            remaining = gate_deadline - time.time()
            if eff >= args.min_host_eff or remaining <= 0:
                break
            time.sleep(min(60.0, remaining))
        host_gate = {"min_eff": args.min_host_eff, "probes": gate_probes,
                     "passed": bool(gate_probes[-1] >= args.min_host_eff)}
    else:
        # gate disabled: no probe (it costs seconds on exactly the
        # degraded host one disables it for), and `passed` is None so
        # artifact consumers can tell "disabled" from "healthy window"
        host_gate = {"min_eff": 0.0, "probes": [], "passed": None}

    from datacanary_spark.session import get_spark

    spark = get_spark(app_name="datacanary_bench",
                      master=f"local[{args.cpus}]")

    import __spark_entry__ as entry_mod

    warmup(spark, args.sf_dir)

    first_run: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        # the FIRST execution is always the first-run sample — folding
        # repeats into it via min() would silently record a warm time
        # under the first-run label whenever --repeat > 1
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).collect()
        first_run[name] = round(time.perf_counter() - t0, 4)
        # steady-state passes: this query's codegen compiled and its
        # persisted intermediates warm — the number a long-running
        # cluster job sees. As of r04 this is the HEADLINE (first-run
        # kept as the secondary column): r02/r03 showed first-run diffs
        # are dominated by Catalyst/JIT compile noise (e.g.
        # rule_engine_verdicts 5.7 s first vs 0.67 s warm with an
        # unchanged plan), so warm is the signal a 100-TB job sees.
        best = float("inf")
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        warm[name] = round(best, 4)
        # isolate queries from each other (r04): the LSH/near-dup
        # queries persist intermediates they never unpersist, so
        # without this a query's warm run could reuse (or be evicted
        # by) a NEIGHBOR query's leaked blocks — timings then shift
        # whenever the suite gains a query, which is exactly the
        # round-over-round noise this file exists to avoid. Within one
        # query's own first+warm pair the persist still works.
        spark.catalog.clearCache()

    filt_sec, n_docs = bench_filter_pipeline(spark, args.sf_dir)
    # the pipeline number is already steady-state (min-of-3 after its
    # own warm-up) — mirror it into both sets so the totals cover the
    # same key set and stay comparable
    first_run["filter_pipeline_full"] = round(filt_sec, 4)
    warm["filter_pipeline_full"] = round(filt_sec, 4)

    # Same-window hardware control (r04n): this box's effective thread
    # ceiling swings by >2x between host windows (BENCH/BASELINE.md
    # "unstable host" sections) — a pure-C md5 probe alongside every
    # bench run lets round-over-round diffs separate host drift from
    # plan regressions. secs_per_md5_unit_1t is the absolute
    # single-thread speed reference; eff_8_to_32 near or below 0.25
    # means 32 workers run no faster than 8 in this window and every
    # local[32] timing above carries that oversubscription.
    hw = md5_thread_secs((1, 8, 32))
    hw_control = {
        "threads_1_sec": round(hw[1], 3),
        "threads_8_sec": round(hw[8], 3),
        "threads_32_sec": round(hw[32], 3),
        "eff_1_to_8": round(hw[1] / hw[8] / 8, 3),
        "eff_8_to_32": round(hw[8] / hw[32] / 4, 3),
    }

    total = round(sum(warm.values()), 4)
    result = {
        "hw_md5_control": hw_control,
        "host_gate": host_gate,
        "metric": "quality_filter_suite_warm_total",
        "value": total,
        "unit": "sec",
        "queries": warm,
        "queries_first_run": first_run,
        "first_run_total": round(sum(first_run.values()), 4),
        # r03 compatibility aliases: r03 keyed warm numbers as
        # queries_warm/warm_total (with first-run as the headline) —
        # keep the old names so cross-round tooling can diff either way
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 4),
        "sf": parse_sf(args.sf_dir),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / filt_sec, 2) if filt_sec > 0 else None,
        "cpus": str(args.cpus),
        "protocol": "warm (all tables scanned + flagship run before timing); "
                    "HEADLINE value/queries are steady-state (best of "
                    f"{max(1, args.repeat)} post-first runs per query) as of "
                    "r04 — compare to r03's warm_total/queries_warm; "
                    "first-run times (r01-r03 headline protocol; always the "
                    "literal first execution) are in "
                    "queries_first_run/first_run_total; cache cleared "
                    "between queries (r04) so timings are independent of "
                    "suite composition",
        "notes": {
            "embedding_near_dup_pairs":
                "exact all-pairs oracle twin, O(n^2) by design (corpus "
                "capped at 1k vectors); the scale path is "
                "embedding_near_dup_lsh_pairs (bucketed)",
            "knn_bruteforce_top5":
                "exact scan baseline; scale paths are ann_lsh_top5 / "
                "ann_ivf_top5",
            "incremental_ingest_accepted":
                "end-to-end store demo: builds a fresh on-disk "
                "SignatureStore and runs TWO full ingest commits per "
                "invocation (~16 Spark jobs of writes/reads on a "
                "150-doc corpus) — time is job-scheduling fixed cost, "
                "not data; per-doc throughput evidence is "
                "BENCH/BASELINE.md's ingest N->4N run",
        },
        "round": str(args.round),
    }
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    # zero-pad numeric rounds so the artifact name matches the driver's
    # BENCH_r{NN}.json convention (bench_r02.json, not bench_r2.json)
    tag = f"{int(args.round):02d}" if str(args.round).isdigit() else args.round
    artifact = f"bench_r{tag}.json"
    with open(os.path.join(bench_dir, artifact), "w") as f:
        json.dump(result, f, indent=2, sort_keys=True)

    # The driver captures only the LAST 2000 CHARS of stdout and parses
    # the JSON line out of that tail. r01's line fit; once the registry
    # passed ~60 queries the line overflowed the buffer and the driver
    # recorded "parsed": null for r02 and r03. So the PRINTED line is a
    # compact summary trimmed to a hard byte budget — headline metric +
    # the costliest warm queries — while the full 118-query detail
    # (first-run + warm + notes) lives in BENCH/bench_r{tag}.json.
    print(json.dumps(compact_line(result, artifact)))
    spark.stop()


STDOUT_BUDGET = 1600  # chars; driver tail buffer is 2000 — leave headroom


def compact_line(result: dict, artifact: str) -> dict:
    """Build the stdout JSON line under ``STDOUT_BUDGET`` chars.

    Keeps every scalar headline field and as many of the slowest warm
    queries as fit (slowest first — those are the ones a regression
    diff cares about); drops entries until the serialized line fits.
    """
    warm = result["queries"]
    ranked = sorted(warm, key=lambda k: -warm[k])
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "cpus": result["cpus"],
        "round": result["round"],
        "n_queries": len(warm),
        "first_run_total": result["first_run_total"],
        "n_docs": result["n_docs"],
        "docs_per_sec": result["docs_per_sec"],
        "hw_md5_control": result["hw_md5_control"],
        "host_gate": result["host_gate"],
        "detail_file": f"BENCH/{artifact}",
        "queries_note": "slowest warm queries only (stdout tail budget); "
                        "full per-query map in detail_file",
        "queries": {},
    }
    for k in ranked:
        line["queries"][k] = warm[k]
        if len(json.dumps(line)) > STDOUT_BUDGET:
            del line["queries"][k]
            break
    return line


if __name__ == "__main__":
    sys.exit(main())
