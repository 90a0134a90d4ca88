"""Root-cause probe for the first-run compile spike (VERDICT r03 #7).

The profiler / rule-engine queries show a large first-run vs warm gap
(rule_engine_verdicts 5.7 s first / 0.67 s warm at sf0.1). Candidate
causes: (a) Catalyst analysis + Janino whole-stage codegen compile of
the ~40-expression aggregate projection, (b) JVM JIT warm-up of the
interpreter/codegen infrastructure itself, (c) parquet footer reads.

Protocol: each VARIANT runs in a FRESH JVM (subprocess), times the
SAME query three times back-to-back, and prints per-run wall times.
Variants toggle the codegen machinery:

  default     — wholeStage codegen on (production config)
  no-ws       — spark.sql.codegen.wholeStage=false (expression codegen
                still on; removes Janino whole-stage class compile)
  interpreted — spark.sql.codegen.factoryMode=NO_CODEGEN +
                wholeStage=false (no Janino at all; pure interpreted
                expression eval)

Reading the result: if the first-run spike survives with Janino fully
removed (interpreted), the cost is JVM JIT + analysis, not plan-
addressable; if `no-ws`/`interpreted` kill the spike, it is compile
cost and a fast-start session option is worth shipping.

Usage:
  python scripts/coldstart_probe.py            # run all variants
  python scripts/coldstart_probe.py _child <variant> <query> <sf_dir>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

VARIANTS = {
    "default": {},
    "no-ws": {"spark.sql.codegen.wholeStage": "false"},
    "interpreted": {"spark.sql.codegen.wholeStage": "false",
                    "spark.sql.codegen.factoryMode": "NO_CODEGEN"},
}


def child(variant: str, query: str, sf_dir: str) -> None:
    import __spark_entry__ as entry
    from datacanary_spark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark(app_name=f"coldstart-{variant}", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf=VARIANTS[variant])
    session_s = time.perf_counter() - t0

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        entry.queries()[query](spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"variant": variant, "query": query,
                      "session_s": round(session_s, 3), "runs": runs}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    sf_dir = "/root/testdata/sf0.1"
    queries = ["rule_engine_verdicts", "profile_numeric_nchars"]
    for query in queries:
        for variant in VARIANTS:
            out = subprocess.run(
                [sys.executable, __file__, "_child", variant, query, sf_dir],
                capture_output=True, text=True, check=True)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            print(line, flush=True)


if __name__ == "__main__":
    main()
