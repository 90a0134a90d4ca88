"""SparkSession builder tuned for this engine.

Local mode is used for tests/bench (``local[N]``), but every knob here is
chosen for multi-executor scale:

* AQE on (runtime coalescing + skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong somewhere; AQE fixes it per-stage.
* Arrow on — every pandas-UDF boundary moves columnar batches, not rows.
* ``spark.sql.shuffle.partitions`` defaults to cores in local mode; on a
  real cluster callers pass ``shuffle_partitions`` sized to ~128 MB of
  post-shuffle data per partition.
* UTC session timezone — timestamp semantics must not depend on the host.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH = 2048  # docs per Arrow batch; web pages are big rows


def get_spark(
    app_name: str = "datacanary_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = DEFAULT_ARROW_BATCH,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's standard config."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or _default_master()
    if shuffle_partitions is None:
        shuffle_partitions = _default_shuffle_partitions(master)

    # glibc malloc tuning for the Python UDF workers: without this, every
    # large numpy temp is a fresh mmap whose first-touch page faults
    # serialize all workers on the kernel's mmap_lock (measured 26× slower
    # per allocation here, and it ruins multi-core scaling). Keeping big
    # allocations on the heap makes worker arenas warm once and get reused
    # across Arrow batches. Set before the JVM starts so workers inherit.
    for var in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(var, "1073741824")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE partition sizing, env-parameterized for cluster runs. The
        # defaults are Spark's own: parallelismFirst=true + 64m
        # advisory. A/B-measured here (r06): forcing byte-advisory
        # coalescing (parallelismFirst=false) LOST 19s over the suite —
        # post-shuffle stages in this engine are CPU-bound on tiny
        # bytes (ADC scoring, signature estimation, gram folds), so
        # collapsing them to one 64MB-sized partition serializes real
        # work. On a 100-TB cluster, where post-shuffle bytes are
        # orders of magnitude above the advisory size, the same knobs
        # land on large parallel partitions either way; operators that
        # need map-side parallelism regardless of AQE use
        # plans/partitioning.spread_to_parallelism.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY", "64m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let the planner pick shuffled-hash joins when its size checks
        # pass (guide §3.1/§9): SHJ skips both sort passes of an SMJ.
        # A/B on the join-heavy bench subset: −4s net (ingest −3.1,
        # components −2.3, small queries ±0.3 noise). The SHJ OOM risk
        # (a build-side partition that cannot spill... Spark 4's SHJ
        # does spill) is bounded by the planner's own per-partition
        # size checks; env-overridable for cluster runs.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824")
        # reuse python workers (model cache + warm malloc arenas persist)
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def _default_shuffle_partitions(master: str) -> int:
    """In local[N] mode, N shuffle partitions; AQE coalesces further."""
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return max(int(inner), 1)
        except ValueError:
            return 32
    return 200
