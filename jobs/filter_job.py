"""spark-submit entry point for the quality-filter job.

    spark-submit --py-files dist/datacanary_spark.zip jobs/filter_job.py \
        --input <pages dir/table> --output <dir> [--chunks N] [--buckets N]

On a real cluster the SparkSession comes from spark-submit's conf
(master/executors set there); locally it falls back to local[*].
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--buckets", type=int, default=None)
    p.add_argument("--from-html", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from datacanary_spark.plans.checkpoint import run_filter_job

    spark = (SparkSession.builder.appName("datacanary_filter_job")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    summary = run_filter_job(spark, args.input, args.output,
                             n_chunks=args.chunks,
                             repartition_buckets=args.buckets,
                             extract_from_html=args.from_html)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
