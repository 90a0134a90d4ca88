"""spark-submit entry point for the composed curation job
(filter → exact dedup → line dedup → stratified mix).

    spark-submit --py-files dist/datacanary_spark.zip jobs/curate_job.py \
        --input <pages dir/table> --output <dir> \
        [--fractions en=1.0,de=0.5] [--no-line-dedup] [--from-html]

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
    p.add_argument("--fractions", default=None,
                   help="stratum=fraction pairs, e.g. en=1.0,de=0.5")
    p.add_argument("--strata-col", default="lang_pred")
    p.add_argument("--key-col", default="url")
    p.add_argument("--no-line-dedup", action="store_true")
    p.add_argument("--from-html", action="store_true")
    p.add_argument("--decontaminate-against", default=None)
    p.add_argument("--decontaminate-mode", choices=["exact", "winnow"],
                   default="winnow")
    args = p.parse_args()

    from datacanary_spark.cli import parse_fractions

    fractions = parse_fractions(args.fractions) if args.fractions else None

    from pyspark.sql import SparkSession

    from datacanary_spark.plans.curate import run_curation_job

    spark = (SparkSession.builder.appName("datacanary_curate_job")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    summary = run_curation_job(
        spark, args.input, args.output, fractions=fractions,
        strata_col=args.strata_col, key_col=args.key_col,
        line_dedup=not args.no_line_dedup,
        extract_from_html=args.from_html,
        decontaminate_path=args.decontaminate_against,
        decontaminate_mode=args.decontaminate_mode)
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
