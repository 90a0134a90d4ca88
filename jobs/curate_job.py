"""spark-submit entry point for the composed curation job.

    spark-submit --py-files dist/datacanary_spark.zip jobs/curate_job.py \
        --input <pages dir/table> --output <dir> [any `curate` flag]

Delegates to the CLI's ``curate`` subcommand so the spark-submit flag
surface IS the CLI flag surface — this file used to carry its own
argparse copy and silently drifted seven stage flags behind
(near-dup/span-dedup/host-cap/classifier/gopher-repetition/DSIR/
temperature). Under spark-submit the pre-existing SparkContext wins
``getOrCreate`` inside ``datacanary_spark.session.get_spark``, so the
cluster master/executors from the submit conf apply unchanged; locally
it falls back to ``local[*]``.
"""

from __future__ import annotations

import sys


def main() -> int:
    from datacanary_spark.cli import main as cli_main

    return cli_main(["curate", *sys.argv[1:]])


if __name__ == "__main__":
    sys.exit(main())
