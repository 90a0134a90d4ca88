"""spark-submit entry point for the training-data export job.

    spark-submit --py-files dist/datacanary_spark.zip jobs/export_job.py \
        --input <corpus dir/table> --output <dir> [any `export` flag]

Delegates to the CLI's ``export`` subcommand (split + global shuffle +
sharded write) so the spark-submit flag surface IS the CLI flag
surface — same no-drift rationale as curate_job.py. Under spark-submit
the pre-existing SparkContext wins ``getOrCreate`` inside
``datacanary_spark.session.get_spark``, so the cluster master /
executors from the submit conf apply unchanged; locally it falls back
to ``local[*]``.
"""

from __future__ import annotations

import sys


def main() -> int:
    from datacanary_spark.cli import main as cli_main

    return cli_main(["export", *sys.argv[1:]])


if __name__ == "__main__":
    sys.exit(main())
