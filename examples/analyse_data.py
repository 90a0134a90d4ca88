"""Library-composition example: profile a parquet dataset and save the
stats as JSON (the rebuild's twin of the reference's analyse_data.py
example — one Spark scan instead of per-stat pandas passes).

    python examples/analyse_data.py [path/to/table.parquet] [out.json]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json


def main(path: str = "/root/testdata/sf0.001/documents.parquet",
         out: str | None = None) -> dict:
    from datacanary_spark.operators.profiler import analyse_dataframe
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.io import read_table

    spark = get_spark(app_name="example_analyse")
    profile = analyse_dataframe(read_table(spark, path))
    for col, info in profile.items():
        stats = info["stats"]
        print(f"{col:12s} type={info['type']:14s} "
              f"nulls={stats['null_percentage']}% "
              f"unique={stats['unique_percentage']}%")
    if out:
        with open(out, "w") as f:
            json.dump({"dataset": path, "profile": profile}, f,
                      indent=2, default=str)
        print(f"written: {out}")
    return profile


if __name__ == "__main__":
    main(*sys.argv[1:])
