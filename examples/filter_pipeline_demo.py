"""Library-composition example: the full web-text quality-filter
pipeline over a generated pages corpus — heuristics + language-ID +
perplexity + PII scrub, then per-partition lineage and corpus metrics.

    python examples/filter_pipeline_demo.py [n_docs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile


def main(n_docs: int = 500) -> None:
    from datacanary_spark.plans.lineage import corpus_metrics, partition_lineage
    from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.fixtures import write_pages_parquet

    spark = get_spark(app_name="example_filter")
    pages_dir = tempfile.mkdtemp(prefix="pages_")
    write_pages_parquet(pages_dir, int(n_docs), seed=7)

    pages = spark.read.parquet(pages_dir)
    verdicts = filter_pages(pages, broadcast_models(spark),
                            repartition_buckets=8)

    print("-- corpus metrics --")
    corpus_metrics(verdicts).show(truncate=False)
    print("-- lineage (first 5 partitions) --")
    partition_lineage(verdicts).orderBy("partition_id").show(5, truncate=False)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
