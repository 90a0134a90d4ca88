from datacanary_spark.streaming.filter_stream import (  # noqa: F401
    idempotent_parquet_sink,
    run_filter_stream,
    stream_dedup_pages,
    stream_hourly_counts,
    stream_hourly_counts_append,
)
