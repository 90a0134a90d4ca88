from datacanary_spark.streaming.filter_stream import (  # noqa: F401
    run_filter_stream,
    stream_hourly_counts,
    stream_hourly_counts_append,
)
