from sayn_spark.streaming.streams import (  # noqa: F401
    hourly_aggregate_stream,
    read_events_stream,
    sessionize_stream,
    stream_copy,
)
