from sayn_spark.streaming.stateful import (  # noqa: F401
    dedup_stream,
    running_user_totals,
    ttl_user_totals,
)
from sayn_spark.streaming.materialise import (  # noqa: F401
    dedup_ingest_batch,
    stream_ann_ingest,
    stream_ann_search,
    stream_chunk,
    stream_decontaminate,
    stream_dedup_ingest,
    stream_merge_into,
    stream_route_media,
    stream_surprisal_filter,
)
from sayn_spark.streaming.streams import (  # noqa: F401
    attribution_join_stream,
    content_filter_stream,
    dynamic_session_stream,
    hourly_aggregate_stream,
    read_events_stream,
    sessionize_stream,
    stream_copy,
    stream_hash_sample,
)
