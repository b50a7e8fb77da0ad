from node_gedcom_graph_spark.streaming.pipeline import (  # noqa: F401
    read_events_stream,
    stream_distinct_event_types,
    stream_gedcom_pipeline,
    stream_sessionized_counts,
    stream_stream_view_purchase_join,
    stream_windowed_event_counts,
)
