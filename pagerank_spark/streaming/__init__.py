from pagerank_spark.streaming.events import (
    read_events_stream,
    windowed_event_counts,
    streaming_edge_degrees,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "streaming_edge_degrees",
]
