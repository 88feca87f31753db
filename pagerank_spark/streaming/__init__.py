from pagerank_spark.streaming.events import (
    read_events_stream,
    windowed_event_counts,
    streaming_edge_degrees,
)
from pagerank_spark.streaming.sessions import sessionize

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "streaming_edge_degrees",
    "sessionize",
]
