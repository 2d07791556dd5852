from cminer_spark.streaming.dedup_stream import stream_exact_dedup
from cminer_spark.streaming.edges_stream import (
    stream_edges,
    stream_tool_invocation_counts,
)
from cminer_spark.streaming.sessionize_stream import stream_sessionize

__all__ = [
    "stream_edges",
    "stream_tool_invocation_counts",
    "stream_exact_dedup",
    "stream_sessionize",
]
