from cminer_spark.streaming.edges_stream import (
    stream_edges,
    stream_tool_invocation_counts,
)

__all__ = ["stream_edges", "stream_tool_invocation_counts"]
