"""Event-stream operators (batch + Structured Streaming)."""

from jodie_spark.streaming.delta_sink import write_stream_to_delta
from jodie_spark.streaming.events import sessionize, windowed_event_counts

__all__ = ["sessionize", "windowed_event_counts", "write_stream_to_delta"]
