"""Event-stream operators (batch + Structured Streaming)."""

from jodie_spark.streaming.events import sessionize, windowed_event_counts

__all__ = ["sessionize", "windowed_event_counts"]
