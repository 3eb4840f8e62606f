"""Structured-streaming variants of the event analytics."""

from .event_analytics import (
    read_event_stream,
    sessionize,
    windowed_event_counts,
)

__all__ = ["read_event_stream", "windowed_event_counts", "sessionize"]
