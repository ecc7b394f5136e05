"""Structured Streaming tier: streaming twins of the batch event analytics."""

from .events import (
    hourly_event_counts,
    read_event_stream,
    run_available_now,
    run_to_files,
    sessionize_stream,
    user_running_stats,
)

__all__ = [
    "hourly_event_counts",
    "read_event_stream",
    "run_available_now",
    "run_to_files",
    "sessionize_stream",
    "user_running_stats",
]
