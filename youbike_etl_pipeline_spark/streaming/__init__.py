"""Structured Streaming layer (SURVEY §2.8)."""

from .ingest import (
    hourly_windowed_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    stream_dedup_counts,
    upsert_foreach_batch,
)

__all__ = [
    "hourly_windowed_counts_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "stream_dedup_counts",
    "upsert_foreach_batch",
]
