"""Structured Streaming front door (SURVEY §2.13)."""

from .scene_stream import (
    drain_available_now,
    drain_partial_to_parquet,
    drain_to_parquet,
    run_available_now,
    stream_sessionize,
    stream_static_join,
    stream_stream_interval_join,
    stream_table,
    stream_windowed_counts,
    write_batch_partial,
)

__all__ = [
    "drain_available_now",
    "drain_partial_to_parquet",
    "drain_to_parquet",
    "run_available_now",
    "stream_sessionize",
    "stream_static_join",
    "stream_stream_interval_join",
    "stream_table",
    "stream_windowed_counts",
    "write_batch_partial",
]
