"""Structured Streaming front door (SURVEY §2.13)."""

from .scene_stream import run_available_now, stream_windowed_counts

__all__ = ["run_available_now", "stream_windowed_counts"]
