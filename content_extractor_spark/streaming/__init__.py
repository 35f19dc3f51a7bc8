"""Structured Streaming adapters for incremental extraction."""

from .incremental import streaming_extract, run_available_now  # noqa: F401
