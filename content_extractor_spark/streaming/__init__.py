"""Structured Streaming adapters for incremental extraction."""

from .incremental import host_rates, run_available_now, streaming_extract  # noqa: F401
from .stateful import streaming_dedup  # noqa: F401
