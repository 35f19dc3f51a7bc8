"""Plan inspection helpers."""

from .inspect import plan_report  # noqa: F401
