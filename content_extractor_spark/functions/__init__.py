"""Standalone column functions / UDFs (SURVEY §2.7)."""

from .udfs import clean_url_udf, content_hash_udf, register_all  # noqa: F401
