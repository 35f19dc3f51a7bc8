"""Spark DataFrame operators (Catalyst-first; the extract UDF is the
single non-Catalyst compute step)."""
