"""Shared column expressions + canonical result hashing."""

from etl_rust_spark.functions.hashing import canonical_rows, canonical_hash  # noqa: F401
