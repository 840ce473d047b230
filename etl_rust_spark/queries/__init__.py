"""Declared analytics query surface (SURVEY.md §2.6).

``DECLARED`` maps query name → :class:`Query` carrying the Spark-dialect
and DuckDB-dialect SQL.  Most queries are portable (identical text); five
are dual-form where the dialects differ in function names only
(documented per query).
"""

from etl_rust_spark.queries.declared import DECLARED, Query  # noqa: F401

__all__ = ["DECLARED", "Query"]
