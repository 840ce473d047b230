"""Batch ETL pipeline: range extraction, fan-out writes, queue sinks, goldens."""

from etl_rust_spark.etl.goldens import check_golden, create_test_set, save_range
from etl_rust_spark.etl.pipeline import RunStats, run_range
from etl_rust_spark.etl.sinks import (
    DirQueueClient,
    PublishStats,
    publish_table,
    publish_tables,
)
from etl_rust_spark.etl.writer import time_bucket_cols, write_table, write_tables

__all__ = [
    "RunStats",
    "run_range",
    "write_table",
    "write_tables",
    "time_bucket_cols",
    "save_range",
    "create_test_set",
    "check_golden",
    "DirQueueClient",
    "PublishStats",
    "publish_table",
    "publish_tables",
]
