"""etl_rust_spark — a PySpark-native analytics + ETL engine.

Brand-new engine with the query/data-processing capabilities of the
``blockchain-etl/etl-rust`` streaming ETL framework (reference at
/root/reference, studied for behavior only), re-expressed Spark-first:
DataFrame/SQL logical plans optimized by Catalyst, Structured Streaming
for unbounded sources, and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout
------
- ``session``    SparkSession factory (UTC, AQE, parquet-nanos handling)
- ``catalog``    schema registry + loaders for the synthetic test tables
- ``queries``    declared analytics query surface (SURVEY.md §2.6)
- ``operators``  LLM-data operators: dedup / similarity / text / multimodal
- ``sources``    range/list/subscription scans, checkpoint resume, ChainConfig
- ``etl``        block→table transform fan-out + partitioned multi-sink writer
- ``streaming``  Structured Streaming windows/watermark/foreachBatch pipeline
- ``functions``  canonical hashing + shared column expressions
- ``plans``      physical-plan inspection helpers (scale/pushdown assertions)
- ``versions``   versioned tables: snapshots, time travel, DML, CDC, retention
- ``deltalake``  jar-free Delta Lake interop (read/export/import/stream)
- ``iceberg``    jar-free Apache Iceberg interop (read/export/import)
"""

__version__ = "0.1.0"

from etl_rust_spark.session import get_spark  # noqa: F401
from etl_rust_spark.catalog import register_views, load_table  # noqa: F401
