"""SparkSession factory.

Mirrors the reference's static bootstrap (env + feature validation,
``/root/reference/src/main.rs:247-274``, ``src/features.rs:9-35``) as a
single audited session builder: every engine entry point goes through
``get_spark`` so session semantics (UTC, nanos handling, AQE) are uniform.

Scale notes (100 TB design):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast-join demotion/promotion replace any hand-tuned plan choices.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster set it ~2-3x total cores (or rely on AQE coalescing
  from a high initial value).
- Arrow enabled for the pandas-UDF paths (operators/multimodal, similarity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CONFS"]

# Session-wide semantics every component relies on.  Keep this the single
# source of truth: the DuckDB oracle runs with TimeZone=UTC, and the
# events table is parquet TIMESTAMP(NANOS) which PySpark only reads via
# nanosAsLong (see FIXTURES.md §3).
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + aggregate pushdown where legal.
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Don't let tiny test files explode into thousands of tasks, and don't
    # let one 1 GB file become one task at scale: ~128 MB split targets.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
}


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "etl-rust-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset).  On a cluster, pass ``master=None`` with an external
    spark-submit master and these confs still apply.
    """
    cpus = _cpus()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may return a pre-existing session: re-assert the runtime
    # confs that matter for correctness (static ones can't change, but all
    # of these are runtime-settable).
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.adaptive.enabled",
    ):
        spark.conf.set(k, confs[k])
    return spark
