"""Streaming maintenance of versioned tables: each micro-batch commits
one MERGE as a new version (``versions.upsert_table_version`` inside
``foreachBatch``).

Exactly-once posture: the version LOG is append-only and the upsert is
content-idempotent — a replayed epoch (Spark re-invokes a crashed
foreachBatch with the same rows) commits another version whose ROWS
equal the previous head, so downstream readers of ``read_table_version
(latest)`` never see duplicates or lost updates; the redundant version
is retention fodder for ``expire_versions``.  This trades a spare
manifest (KBs) for never needing epoch bookkeeping inside the table —
the same replay-idempotency-over-markers choice as streaming/rollup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["run_versioned_upsert_stream", "versioned_upsert_processor"]


def versioned_upsert_processor(
    table: str,
    keys: list[str],
    partition_by: str | None = None,
):
    """The ``foreachBatch`` body, exposed so tests can drive epochs and
    replays directly (the streaming/rollup.py pattern)."""
    from etl_rust_spark.versions import upsert_table_version

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_table_version(
            batch_df.sparkSession, table, batch_df,
            keys=keys, partition_by=partition_by,
        )

    return process


def run_versioned_upsert_stream(
    delta_stream: DataFrame,
    table: str,
    checkpoint_dir: str,
    keys: list[str],
    partition_by: str | None = None,
):
    """Start the maintenance query; returns the StreamingQuery."""
    return (
        delta_stream.writeStream.foreachBatch(
            versioned_upsert_processor(table, keys, partition_by)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
