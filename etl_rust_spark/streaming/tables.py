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

__all__ = [
    "run_versioned_upsert_stream",
    "versioned_upsert_processor",
    "sync_table_changes",
    "publish_table_changes",
]


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


def sync_table_changes(
    spark,
    table: str,
    keys: list[str],
    apply_fn,
    cursor_path: str,
    max_steps: int | None = None,
) -> int:
    """Incremental downstream sync off the CDC feed (r9): read the
    versions committed since the last run, hand their change rows to
    ``apply_fn(changes_df, up_to_version)``, and advance a durable
    cursor — the consumer half of :func:`versions.read_table_changes`,
    shaped like a Delta-CDF `foreachBatch` sink without needing a
    Structured Streaming source for the version log.

    - ``cursor_path`` holds the last APPLIED version (one-line file,
      atomic ``os.replace`` after ``apply_fn`` returns) — crash before
      the write re-delivers the same changes next run, so ``apply_fn``
      must be idempotent (keyed upsert/delete naturally is; the same
      at-least-once-into-idempotent-sink contract as the ETL writer).
    - A cold start (no cursor) begins at the CURRENT head without
      replaying history: the downstream bootstraps from
      ``read_table_version(latest)`` and this keeps it current after.
    - ``max_steps`` bounds versions per run (backlog pacing); returns
      the number of versions applied.

    Drive it from any scheduler loop or a `foreachBatch` of an
    unrelated trigger stream; each run is ONE lazy plan over only the
    dirty partitions of the versions it covers."""
    import os
    import uuid as _uuid
    from pathlib import Path

    from etl_rust_spark.versions import latest_version, read_table_changes

    head = latest_version(table)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {table}")
    cp = Path(cursor_path)
    if cp.exists():
        cursor = int(cp.read_text().strip())
        if cursor > head:
            raise ValueError(
                f"cursor {cursor} is ahead of table head {head} — wrong "
                "cursor file or the table was recreated"
            )
    else:
        cursor = head  # cold start: current head, no history replay
    to_v = head if max_steps is None else min(head, cursor + max_steps)
    applied = 0
    if to_v > cursor:
        changes = read_table_changes(
            spark, table, keys, from_version=cursor, to_version=to_v
        )
        apply_fn(changes, to_v)
        applied = to_v - cursor
    cp.parent.mkdir(parents=True, exist_ok=True)
    tmp = cp.with_name(f"{cp.name}.{_uuid.uuid4().hex}")
    tmp.write_text(str(to_v))
    os.replace(tmp, cp)
    return applied


def publish_table_changes(
    spark,
    table: str,
    keys: list[str],
    client_factory,
    cursor_path: str,
    topic: str | None = None,
    encoder="json",
    max_steps: int | None = None,
    **publish_kw,
) -> int:
    """CDC feed → queue transport: publish each newly committed
    version's change rows (``_change_type`` insert/delete/
    update_postimage, full payload, ``_commit_version``) through the
    existing ``etl.sinks.publish_table`` machinery — the table stack
    feeding the same publish path (chunking, retry ladder, per-worker
    client reuse) the block ETL uses, so a downstream queue consumer
    tails the table exactly like it tails the chain.

    Durable-cursor semantics ride :func:`sync_table_changes`: the
    cursor advances only after the publish returns, so a crash
    re-publishes the same change rows next run — at-least-once into
    consumers that dedupe on ``(keys..., _commit_version)`` (which the
    feed makes unique per change).  Returns versions published."""
    from pathlib import Path

    from etl_rust_spark.etl.sinks import publish_table

    dest = topic or Path(table).name

    def apply_fn(changes: DataFrame, up_to: int) -> None:
        publish_table(changes, dest, client_factory, encoder, **publish_kw)

    return sync_table_changes(
        spark, table, keys, apply_fn, cursor_path, max_steps
    )
