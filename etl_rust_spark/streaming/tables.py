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
    "replicate_table_changes",
    "CDCRetentionError",
]


class CDCRetentionError(Exception):
    """The CDC cursor points below the oldest surviving version —
    retention expired manifests the consumer still needed, so the
    change feed over (cursor, head] can never be reconstructed and the
    cursor can never advance (ADVICE r9: this used to wedge the
    consumer forever with a FileNotFoundError deep in
    read_table_changes).  Remediation: re-bootstrap the downstream
    from ``read_table_version(latest)`` and delete the cursor file
    (the next run cold-starts at the current head); prevention: size
    the table's ``expire_versions(keep_last=...)`` to cover the
    consumer's worst-case lag, or have the consumer hold a
    :class:`~etl_rust_spark.versions.Pin`/tag on its cursor version."""


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

    from etl_rust_spark.versions import (
        latest_version, list_versions, read_table_changes,
    )

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
    if to_v > cursor:
        # retention guard (ADVICE r9): the feed over (cursor, to_v]
        # walks every manifest in [cursor, to_v]; if expire_versions
        # dropped any (keep_last smaller than this consumer's lag), the
        # cursor could never advance — fail with the re-bootstrap story
        # instead of a FileNotFoundError loop
        surviving = set(list_versions(table))
        gone = [v for v in range(cursor, to_v + 1) if v not in surviving]
        if gone:
            raise CDCRetentionError(
                f"CDC cursor {cursor} of {table} needs versions "
                f"{gone[0]}..{gone[-1]} that retention already expired "
                f"(oldest surviving: {min(surviving, default=head)}) — "
                "re-bootstrap the downstream from read_table_version"
                "(latest) and delete the cursor file; prevent this by "
                "sizing keep_last over consumer lag or pinning/tagging "
                "the cursor version"
            )
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


def replicate_table_changes(
    spark,
    source: str,
    target: str,
    keys: list[str],
    cursor_path: str,
    partition_by: str | None = None,
    max_steps: int | None = None,
) -> int:
    """Versioned-table → versioned-table replication off the CDC feed
    (VERDICT r9 #6 — the composition the change feed exists for): on a
    COLD START (no cursor) the target is bootstrapped from the source
    head snapshot; afterwards each run applies the source's new
    versions to the target IN COMMIT ORDER — deletes via
    :func:`~etl_rust_spark.versions.delete_table_version`, inserts and
    update postimages via
    :func:`~etl_rust_spark.versions.upsert_table_version` — and
    advances the durable cursor.  Returns versions applied.

    Exactly-once posture: the cursor lands AFTER the apply (crash →
    the same versions re-deliver next run), and every applied op is
    content-idempotent — a replayed upsert commits a version whose rows
    equal the head, a replayed delete matches nothing — so the target's
    HEAD CONTENT equals the source's synced version after any
    kill+resume, with redundant versions left for the target's own
    retention.  The bootstrap is crash-safe the same way: a crash
    between the snapshot upsert and the first cursor write re-runs the
    bootstrap idempotently.

    Each step applies as ONE :func:`~etl_rust_spark.versions.
    merge_table_version` commit (r10 s2 — previously a delete commit
    plus an upsert commit per step, with the deleted keys COLLECTED to
    the driver to build an OR-chain predicate, a plan-size hazard on
    high-churn steps): the feed's ``_change_type`` drives the clauses
    directly — ``WHEN MATCHED AND s._change_type = 'delete' THEN
    DELETE``, ``WHEN MATCHED THEN UPDATE *``, ``WHEN NOT MATCHED AND
    s._change_type <> 'delete' THEN INSERT`` — so a step is atomic on
    the target, no keys ever pass through the driver, and the rewrite
    cost rides merge's hit-file narrowing.  Driver-side costs: one
    ``_commit_version`` distinct per run.  Backlog is paced with
    ``max_steps``; consumers lagging past the source's retention get
    :class:`CDCRetentionError` with the re-bootstrap story."""
    import os
    import uuid as _uuid
    from pathlib import Path

    from pyspark.sql import functions as F

    from etl_rust_spark.versions import (
        latest_version,
        merge_table_version,
        read_table_version,
        upsert_table_version,
        write_table_version,
    )

    cp = Path(cursor_path)
    if not cp.exists():
        head = latest_version(source)
        if head is None:
            raise FileNotFoundError(f"no committed versions under {source}")
        snap = read_table_version(spark, source, head)
        if latest_version(target) is None:
            write_table_version(snap, target, partition_by)
        else:
            upsert_table_version(spark, target, snap, keys, partition_by)
        # cursor pinned to the SNAPSHOT's head (not sync's possibly
        # newer head read) so versions landing between the snapshot and
        # the first incremental run are never skipped
        cp.parent.mkdir(parents=True, exist_ok=True)
        tmp = cp.with_name(f"{cp.name}.{_uuid.uuid4().hex}")
        tmp.write_text(str(head))
        os.replace(tmp, cp)

    def apply_fn(changes, up_to: int) -> None:
        # materialize the multi-version feed ONCE (it is one lazy plan;
        # per-step filters would otherwise re-run every diff per step)
        changes = changes.localCheckpoint(eager=True)
        step_vs = sorted(
            r[0]
            for r in changes.select("_commit_version").distinct().collect()
        )
        for v in step_vs:  # commit order: a delete+reinsert must not flip
            step = changes.filter(
                F.col("_commit_version") == v
            ).drop("_commit_version")
            merge_table_version(
                spark, target, step, keys,
                when_matched_delete="s._change_type = 'delete'",
                when_matched_update="*",
                when_not_matched_insert="s._change_type <> 'delete'",
            )

    return sync_table_changes(
        spark, source, keys, apply_fn, cursor_path, max_steps
    )


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
