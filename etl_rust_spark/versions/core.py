"""Manifest log primitives: paths, load, staging, the CAS commit,
conflict retry, and table-op metrics.

Mechanical split of the former single-module versions.py (r11); see the package __init__ for the public surface."""

from __future__ import annotations

import json
import os
import shutil
import threading as _threading
import uuid
from pathlib import Path

from pyspark.sql import DataFrame


def _manifest_dir(path: str) -> Path:
    return Path(path) / "_manifests"


def _manifest_path(path: str, version: int) -> Path:
    return _manifest_dir(path) / f"m{version:08d}.json"


def latest_version(path: str) -> int | None:
    """The committed version number, or None for an empty table dir."""
    try:
        return int((Path(path) / "_latest").read_text())
    except FileNotFoundError:
        return None


def list_versions(path: str) -> list[int]:
    """All COMMITTED versions (dangling manifests past ``_latest`` — a
    crashed writer — are not versions)."""
    n = latest_version(path)
    if n is None:
        return []
    return [
        v
        for v in sorted(
            int(p.stem[1:]) for p in _manifest_dir(path).glob("m*.json")
        )
        if v <= n
    ]


# a delta-form manifest chain is capped by writing a full (checkpoint)
# manifest at this depth — bounds both reconstruction cost (≤16 small
# JSON reads) and how many ancestor manifests retention must keep
_CHECKPOINT_EVERY = 16


def _load_manifest(path: str, version: int) -> dict:
    """The FULL view of a version: scalar fields plus materialized
    ``files`` and ``stats``.

    On disk a manifest is either FULL (has ``files`` — a checkpoint) or
    DELTA (``added``/``removed`` relative to its parent) — the Delta-
    Lake-style answer to commit metadata growing with TABLE size
    instead of CHANGE size: a 1 M-file table's upsert writes KBs of
    delta, not a 100 MB file list, and every
    :data:`_CHECKPOINT_EVERY`-th commit checkpoints so reconstruction
    walks a bounded chain.  Every consumer goes through here and only
    ever sees the full view."""
    raw = json.loads(_manifest_path(path, version).read_text())
    fv = int(raw.get("format", 1))
    if fv > _FORMAT_VERSION:
        # the reader/writer protocol gate every table format needs
        # (Delta protocol versions / Iceberg format-version): refuse
        # loudly instead of misreading future layouts
        raise ValueError(
            f"version {version} of {path} was written with manifest "
            f"format {fv}; this reader understands <= {_FORMAT_VERSION} "
            "— upgrade the library to read this table"
        )
    if "files" in raw:
        return raw
    chain = [raw]
    cur = raw
    while True:
        cur = json.loads(_manifest_path(path, cur["parent"]).read_text())
        if "files" in cur:
            base = cur
            break
        chain.append(cur)
    files = set(base["files"])
    stats = dict(base.get("stats") or {})
    for d in reversed(chain):  # oldest delta first
        for f in d["removed"]:
            files.discard(f)
            stats.pop(f, None)
        files.update(d["added"])
        stats.update(d.get("stats") or {})
    out = dict(raw)
    out["files"] = sorted(files)
    out["stats"] = {f: stats[f] for f in out["files"] if f in stats}
    return out


def _stage_files(df: DataFrame, table: str, partition_by: str | None) -> list[str]:
    """Write ``df`` to a staging dir, then move every part file into
    ``data/`` under a collision-free name; returns data-relative paths."""
    root = Path(table)
    stage = root / f"_stage-{uuid.uuid4().hex}"
    w = df.write
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(str(stage))
    data = root / "data"
    out: list[str] = []
    for f in sorted(stage.rglob("*.parquet")):
        rel = f.relative_to(stage)
        dest = data / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        os.rename(f, dest)
        out.append(str(rel))
    shutil.rmtree(stage)
    return out


# ------------------------------------------------------------ metrics
# O-01 parity for the table layer: process-local counters a
# MetricsServer exposes via ``register("table", table_metrics)`` —
# commits by operation, CAS conflicts/retries, retention drops.
import threading as _threading

_METRICS_LOCK = _threading.Lock()
_METRICS: dict[str, int] = {}


def _bump(name: str, n: int = 1) -> None:
    with _METRICS_LOCK:
        _METRICS[name] = _METRICS.get(name, 0) + n


def table_metrics() -> dict[str, int]:
    """Snapshot of the table-layer counters (for MetricsServer)."""
    with _METRICS_LOCK:
        return dict(_METRICS)


class CommitConflict(Exception):
    """Another writer committed between this writer's read of the table
    head and its manifest creation.  Merge-dependent callers
    (:func:`upsert_table_version`, :func:`compact_table_version`)
    catch this and re-merge against the new head; full snapshots just
    re-number."""


# a manifest whose _latest swap hasn't landed this long after creation
# belongs to a writer that died between the two commit steps (the gap
# is milliseconds in a live process) — safe to sweep and take its slot
_STALE_MANIFEST_SECONDS = 60.0

# manifest format version; _load_manifest refuses manifests newer
# than it understands (absent key reads as 1).  Format 2 = the
# manifest may carry a column_map (metadata-only renames): commits
# stamp 2 only when a map is present, so format-1 readers refuse
# exactly the tables they would misread and nothing else
_FORMAT_VERSION = 2


def _commit(path: str, files: list[str], count: int, parent: int | None,
            partition_by: str | None, stats_cols: list[str] | None = None,
            stats: dict | None = None,
            schema: dict | None = None,
            bloom_conf: dict | None = None,
            op: str | None = None,
            deletes: list[dict] | None = None,
            constraints: dict | None | type(...) = ...,
            txn: dict | None | type(...) = ...,
            properties: dict | None | type(...) = ...,
            column_map: dict | None | type(...) = ...,
            transform: dict | None | type(...) = ...) -> int:
    """Optimistic-concurrency commit (r8, VERDICT r7 #5).

    ``parent`` is the head this commit's content was computed AGAINST.
    Two CAS layers make concurrent writers safe without a lock service:

    1. creating ``m{N}.json`` with ``O_EXCL`` is the exclusive claim on
       version N — exactly one writer can own it.  If the log moved
       past ``parent`` (head advanced, or N is already claimed), the
       commit raises :class:`CommitConflict` instead of silently
       orphaning the loser, and the caller re-merges;
    2. the ``_latest`` pointer swap is forward-only under a short
       ``flock`` — a writer that stalls after claiming N can never
       regress the pointer once N+1 has landed.

    A claimed-but-unswapped manifest from a CRASHED writer would block
    its slot forever; claims older than ``_STALE_MANIFEST_SECONDS``
    with the pointer still behind are swept and retried.  (Object-store
    deployments map step 1 to a conditional PUT; flock assumes a POSIX
    filesystem, documented.)"""
    import fcntl
    import time

    _manifest_dir(path).mkdir(parents=True, exist_ok=True)
    head = latest_version(path) or 0
    if (parent or 0) != head:
        _bump("commit_conflicts_total")
        raise CommitConflict(
            f"table {path} advanced to version {head} while this commit "
            f"was computed against {parent or 0}"
        )
    version = head + 1
    # writer identity: lets the pre-swap re-verify below detect a
    # stale-claim sweep stealing this slot (ADVICE r8: a writer paused
    # longer than _STALE_MANIFEST_SECONDS between claim and swap must
    # lose loudly via CommitConflict, never silently share version N)
    writer = uuid.uuid4().hex
    # commit timestamp, recorded IN the manifest (rename-safe — expiry's
    # delta→checkpoint materialization os.replace()s the file, so mtime
    # lies) and forced MONOTONE over the parent's so AS OF <timestamp>
    # resolution is unambiguous even across clock skew between writers
    ts = time.time()
    if parent:
        try:
            phead = json.loads(_manifest_path(path, parent).read_text())
        except (FileNotFoundError, json.JSONDecodeError):
            phead = {}
        pts = phead.get("ts")
        if pts is not None:
            ts = max(ts, float(pts) + 1e-6)
        if constraints is ...:
            # CHECK constraints are table metadata: inherited by every
            # commit unless explicitly changed (add/drop_table_constraint)
            constraints = phead.get("constraints")
        if txn is ...:
            # the txnAppId→txnVersion idempotence ledger (Delta parity)
            # rides the manifests the same way
            txn = phead.get("txn")
        if properties is ...:
            # TBLPROPERTIES ride the manifests like constraints
            properties = phead.get("properties")
        if column_map is ...:
            # logical→physical column mapping: inherited by partial
            # ops (which stage PHYSICAL); full re-snapshot ops pass
            # None explicitly — they re-baseline physical = logical
            column_map = phead.get("column_map")
        if transform is ...:
            # a partition TRANSFORM rides its synthetic directory
            # column: inherited exactly while the commit keeps the
            # parent's partition_by; re-partitioning (alter) names a
            # different column and the transform drops with the layout
            transform = (
                phead.get("partition_transform")
                if phead.get("partition_by") == partition_by
                else None
            )
    else:
        if constraints is ...:
            constraints = None
        if txn is ...:
            txn = None
        if properties is ...:
            properties = None
        if column_map is ...:
            column_map = None
        if transform is ...:
            transform = None
    manifest = {
        # stamp the MINIMUM format this manifest requires (readers
        # compare against the max they understand); a column_map below
        # raises it to 2
        "format": 1,
        "version": version,
        "parent": parent,
        "writer": writer,
        "ts": ts,
        "partition_by": partition_by,
        "count": count,
        "files": sorted(files),
        "stats_cols": stats_cols or [],
        "stats": stats or {},
    }
    if schema is not None:
        # recorded only when no data file can carry it (an EMPTY
        # version, e.g. delete_table_version removing every row) so
        # read_table_version can still plan a typed empty frame
        manifest["schema"] = schema
    if bloom_conf is not None:
        manifest["blooms_conf"] = bloom_conf
    if deletes:
        # merge-on-read delete sidecars (VERDICT r9 #3): [{"path":
        # <data-relative parquet of row fingerprints>, "files": [data
        # files the sidecar applies to]}].  Stored IN FULL in every
        # manifest (delta form included) — the list is bounded by
        # delete ops since the last fold, not table size
        manifest["deletes"] = deletes
    if constraints:
        # CHECK constraints {name: sql_expr} — stored in full in every
        # manifest so inheritance is one parent read (KBs)
        manifest["constraints"] = constraints
    if txn:
        manifest["txn"] = txn
    if properties:
        manifest["properties"] = properties
    if column_map:
        manifest["column_map"] = column_map
        manifest["format"] = 2  # format-1 readers must refuse, not misread
    if transform:
        # hidden partitioning: the directory column is DERIVED — readers
        # that don't know transforms would surface the synth column and
        # mistype it, so the format gate covers it too
        manifest["partition_transform"] = transform
        manifest["format"] = max(manifest["format"], 2)
    if op:
        manifest["op"] = op  # DESCRIBE HISTORY: what produced this version
    if parent and schema is None:
        # DELTA form when the change is smaller than the table and the
        # chain is shallow (see _load_manifest): commit metadata then
        # costs O(changed files), the 100 TB requirement
        try:
            praw = json.loads(_manifest_path(path, parent).read_text())
        except (FileNotFoundError, json.JSONDecodeError):
            praw = None
        if praw is not None:
            depth = int(praw.get("depth", 0))
            if depth + 1 < _CHECKPOINT_EVERY:
                pfiles = set(_load_manifest(path, parent)["files"])
                nfiles = set(files)
                added = sorted(nfiles - pfiles)
                removed = sorted(pfiles - nfiles)
                if len(added) + len(removed) < len(nfiles):
                    manifest = {
                        "format": 1,
                        "version": version,
                        "parent": parent,
                        "writer": writer,
                        "ts": ts,
                        "partition_by": partition_by,
                        "count": count,
                        "depth": depth + 1,
                        "added": added,
                        "removed": removed,
                        "stats_cols": stats_cols or [],
                        "stats": {
                            f: (stats or {})[f]
                            for f in added
                            if f in (stats or {})
                        },
                    }
                    if bloom_conf is not None:
                        manifest["blooms_conf"] = bloom_conf
                    if deletes:
                        manifest["deletes"] = deletes
                    if constraints:
                        manifest["constraints"] = constraints
                    if txn:
                        manifest["txn"] = txn
                    if properties:
                        manifest["properties"] = properties
                    if column_map:
                        manifest["column_map"] = column_map
                        manifest["format"] = 2
                    if transform:
                        manifest["partition_transform"] = transform
                        manifest["format"] = max(manifest["format"], 2)
                    if op:
                        manifest["op"] = op
    mp = _manifest_path(path, version)
    try:
        fd = os.open(mp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        # stale claim from a crashed writer?  (pointer still behind N
        # and the claim is old).  The age check + unlink run UNDER
        # _latest.lock (ADVICE r9): an unserialized sweep could fire in
        # the gap between a stalled victim's in-lock writer-id
        # re-verify and its pointer swap — rewriting m{N}.json while
        # the victim still publishes N and returns success, silently
        # losing one of the two commits.  Under the lock the sweep
        # serializes with verify-and-swap: if the victim swapped first,
        # `latest_version >= N` here and the sweep declines (loud
        # CommitConflict for the sweeper); if the sweep won, the
        # victim's re-verify sees the foreign writer id (loud
        # CommitConflict for the victim).  Never both-succeed.
        swept = False
        with open(Path(path) / "_latest.lock", "a") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                try:
                    age = time.time() - mp.stat().st_mtime
                except FileNotFoundError:
                    age = 0.0
                if (
                    age > _STALE_MANIFEST_SECONDS
                    and (latest_version(path) or 0) < version
                ):
                    mp.unlink(missing_ok=True)
                    swept = True
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
        if swept:
            return _commit(
                path, files, count, parent, partition_by, stats_cols,
                stats, schema, bloom_conf, op, deletes, constraints, txn,
                properties, column_map, transform,
            )
        _bump("commit_conflicts_total")
        raise CommitConflict(
            f"version {version} of {path} was claimed concurrently"
        ) from None
    with os.fdopen(fd, "w") as f:
        f.write(json.dumps(manifest, indent=1))
    if _commit._pause_before_swap is not None:  # test hook: stall window
        _commit._pause_before_swap(mp)
    # commit point: readers see the version only after the pointer swap
    root = Path(path)
    with open(root / "_latest.lock", "a") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            # TOCTOU guard (ADVICE r8): if this writer stalled past
            # _STALE_MANIFEST_SECONDS, the sweep in the claim path may
            # have unlinked our manifest and handed slot N to another
            # writer.  Re-verify on-disk ownership before publishing —
            # a mismatch means our commit content is NOT what m{N}.json
            # holds, so returning N would silently lose this commit.
            try:
                on_disk = json.loads(mp.read_text()).get("writer")
            except (FileNotFoundError, json.JSONDecodeError):
                on_disk = None
            if on_disk != writer:
                raise CommitConflict(
                    f"version {version} of {path} was reclaimed by a "
                    f"stale-claim sweep while this writer was stalled"
                )
            if _commit._pause_after_verify is not None:  # test hook
                _commit._pause_after_verify(mp)
            cur = latest_version(path) or 0
            if version > cur:  # forward-only
                tmp = root / f"_latest.{uuid.uuid4().hex}"
                tmp.write_text(str(version))
                os.replace(tmp, root / "_latest")
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    _bump("commits_total")
    if op:
        _bump(f"commits_{op.split('(')[0]}")
    return version


# test-only injection point: called(manifest_path) between the manifest
# write and the _latest swap, simulating a writer stalled in the gap the
# stale-claim sweep races against (ADVICE r8 TOCTOU)
_commit._pause_before_swap = None
# test-only injection point: called(manifest_path) INSIDE _latest.lock
# between the writer-id re-verify and the pointer swap — the window the
# ADVICE r9 fix closes (a sweep firing here must block on the lock and
# then decline, never rewrite m{N}.json under a publishing victim)
_commit._pause_after_verify = None



# CAS retry budget: a writer contending with N peers loses up to ~N
# races per peer commit, so the budget must comfortably exceed the
# expected writer count × their in-flight commits (an 8-writer × 5-
# commit stress exhausted the old budget of 10 — found r9s2; each loss
# already costs a full Spark re-merge, so generous attempts are cheap
# relative to the work they retry)
_CAS_ATTEMPTS = 40


def _retry_conflicts(fn, what: str, attempts: int | None = None):
    """Optimistic-concurrency loop: re-run ``fn`` (which re-reads the
    head and re-merges) until its commit lands or ``attempts``
    (default :data:`_CAS_ATTEMPTS`) is exhausted — a clean error, never
    lost data.  Losing attempts may leave already-staged data files in
    ``data/`` — they are unreferenced by any manifest, invisible to
    readers, and swept by :func:`expire_versions`.  Backoff is
    jittered-exponential (capped) so synchronized losers de-correlate
    instead of re-racing in lockstep."""
    import random
    import time

    if attempts is None:
        attempts = _CAS_ATTEMPTS
    last: CommitConflict | None = None
    for i in range(attempts):
        try:
            return fn()
        except CommitConflict as exc:
            last = exc
            _bump("commit_retries_total")
            time.sleep(random.uniform(0, 0.02 * (1 << min(i, 5))))
    raise CommitConflict(f"{what}: gave up after {attempts} attempts") from last


def list_tags(path: str) -> dict[str, int]:
    out = {}
    for tf in sorted((Path(path) / "_tags").glob("*")):
        if tf.name.startswith("."):
            continue  # in-flight temp from tag_version
        try:
            out[tf.name] = int(tf.read_text())
        except (ValueError, FileNotFoundError):
            continue
    return out
