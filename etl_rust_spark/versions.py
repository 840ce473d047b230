"""Manifest-based table versioning: snapshots, time travel, file-level
copy-on-write upserts — the minimal honest slice of what Iceberg/Delta
manifests do, on plain parquet.

The reference has no table-maintenance layer at all (extract→publish,
src/example_config/mod.rs); catalog.py already gives this repo keyed
upserts, snapshot diff, clustering and layout audits.  What those can't
do is answer "what did this table look like yesterday" or make a commit
atomic — both are manifest problems, not data problems:

Layout::

    table/
      _latest                    # one line: the committed version number
      _manifests/m00000001.json  # {"version", "files": [...], "count", ...}
      data/[p=<val>/]<uuid>-part-*.parquet

- A VERSION is a manifest: an explicit list of data files (relative to
  ``data/``).  Readers list nothing — they read ``_latest`` (or any
  older version number), load that manifest, and scan exactly its
  files with ``basePath`` so directory-partition columns survive.
- A COMMIT is ``os.replace`` of ``_latest`` — atomic on POSIX.  Files
  and manifest land first; a crash before the marker leaves dangling
  files that no reader ever sees (and that :func:`expire_versions`
  sweeps), never a half-visible version.
- An UPSERT is file-level copy-on-write: only the delta's dirty
  partitions are rewritten (the ``catalog.upsert_table`` discipline);
  every untouched partition's files are REFERENCED AGAIN by the new
  manifest rather than copied — so N versions of a slowly-changing
  table cost one table plus the churn, and old versions stay readable
  byte-identically.
- MULTI-WRITER SAFE via optimistic concurrency (r8): ``O_EXCL``
  creation of ``m{N}.json`` is the exclusive claim on version N, the
  ``_latest`` swap is forward-only under a short ``flock``, and a
  losing writer re-merges against the new head instead of silently
  orphaning its commit (:class:`CommitConflict` protocol in
  :func:`_commit`).  Object stores map the claim to a conditional PUT.
- Readers are not tracked (no lease service): a long reader holding
  version N races :func:`expire_versions` deleting N's files — size
  ``keep_last`` to cover reader lag, use ``grace_seconds`` so in-flight
  writers' staged files and fresh claims are never swept, or register a
  :class:`Pin`.
- DELETE is dual-mode (r10): copy-on-write rewrites only the hit files;
  ``mode="mor"`` (merge-on-read, Iceberg-v2-delete-file shaped) writes
  a fingerprint SIDECAR instead — zero data files rewritten, readers
  anti-join the broadcast-sized sidecar, and compaction folds the debt.
- Time travel resolves by version number, tag name, or ``as_of``
  timestamp (commit instants recorded in the manifests, monotone).
- History is LINEAR by design: every commit's parent is the head it
  was computed against (CAS-enforced), so there are no branches —
  :func:`tag_version` gives named read refs and
  :func:`restore_table_version` gives rollback, which together cover
  what table workloads actually use branches for without the merge
  semantics a version log of data files cannot honestly provide.

100 TB posture: manifests hold file PATHS (KBs per thousand files) and
live on the driver; data moves only for dirty partitions; time-travel
reads plan from an explicit file list, which also sidesteps eventually-
consistent directory listings on object stores.  ``os.rename`` of
staged files into ``data/`` is metadata-only on a real filesystem; an
object-store deployment would stage directly into ``data/`` with unique
names (Spark's part-UUIDs already are) and skip the move.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_table_version",
    "commit_appended_files",
    "upsert_table_version",
    "read_table_version",
    "version_at_timestamp",
    "list_versions",
    "latest_version",
    "alter_table_version",
    "rename_columns",
    "delete_table_version",
    "update_table_version",
    "merge_table_version",
    "diff_table_versions",
    "read_table_changes",
    "compact_table_version",
    "expire_versions",
    "CommitConflict",
    "Pin",
    "pin_version",
    "tag_version",
    "restore_table_version",
    "add_table_constraint",
    "drop_table_constraint",
    "table_constraints",
    "clone_table",
    "table_detail",
    "aggregate_table_metadata",
    "table_partitions",
    "MetadataInsufficient",
    "set_table_properties",
    "unset_table_properties",
    "table_properties",
    "history",
    "delete_tag",
    "list_tags",
    "table_metrics",
]


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


_ROWS_KEY = "rows:"    # per-file stats-dict key: exact footer row count
_TRUNC_KEY = "trunc:"  # per-file marker: "trunc:<col>" → bounds widened

# String min/max longer than this are stored as WIDENED bounds (Iceberg's
# truncate(w) semantics): min keeps its first _STATS_TRUNCATE code points
# (a prefix is <= the full value, a sound lower bound); max keeps the
# prefix with its last code point incremented (strictly above every value
# sharing the prefix, a sound upper bound).  Pruning only ever KEEPS more
# files under widened bounds, so every prune path stays correct; exact
# consumers (aggregate_table_metadata) see the "trunc:<col>" marker and
# refuse.  Without this, one wide-string stats column (document text,
# URLs) makes manifest size O(files x value width) — the 100 TB metadata
# hazard delta-form manifests were built to avoid.
_STATS_TRUNCATE = 64


def _trunc_upper(s: str, n: int) -> str | None:
    """Shortest string of <= n code points that upper-bounds every string
    with prefix ``s[:n]``: the prefix with its last incrementable code
    point bumped (skipping the UTF-16 surrogate gap so code-point order
    keeps matching Spark's UTF-8 byte order).  None when no such bound
    exists (prefix entirely U+10FFFF) — caller drops the stats entry."""
    p = s[:n]
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c >= 0x10FFFF:
            continue
        return p[:i] + chr(0xE000 if c == 0xD7FF else c + 1)
    return None


def _file_stats(table: str, files: list[str], cols: list[str]) -> dict:
    """Per-file [min, max] of ``cols`` from the parquet FOOTERS (pyarrow,
    driver-side metadata read — the layout_report mechanics), keyed by
    data-relative path.  Columns a file lacks or carries no stats for
    are simply absent — pruning treats that as "cannot skip".

    Every file additionally records its exact footer row count under
    ``rows:`` (Delta/Iceberg parity) — the key metadata-only COUNTs and
    per-partition row reporting read; string bounds wider than
    ``_STATS_TRUNCATE`` are stored widened with a ``trunc:<col>``
    marker (see above).

    Caveat (measured r10 s3, SCALE.md): parquet-mr OMITS footer
    min/max whenever min+max together exceed 4 KB, so a stats column
    over document-body text records no bounds at all — those files
    simply lack the entry and pruning keeps them.  Range stats belong
    on keys/URLs/timestamps; document text wants a fingerprint or
    bloom column instead."""
    import pyarrow.parquet as pq

    data = Path(table) / "data"
    out: dict[str, dict[str, object]] = {}
    for rel in files:
        meta = pq.ParquetFile(str(data / rel)).metadata
        fstats: dict[str, object] = {_ROWS_KEY: meta.num_rows}
        out[rel] = fstats
        if not meta.num_row_groups:
            continue
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        for c in cols:
            if c not in idx:
                continue
            lo = hi = None
            ok = True
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if not ok:
                continue
            if isinstance(lo, str) and (
                len(lo) > _STATS_TRUNCATE or len(hi) > _STATS_TRUNCATE
            ):
                up = (
                    hi if len(hi) <= _STATS_TRUNCATE
                    else _trunc_upper(hi, _STATS_TRUNCATE)
                )
                if up is None:
                    continue  # unbounded above: no sound entry possible
                fstats[c] = [lo[:_STATS_TRUNCATE], up]
                fstats[_TRUNC_KEY + c] = True
            else:
                fstats[c] = [lo, hi]
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


_BLOOM_KEY = "bloom:"  # per-file stats-dict key prefix for bloom entries


def _bloom_positions(value: str, bits: int, k: int) -> list[int]:
    """k bit positions via double hashing over one blake2b digest —
    deterministic across processes (no PYTHONHASHSEED dependence)."""
    import hashlib

    d = hashlib.blake2b(value.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % bits for i in range(k)]


def _point_probe_str(col: str, val) -> str:
    """Render a point-probe value EXACTLY as the bloom build did (the
    build hashes ``CAST(col AS STRING)``).  Python ``str()`` diverges
    from Spark's cast for bool ('True' vs 'true'), float, date and
    timestamp — a diverging rendering makes the bloom report a FALSE
    NEGATIVE and the file is silently pruned: rows dropped from reads,
    rows MISSED by delete/update (a GDPR-erasure hazard).  So bool is
    normalized to Spark's rendering, str/int pass through (identical in
    both engines), and everything else is rejected LOUDLY (ADVICE r9 —
    the limitation used to be documented but unenforced)."""
    if isinstance(val, bool):  # before int: bool is an int subtype
        return "true" if val else "false"
    if isinstance(val, (str, int)):
        return str(val)
    raise TypeError(
        f"point probe on {col!r} supports str/int/bool values only, got "
        f"{type(val).__name__}: Python's rendering of float/date/"
        "timestamp diverges from the CAST(col AS STRING) the bloom was "
        "built from, which would silently prune files that DO contain "
        "the key — pass the value pre-rendered with Spark cast semantics"
    )


def _bloom_might_contain(entry: dict, value: str) -> bool:
    import base64

    import numpy as np

    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(entry["b"]), dtype=np.uint8)
    )
    return all(bits[p] for p in _bloom_positions(value, entry["m"], entry["k"]))


def _file_blooms(
    spark: SparkSession, table: str, files: list[str], cols: list[str],
    bits: int, k: int,
) -> dict[str, dict]:
    """Per-file bloom filters over ``CAST(col AS STRING)`` — the
    point-lookup complement to min/max stats: a high-cardinality
    UNORDERED key (doc_id, uuid, address) has every file's [min, max]
    spanning the whole domain, so range stats prune nothing, while a
    1 KB bloom per file answers "could this file hold key X" with no
    false negatives (false positives only cost a read that min/max
    would have paid anyway).

    Built executor-side with ZERO shuffle: one columnar scan of only
    the bloom columns, per-Arrow-batch partial bitmaps, OR-merged on
    the driver (n_batches × n_cols tiny rows — control-plane sized).
    Size ``bits`` to ~10× the expected distinct keys per file; for
    very fat files prefer engine-native parquet bloom filters at write
    time and keep these for file-level (not row-group) skipping."""
    import base64

    import numpy as np
    import pandas as pd

    if not files or not cols:
        return {}
    data_abs = (Path(table) / "data").resolve()
    data = str(Path(table) / "data")
    df = spark.read.option("basePath", data).parquet(
        *[f"{data}/{f}" for f in files]
    )
    present = [c for c in cols if c in df.columns]
    if not present:
        return {}
    sel = df.select(
        F.input_file_name().alias("__f"),
        *[F.col(c).cast("string").alias(c) for c in present],
    )

    def gen(batches):
        for pdf in batches:
            fs, cs, bs = [], [], []
            for fname, sub in pdf.groupby("__f"):
                for c in present:
                    arr = np.zeros(bits, dtype=bool)
                    for v in sub[c]:
                        if v is None:
                            continue
                        for p in _bloom_positions(v, bits, k):
                            arr[p] = True
                    fs.append(fname)
                    cs.append(c)
                    bs.append(np.packbits(arr).tobytes())
            yield pd.DataFrame({"f": fs, "c": cs, "b": bs})

    def or_merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = np.zeros(bits // 8 + (1 if bits % 8 else 0),
                       dtype=np.uint8)
        for b in pdf["b"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"f": pdf["f"].iloc[:1],
                             "c": pdf["c"].iloc[:1],
                             "b": [acc.tobytes()]})

    # OR-merge the per-partition partials SPARK-SIDE so the collect is
    # exactly one row per (file, col) — without this, a file split
    # across P scan partitions ships P bitmaps to the driver (the
    # n_files x n_cols x P x bits/8 partial-collect VERDICT r10 named)
    partials = sel.mapInPandas(gen, "f string, c string, b binary")
    merged_df = partials.groupBy("f", "c").applyInPandas(
        or_merge, "f string, c string, b binary"
    )
    out: dict[str, dict] = {}
    for row in merged_df.collect():
        rel = _rel_from_file_uri(row["f"], data_abs)
        out.setdefault(rel, {})[_BLOOM_KEY + row["c"]] = {
            "m": bits,
            "k": k,
            "b": base64.b64encode(row["b"]).decode("ascii"),
        }
    return out


def _new_file_meta(
    spark: SparkSession, table: str, files: list[str],
    stats_cols: list[str] | None, bloom_conf: dict | None,
) -> dict:
    """Per-file metadata for freshly staged files: [min,max] footer
    stats for ``stats_cols`` plus bloom entries per ``bloom_conf`` —
    both live in the same per-file dict so every carry/reconstruct
    path moves them together.  Called with stats_cols=None it still
    records each file's exact ``rows:`` count (one driver-side footer
    read per NEW file — delta commits touch few)."""
    meta: dict[str, dict] = _file_stats(table, files, stats_cols or [])
    if bloom_conf and bloom_conf.get("cols"):
        for f, d in _file_blooms(
            spark, table, files, bloom_conf["cols"],
            int(bloom_conf.get("bits", 8192)), int(bloom_conf.get("k", 4)),
        ).items():
            meta.setdefault(f, {}).update(d)
    return meta


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


def _validate_constraints_duckdb(
    files: list[str], constraints: dict, what: str,
    column_map: dict[str, str] | None = None,
) -> None:
    """Sparkless CHECK validation (the versioned_table sink's commit
    hook runs in a Python worker with NO SparkSession): evaluate each
    constraint over the staged parquet with DuckDB — CHECK expressions
    are plain ANSI predicates, the shared dialect this repo's oracle
    mirrors live in.  FAIL CLOSED: an expression DuckDB cannot parse
    aborts the commit naming the constraint, never silently skips."""
    import duckdb

    quoted = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    src = f"read_parquet([{quoted}])"
    if column_map:
        # constraints reference LOGICAL names; the files are physical
        excluded = ", ".join(
            f'"{p}"' for p in sorted(column_map.values())
        )
        aliases = ", ".join(
            f'"{p}" AS "{lg}"' for lg, p in sorted(column_map.items())
        )
        src = f"(SELECT * EXCLUDE ({excluded}), {aliases} FROM {src})"
    con = duckdb.connect()
    bad: dict[str, int] = {}
    try:
        for name, expr in sorted(constraints.items()):
            try:
                n = con.execute(
                    f"SELECT count(*) FROM {src} "
                    f"WHERE NOT coalesce(({expr}), TRUE)"
                ).fetchone()[0]
            except Exception as exc:
                raise ValueError(
                    f"{what}: CHECK constraint {name!r} ({expr!r}) could "
                    "not be evaluated sparkless (DuckDB said: "
                    f"{exc}) — commit through a SparkSession path "
                    "(write_table_version/upsert) or simplify the "
                    "expression to ANSI predicates"
                ) from None
            if n:
                bad[name] = n
    finally:
        con.close()
    if bad:
        raise ValueError(
            f"{what} violates CHECK constraints (violating-row counts): "
            f"{bad}"
        )


def _new_file_meta_local(
    table: str, files: list[str], stats_cols: list[str] | None,
    bloom_conf: dict | None,
) -> dict:
    """Sparkless per-file metadata (the sink's commit hook): [min,max]
    via parquet footers, blooms via a pyarrow column read hashed with
    the SAME rendering contract as the probes (str/int pass through,
    bool normalizes, float/date/timestamp REJECTED — a diverging
    rendering would poison the bloom with false negatives)."""
    import base64

    import numpy as np
    import pyarrow.parquet as pq

    meta: dict[str, dict] = _file_stats(table, files, stats_cols or [])
    if bloom_conf and bloom_conf.get("cols"):
        data = Path(table) / "data"
        bits = int(bloom_conf.get("bits", 8192))
        k = int(bloom_conf.get("k", 4))
        for rel in files:
            t = pq.read_table(str(data / rel))
            for c in bloom_conf["cols"]:
                if c not in t.column_names:
                    continue
                arr = np.zeros(bits, dtype=bool)
                for v in t.column(c).to_pylist():
                    if v is None:
                        continue
                    for pos in _bloom_positions(
                        _point_probe_str(c, v), bits, k
                    ):
                        arr[pos] = True
                meta.setdefault(rel, {})[_BLOOM_KEY + c] = {
                    "m": bits,
                    "k": k,
                    "b": base64.b64encode(
                        np.packbits(arr).tobytes()
                    ).decode("ascii"),
                }
    return meta


def _column_map(m: dict) -> dict[str, str]:
    """The manifest's ``column_map`` — {logical: physical}, identity
    entries omitted (r10 s2, metadata-only renames / Delta
    column-mapping 'name' mode).  THE INVARIANT: everything under
    ``data/`` is PHYSICAL — file column names, stats/bloom keys,
    partition directory names, MoR sidecar fingerprints (whose column
    ORDER sorts by name, so they must never see a rename) — and the
    map applies only at the API boundary: read results surface logical
    names, user predicates/expressions arrive in logical names and are
    evaluated over an aliased projection (filter pushdown survives an
    alias, so file skipping is unaffected)."""
    return dict(m.get("column_map") or {})


def _phys_col(m: dict, name: str) -> str:
    return _column_map(m).get(name, name)


def _logical_pb(m: dict) -> str | None:
    """The partition column's LOGICAL name (manifests store the
    physical one — it names real directories)."""
    pb = m.get("partition_by") or None
    if pb is None:
        return None
    inv = {p: l for l, p in _column_map(m).items()}
    return inv.get(pb, pb)


# --------------------------------------------- hidden partition transforms
# (Iceberg partition-transform shaped, r10 s3): the table partitions on a
# DERIVED value — days(ts), bucket(n, k), truncate(w, s) — materialized
# as a synthetic STRING column that exists ONLY in directory names, never
# in the user schema or the payload parquet.  The invariant mirrors
# column mapping: everything under data/ is physical (directories carry
# the synth value; payload files never do — partitionBy excludes it),
# and the API boundary converts — _to_logical DROPS the synth column,
# _to_physical RE-DERIVES it from the source column (the transform is a
# pure expression, so recomputation is exact and survives UPDATEs to the
# source value: the row simply moves to its new directory).  Synth
# values are strings by construction so directory round-trips are
# engine-stable; physical reads cast the inferred directory column back
# to string (Spark's partition inference would type '2026-01-01' as
# DATE, which would desynchronize MoR fingerprints).


def _transform_of(m: dict) -> dict | None:
    return m.get("partition_transform") or None


def _synth_of(m: dict) -> str | None:
    """The synthetic partition column's name, or None for identity
    partitioning."""
    return m.get("partition_by") if _transform_of(m) else None


def _transform_expr(t: dict, source: str | None = None):
    """The transform as a Column over ``source`` (default: the recorded
    physical source column).  All transforms yield STRINGS.

    days/hours of a TIMESTAMP (instant) source are UTC days — pure
    epoch arithmetic, independent of ``spark.sql.session.timeZone``
    (Iceberg pins UTC for the same reason: a session-tz-dependent
    day boundary splits one table's layout across differently-
    configured writers).  DATE and TIMESTAMP_NTZ sources are wall
    values with no timezone at all, so their calendar rendering is
    already deterministic."""
    src = F.col(source or t["source"])
    kind = t["kind"]
    if kind in ("days", "hours"):
        st = t.get("src_type", "")
        if st.startswith("timestamp") and st != "timestamp_ntz":
            e = src.cast("bigint")  # epoch seconds — tz-free instant
            day = ((e - F.pmod(e, F.lit(86400))) / 86400).cast("int")
            d = F.date_from_unix_date(day).cast("string")
            if kind == "days":
                return d
            hr = F.pmod(
                ((e - F.pmod(e, F.lit(3600))) / 3600).cast("bigint"),
                F.lit(24),
            ).cast("int")
            return F.concat(
                d, F.lit("-"), F.lpad(hr.cast("string"), 2, "0")
            )
        return F.date_format(
            src, "yyyy-MM-dd" if kind == "days" else "yyyy-MM-dd-HH"
        )
    if kind == "bucket":
        # engine-native wide hash mod n — deterministic across sessions
        return F.pmod(F.xxhash64(src), F.lit(int(t["n"]))).cast("string")
    if kind == "truncate":
        return F.substring(src, 1, int(t["n"]))
    raise ValueError(f"unknown partition transform kind {kind!r}")


def _same_transform(a: dict | None, b: dict | None) -> bool:
    """Layout identity ignores the recorded src_type (an implementation
    detail of probe pruning, not of the partitioning)."""
    strip = lambda d: (
        {k: v for k, v in d.items() if k != "src_type"} if d else None
    )
    return strip(a) == strip(b)


def _parse_partition_spec(partition_by, df: DataFrame | None):
    """A user partition spec → (directory column name, transform dict).
    A plain string is identity partitioning (transform None); a tuple is
    ``("days"|"hours", source)`` or ``("bucket"|"truncate", source, n)``."""
    if partition_by is None or isinstance(partition_by, str):
        return partition_by, None
    spec = list(partition_by)
    kind = spec[0]
    if kind in ("days", "hours"):
        if len(spec) != 2:
            raise ValueError(f"partition_by=({kind!r}, source)")
        t = {"kind": kind, "source": spec[1]}
    elif kind in ("bucket", "truncate"):
        if len(spec) != 3 or int(spec[2]) <= 0:
            raise ValueError(f"partition_by=({kind!r}, source, n>0)")
        t = {"kind": kind, "source": spec[1], "n": int(spec[2])}
    else:
        raise ValueError(
            f"unknown partition transform {kind!r} — days | hours | "
            "bucket | truncate"
        )
    if df is not None:
        if t["source"] not in df.columns:
            raise ValueError(
                f"transform source column {t['source']!r} is not in the "
                "DataFrame"
            )
        dt = dict(df.dtypes)[t["source"]]
        if kind in ("days", "hours") and not dt.startswith(("timestamp", "date")):
            raise ValueError(f"{kind} transform needs a timestamp/date "
                             f"source; {t['source']!r} is {dt}")
        if kind == "truncate" and dt != "string":
            raise ValueError(f"truncate transform needs a string source; "
                             f"{t['source']!r} is {dt}")
        # recorded for every transform: bucket probe pruning needs the
        # xxhash64 byte encoding Spark used (long: 8 LE, int: 4 LE,
        # string: UTF-8 — parity pinned in tests), and days/hours need
        # to know instant-vs-wall to pick UTC epoch arithmetic
        t["src_type"] = dt
    n = t.get("n")
    synth = f"_p_{kind}{n if n is not None else ''}_{t['source']}"
    return synth, t


def _seg_value_of(rel: str):
    """A data-relative file path's partition directory value (unescaped),
    or None for __HIVE_DEFAULT_PARTITION__ / unpartitioned files."""
    from urllib.parse import unquote

    if "/" not in rel:
        return None
    raw = rel.rsplit("/", 1)[0].partition("=")[2]
    val = unquote(raw)
    return None if val == "__HIVE_DEFAULT_PARTITION__" else val


def _transform_prune_keep(t: dict, seg, prunes: list[tuple]) -> bool:
    """Directory-level pruning for transform tables: can a file whose
    partition value is ``seg`` hold a row matching every (source-column)
    range in ``prunes``?  Sound by the same widened-bounds argument as
    stats pruning — unknown cases KEEP the file.  days: lexicographic
    yyyy-MM-dd compare against day-prefixes of ISO-ish bounds; truncate:
    prefix-interval intersection.  bucket/hours directory pruning is
    deliberately absent (bucket needs the engine's hash driver-side;
    blooms cover point lookups)."""
    import datetime as _dt

    if seg is None:
        return True  # NULL-source rows: never prune on a range
    kind = t["kind"]
    if kind == "days":
        def day_of(v):
            if isinstance(v, (_dt.datetime, _dt.date)):
                return v.isoformat()[:10]
            if isinstance(v, str) and len(v) >= 10:
                d = v[:10]
                if d[4] == "-" and d[7] == "-":
                    return d
            return None
        for _, lo, hi in prunes:
            lo_d = day_of(lo) if lo is not None else None
            hi_d = day_of(hi) if hi is not None else None
            if (hi_d is not None and seg > hi_d) or (
                lo_d is not None and seg < lo_d
            ):
                return False
        return True
    if kind == "hours":
        def hour_of(v):
            if isinstance(v, _dt.datetime):
                return v.strftime("%Y-%m-%d-%H")
            if isinstance(v, _dt.date):
                return v.isoformat() + "-00"
            if isinstance(v, str) and len(v) >= 13:
                d, h = v[:10], v[11:13]
                if d[4] == "-" and d[7] == "-" and h.isdigit():
                    return f"{d}-{h}"
            return None
        for _, lo, hi in prunes:
            lo_h = hour_of(lo) if lo is not None else None
            hi_h = hour_of(hi) if hi is not None else None
            if (hi_h is not None and seg > hi_h) or (
                lo_h is not None and seg < lo_h
            ):
                return False
        return True
    if kind == "truncate":
        upper = _trunc_upper(seg, len(seg)) if seg else None
        for _, lo, hi in prunes:
            if hi is not None and isinstance(hi, str) and seg > hi:
                return False
            if (
                lo is not None
                and isinstance(lo, str)
                and upper is not None
                and upper <= lo
            ):
                return False
        return True
    return True


def _bucket_seg_of(t: dict, val) -> str | None:
    """Driver-side replica of the bucket transform —
    ``pmod(xxhash64(col), n)`` — for point-probe directory pruning.
    Returns the bucket directory value, or None when it cannot be
    computed EXACTLY (unknown/unrecorded source dtype, or a probe value
    of the wrong Python type) — None means "prune nothing", never a
    guess: a wrong bucket silently drops matching rows.  Byte-encoding
    parity with Spark's XxHash64 (seed 42) is pinned in tests: bigint →
    8-byte LE, int → 4-byte LE, string → UTF-8."""
    import struct

    from etl_rust_spark.etl.zstdcodec import xxhash64

    st = t.get("src_type")
    if isinstance(val, bool):
        return None
    if st == "bigint" and isinstance(val, int):
        data = struct.pack("<q", val)
    elif st == "int" and isinstance(val, int):
        data = struct.pack("<i", val)
    elif st == "string" and isinstance(val, str):
        data = val.encode("utf-8")
    else:
        return None
    h = xxhash64(data, seed=42)
    if h >= 1 << 63:
        h -= 1 << 64
    return str(h % int(t["n"]))


def _py_transform_value(t: dict, val, tz_name: str = "UTC") -> str:
    """Pure-Python twin of :func:`_transform_expr` for one value — the
    jar-free SINK's per-row synth derivation (no SparkSession in a
    DataSource writer).  MUST match Spark's rendering exactly: a row
    staged under the wrong directory value silently vanishes from
    later bucket point probes and day-range prunes, so anything this
    replica cannot compute EXACTLY raises (the `_bucket_seg_of`
    discipline — never a guess).

    ``tz_name`` is the writer's session timezone, captured DRIVER-side:
    instant (TimestampType) values arrive in the Python worker as
    naive datetimes rendered in the session zone, and the UTC epoch
    arithmetic needs the real instant back."""
    import datetime as _dt

    kind = t["kind"]
    if val is None:
        raise ValueError(
            f"NULL {t['source']!r} has no append-safe transform "
            "directory — route NULL-source rows through "
            "upsert_table_version"
        )
    if kind in ("days", "hours"):
        st = t.get("src_type", "")
        if st.startswith("timestamp") and st != "timestamp_ntz":
            if not isinstance(val, _dt.datetime):
                raise ValueError(
                    f"{kind} transform expected a datetime, got "
                    f"{type(val).__name__}"
                )
            if val.tzinfo is None:
                from zoneinfo import ZoneInfo

                val = val.replace(tzinfo=ZoneInfo(tz_name))
            # floor, not truncate-toward-zero: Spark's cast-to-bigint
            # floors, so a pre-1970 instant with fractional seconds
            # must land in the same day/hour directory
            import math as _math

            e = _math.floor(val.timestamp())
            d = (_dt.date(1970, 1, 1)
                 + _dt.timedelta(days=e // 86400)).isoformat()
            if kind == "days":
                return d
            return f"{d}-{(e // 3600) % 24:02d}"
        if isinstance(val, _dt.datetime):  # timestamp_ntz: wall value
            return val.strftime(
                "%Y-%m-%d" if kind == "days" else "%Y-%m-%d-%H"
            )
        if isinstance(val, _dt.date):
            return (val.isoformat() if kind == "days"
                    else val.isoformat() + "-00")
        raise ValueError(
            f"{kind} transform expected a date/datetime, got "
            f"{type(val).__name__}"
        )
    if kind == "bucket":
        seg = _bucket_seg_of(t, val)
        if seg is None:
            raise ValueError(
                f"bucket transform over {t.get('src_type')!r} has no "
                f"exact Python replica for {type(val).__name__} values "
                "— a wrong bucket directory silently drops the row "
                "from point probes; route through upsert_table_version"
            )
        return seg
    if kind == "truncate":
        if not isinstance(val, str):
            raise ValueError(
                f"truncate transform expected a string, got "
                f"{type(val).__name__}"
            )
        return val[: int(t["n"])]
    raise ValueError(f"unknown partition transform kind {kind!r}")


def _to_logical(df: DataFrame, m: dict) -> DataFrame:
    synth = _synth_of(m)
    if synth and synth in df.columns:
        df = df.drop(synth)
    cm = _column_map(m)
    if not cm:
        return df
    inv = {p: l for l, p in cm.items()}
    return df.select(*[F.col(c).alias(inv.get(c, c)) for c in df.columns])


def _to_physical(df: DataFrame, m: dict) -> DataFrame:
    cm = _column_map(m)
    if cm:
        df = df.select(*[F.col(c).alias(cm.get(c, c)) for c in df.columns])
    t = _transform_of(m)
    synth = _synth_of(m)
    if t and synth and synth not in df.columns:
        # re-derive from the (physical) source column — pure expression,
        # so a row whose source value changed lands in its NEW directory
        df = df.withColumn(synth, _transform_expr(t))
    return df


_HIVE_ESCAPE_CHARS = set('"#%\'*/:=?\\\x7f{[]^')


def _hive_escape(value: str) -> str:
    """Spark's ExternalCatalogUtils.escapePathName: control chars and
    the Hive-special set become %XX (uppercase hex); everything else —
    including non-ASCII — passes through.  Derived from the escaped
    set probed empirically against Spark 4.1's partitioned writer
    (parity pinned in tests against Spark-written directories)."""
    return "".join(
        f"%{ord(ch):02X}" if ord(ch) < 32 or ch in _HIVE_ESCAPE_CHARS
        else ch
        for ch in value
    )


def _hive_part_segment(col: str, val) -> str:
    """Render + escape a partition directory segment exactly as Spark
    would, so sink-staged files land in the SAME directory as
    Spark-staged ones.  Value types whose Python rendering diverges
    from Spark's cast-to-string (float, timestamp) are rejected loudly
    — the bloom-probe discipline; route those through
    upsert_table_version, where Spark itself stages the directories."""
    import datetime as _dt

    if val is None:
        raise ValueError(
            "NULL partition values cannot be appended (Spark routes "
            "them to __HIVE_DEFAULT_PARTITION__ and isin() cannot "
            "match them) — route through a full snapshot"
        )
    if isinstance(val, bool):
        s = "true" if val else "false"
    elif isinstance(val, (str, int)):
        s = str(val)
    elif isinstance(val, _dt.date) and not isinstance(val, _dt.datetime):
        s = val.isoformat()
    else:
        raise ValueError(
            f"partition value {val!r} ({type(val).__name__}) has no "
            "append-safe directory rendering — use str/int/bool/date "
            "partition columns or route through upsert_table_version"
        )
    return f"{_hive_escape(col)}={_hive_escape(s)}"


def _arrow_canon(t) -> str:
    """Canonical form for footer-schema compatibility checks: large/
    small string+binary unify (writer-dependent, read-identical), list
    element field names drop (Spark names 'element', pyarrow 'item'),
    timestamps keep unit + utc-adjustedness only (parquet stores a
    BOOLEAN isAdjustedToUTC, not a zone name)."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}{',utc' if t.tz else ''}]"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_canon(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(
            f"{t.field(i).name}: {_arrow_canon(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{_arrow_canon(t.key_type)}, {_arrow_canon(t.item_type)}>"
    return str(t)


def _parquet_ts_canon(col) -> str:
    """Spark-visible type of a parquet timestamp column (the pyspark
    4.1.2 read mapping — arrow's schema string is NOT enough: INT96
    surfaces as tz-naive timestamp[ns] yet Spark reads it as
    TimestampType): INT96 → utc; annotated NANOS → NTZ (read natively,
    micros-truncated); MICROS/MILLIS by isAdjustedToUTC."""
    if col.physical_type == "INT96":
        return "ts:utc"
    lt = json.loads(col.logical_type.to_json())
    if lt.get("timeUnit") == "nanoseconds":
        return "ts:ntz"
    return "ts:utc" if lt.get("isAdjustedToUTC") else "ts:ntz"


def _footer_canon(f: str) -> dict[str, str]:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f)
    s = pf.schema_arrow
    out = {n: _arrow_canon(s.field(n).type) for n in s.names}
    pqs = pf.schema
    for i in range(len(pqs)):
        c = pqs.column(i)
        # top-level timestamps only ('.' marks a nested path; nested
        # ones keep the arrow canon — the sink can't stage nested
        # types, so only same-writer files ever compare there)
        if "." not in c.name and out.get(c.name, "").startswith(
            "timestamp"
        ):
            out[c.name] = _parquet_ts_canon(c)
    return out


def _spark_json_canon(t) -> str:
    """Map a Spark schema-json type to the same canonical space as
    :func:`_arrow_canon` (the empty-head case: a delete-all manifest
    carries the schema json, no data file footer to compare against)."""
    flat = {
        "long": "int64", "integer": "int32", "short": "int16",
        "byte": "int8", "double": "double", "float": "float",
        "string": "string", "boolean": "bool", "binary": "binary",
        "date": "date32[day]", "timestamp": "ts:utc",
        "timestamp_ntz": "ts:ntz",
    }
    if isinstance(t, str):
        if t in flat:
            return flat[t]
        dm = re.match(r"decimal\((\d+),(\d+)\)$", t)
        if dm:
            return f"decimal128({dm.group(1)}, {dm.group(2)})"
    elif isinstance(t, dict):
        if t.get("type") == "array":
            return f"list<{_spark_json_canon(t['elementType'])}>"
        if t.get("type") == "struct":
            inner = ", ".join(
                f"{f['name']}: {_spark_json_canon(f['type'])}"
                for f in t["fields"]
            )
            return f"struct<{inner}>"
        if t.get("type") == "map":
            return (
                f"map<{_spark_json_canon(t['keyType'])}, "
                f"{_spark_json_canon(t['valueType'])}>"
            )
    raise ValueError(
        f"cannot canonicalize Spark type {t!r} for an append-schema "
        "check against an empty table — re-seed the schema with "
        "write_table_version instead of appending"
    )


def _check_append_schema(
    path: str, m: dict, staged: list[str], overwrite: bool
) -> None:
    """Reject staged files whose footer schema is incompatible with the
    table's: appended commits inherit the head's file list, and Spark's
    parquet schema reconciliation across a mixed list silently NULLs
    missing columns or flips dtypes (a timestamp staged without
    isAdjustedToUTC flipped the whole table to timestamp_ntz — the bug
    this guard was written against).  Overwrites replace every file, so
    they only need the staged files to agree with EACH OTHER."""
    if not staged:
        return
    ref: dict[str, str] | None = None
    src = ""
    if not overwrite:
        files = m.get("files") or []
        if files:
            ref = _footer_canon(str(Path(path) / "data" / files[0]))
            src = f"table head file {files[0]!r}"
        elif m.get("schema"):
            pb = m.get("partition_by") or None
            ref = {
                f["name"]: _spark_json_canon(f["type"])
                for f in m["schema"]["fields"]
                # the partition column lives in the directory, never
                # in the staged payload
                if f["name"] != pb
            }
            src = "the empty head's recorded schema"
    for f in staged:
        got = _footer_canon(f)
        if ref is None:
            ref, src = got, f"staged file {f!r}"
            continue
        if got != ref:
            diffs = {
                c: (ref.get(c), got.get(c))
                for c in sorted(set(ref) | set(got))
                if ref.get(c) != got.get(c)
            }
            raise ValueError(
                f"append to {path}: staged file {f!r} is schema-"
                f"incompatible with {src} — per-column (expected, got), "
                f"None = absent: {diffs}"
            )


def commit_appended_files(
    spark: SparkSession,
    path: str,
    staged: list[str],
    count: int,
    txn_app: str | None = None,
    txn_version: int | None = None,
    overwrite: bool = False,
    dynamic_partitions: bool = False,
) -> int | None:
    """Fold externally staged parquet files (absolute paths, already on
    the table's filesystem) into the version chain as an APPEND (or
    ``overwrite=True`` full replacement) — the driver half of the
    ``versioned_table`` Spark SINK: executors write the files, this
    moves them under ``data/`` and commits one manifest.

    ``txn_app``/``txn_version`` give Delta's txnAppId/txnVersion
    exactly-once: the manifest carries a per-appId high-water ledger,
    and a commit whose ``txn_version`` is not newer is SKIPPED (staged
    files unlinked, returns None) — how a replayed streaming epoch
    lands exactly once.

    ``overwrite=True`` with ``dynamic_partitions=True`` is Spark's
    dynamic partition-overwrite: only the partitions PRESENT in the
    staged data are replaced (their row counts come from the replaced
    files' footers — driver-side metadata reads bounded by replaced
    file count); every other partition's files carry verbatim, and MoR
    sidecar scopes shrink to the carried files.

    PARTITIONED tables: each staged entry is ``(src_path, segment)``
    where segment is the Hive directory name from
    :func:`_hive_part_segment` (Spark-escaping parity pinned) and the
    staged parquet must NOT contain the partition column (it lives in
    the directory, as Spark writes it).  Unpartitioned entries are
    plain path strings.  Creating a NEW table through the sink is
    unpartitioned-only — seed partitioned tables with
    write_table_version first.  CHECK constraints are validated over
    the staged files before anything folds in (a constraint that
    references the partition column cannot be evaluated on the staged
    payload and fails loudly — route such tables through upsert)."""
    head = latest_version(path)
    m = _load_manifest(path, head) if head is not None else {}
    entries: list[tuple[str, str | None]] = [
        e if isinstance(e, tuple) else (e, None) for e in staged
    ]
    paths = [e[0] for e in entries]
    if txn_app is not None and txn_version is not None:
        applied = (m.get("txn") or {}).get(txn_app)
        if applied is not None and int(txn_version) <= int(applied):
            for f in paths:
                Path(f).unlink(missing_ok=True)
            return None  # replayed epoch: already committed
    pb = m.get("partition_by") or None
    if head is not None and pb is not None:
        missing = [p for p, seg in entries
                   if not (seg or "").startswith(f"{_hive_escape(pb)}=")]
        if missing:
            raise ValueError(
                f"table {path} is partitioned by {pb!r} — every staged "
                "entry must carry its partition directory segment "
                "(the versioned_table sink derives it per row group; "
                f"bare entries: {missing})"
            )
    elif any(seg for _, seg in entries):
        raise ValueError(
            f"staged entries carry partition segments but {path} is "
            "not a partitioned table"
        )
    if not entries and not overwrite:
        return head  # empty append: no empty commits (delete's rule)
    _check_append_schema(path, m, paths, overwrite)
    if head is not None and m.get("constraints") and paths:
        # the sink's commit hook runs in a Python worker WITHOUT a
        # SparkSession — validate with DuckDB there, Spark when we have
        # one; both fail closed.  Constraints reference LOGICAL names;
        # staged files are physical — validate over the mapped view
        if spark is not None:
            _validate_constraints(
                _to_logical(spark.read.parquet(*paths), m),
                m["constraints"], f"append to {path}",
            )
        else:
            _validate_constraints_duckdb(
                paths, m["constraints"], f"append to {path}",
                # the partition column lives in the directory, not the
                # staged payload — constraints referencing it keep
                # failing loudly (column absent), as documented
                column_map={
                    lg: p for lg, p in _column_map(m).items() if p != pb
                },
            )
    data = Path(path) / "data"
    data.mkdir(parents=True, exist_ok=True)
    new_files: list[str] = []
    for f, seg in entries:
        rel = f"{uuid.uuid4().hex}-{Path(f).name}"
        if seg:
            (data / seg).mkdir(parents=True, exist_ok=True)
            rel = f"{seg}/{rel}"
        os.replace(f, data / rel)
        new_files.append(rel)
    stats_cols = m.get("stats_cols") or None
    bloom_conf = m.get("blooms_conf")
    txn = None
    if txn_app is not None and txn_version is not None:
        txn = {**(m.get("txn") or {}), txn_app: int(txn_version)}

    if dynamic_partitions and not overwrite:
        raise ValueError("dynamic_partitions requires overwrite=True")
    if dynamic_partitions and pb is None:
        raise ValueError(
            "dynamic partition overwrite needs a partitioned table "
            "(static overwrite replaces unpartitioned content)"
        )
    replaced_dirs = {seg for _, seg in entries if seg}

    def once() -> int:
        h = latest_version(path)
        hm = _load_manifest(path, h) if h is not None else {}
        if overwrite and dynamic_partitions:
            import pyarrow.parquet as pq

            carried = [
                f for f in (hm.get("files") or [])
                if f.rsplit("/", 1)[0] not in replaced_dirs
            ]
            replaced = [
                f for f in (hm.get("files") or []) if f not in carried
            ]
            masked = {
                f
                for d in (hm.get("deletes") or [])
                for f in d["files"]
            } & set(replaced)
            if masked:
                # footer row counts diverge from logical counts under a
                # sidecar mask — refuse rather than mis-count
                raise ValueError(
                    "dynamic overwrite of partitions carrying "
                    f"merge-on-read sidecars ({sorted(masked)[:3]}…) — "
                    "compact_table_version first to fold the debt"
                )
            gone = sum(
                pq.ParquetFile(str(data / f)).metadata.num_rows
                for f in replaced
            )
            files = carried + new_files
            total = (hm.get("count") or 0) - gone + count
            deletes = _carry_deletes(hm.get("deletes"), carried)
        elif overwrite:
            carried = []
            files, total = new_files, count
            deletes = None
        else:
            carried = hm.get("files") or []
            files = carried + new_files
            total = (hm.get("count") or 0) + count
            deletes = hm.get("deletes")
        old_stats = hm.get("stats") or {}
        stats = {f: old_stats[f] for f in carried if f in old_stats}
        stats.update(
            _new_file_meta(spark, path, new_files, stats_cols, bloom_conf)
            if spark is not None
            else _new_file_meta_local(
                path, new_files, stats_cols, bloom_conf
            )
        )
        return _commit(
            path, files, total, h, pb, stats_cols, stats or None,
            bloom_conf=bloom_conf,
            op=(
                "overwrite(dynamic)"
                if overwrite and dynamic_partitions
                else "overwrite" if overwrite else "append"
            ),
            deletes=deletes,
            txn=txn if txn is not None else ...,
        )

    return _retry_conflicts(once, f"append to {path}")


# ------------------------------------------------------ CHECK constraints
# (r10, Delta ADD CONSTRAINT parity): {name: sql_expr} carried as table
# metadata in every manifest.  SQL CHECK semantics — a row violates only
# when the expression evaluates FALSE (NULL passes).  The invariant
# "every live row satisfies every constraint" holds because (a) adding a
# constraint validates the ENTIRE current head first, and (b) every op
# that stages new row content (snapshot, upsert, update) validates the
# rows it stages before anything commits.  Ops that only re-arrange
# already-valid rows (delete, compact, zorder, restore) skip the check.


def _validate_constraints(df: DataFrame, constraints: dict | None,
                          what: str) -> None:
    if not constraints:
        return
    try:
        counts = df.select(
            *[
                F.sum(
                    (
                        ~F.coalesce(
                            F.expr(expr).cast("boolean"), F.lit(True)
                        )
                    ).cast("long")
                ).alias(name)
                for name, expr in sorted(constraints.items())
            ]
        ).collect()[0]
    except Exception as exc:  # unresolvable column after a rename/drop
        raise ValueError(
            f"{what}: a CHECK constraint no longer resolves against the "
            f"new schema ({constraints}) — drop or re-create the "
            f"constraint first: {exc}"
        ) from None
    bad = {n: counts[n] for n in sorted(constraints) if counts[n]}
    if bad:
        raise ValueError(
            f"{what} violates CHECK constraints (violating-row counts): "
            f"{bad}"
        )


def table_constraints(path: str, version: int | None = None) -> dict:
    """The CHECK constraints in force at ``version`` (default head)."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    return dict(_load_manifest(path, v).get("constraints") or {})


def add_table_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """ADD CONSTRAINT: validate the ENTIRE current head against
    ``expr`` (one aggregation over the deletes-aware read — violating
    tables are rejected with the row count, like Delta's full-scan add),
    then commit a metadata-only version (files unchanged, KBs)."""
    import re

    if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_]*", name):
        raise ValueError(f"bad constraint name {name!r}")
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    cons = dict(m.get("constraints") or {})
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists on {path}")
    if m["files"]:
        _validate_constraints(
            read_table_version(spark, path, head), {name: expr},
            f"ADD CONSTRAINT {name} on {path}",
        )
    cons[name] = expr

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"), m.get("blooms_conf"),
            f"add_constraint({name})", m.get("deletes"), cons,
        )

    return _retry_conflicts(once, f"add constraint on {path}")


def drop_table_constraint(path: str, name: str) -> int:
    """DROP CONSTRAINT as a metadata-only commit; unknown names raise
    (a takedown-style op that silently no-ops hides wiring bugs)."""
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    cons = dict(m.get("constraints") or {})
    if name not in cons:
        raise ValueError(f"no constraint {name!r} on {path}")
    del cons[name]

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"), m.get("blooms_conf"),
            f"drop_constraint({name})", m.get("deletes"), cons or None,
        )

    return _retry_conflicts(once, f"drop constraint on {path}")


def set_table_properties(path: str, props: dict[str, str]) -> int:
    """TBLPROPERTIES (Delta/Iceberg parity): merge arbitrary string
    key→value metadata into the table as a metadata-only commit.
    Properties ride the manifests like constraints — inherited by
    every commit, versioned (time travel / RESTORE see their own),
    surfaced by :func:`table_detail`.  For operational metadata
    (owner, retention policy, pipeline tags) — the engine never
    interprets them."""
    if not props:
        raise ValueError("no properties given")
    bad = [k for k, v in props.items()
           if not isinstance(k, str) or not isinstance(v, str)]
    if bad:
        raise ValueError(f"properties must be str→str (bad keys: {bad})")
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    merged = {**(m.get("properties") or {}), **props}

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"), m.get("blooms_conf"),
            f"set_properties({sorted(props)})", m.get("deletes"),
            properties=merged,
        )

    return _retry_conflicts(once, f"set properties on {path}")


def unset_table_properties(path: str, keys: list[str]) -> int:
    """Remove TBLPROPERTIES keys; unknown keys raise (the
    drop-constraint rule: a silent no-op hides wiring bugs)."""
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    props = dict(m.get("properties") or {})
    missing = [k for k in keys if k not in props]
    if missing:
        raise ValueError(f"no properties {missing!r} on {path}")
    for k in keys:
        del props[k]

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"), m.get("blooms_conf"),
            f"unset_properties({sorted(keys)})", m.get("deletes"),
            properties=props or None,
        )

    return _retry_conflicts(once, f"unset properties on {path}")


def table_properties(path: str) -> dict[str, str]:
    """The head's TBLPROPERTIES ({} when none)."""
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    return dict(_load_manifest(path, head).get("properties") or {})


def write_table_version(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 8192,
    bloom_k: int = 4,
) -> int:
    """Commit ``df`` as a full new snapshot; returns the version.

    ``stats_cols`` records per-file [min, max] of those columns in the
    manifest (footer metadata read, no data scan): the Iceberg-style
    stats that let :func:`read_table_version` prune FILES on
    non-partition predicates — which is how a z-ordered layout keeps
    skipping through the explicit-file-list read.

    ``bloom_cols`` additionally records a per-file bloom filter per
    column (see :func:`_file_blooms`) so ``point`` lookups on
    high-cardinality UNORDERED keys — where every file's [min, max]
    spans the domain and range stats prune nothing — still skip files.
    Both kinds of per-file metadata are inherited by upserts, deletes
    and compactions: carried files keep their entries, new files pay
    one footer read + one bloom scan.

    ``partition_by`` accepts a HIDDEN-PARTITIONING transform tuple
    (Iceberg-shaped, r10 s3): ``("days", ts_col)`` / ``("hours",
    ts_col)`` / ``("bucket", col, n)`` / ``("truncate", str_col, w)``.
    The table partitions on the DERIVED value — materialized only in
    directory names, never in the user schema — so reads return the
    original columns, range predicates on the SOURCE column prune
    whole directories (days/truncate), and DML routes rows by the
    recomputed transform (an UPDATE that changes the source value
    moves the row to its new directory).  The user never materializes
    or maintains a partition column — the 100 TB ergonomics win hidden
    partitioning exists for."""
    head0 = latest_version(path)
    if head0 is not None:
        _validate_constraints(
            df, _load_manifest(path, head0).get("constraints"),
            f"snapshot of {path}",
        )
    partition_by, transform = _parse_partition_spec(partition_by, df)
    if transform:
        df = df.withColumn(partition_by, _transform_expr(transform))
    n = df.count()
    files = _stage_files(df, path, partition_by)
    bloom_conf = (
        {"cols": bloom_cols, "bits": bloom_bits, "k": bloom_k}
        if bloom_cols
        else None
    )
    stats = _new_file_meta(
        df.sparkSession, path, files, stats_cols, bloom_conf
    ) or None
    # a full snapshot's content is parent-independent: on conflict just
    # re-read the head and take the next slot (files staged once)
    return _retry_conflicts(
        lambda: _commit(
            path, files, n, latest_version(path), partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="snapshot",
            column_map=None,  # full snapshot: physical = logical again
            transform=transform,
        ),
        f"snapshot of {path}",
    )


# ------------------------------------------------- merge-on-read deletes
# (VERDICT r9 #3, Iceberg-v2-delete-file shaped): a MoR delete writes a
# SIDECAR parquet of row FINGERPRINTS instead of rewriting the hit data
# files — a 1-row takedown on a 1 GB file costs one KB-sized sidecar.
# Readers anti-join the sidecar at scan time (the MoR read tax); the
# compactor folds sidecars back into clean files.  Scoping rule: a
# sidecar applies ONLY to the data files recorded with it — files are
# immutable, so a later re-insert of byte-identical content lands in a
# NEW file and is never masked (the role Iceberg's sequence numbers
# play, expressed on the file axis).  The fingerprint is the proven-
# injective encoding from operators/profile.py over ALL columns in
# sorted-name order, so "delete exactly these rows" is exact row-value
# semantics, NULLs included, with no null-safe-join gymnastics.


_MOR_MAX_ROWS = 1_000_000


def _check_mor_size(n_matched: int, mor_max_rows: int, op: str,
                    path: str) -> None:
    """The MoR cost model is BROADCAST-SIZED takedowns: the sidecar
    stages through one task (coalesce(1)) and then rides every read as
    a broadcast delete side.  A broad predicate breaks both halves —
    one funneled writer task now, an executor-memory-sized broadcast
    on every read after — so past the row threshold refuse with the
    CoW remediation instead of silently degrading (VERDICT r10 #5)."""
    if n_matched > mor_max_rows:
        raise ValueError(
            f"{op} of {path} matched {n_matched:,} rows — over the "
            f"mor_max_rows={mor_max_rows:,} sidecar guard.  A sidecar "
            "that size funnels through one staging task and then rides "
            "EVERY read as a broadcast delete side.  Use mode='cow' "
            "for broad predicates (write amplification once, clean "
            "reads after), or pass a larger mor_max_rows if the read "
            "tax is understood"
        )


def _sidecar_rows(matched: DataFrame, m: dict) -> DataFrame:
    """One sidecar row per matched row: ``_fp`` (the injective full-
    row fingerprint in PHYSICAL space — column order sorts by NAME, so
    a rename never changes it) plus ``_file``/``_pos`` (data-relative
    file and row position, captured from the delete-time scan) so
    position-capable readers mask without replicating the fingerprint
    encode.  Fingerprint readers ``select("_fp").distinct()`` and see
    exactly the pre-r11 shape.  ``matched`` carries the
    :data:`_POS_COLS` annotations; :func:`_to_physical` passes them
    through untouched, and they are excluded from the fingerprint."""
    from etl_rust_spark.operators.profile import _fingerprint

    matched_p = _to_physical(matched, m)
    fp_cols = sorted(c for c in matched_p.columns
                     if c not in _POS_COLS)
    return matched_p.select(
        _fingerprint(matched_p, fp_cols).alias("_fp"),
        F.col(_POS_COLS[0]).alias("_file"),
        F.col(_POS_COLS[1]).alias("_pos"),
    )


def _stage_delete_sidecar(fps: DataFrame, table: str) -> str:
    """Write a sidecar frame as ONE parquet under ``data/_deletes/``
    (sidecars are driver-named, collision-free, and live inside data/
    so expiry's sweep covers them); returns the data-relative path."""
    root = Path(table)
    stage = root / f"_stage-{uuid.uuid4().hex}"
    fps.coalesce(1).write.parquet(str(stage))
    part = next(iter(sorted(stage.rglob("*.parquet"))))
    rel = f"_deletes/{uuid.uuid4().hex}.parquet"
    dest = root / "data" / rel
    dest.parent.mkdir(parents=True, exist_ok=True)
    os.rename(part, dest)
    shutil.rmtree(stage)
    return rel


def _carry_deletes(
    parent_deletes: list[dict] | None, carried_files: list[str]
) -> list[dict] | None:
    """Sidecar carry rule for every rewriting op: files REWRITTEN in
    this commit were re-staged from a deletes-aware read (their masked
    rows are physically gone), so each sidecar keeps only the files
    that carried over verbatim; sidecars left scoping nothing drop."""
    if not parent_deletes:
        return None
    sset = set(carried_files)
    out = []
    for d in parent_deletes:
        files = [f for f in d["files"] if f in sset]
        if files:
            out.append({"path": d["path"], "files": files})
    return out or None


_POS_COLS = ("__pos_file", "__pos_idx")


def _pos_annotation_cols(data: str) -> list:
    """(data-relative file, row position) expressions over a scan's
    ``_metadata`` columns — recorded into MoR sidecars at delete time
    so position-capable readers (the jar-free DataSource) can mask
    rows without replicating the fingerprint string-cast encode.
    Literal '+' is pre-escaped before url_decode (the deltalake
    scan-side discipline: java decodes '+' to a space, silently
    breaking path equality)."""
    data_abs = str(Path(data).resolve())
    dec = F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
    )
    rel = F.regexp_replace(
        F.regexp_replace(dec, "^file:/+", "/"),
        "^" + re.escape(data_abs) + "/", "",
    )
    return [rel.alias(_POS_COLS[0]),
            F.col("_metadata.row_index").alias(_POS_COLS[1])]


def _plan_with_deletes(
    spark: SparkSession, data: str, files: list[str],
    deletes: list[dict] | None,
    synth: str | None = None,
    positions: bool = False,
) -> DataFrame:
    """Plan ``files`` with MoR sidecars applied: files are grouped by
    their APPLICABLE sidecar set (usually one or two groups — most
    files have none), each group anti-joins the broadcast union of its
    sidecars' fingerprints, groups union back.  Cost model at 100 TB:
    the delete side is KBs–MBs (broadcast, no shuffle of the data
    side); untouched file groups pay nothing.

    ``synth`` (transform tables): the synthetic partition column is
    cast back to STRING immediately after the read — partition
    inference would type '2026-01-01' directories as DATE and bucket
    digits as INT, which would desynchronize the fingerprint encoding
    between the read-side anti-join here and the sidecar build (both
    must see the same dtype)."""
    by_sidecars: dict[tuple[str, ...], list[str]] = {}
    scoped = [
        (d["path"], frozenset(d["files"])) for d in (deletes or [])
    ]
    for f in files:
        key = tuple(sorted(p for p, fs in scoped if f in fs))
        by_sidecars.setdefault(key, []).append(f)
    parts = []
    for sidecars, fs in sorted(by_sidecars.items()):
        df = spark.read.option("basePath", data).parquet(
            *[f"{data}/{f}" for f in fs]
        )
        if positions:
            # per scan relation, BEFORE the union (`_metadata` does
            # not resolve through a union)
            df = df.select("*", *_pos_annotation_cols(data))
        if synth and synth in df.columns:
            df = df.withColumn(synth, F.col(synth).cast("string"))
        if sidecars:
            dd = spark.read.parquet(
                *[f"{data}/{s}" for s in sidecars]
            ).select("_fp").distinct()
            from etl_rust_spark.operators.profile import _fingerprint

            # fingerprint the DATA columns only — the position
            # annotations are reader-side bookkeeping, never part of
            # the row identity the sidecars encode
            fp_cols = sorted(c for c in df.columns
                             if c not in _POS_COLS)
            df = (
                df.withColumn("__fp", _fingerprint(df, fp_cols))
                .join(
                    F.broadcast(dd),
                    F.col("__fp") == F.col("_fp"),
                    "left_anti",
                )
                .drop("__fp")
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _parse_as_of(ts) -> float:
    """AS OF timestamp → epoch seconds.  Accepts epoch int/float, a
    datetime (tz-naive assumed UTC — never silently local), or an
    ISO-8601 string ('2026-08-15T12:00:00Z' / '+00:00' offsets /
    date-only)."""
    import datetime as _dt

    if isinstance(ts, bool) or not isinstance(
        ts, (int, float, str, _dt.datetime, _dt.date)
    ):
        raise TypeError(f"as_of must be epoch/datetime/ISO string, got "
                        f"{type(ts).__name__}")
    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        s = ts[:-1] + "+00:00" if ts.endswith("Z") else ts
        ts = _dt.datetime.fromisoformat(s)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    # a plain date: midnight UTC
    return _dt.datetime(
        ts.year, ts.month, ts.day, tzinfo=_dt.timezone.utc
    ).timestamp()


def version_at_timestamp(path: str, as_of) -> int:
    """AS OF <timestamp> resolution (VERDICT r9 #4 — Delta/Iceberg's
    most-used time-travel form): the NEWEST version whose commit
    timestamp is <= ``as_of``.  Commit timestamps are read from the
    manifests (recorded at commit since r10 and forced monotone over
    the parent's; pre-r10 manifests fall back to file mtime).  Raises
    if ``as_of`` predates the first surviving commit — retention may
    have expired the version that WAS current then, and guessing an
    older-but-wrong snapshot would be silent time-travel corruption."""
    t = _parse_as_of(as_of)
    best = None
    for v in list_versions(path):
        mp = _manifest_path(path, v)
        try:
            vts = json.loads(mp.read_text()).get("ts")
            if vts is None:
                vts = mp.stat().st_mtime  # pre-r10 manifest
        except (FileNotFoundError, json.JSONDecodeError):
            continue
        if float(vts) <= t:
            best = v  # list_versions is ascending; keep the newest
    if best is None:
        raise ValueError(
            f"no version of {path} committed at or before {as_of!r} "
            "(before the first surviving commit — expired by retention, "
            "or the timestamp predates the table)"
        )
    return best


def read_table_version(
    spark: SparkSession,
    path: str,
    version: int | str | None = None,
    prune: list[tuple] | None = None,
    point: list[tuple] | None = None,
    as_of=None,
) -> DataFrame:
    """The table AS OF ``version`` (default: latest) — planned from the
    manifest's explicit file list, ``basePath``-anchored so partition
    columns survive reading individual files.

    ``prune`` is a list of ``(col, lo, hi)`` range predicates evaluated
    against the manifest's per-file stats BEFORE planning: files whose
    recorded [min, max] cannot intersect are never handed to Spark at
    all (driver-side, zero I/O).  ``point`` is a list of ``(col,
    value)`` equality probes evaluated against per-file bloom filters
    (``bloom_cols`` at write time; str/int values render identically to
    the CAST(col AS STRING) the build hashed, bool is normalized to
    Spark's 'true'/'false', anything else raises — see
    :func:`_point_probe_str`) — the pruning
    that works where min/max can't: unordered high-cardinality keys.
    Files without stats/blooms for a column are kept — pruning is an
    optimization, never a filter: callers still apply the real
    predicate to the returned frame (bloom false positives only keep
    extra files, never drop a match).

    ``as_of`` reads the table AS OF a wall-clock instant (epoch /
    datetime / ISO-8601 string — :func:`version_at_timestamp`);
    mutually exclusive with ``version``."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version OR as_of, not both")
        version = version_at_timestamp(path, as_of)
    if isinstance(version, str):  # a tag name (tag_version)
        tags = list_tags(path)
        if version not in tags:
            raise FileNotFoundError(f"no tag {version!r} on {path}")
        version = tags[version]
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, v)
    data = str(Path(path) / "data")
    files = m["files"]
    if not files:
        if m.get("schema"):
            # an EMPTY version (delete_table_version removed every
            # row): the manifest carries the schema no file can
            from pyspark.sql.types import StructType

            return _to_logical(
                spark.createDataFrame([], StructType.fromJson(m["schema"])),
                m,
            )
        raise ValueError(f"version {v} of {path} is empty")
    # prune/point arrive in LOGICAL names; stats/bloom keys are
    # PHYSICAL (recorded at file-write time, rename-stable)
    raw_point = point  # typed values, pre-rendering (bucket replica)
    if prune:
        prune = [(_phys_col(m, c), lo, hi) for c, lo, hi in prune]
    if point:
        point = [(_phys_col(m, c), _point_probe_str(c, val))
                 for c, val in point]
    if prune or point:
        stats = m.get("stats") or {}
        # hidden partitioning: prunes on the transform SOURCE column
        # additionally skip whole directories (days/hours/truncate
        # range mapping; bucket point-probe replica)
        t = _transform_of(m)
        t_prunes = (
            [pr for pr in prune or [] if pr[0] == t["source"]]
            if t
            else []
        )
        t_bucket_segs = None
        if t and t["kind"] == "bucket":
            probes = [
                _bucket_seg_of(t, v)
                for c, v in raw_point or []
                if _phys_col(m, c) == t["source"]
            ]
            if probes and None not in probes:
                # AND semantics (like blooms): a file must be able to
                # hold EVERY probe — distinct buckets prune everything
                t_bucket_segs = set(probes)

        def keep(f: str) -> bool:
            if t_bucket_segs is not None:
                sv = _seg_value_of(f)
                if sv is not None and not all(
                    sv == b for b in t_bucket_segs
                ):
                    return False
            if t_prunes and not _transform_prune_keep(
                t, _seg_value_of(f), t_prunes
            ):
                return False
            fs = stats.get(f)
            if not fs:
                return True
            for col, lo, hi in prune or []:
                if col in fs:
                    fmin, fmax = fs[col]
                    if (hi is not None and fmin > hi) or (
                        lo is not None and fmax < lo
                    ):
                        return False
            for col, val in point or []:
                entry = fs.get(_BLOOM_KEY + col)
                if entry and not _bloom_might_contain(entry, val):
                    return False
            return True

        files = [f for f in files if keep(f)]
    if not files:
        # stats pruned every file: an empty frame with the version's
        # schema, planned from ONE file (all files of a version share a
        # schema — evolution commits full snapshots).  No recursion:
        # recursing on the same version with prune dropped used to
        # RecursionError on empty manifests (ADVICE r7).
        return _to_logical(
            spark.read.option("basePath", data)
            .parquet(f"{data}/{m['files'][0]}")
            .limit(0),
            m,
        )
    # MoR sidecars (if any) anti-join here — the read tax a mode="mor"
    # delete trades for not rewriting data files; plain tables take the
    # zero-cost branch inside.  The column map applies LAST: sidecar
    # fingerprints and partition columns are physical underneath
    return _to_logical(
        _plan_with_deletes(spark, data, files, m.get("deletes"),
                           _synth_of(m)), m
    )


def upsert_table_version(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Concurrent-writer-safe wrapper: the merge is computed against a
    fixed head snapshot; if another writer commits first the CAS in
    :func:`_commit` raises and the WHOLE merge re-runs against the new
    head (losers never orphan a commit — VERDICT r7 #5)."""
    return _retry_conflicts(
        lambda: _upsert_table_version_once(
            spark, path, delta, keys, partition_by, stats_cols
        ),
        f"upsert into {path}",
    )


def _upsert_table_version_once(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Keyed MERGE as a new version with FILE-LEVEL copy-on-write:
    untouched partitions' files are re-referenced, only the delta's
    dirty partitions are rewritten (merged = survivors-of-dirty ∪
    delta).  Unpartitioned tables rewrite fully (the plain-parquet
    cost, same as ``catalog.upsert_table``).  Replaying a delta is
    idempotent in CONTENT (the new version's rows equal the previous
    version's), though it still commits a version.  ``stats_cols``
    defaults to the parent manifest's — carried files keep their
    recorded stats, only new files pay a footer read.

    CONTRACT: the partition column must be stable per key (functionally
    dependent on ``keys``).  A delta row that MOVES a key to a new
    partition value only dirties the NEW partition — the old
    partition's copy survives untouched and the key duplicates, the
    inherent trade of partition-scoped merges (route partition moves
    through delete_table_version + upsert, or a full snapshot)."""
    missing = [k for k in keys if k not in delta.columns]
    if missing:
        raise ValueError(f"delta is missing key columns: {missing}")
    head = latest_version(path)
    if head is None:
        return write_table_version(delta, path, partition_by, stats_cols)
    m = _load_manifest(path, head)
    # carried content was validated when staged; only the delta's rows
    # are new — one aggregation, only when constraints exist
    _validate_constraints(
        delta, m.get("constraints"), f"upsert into {path}"
    )
    if stats_cols is None:
        stats_cols = m.get("stats_cols") or None  # physical already
    else:
        stats_cols = [_phys_col(m, c) for c in stats_cols]
    bloom_conf = m.get("blooms_conf")
    phys_pb = m.get("partition_by") or None
    t_head = _transform_of(m)
    if t_head is not None:
        # the table's layout is authoritative: accept the matching
        # transform tuple (or None) — a mismatched spec must not
        # silently re-route rows
        if partition_by is not None and not _same_transform(
            _parse_partition_spec(partition_by, None)[1], t_head
        ):
            raise ValueError(
                f"table {path} is hidden-partitioned by "
                f"{t_head['kind']}({t_head['source']}) — pass "
                "partition_by=None or the matching transform tuple"
            )
        partition_by = None
    elif _logical_pb(m) != (partition_by or None):
        raise ValueError(
            f"table is partitioned by {_logical_pb(m)!r}, "
            f"upsert requested {partition_by!r}"
        )
    if not m["files"]:
        # the table was fully emptied (delete_table_version of every
        # row): re-seed with a full snapshot on the SAME version chain.
        # Staged files are PHYSICAL like everything under data/
        n = delta.count()
        files = _stage_files(_to_physical(delta, m), path, phys_pb)
        stats = _new_file_meta(spark, path, files, stats_cols, bloom_conf) or None
        return _commit(path, files, n, head, phys_pb, stats_cols,
                       stats, bloom_conf=bloom_conf, op="upsert")
    existing = read_table_version(spark, path, head)
    dropped = set(existing.columns) - set(delta.columns)
    if dropped:
        raise ValueError(
            f"delta is missing table columns {sorted(dropped)} — select "
            "the full schema explicitly (silent NULL-filling a forgotten "
            "column is a bug magnet; the catalog.upsert_table rule)"
        )
    if set(delta.columns) - set(existing.columns):
        # ADD-COLUMN evolution: commit a FULL new snapshot (all-new
        # files, no partition reuse) — old manifests keep reading the
        # old files with the old schema byte-identically, which is the
        # version-log answer to the mixed-schema-directory problem that
        # forces catalog.upsert_table's whole-table rewrite anyway.
        # re-baselined files are staged with LOGICAL names — map the
        # manifest's physical stats/bloom columns back to logical
        inv = {p: l for l, p in _column_map(m).items()}
        stats_cols = [inv.get(c, c) for c in stats_cols or []] or None
        if bloom_conf:
            bloom_conf = {
                **bloom_conf,
                "cols": [inv.get(c, c) for c in bloom_conf["cols"]],
            }
        widened = existing.unionByName(delta.limit(0), allowMissingColumns=True)
        merged = widened.join(
            delta.select(*keys), keys, "left_anti"
        ).unionByName(delta)
        n = merged.count()
        # a full re-snapshot staged from the LOGICAL frame re-baselines
        # any column mapping: physical = logical again — including the
        # transform's SOURCE column name, so the transform re-baselines
        # with it (new synth directory name if the source was renamed)
        t_new = None
        stage_pb = partition_by
        if t_head is not None:
            inv = {p: l for l, p in _column_map(m).items()}
            src_l = inv.get(t_head["source"], t_head["source"])
            t_new = {**t_head, "source": src_l}
            stage_pb = (
                f"_p_{t_new['kind']}{t_new.get('n', '')}_{src_l}"
            )
            merged = merged.withColumn(
                stage_pb, _transform_expr(t_new, src_l)
            )
        files = _stage_files(merged, path, stage_pb)
        stats = _new_file_meta(spark, path, files, stats_cols, bloom_conf) or None
        return _commit(
            path, files, n, head, stage_pb, stats_cols, stats,
            bloom_conf=bloom_conf, op="upsert-evolve", column_map=None,
            transform=t_new,
        )
    if t_head is not None:
        # hidden partitioning: dirty partitions are the delta's
        # TRANSFORMED source values — the same pure expression computed
        # over the logical frames (user never materializes the column)
        inv = {p: l for l, p in _column_map(m).items()}
        part_expr = _transform_expr(
            t_head, inv.get(t_head["source"], t_head["source"])
        )
    elif partition_by:
        part_expr = F.col(partition_by)
    else:
        part_expr = None
    if part_expr is not None:
        dirty = [
            r[0]
            for r in delta.select(part_expr.alias("__p"))
            .distinct().collect()
        ]
        if any(d is None for d in dirty):
            raise ValueError(
                "delta carries NULL partition values — NULL-partition "
                "upserts are rejected (isin() cannot match them and "
                "Spark routes them to __HIVE_DEFAULT_PARTITION__); "
                "route them through a full snapshot instead"
            )
        scope = existing.filter(part_expr.isin(dirty))
    else:
        scope = existing
    merged = scope.join(
        delta.select(*keys), keys, "left_anti"
    ).unionByName(delta)
    n_new = merged.count()
    new_files = _stage_files(_to_physical(merged, m), path, phys_pb)
    if part_expr is not None:
        # Files of CLEAN partitions carry over untouched.  Dirty
        # DIRECTORY names are taken from the files Spark itself just
        # staged — same engine, same Hive escaping (':' → '%3A',
        # timestamp/date rendering, ...) — instead of str()-formatting
        # the Python partition values, which diverges for any value
        # Spark escapes and silently carried stale files (ADVICE r7).
        dirty_dirs = {f.rsplit("/", 1)[0] for f in new_files if "/" in f}
        carried = [
            f for f in m["files"] if f.rsplit("/", 1)[0] not in dirty_dirs
        ]
        total = (
            existing.filter(
                part_expr.isNull() | ~part_expr.isin(dirty)
            ).count()
            + n_new
        )
    else:
        carried = []
        total = n_new
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(_new_file_meta(spark, path, new_files, stats_cols, bloom_conf))
    return _commit(
        path, carried + new_files, total, head, phys_pb,
        stats_cols, stats, bloom_conf=bloom_conf, op="upsert",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )


def clone_table(src: str, dst: str, version: int | str | None = None) -> int:
    """CLONE (Delta shallow-clone shaped, filesystem-native): create a
    NEW table at ``dst`` whose first version references ``src``'s
    content at ``version`` (default head; tag names accepted) via
    HARDLINKS — zero bytes copied, instant, the cheap branch-for-an-
    experiment operation a 100 TB training-data table needs.

    Unlike Delta's manifest-external-path shallow clone (where VACUUM
    on the source breaks clones), each table here owns its own
    DIRECTORY ENTRIES: expiry on either side unlinks only its own
    names and the shared inode lives until the last reference drops —
    retention stays fully independent, enforced by the filesystem's
    refcount instead of an operational caveat.  Writes diverge
    copy-on-write exactly as normal commits do (rewrites stage new
    files; the other table keeps reading the old inode).  Cross-device
    destinations fall back to a real copy, same semantics.

    The clone inherits partitioning, per-file stats, blooms, CHECK
    constraints and MoR delete sidecars; it starts its OWN version
    chain (v1, op ``clone(src@v)``) and does not carry tags, pins,
    history, or the txnAppId ledger (a clone is a new table — a
    streaming writer replaying into it should append, not no-op).

    On object storage (no hardlinks) a clone degrades to a copy —
    the manifest-external-path design would be the upgrade there."""
    if isinstance(version, str):
        tags = list_tags(src)
        if version not in tags:
            raise FileNotFoundError(f"no tag {version!r} on {src}")
        version = tags[version]
    v = latest_version(src) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {src}")
    if latest_version(dst) is not None or _manifest_dir(dst).exists():
        raise FileExistsError(f"{dst} already has a version chain")
    m = _load_manifest(src, v)
    sdata, ddata = Path(src) / "data", Path(dst) / "data"
    to_link = list(m["files"]) + [
        d["path"] for d in (m.get("deletes") or [])
    ]
    for rel in to_link:
        target = ddata / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(sdata / rel, target)
        except OSError:
            shutil.copy2(sdata / rel, target)
    return _commit(
        dst, list(m["files"]), m["count"], None,
        m.get("partition_by") or None, m.get("stats_cols") or None,
        m.get("stats") or None, m.get("schema"), m.get("blooms_conf"),
        op=f"clone({src}@{v})", deletes=m.get("deletes"),
        constraints=m.get("constraints"),
        properties=m.get("properties"),
        column_map=m.get("column_map"),
        transform=m.get("partition_transform"),
    )


def table_detail(path: str) -> dict:
    """DESCRIBE DETAIL (Delta parity): one driver-side dict about the
    HEAD — version, logical row count, file count and on-disk bytes,
    layout (partitioning/stats/blooms), constraints, outstanding MoR
    sidecar debt, commit instant, txn ledger, live version/tag counts.
    Metadata only; no Spark job."""
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    data = Path(path) / "data"
    size = 0
    for f in m["files"]:
        try:
            size += (data / f).stat().st_size
        except OSError:
            pass  # expired out from under us mid-listing
    return {
        "version": head,
        "count": m["count"],
        "num_files": len(m["files"]),
        "size_bytes": size,
        "partition_by": m.get("partition_by") or None,
        "partition_transform": m.get("partition_transform") or None,
        "stats_cols": m.get("stats_cols") or None,
        "bloom_cols": (m.get("blooms_conf") or {}).get("cols"),
        "constraints": m.get("constraints") or {},
        "properties": m.get("properties") or {},
        "column_map": m.get("column_map") or {},
        "n_delete_sidecars": len(m.get("deletes") or []),
        "delete_sidecar_bytes": sum(
            (data / d["path"]).stat().st_size
            for d in m.get("deletes") or []
            if (data / d["path"]).exists()
        ),
        "ts": m.get("ts"),
        "op": m.get("op"),
        "txn": m.get("txn") or {},
        "n_versions": len(list_versions(path)),
        "tags": list_tags(path),
    }


class MetadataInsufficient(ValueError):
    """The manifest log cannot answer this query EXACTLY — the caller
    must fall back to the scan-side equivalent over
    :func:`read_table_version`.  Raised loudly rather than answering
    approximately: a metadata shortcut that can be silently wrong is
    worse than no shortcut."""


def _resolve_version(path: str, version: int | str | None, as_of) -> int:
    """version number | tag name | as_of instant | None (head) → the
    concrete version number (the read_table_version resolution rules)."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version OR as_of, not both")
        return version_at_timestamp(path, as_of)
    if isinstance(version, str):
        tags = list_tags(path)
        if version not in tags:
            raise FileNotFoundError(f"no tag {version!r} on {path}")
        return tags[version]
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    return v


_AGG_RE = None  # compiled lazily (module import stays cheap)


def aggregate_table_metadata(
    path: str,
    exprs: list[str],
    version: int | str | None = None,
    as_of=None,
) -> dict:
    """Answer ``count(*)`` / ``min(col)`` / ``max(col)`` from the
    manifest log ALONE — zero data-file reads, zero Spark jobs (Delta's
    metadata-only-query optimization).  At 100 TB a ``SELECT COUNT(*)``
    is a full scan without this; here it is one manifest read.

    Exactness is the contract: any situation where the log's answer
    could differ from a scan raises :class:`MetadataInsufficient`
    naming the reason —

    - merge-on-read delete sidecars (masked rows could hold the min);
    - a file missing [min,max] stats for the column (not a stats
      column, written before stats, or an ALL-NULL file — parquet
      records no bounds for those, and "no bounds" is indistinguishable
      from "no stats");
    - truncated (widened) string bounds — sound for pruning, not exact;
    - float/double columns (Spark's MIN/MAX order NaN above everything;
      parquet bounds exclude NaN — divergent);
    - the partition column (its values live in directory names, typed
      by Spark's partition inference, not in footer stats).

    MIN/MAX over non-null values matches SQL semantics (parquet bounds
    exclude nulls); an empty table answers count 0 and min/max None
    (SQL's NULL).  Column names are LOGICAL (column mapping resolved).
    Returns {expr: value} keyed by the given strings."""
    import re

    global _AGG_RE
    if _AGG_RE is None:
        _AGG_RE = re.compile(r"^\s*(count|min|max)\s*\(\s*([^()\s]+|\*)\s*\)\s*$", re.I)
    v = _resolve_version(path, version, as_of)
    m = _load_manifest(path, v)
    if m.get("deletes"):
        raise MetadataInsufficient(
            f"version {v} of {path} carries merge-on-read delete "
            "sidecars — masked rows make every metadata answer unsound; "
            "compact_table_version folds the debt, or scan via "
            "read_table_version"
        )
    stats = m.get("stats") or {}
    pb = m.get("partition_by") or None
    out: dict[str, object] = {}
    for expr in exprs:
        g = _AGG_RE.match(expr)
        if not g:
            raise ValueError(
                f"unsupported metadata aggregate {expr!r} — the log "
                "answers count(*), min(col), max(col) only"
            )
        fn, arg = g.group(1).lower(), g.group(2)
        if fn == "count":
            if arg != "*":
                raise MetadataInsufficient(
                    f"count({arg}) needs per-file null counts, which "
                    "manifests do not record — count(*) or a scan"
                )
            out[expr] = m["count"]
            continue
        if arg == "*":
            raise ValueError(f"{fn}(*) is not a thing")
        cm = _column_map(m)
        if arg not in cm and arg in cm.values():
            raise ValueError(
                f"{arg!r} is a PHYSICAL column name on a column-mapped "
                "table — query the logical name "
                f"({ {l for l, p in cm.items() if p == arg}.pop()!r})"
            )
        phys = _phys_col(m, arg)
        if phys == pb:
            raise MetadataInsufficient(
                f"{arg!r} is the partition column — its values live in "
                "directory names (typed by partition inference, not "
                "footer stats); scan via read_table_version"
            )
        best = None
        for f in m["files"]:
            fs = stats.get(f) or {}
            if fs.get(_ROWS_KEY) == 0:
                # a provably EMPTY file (Spark writes one for the first
                # task even when it got no rows) contributes nothing —
                # skipping it is exact, not approximate
                continue
            if phys not in fs:
                raise MetadataInsufficient(
                    f"file {f!r} of version {v} records no [min,max] for "
                    f"{arg!r} (not a stats column, pre-stats file, or "
                    "all-NULL) — scan via read_table_version"
                )
            if fs.get(_TRUNC_KEY + phys):
                raise MetadataInsufficient(
                    f"{arg!r} bounds in file {f!r} are truncated "
                    f"(values wider than {_STATS_TRUNCATE} chars) — "
                    "widened bounds prune soundly but cannot answer "
                    "min/max exactly; scan via read_table_version"
                )
            lo, hi = fs[phys]
            val = lo if fn == "min" else hi
            if isinstance(val, float):
                raise MetadataInsufficient(
                    f"{arg!r} is floating-point — parquet bounds exclude "
                    "NaN while Spark's MIN/MAX order NaN above all "
                    "values; scan via read_table_version"
                )
            if best is None or (val < best if fn == "min" else val > best):
                best = val
        out[expr] = best  # None == SQL NULL over an empty table
    return out


def table_partitions(
    path: str, version: int | str | None = None, as_of=None
) -> dict:
    """SHOW PARTITIONS from the manifest alone — the partition values
    of a version with per-partition file counts, byte sizes, and (when
    every file in the partition records a ``rows:`` footer count and no
    delete sidecar masks it) exact row counts; ``rows`` is None where
    the log can't say exactly.  Driver-side metadata only: one manifest
    read plus one ``stat()`` per file, no Spark job — at 100 TB this is
    the difference between answering from KBs of metadata and listing a
    filesystem.  The partition column surfaces under its LOGICAL name;
    a ``__HIVE_DEFAULT_PARTITION__`` directory surfaces as value None."""
    v = _resolve_version(path, version, as_of)
    m = _load_manifest(path, v)
    pb = m.get("partition_by") or None
    if pb is None:
        raise ValueError(f"version {v} of {path} is not partitioned")
    stats = m.get("stats") or {}
    masked: set[str] = set()
    for sc in m.get("deletes") or []:
        masked.update(sc.get("files") or [])
    data = Path(path) / "data"
    from urllib.parse import unquote

    parts: dict[object, dict] = {}
    for f in m["files"]:
        seg = f.rsplit("/", 1)[0] if "/" in f else ""
        raw = seg.partition("=")[2]
        val = unquote(raw)
        key = None if val == "__HIVE_DEFAULT_PARTITION__" else val
        p = parts.setdefault(
            key, {"value": key, "files": 0, "rows": 0, "bytes": 0}
        )
        p["files"] += 1
        try:
            p["bytes"] += (data / f).stat().st_size
        except OSError:
            pass  # expired out from under us mid-listing
        n = (stats.get(f) or {}).get(_ROWS_KEY)
        if p["rows"] is not None and n is not None and f not in masked:
            p["rows"] += n
        else:
            p["rows"] = None
    return {
        "column": _logical_pb(m),
        "transform": _transform_of(m),
        "partitions": sorted(
            parts.values(), key=lambda p: (p["value"] is not None, p["value"])
        ),
    }


def restore_table_version(path: str, version: int | str) -> int:
    """RESTORE (Delta parity): commit a NEW head whose content equals an
    older version — a pure metadata commit that re-references the old
    version's files (zero data movement, KBs of manifest), so a bad
    write is rolled back in milliseconds while the full history stays
    intact and time-travelable.  Accepts a version number or tag name.
    The restored-from version's files must still exist — restore within
    your retention window (expire keeps what its manifests reference,
    so any readable version is restorable)."""
    if isinstance(version, str):
        tags = list_tags(path)
        if version not in tags:
            raise FileNotFoundError(f"no tag {version!r} on {path}")
        version = tags[version]
    if version not in list_versions(path):
        raise ValueError(f"version {version} of {path} is not committed")
    m = _load_manifest(path, version)

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"),
            m.get("blooms_conf"), f"restore({version})",
            m.get("deletes"), column_map=m.get("column_map"),
            transform=m.get("partition_transform"),
        )

    return _retry_conflicts(once, f"restore of {path}")


def history(path: str) -> list[dict]:
    """DESCRIBE HISTORY: one row per committed version, newest first —
    version, the operation that produced it (recorded at commit since
    r9s2; older manifests show None), row count, file count, parent,
    and the manifest's on-disk form (checkpoint vs delta).  Driver-side
    metadata only; no Spark job."""
    out = []
    for v in reversed(list_versions(path)):
        raw = json.loads(_manifest_path(path, v).read_text())
        full = _load_manifest(path, v)
        out.append(
            {
                "version": v,
                "op": raw.get("op"),
                "ts": raw.get("ts"),  # commit instant (AS OF resolution)
                "count": full.get("count"),
                "n_files": len(full["files"]),
                # outstanding MoR sidecars — nonzero means reads pay the
                # anti-join tax until a compaction folds them
                "n_delete_sidecars": len(full.get("deletes") or []),
                "parent": raw.get("parent"),
                "form": "full" if "files" in raw else "delta",
            }
        )
    return out


def tag_version(path: str, name: str, version: int | None = None) -> int:
    """Name a committed version (``prod``, ``v2024-08-15``) — the
    Iceberg-tag-style named ref: ``_tags/<name>`` holds the version
    number, written atomically so re-pointing a tag is safe, and
    :func:`expire_versions` retains tagged versions (files and
    manifest) regardless of ``keep_last`` until the tag is deleted.
    :func:`read_table_version` accepts the tag name as its ``version``.
    Returns the tagged version (default: current head).

    Race window (same as reader pins): a tag created while an expiry is
    ALREADY past its tag scan can still lose that expiry — tag before
    relying on retention, and run production expiry with
    ``grace_seconds`` covering the tagging window."""
    import re

    if not re.fullmatch(r"[A-Za-z][A-Za-z0-9._-]*", name):
        raise ValueError(f"bad tag name {name!r}")
    v = latest_version(path) if version is None else version
    if v is None or v not in list_versions(path):
        raise ValueError(f"version {v!r} of {path} is not committed")
    tags = Path(path) / "_tags"
    tags.mkdir(parents=True, exist_ok=True)
    tmp = tags / f".{name}.{uuid.uuid4().hex}"
    tmp.write_text(str(v))
    os.replace(tmp, tags / name)
    return v


def delete_tag(path: str, name: str) -> None:
    (Path(path) / "_tags" / name).unlink(missing_ok=True)


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


def alter_table_version(
    spark: SparkSession,
    path: str,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    new_partition_by: str | None | type(...) = ...,
    cast: dict[str, str] | None = None,
) -> int:
    """Schema / partition evolution as a new version: DROP COLUMN,
    RENAME COLUMN, and repartitioning-by-a-different-column, committed
    as a FULL re-snapshot on the same version chain — the other half of
    the evolution story next to upsert's add-column path, and the same
    honest plain-parquet cost (no table-level schema metadata means
    mixed-schema or mixed-layout directories are a read-order hazard;
    table formats pay a metadata commit instead).  Old versions keep
    reading their own files with their own schema and layout
    byte-identically.

    ``new_partition_by`` defaults to "keep the current one" (the
    sentinel ``...``); pass a column name to re-partition or ``None``
    to flatten.  Per-file stats_cols follow renames and drop dropped
    columns; bloom columns likewise.

    ``cast`` (r10: ALTER COLUMN TYPE) maps column → Spark DDL type
    (``{"k": "bigint"}``).  Casts apply BEFORE renames in the same
    simultaneous projection.  NARROWING that loses values is rejected:
    any row where the cast produces NULL from a non-NULL input aborts
    the alter with a per-column violation count, before anything
    commits — the widening-only contract Delta enforces statically,
    enforced here against the data itself."""
    drop = list(drop or [])
    rename = dict(rename or {})
    cast = dict(cast or {})
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    old_partition_by = m.get("partition_by") or None
    existing = read_table_version(spark, path, head)
    cols = set(existing.columns)
    missing = [c for c in drop + list(rename) + list(cast) if c not in cols]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    both = sorted(set(drop) & (set(rename) | set(cast)))
    if both:
        raise ValueError(f"columns both dropped and renamed/cast: {both}")
    # renames are SIMULTANEOUS (one select projection, ADVICE r9):
    # swap ({'a':'b','b':'a'}) and chain ({'a':'b','b':'c'}) maps are
    # legal — every SOURCE evaluates against the old row, exactly SQL
    # UPDATE's simultaneous-SET semantics.  The only illegal maps are
    # the ones whose FINAL column list duplicates a name.
    final = [
        rename.get(c, c) for c in existing.columns if c not in drop
    ]
    dups = sorted({n for n in final if final.count(n) > 1})
    if dups:
        raise ValueError(f"rename would duplicate columns: {dups}")
    if old_partition_by in drop and new_partition_by is ...:
        raise ValueError(
            f"cannot drop partition column {old_partition_by!r} without "
            "choosing new_partition_by"
        )

    def follow(c: str | None) -> str | None:
        return rename.get(c, c) if c is not None else None

    # hidden partitioning: the synth column is never in the logical
    # frame, so the transform (not the directory column) is what
    # evolves — it follows renames/casts of its SOURCE column, and
    # dropping the source needs an explicit new layout.  Passing a
    # transform TUPLE as new_partition_by sets hidden partitioning
    # via ALTER.
    t_head = _transform_of(m)
    t_new = None
    if new_partition_by is ...:
        if t_head is not None:
            inv = {p: l for l, p in _column_map(m).items()}
            src_l = inv.get(t_head["source"], t_head["source"])
            if src_l in drop:
                raise ValueError(
                    f"cannot drop {src_l!r} — it is the source of the "
                    f"table's {t_head['kind']} partition transform; "
                    "choose new_partition_by"
                )
            t_new = {**t_head, "source": follow(src_l)}
            partition_by = (
                f"_p_{t_new['kind']}{t_new.get('n', '')}_{t_new['source']}"
            )
        else:
            partition_by = follow(old_partition_by)
    else:
        partition_by, t_new = _parse_partition_spec(new_partition_by, None)

    def _src(c: str):
        return F.col(c).cast(cast[c]) if c in cast else F.col(c)

    out = existing.select(
        *[
            _src(c).alias(rename.get(c, c))
            for c in existing.columns
            if c not in drop
        ]
    )
    if cast:
        # widening-only contract, checked against the DATA: a cast that
        # loses any non-NULL value (overflow, unparseable string) would
        # silently corrupt the re-snapshot — abort with counts instead,
        # before anything is staged.  try_cast so the check itself
        # yields COUNTS under ANSI mode (where a plain narrowing cast
        # throws mid-scan); once the check passes, the projection's
        # plain cast cannot fail
        checks = existing.select(
            *[
                F.sum(
                    (
                        F.col(c).isNotNull()
                        & F.col(c).try_cast(cast[c]).isNull()
                    ).cast("long")
                ).alias(c)
                for c in cast
            ]
        ).collect()[0]
        lossy = {c: checks[c] for c in cast if checks[c]}
        if lossy:
            raise ValueError(
                f"cast would lose values (non-NULL → NULL row counts): "
                f"{lossy} — ALTER COLUMN TYPE is widening-only; route "
                "lossy conversions through an explicit UPDATE first"
            )
    if t_new is not None:
        # validate the (possibly new) transform against the RESULT
        # schema — and take its freshly recorded src_type (a cast may
        # have changed the source dtype) — then materialize the
        # directory column for staging
        _, t_new = _parse_partition_spec(
            (t_new["kind"], t_new["source"], t_new["n"])
            if "n" in t_new
            else (t_new["kind"], t_new["source"]),
            out,
        )
        out = out.withColumn(partition_by, _transform_expr(t_new))
    if partition_by is not None and partition_by not in out.columns:
        raise ValueError(f"partition column {partition_by!r} not in result")
    # constraints must still RESOLVE against the altered schema (a
    # rename/drop of a referenced column is caught here with the
    # drop-the-constraint-first remediation) and still hold on the data
    _validate_constraints(out, m.get("constraints"), f"alter of {path}")
    stats_cols = [
        follow(c) for c in (m.get("stats_cols") or []) if c not in drop
    ] or None
    bloom_conf = m.get("blooms_conf")
    if bloom_conf:
        bcols = [follow(c) for c in bloom_conf["cols"] if c not in drop]
        bloom_conf = {**bloom_conf, "cols": bcols} if bcols else None
    n = out.count()
    if n == 0:
        return _retry_conflicts(
            lambda: _commit(
                path, [], 0, latest_version(path), partition_by,
                stats_cols, None, out.schema.jsonValue(), bloom_conf,
                "alter", column_map=None, transform=t_new,
            ),
            f"alter of {path}",
        )
    files = _stage_files(out, path, partition_by)
    stats = _new_file_meta(spark, path, files, stats_cols, bloom_conf) or None
    return _retry_conflicts(
        lambda: _commit(
            path, files, n, latest_version(path), partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="alter",
            column_map=None,  # full re-snapshot: physical = logical
            transform=t_new,
        ),
        f"alter of {path}",
    )


def rename_columns(spark: SparkSession, path: str,
                   rename: dict[str, str]) -> int:
    """METADATA-ONLY column rename (r10 s2, Delta column-mapping 'name'
    mode): commit a new version whose files, stats, blooms and sidecars
    are the head's VERBATIM, carrying a logical-to-physical
    ``column_map`` applied at read time — at 100 TB a rename costs one
    KB-sized manifest instead of :func:`alter_table_version`'s full
    re-snapshot.  Renames are simultaneous (swap/chain maps legal,
    duplicate-producing maps rejected — the alter rule); the partition
    column may be renamed (directories keep their physical name, the
    read surfaces the logical one).  Constraints must still resolve
    against the renamed schema — a constraint referencing an old name
    aborts with the drop-first remediation.

    Mapped tables stamp manifest ``format: 2``: pre-mapping readers
    refuse them loudly instead of misreading (the format gate's
    purpose).  The jar-free ``versioned_table`` DataSource declares
    non-support and rejects mapped tables; every versions.py operation
    composes (reads, prune/point skipping, DELETE/UPDATE/MERGE in
    logical names over physical scans — filter pushdown survives the
    alias projection — CoW and MoR, CDC, clone, compact).  A full
    re-snapshot op (alter's data path, write_table_version, upsert's
    add-column evolution) RE-BASELINES: files are rewritten with the
    logical names and the map clears.

    CDC consumers treat a rename as a SCHEMA BOUNDARY: a
    read_table_changes window crossing the rename step compares frames
    with different column names — renamed KEYS fail loudly, and a
    renamed payload column can surface as whole-table update_postimages
    (correct but wasteful — the fingerprint concatenates values in
    sorted-COLUMN-NAME order).  Rename the downstream table first, or
    re-bootstrap the consumer from the post-rename head."""
    if not rename:
        raise ValueError("nothing to rename")
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    cm = _column_map(m)
    inv = {p: l for l, p in cm.items()}
    # current LOGICAL columns, no Spark job: a data-file footer (plus
    # the physical partition directory column), or the recorded schema
    # of an empty head
    if m["files"]:
        import pyarrow.parquet as pq

        phys = list(
            pq.read_schema(
                str(Path(path) / "data" / m["files"][0])
            ).names
        )
        pb = m.get("partition_by") or None
        if pb and pb not in phys:
            phys.append(pb)
    elif m.get("schema"):
        phys = [f["name"] for f in m["schema"]["fields"]]
    else:
        raise ValueError(f"{path} has no schema to rename")
    logical = [inv.get(c, c) for c in phys]
    missing = [c for c in rename if c not in logical]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    final = [rename.get(c, c) for c in logical]
    dups = sorted({n for n in final if final.count(n) > 1})
    if dups:
        raise ValueError(f"rename would duplicate columns: {dups}")
    new_cm = {}
    for p, lg in zip(phys, logical):
        n = rename.get(lg, lg)
        if n != p:
            new_cm[n] = p
    if m.get("constraints"):
        # constraints reference LOGICAL names: verify they still
        # resolve post-rename (zero-row frame, tiny job)
        probe = read_table_version(spark, path, head).limit(0)
        probe = probe.select(
            *[F.col(c).alias(rename.get(c, c)) for c in probe.columns]
        )
        try:
            _validate_constraints(
                probe, m["constraints"], f"rename on {path}"
            )
        except Exception as exc:
            raise ValueError(
                f"rename breaks CHECK constraints ({exc}) — drop the "
                "constraint first, rename, then re-add it under the "
                "new name"
            ) from None

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"),
            m.get("blooms_conf"),
            f"rename-metadata({sorted(rename.items())})",
            m.get("deletes"), column_map=new_cm or None,
        )

    return _retry_conflicts(once, f"rename on {path}")


class Pin:
    """A reader-registered version pin: ``_pins/r{uuid}.json`` names the
    version a long-running reader is scanning so :func:`expire_versions`
    will not delete that version's files out from under its executors
    mid-scan (VERDICT r8 #2 — the minimal honest slice of Iceberg's
    snapshot-ref retention, using the same O_EXCL claim-file discipline
    as :func:`_commit`).

    Liveness is mtime-based: a pin is ACTIVE while its file's age is
    within its recorded ``ttl_seconds``; a reader outliving its TTL
    calls :meth:`refresh` (one ``utime``) to stay protected, and a
    crashed reader's pin goes stale and is swept by the next expiry —
    no lease service, no heartbeat thread.

    Registration order closes the obvious race (the pin lands on disk
    BEFORE the manifest is re-verified, so an expiry that starts after
    ``Pin()`` returns sees it); an expiry ALREADY past its pin scan
    when the pin is created can still win — run production expiry with
    ``grace_seconds`` covering the pin-registration window, the same
    knob that already protects in-flight writers."""

    def __init__(self, path: str, version: int, ttl_seconds: float = 3600.0):
        if ttl_seconds <= 0:
            raise ValueError("ttl_seconds must be > 0")
        self.version = int(version)
        self.ttl_seconds = float(ttl_seconds)
        pins = Path(path) / "_pins"
        pins.mkdir(parents=True, exist_ok=True)
        self.file = pins / f"r{uuid.uuid4().hex}.json"
        fd = os.open(self.file, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(
                {"version": self.version, "ttl_seconds": self.ttl_seconds}
            ))
        # verify AFTER registering: if the version was expired in the
        # meantime the reader fails loudly now, not mid-scan
        try:
            _load_manifest(path, self.version)
        except FileNotFoundError:
            self.release()
            raise

    def refresh(self) -> None:
        """Extend the pin's liveness window (mtime touch)."""
        os.utime(self.file)

    def release(self) -> None:
        self.file.unlink(missing_ok=True)


@contextmanager
def pin_version(path: str, version: int | None = None,
                ttl_seconds: float = 3600.0):
    """Pin ``version`` (default: current head) for the duration of the
    block; yields the :class:`Pin` (``.version`` for the read call,
    ``.refresh()`` for scans outliving the TTL)::

        with pin_version(table, ttl_seconds=7200) as pin:
            df = read_table_version(spark, table, pin.version)
            ...  # expire_versions cannot delete this version's files

    The pin is released on exit even on error; a crash mid-block leaves
    a stale pin that ages out and is swept by the next expiry."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    pin = Pin(path, v, ttl_seconds)
    try:
        yield pin
    finally:
        pin.release()


def _rel_from_file_uri(uri: str, data_abs: Path) -> str:
    """Map a Spark ``input_file_name()`` URI back to a data-relative
    manifest path.  Spark percent-encodes the path segments of the URI
    it reports, and Hive-escaped partition directories already CONTAIN
    percent escapes on disk (``p=a%3Ab``), so the URI shows them
    double-encoded (``p=a%253Ab``) — one ``unquote`` restores exactly
    the on-disk name."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(uri).path)
    return str(Path(p).relative_to(data_abs))


def _files_matching(
    spark: SparkSession, m: dict, data: str, data_abs: Path, cond,
    prune: list[tuple] | None, point: list[tuple] | None,
) -> set[str]:
    """The find-the-files step shared by DELETE and UPDATE: stats/bloom
    prune the candidates driver-side, then ONE job (predicate pushed to
    the scan, ReadSchema pruned to the predicate columns — CI-asserted
    in tests/test_plans.py) collects the DISTINCT FILE NAMES holding a
    matching row — bounded by file count, never row count."""
    candidates = list(m["files"])
    raw_point = point  # typed values, pre-rendering (bucket replica)
    if prune:
        prune = [(_phys_col(m, c), lo, hi) for c, lo, hi in prune]
    if point:
        point = [(_phys_col(m, c), _point_probe_str(c, val))
                 for c, val in point]
    if prune or point:
        stats = m.get("stats") or {}
        t = _transform_of(m)
        t_prunes = (
            [pr for pr in prune or [] if pr[0] == t["source"]]
            if t
            else []
        )
        t_bucket_segs = None
        if t and t["kind"] == "bucket":
            probes = [
                _bucket_seg_of(t, v)
                for c, v in raw_point or []
                if _phys_col(m, c) == t["source"]
            ]
            if probes and None not in probes:
                t_bucket_segs = set(probes)

        def keep(f: str) -> bool:
            if t_bucket_segs is not None:
                sv = _seg_value_of(f)
                if sv is not None and not all(
                    sv == b for b in t_bucket_segs
                ):
                    return False
            if t_prunes and not _transform_prune_keep(
                t, _seg_value_of(f), t_prunes
            ):
                return False
            fs = stats.get(f)
            if not fs:
                return True
            for col, lo, hi in prune or []:
                if col in fs:
                    fmin, fmax = fs[col]
                    if (hi is not None and fmin > hi) or (
                        lo is not None and fmax < lo
                    ):
                        return False
            for col, val in point or []:
                entry = fs.get(_BLOOM_KEY + col)
                if entry and not _bloom_might_contain(entry, val):
                    return False
            return True

        candidates = [f for f in candidates if keep(f)]
    if not candidates:
        return set()
    cdf = spark.read.option("basePath", data).parquet(
        *[f"{data}/{f}" for f in candidates]
    )
    # the predicate arrives in LOGICAL names; the aliased projection
    # still pushes the filter to the (physical) scan
    hit_uris = [
        r[0]
        for r in _to_logical(cdf, m).filter(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    known = set(m["files"])
    hit: set[str] = set()
    for u in hit_uris:
        rel = _rel_from_file_uri(u, data_abs)
        if rel not in known:  # never silently rewrite the wrong file
            raise ValueError(
                f"matched file {rel!r} is not in version "
                f"{m['version']}'s manifest"
            )
        hit.add(rel)
    return hit


def delete_table_version(
    spark: SparkSession,
    path: str,
    predicate,
    prune: list[tuple] | None = None,
    point: list[tuple] | None = None,
    mode: str = "cow",
    mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    """Row-level ``DELETE WHERE`` as a new version with FILE-LEVEL
    copy-on-write — the takedown / GDPR-erasure operation a training-
    data table needs (Delta ``DELETE`` parity; the reference has no
    table layer at all).  Returns the new version, or the unchanged
    head when no row matches (no empty commit).

    ``predicate`` is a SQL expression string or a Column; rows where it
    evaluates TRUE are removed (NULL keeps the row — SQL ``DELETE``
    semantics).  Three narrowing steps keep the rewrite proportional to
    the HIT set, not the table:

    1. driver-side stats prune (``prune``: same ``(col, lo, hi)``
       contract as :func:`read_table_version`; ``point``: same
       ``(col, value)`` bloom probes) drops files that cannot contain a
       match — zero I/O, and the bloom path makes a single-key
       takedown on an unordered id touch ~1 file instead of the table;
    2. one find-the-files job over the survivors: the predicate plus
       ``input_file_name()``, collecting only DISTINCT FILE NAMES to
       the driver (bounded by file count, never row count);
    3. only hit files are rewritten (their non-matching rows re-staged);
       every other file is re-referenced by the new manifest unchanged,
       so old versions stay readable byte-identically and the changed
       bytes are O(hit files).

    Deleting every row commits an EMPTY version — subsequent
    :func:`read_table_version` raises its documented empty-version
    error and :func:`upsert_table_version` re-seeds the table on the
    same version chain.  Concurrent-writer safe via the same
    re-run-on-:class:`CommitConflict` loop as upsert.

    ``mode="mor"`` (merge-on-read, VERDICT r9 #3): instead of rewriting
    the hit files, write a SIDECAR parquet of the matching rows' exact
    fingerprints and record it in the manifest scoped to those files —
    ZERO data files rewritten, so a 1-row GDPR takedown on a table of
    1 GB files costs KBs.  Reads anti-join the sidecar (broadcast-sized
    delete side); the write amplification moves to
    :func:`compact_table_version`, which folds sidecars into clean
    files on its own schedule — exactly Iceberg v2's delete-file trade.
    MoR semantics are value-exact: rows whose full column tuple equals
    a deleted row's ARE the deleted rows; identical duplicates that
    both matched the predicate both disappear (they would under CoW
    too).  A later upsert/insert of identical content lands in a new
    file outside the sidecar's scope and is NOT masked.  A predicate
    matching more than ``mor_max_rows`` refuses with the CoW
    remediation — the sidecar must stay broadcast-sized (see
    :func:`_check_mor_size`)."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be cow|mor, got {mode!r}")
    return _retry_conflicts(
        lambda: _delete_table_version_once(
            spark, path, predicate, prune, point, mode, mor_max_rows
        ),
        f"delete from {path}",
    )


def _delete_table_version_once(
    spark: SparkSession, path: str, predicate,
    prune: list[tuple] | None, point: list[tuple] | None = None,
    mode: str = "cow", mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    if not m["files"]:
        return head  # already empty — nothing to delete
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    data_abs = (Path(path) / "data").resolve()
    data = str(Path(path) / "data")
    hit = _files_matching(spark, m, data, data_abs, cond, prune, point)
    if not hit:
        return head  # predicate matched nothing: head unchanged
    partition_by = m.get("partition_by") or None
    # the hit-file read applies EXISTING MoR sidecars: already-deleted
    # rows must neither resurrect into rewritten files (CoW) nor count
    # as matches (both modes); MoR additionally annotates (file, pos)
    # so the sidecar carries positions for position-capable readers
    hdf = _plan_with_deletes(
        spark, data, sorted(hit), m.get("deletes"), _synth_of(m),
        positions=mode == "mor",
    )
    ldf = _to_logical(hdf, m)  # user predicate space
    stats_cols = m.get("stats_cols") or None
    bloom_conf = m.get("blooms_conf")
    if mode == "mor":
        matched = ldf.filter(F.coalesce(cond, F.lit(False)))
        n_matched = matched.count()
        if not n_matched:
            return head
        _check_mor_size(n_matched, mor_max_rows, "MoR delete", path)
        rel = _stage_delete_sidecar(_sidecar_rows(matched, m), path)
        deletes = list(m.get("deletes") or []) + [
            {"path": rel, "files": sorted(hit)}
        ]
        # ALL data files carry over verbatim — stats, blooms and layout
        # untouched; only the manifest and one KB-sized sidecar are new
        return _commit(
            path, m["files"], m["count"] - n_matched, head, partition_by,
            stats_cols, m.get("stats") or None, bloom_conf=bloom_conf,
            op="delete(mor)", deletes=deletes,
        )
    n_hit = hdf.count()
    survivors = _to_physical(
        ldf.filter(~F.coalesce(cond, F.lit(False))), m
    )
    n_surv = survivors.count()
    new_files = _stage_files(survivors, path, partition_by) if n_surv else []
    carried = [f for f in m["files"] if f not in hit]
    total = m["count"] - (n_hit - n_surv)
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(_new_file_meta(spark, path, new_files, stats_cols, bloom_conf))
    schema = (
        survivors.schema.jsonValue()  # physical, like everything staged
        if not (carried or new_files)
        else None
    )
    return _commit(
        path, carried + new_files, total, head, partition_by,
        stats_cols, stats, schema, bloom_conf=bloom_conf, op="delete",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )


def update_table_version(
    spark: SparkSession,
    path: str,
    predicate,
    set: dict,
    prune: list[tuple] | None = None,
    point: list[tuple] | None = None,
    mode: str = "cow",
    mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    """Row-level ``UPDATE ... SET ... WHERE`` as a new version —
    completes the DML trio next to :func:`upsert_table_version` and
    :func:`delete_table_version`, with the same file-level
    copy-on-write narrowing (stats/bloom prune → one find-the-files
    job → only hit files rewritten, matching rows transformed and
    non-matching rows re-staged verbatim).  ``set`` maps column name →
    SQL expression string or Column (evaluated in the row's scope, so
    ``{"val": "upper(val)"}`` works); assigning to an unknown column
    raises (UPDATE never adds columns — that is upsert's evolution
    path).  Rows where the predicate is NULL are not updated.  Returns
    the unchanged head when nothing matches.

    ``mode="mor"`` (r10, the UPDATE half of merge-on-read): the OLD row
    images' fingerprints land in a delete sidecar scoped to the hit
    files and only the UPDATED rows stage as a new (tiny) file — a
    1-row update on a 1 GB file costs a KB sidecar plus one small
    append instead of the full rewrite; :func:`compact_table_version`
    folds the debt exactly as for MoR deletes.  A predicate matching
    more than ``mor_max_rows`` refuses with the CoW remediation — the
    sidecar must stay broadcast-sized (see :func:`_check_mor_size`)."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be cow|mor, got {mode!r}")
    return _retry_conflicts(
        lambda: _update_table_version_once(
            spark, path, predicate, set, prune, point, mode,
            mor_max_rows
        ),
        f"update of {path}",
    )


def _update_table_version_once(
    spark: SparkSession, path: str, predicate, set: dict,
    prune: list[tuple] | None, point: list[tuple] | None,
    mode: str = "cow", mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    if not m["files"]:
        return head
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    data_abs = (Path(path) / "data").resolve()
    data = str(Path(path) / "data")
    hit = _files_matching(spark, m, data, data_abs, cond, prune, point)
    if not hit:
        return head
    partition_by = m.get("partition_by") or None
    # deletes-aware: MoR-masked rows must not resurrect into the
    # rewritten files (their sidecar scope ends with the rewrite)
    hdf = _plan_with_deletes(spark, data, sorted(hit), m.get("deletes"),
                             _synth_of(m), positions=mode == "mor")
    ldf = _to_logical(hdf, m)  # SET names / predicates are logical
    unknown = [c for c in set if c not in ldf.columns]
    if unknown:
        raise ValueError(f"UPDATE of unknown columns: {unknown}")
    lpb = _logical_pb(m)
    if lpb and lpb in set:
        raise ValueError(
            f"cannot UPDATE partition column {lpb!r} — rows would "
            "move directories; route through delete + upsert"
        )
    if mode == "mor":
        matched_rows = ldf.filter(F.coalesce(cond, F.lit(False)))
        n_matched = matched_rows.count()
        if not n_matched:
            return head
        _check_mor_size(n_matched, mor_max_rows, "MoR update", path)
        # old images masked by a sidecar scoped to the hit files; the
        # updated rows (SET applied simultaneously against the old row)
        # append as fresh files OUTSIDE every sidecar's scope.
        # Fingerprints are PHYSICAL (rename-stable)
        side = _sidecar_rows(matched_rows, m)
        uproj = []
        for c in ldf.columns:
            if c in _POS_COLS:
                continue
            if c in set:
                val = set[c]
                val = F.expr(val) if isinstance(val, str) else val
                uproj.append(val.cast(ldf.schema[c].dataType).alias(c))
            else:
                uproj.append(F.col(c))
        updated = matched_rows.select(*uproj)
        _validate_constraints(
            updated, m.get("constraints"), f"update of {path}"
        )
        new_files = _stage_files(_to_physical(updated, m), path, partition_by)
        rel = _stage_delete_sidecar(side, path)
        deletes = list(m.get("deletes") or []) + [
            {"path": rel, "files": sorted(hit)}
        ]
        stats_cols = m.get("stats_cols") or None
        bloom_conf = m.get("blooms_conf")
        stats = dict(m.get("stats") or {})
        stats.update(
            _new_file_meta(spark, path, new_files, stats_cols, bloom_conf)
        )
        return _commit(
            path, m["files"] + new_files, m["count"], head, partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="update(mor)",
            deletes=deletes,
        )
    matched = F.coalesce(cond, F.lit(False))
    # SQL UPDATE semantics: every SET expression evaluates against the
    # OLD row (SET a = b, b = a swaps) — one simultaneous projection,
    # never sequential withColumn (where a later SET would see an
    # earlier SET's result)
    proj = []
    for c in ldf.columns:
        if c in set:
            val = set[c]
            val = F.expr(val) if isinstance(val, str) else val
            proj.append(
                F.when(matched, val.cast(ldf.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            proj.append(F.col(c))
    rewritten = ldf.select(*proj)
    _validate_constraints(
        rewritten, m.get("constraints"), f"update of {path}"
    )
    new_files = _stage_files(_to_physical(rewritten, m), path, partition_by)
    carried = [f for f in m["files"] if f not in hit]
    stats_cols = m.get("stats_cols") or None
    bloom_conf = m.get("blooms_conf")
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(_new_file_meta(spark, path, new_files, stats_cols, bloom_conf))
    return _commit(
        path, carried + new_files, m["count"], head, partition_by,
        stats_cols, stats, bloom_conf=bloom_conf, op="update",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )


def merge_table_version(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched_update: dict | str | None = None,
    when_matched_delete=None,
    when_not_matched_insert=None,
    update_condition=None,
    prune: list[tuple] | None = None,
) -> int:
    """``MERGE INTO`` (Delta parity) — the conditional keyed merge the
    unconditional :func:`upsert_table_version` cannot express, and the
    natural CDC-apply operation (a feed of upserts AND deletes lands in
    ONE commit).  ``source`` joins the head on ``keys``; clauses:

    - ``when_matched_delete``: ``True`` or a SQL/Column condition —
      matched target rows satisfying it are removed.  Evaluated FIRST
      (the Delta convention for delete-then-update clause stacks); a
      NULL condition leaves the row (SQL semantics).
    - ``when_matched_update``: ``"*"`` (every target column takes the
      source's value) or ``{col: expr}``; expressions and conditions
      see the target row as ``t`` and the source row as ``s``
      (``{"val": "concat(t.val, s.val)"}``).  ``update_condition``
      narrows it; rows matching neither clause carry unchanged.
    - ``when_not_matched_insert``: ``True``/``"*"`` (source must carry
      every target column; extra source columns are dropped) or a
      condition — source rows with no key match insert as new rows.

    Duplicate-match protection (Delta's error, same reason): if a
    target row matches MORE THAN ONE source row the merge raises —
    which source row wins would be nondeterministic.

    Scale: the same three-step narrowing as DELETE/UPDATE — source key
    [min,max] bounds prune candidate files driver-side (a small CDC
    batch against a clustered table touches few files), one semi-join
    job collects the hit FILE names, and only hit files rewrite; an
    insert-only merge (no matched clauses) rewrites ZERO files and
    reduces to a pure append.  The not-matched anti-join reads only the
    key columns of the head (column-pruned scan).  Reference shape:
    Delta MERGE; the file-level rewrite mirrors this module's
    delete/update (versions.py r9-r10)."""
    if when_matched_update is None and when_matched_delete is None \
            and when_not_matched_insert is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source is missing key columns: {missing}")
    return _retry_conflicts(
        lambda: _merge_table_version_once(
            spark, path, source, keys, when_matched_update,
            when_matched_delete, when_not_matched_insert,
            update_condition, prune,
        ),
        f"merge into {path}",
    )


def _merge_always(c) -> bool:
    """Is this clause unconditional? (never use ``in``/``==`` on a
    possibly-Column value — Column.__eq__ returns a Column and its
    truthiness raises)."""
    return c is True or (isinstance(c, str) and c == "*")


def _merge_cond(c):
    """Normalize a clause condition: True/"*" → always, str → expr;
    NULL evaluates to not-taken (SQL clause semantics)."""
    if _merge_always(c):
        return F.lit(True)
    return F.coalesce(F.expr(c) if isinstance(c, str) else c, F.lit(False))


def _merge_table_version_once(
    spark: SparkSession, path: str, source: DataFrame, keys: list[str],
    upd, dele, ins, upd_cond, prune: list[tuple] | None,
) -> int:
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(
            f"no committed versions under {path} — MERGE needs an "
            "existing table (seed with write_table_version)"
        )
    m = _load_manifest(path, head)
    partition_by = m.get("partition_by") or None
    stats_cols = m.get("stats_cols") or None
    bloom_conf = m.get("blooms_conf")
    if not m["files"]:
        # emptied table: every source row is not-matched
        if not ins:
            return head
        seeded = source
        if not _merge_always(ins):
            seeded = source.filter(_merge_cond(ins))
        seeded = _to_physical(seeded, m)  # staged files live physical
        tgt_schema = m.get("schema")
        if tgt_schema:
            cols = [f["name"] for f in tgt_schema["fields"]]
            seeded = seeded.select(*cols)
        n = seeded.count()
        if not n:
            return head
        _validate_constraints(
            seeded, m.get("constraints"), f"merge into {path}"
        )
        files = _stage_files(seeded, path, partition_by)
        stats = _new_file_meta(spark, path, files, stats_cols, bloom_conf) or None
        return _commit(path, files, n, head, partition_by, stats_cols,
                       stats, bloom_conf=bloom_conf, op="merge")
    data_abs = (Path(path) / "data").resolve()
    data = str(Path(path) / "data")
    existing = _to_logical(
        _plan_with_deletes(spark, data, m["files"], m.get("deletes"),
                           _synth_of(m)), m
    )
    if upd == "*" or ins is not None:
        # every insert is "*"-shaped (optionally conditional): the
        # inserted row is the source row projected to the table schema
        lacking = [c for c in existing.columns if c not in source.columns]
        if lacking:
            raise ValueError(
                f"source is missing table columns {sorted(lacking)} "
                "required by the update('*')/insert clause"
            )
    if isinstance(upd, dict):
        unknown = [c for c in upd if c not in existing.columns]
        if unknown:
            raise ValueError(f"UPDATE SET of unknown columns: {unknown}")
        lpb = _logical_pb(m)
        if lpb and lpb in upd:
            raise ValueError(
                f"cannot UPDATE partition column {lpb!r} — rows "
                "would move directories; route through delete + insert"
            )

    hit: set[str] = set()
    if upd is not None or dele is not None:
        # source key bounds prune candidates driver-side before the
        # find-the-files semi-join (one tiny agg over the source)
        auto_prune = list(prune or [])
        if m.get("stats") and not auto_prune:
            aggs = []
            for k in keys:
                # stats keys are PHYSICAL; the source column is logical
                if _phys_col(m, k) in (stats_cols or []):
                    aggs += [F.min(k).alias(f"lo_{k}"),
                             F.max(k).alias(f"hi_{k}")]
            if aggs:
                row = source.agg(*aggs).collect()[0].asDict()
                for k in keys:
                    if f"lo_{k}" in row and row[f"lo_{k}"] is not None:
                        auto_prune.append(
                            (_phys_col(m, k), row[f"lo_{k}"], row[f"hi_{k}"])
                        )
        candidates = list(m["files"])
        if auto_prune:
            stats = m.get("stats") or {}

            def keep(f: str) -> bool:
                fs = stats.get(f)
                if not fs:
                    return True
                for col, lo, hi in auto_prune:
                    if col in fs:
                        fmin, fmax = fs[col]
                        if (hi is not None and fmin > hi) or (
                            lo is not None and fmax < lo
                        ):
                            return False
                return True

            candidates = [f for f in candidates if keep(f)]
        if candidates:
            cdf = spark.read.option("basePath", data).parquet(
                *[f"{data}/{f}" for f in candidates]
            )
            hit_uris = [
                r[0]
                for r in _to_logical(cdf, m).select(
                    F.input_file_name().alias("_f"), *keys
                )
                .join(source.select(*keys).distinct(), keys, "left_semi")
                .select("_f")
                .distinct()
                .collect()
            ]
            known = set(m["files"])
            for u in hit_uris:
                rel = _rel_from_file_uri(u, data_abs)
                if rel not in known:
                    raise ValueError(
                        f"matched file {rel!r} is not in version "
                        f"{m['version']}'s manifest"
                    )
                hit.add(rel)

    new_files: list[str] = []
    n_t = n_out = 0
    if hit:
        t = _to_logical(
            _plan_with_deletes(spark, data, sorted(hit), m.get("deletes"),
                             _synth_of(m)),
            m,
        ).alias("t")
        s = source.withColumn("__smatch", F.lit(True)).alias("s")
        # plain equality, Delta's ON semantics: a NULL key never
        # matches — it neither updates nor blocks the insert anti-join
        # (eqNullSafe here would make a NULL-key source row BOTH update
        # and insert)
        on = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        joined = t.join(s, cond, "left")
        n_t = t.count()
        n_joined = joined.count()
        if n_joined > n_t:
            raise ValueError(
                "MERGE: a target row matches more than one source row — "
                "which source row wins would be nondeterministic; "
                "de-duplicate the source on the merge keys first "
                "(Delta raises the same error)"
            )
        matched = F.coalesce(F.col("s.__smatch"), F.lit(False))
        take_delete = (
            matched & _merge_cond(dele) if dele is not None else F.lit(False)
        )
        take_update = F.lit(False)
        if upd is not None:
            take_update = matched & ~take_delete & (
                _merge_cond(upd_cond) if upd_cond is not None else F.lit(True)
            )
        proj = []
        for c in existing.columns:
            old = F.col(f"t.{c}")
            if upd == "*":
                newv = F.col(f"s.{c}")
            elif isinstance(upd, dict) and c in upd:
                v = upd[c]
                newv = F.expr(v) if isinstance(v, str) else v
            else:
                newv = None
            if newv is not None:
                proj.append(
                    F.when(
                        take_update,
                        newv.cast(existing.schema[c].dataType),
                    ).otherwise(old).alias(c)
                )
            else:
                proj.append(old.alias(c))
        rewritten = joined.filter(~take_delete).select(*proj)
        n_out = rewritten.count()
        _validate_constraints(
            rewritten, m.get("constraints"), f"merge into {path}"
        )
        if n_out:
            new_files += _stage_files(
                _to_physical(rewritten, m), path, partition_by
            )

    n_ins = 0
    if ins is not None:
        # aliased 's' so insert conditions keep the s.-qualified form
        # the matched clauses use
        anti = source.alias("s").join(
            existing.select(*keys), keys, "left_anti"
        )
        if not _merge_always(ins):
            anti = anti.filter(_merge_cond(ins))
        inserted = anti.select(*[
            F.col(c).cast(existing.schema[c].dataType).alias(c)
            for c in existing.columns
        ])
        n_ins = inserted.count()
        if n_ins:
            _validate_constraints(
                inserted, m.get("constraints"), f"merge into {path}"
            )
            new_files += _stage_files(
                _to_physical(inserted, m), path, partition_by
            )

    if not hit and not n_ins:
        return head  # nothing matched, nothing to insert
    carried = [f for f in m["files"] if f not in hit]
    total = m["count"] - (n_t - n_out) + n_ins
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(
        _new_file_meta(spark, path, new_files, stats_cols, bloom_conf)
    )
    schema = (
        _to_physical(existing.limit(0), m).schema.jsonValue()
        if not (carried or new_files)
        else None
    )
    return _commit(
        path, carried + new_files, total, head, partition_by,
        stats_cols, stats, schema, bloom_conf=bloom_conf, op="merge",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )


def diff_table_versions(
    spark: SparkSession, path: str, v_old: int, v_new: int, keys: list[str]
) -> DataFrame:
    """added/removed/changed rows between two versions — the snapshot
    differ over time-travel reads (fingerprint join; payload never
    shuffles)."""
    from etl_rust_spark.operators.profile import table_diff

    return table_diff(
        read_table_version(spark, path, v_old),
        read_table_version(spark, path, v_new),
        keys,
    )


def read_table_changes(
    spark: SparkSession,
    path: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC-style change feed (Delta ``table_changes`` parity, r9): the
    row-level changes the table underwent over ``(from_version,
    to_version]``, one row per changed key per version STEP, with the
    full payload and change metadata:

    - ``_change_type``: ``insert`` | ``delete`` | ``update_postimage``
      (the new row of a changed key; preimages are one time-travel read
      away and not materialized — half the payload for the common
      downstream-sync consumer);
    - ``_commit_version``: the version that introduced the change.

    Built from consecutive :func:`diff_table_versions` steps — each
    step is a fingerprint join (keys + 32 bytes/row shuffle, payload
    never shuffles) and one keyed semi-join back to the new version for
    the payload; deletes carry keys with NULL payload columns.  Steps
    union into ONE lazy plan, so a multi-version feed is still a single
    job.  Consumers resume by remembering the last ``_commit_version``
    they applied — the same contract as Delta CDF.

    At 100 TB: cost scales with the CHANGED keys per step (dirty
    partitions only, thanks to file-level COW), not table size; a
    full-snapshot-diff consumer pays the same fingerprint exchange this
    does, but per step instead of per full history."""
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    to_v = head if to_version is None else to_version
    if not 0 < from_version <= to_v <= head:
        raise ValueError(
            f"need 0 < from_version <= to_version <= head ({head}); "
            f"got ({from_version}, {to_v}]"
        )
    if from_version == to_v:
        # (v, v] is a legal EMPTY range — a caught-up consumer polling
        # with cursor == head gets an empty feed with the full feed
        # schema, not an error
        new = read_table_version(spark, path, to_v)
        payload = [c for c in new.columns if c not in keys]
        return new.limit(0).select(
            *keys,
            F.lit(None).cast("string").alias("_change_type"),
            *payload,
            F.lit(None).cast("int").alias("_commit_version"),
        )
    steps = []
    for v in range(from_version + 1, to_v + 1):
        d = diff_table_versions(spark, path, v - 1, v, keys)
        new = read_table_version(spark, path, v)
        ch_type = (
            F.when(F.col("diff") == "added", F.lit("insert"))
            .when(F.col("diff") == "removed", F.lit("delete"))
            .otherwise(F.lit("update_postimage"))
        )
        tagged = d.select(*keys, ch_type.alias("_change_type"))
        present = tagged.filter(F.col("_change_type") != "delete").join(
            new, keys, "left"
        )
        deleted = tagged.filter(F.col("_change_type") == "delete").join(
            new.limit(0), keys, "left"
        )
        steps.append(
            present.unionByName(deleted).withColumn(
                "_commit_version", F.lit(v).cast("int")
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def expire_versions(
    path: str, keep_last: int = 1, grace_seconds: float = 0.0,
    dry_run: bool = False,
) -> dict:
    """Retention for the version log: drop all but the newest
    ``keep_last`` committed versions, then delete every data file no
    surviving manifest references (shared files survive — the whole
    point of file-level COW).  Dangling crash leftovers (stage dirs,
    manifests past ``_latest``) are swept too.

    ``grace_seconds`` (r8, the writer-vs-expire guard): anything
    younger than this is NEVER swept — an IN-FLIGHT writer's staged
    files, freshly moved-but-uncommitted data files, and its claimed
    manifest all look dangling until its ``_latest`` swap lands.  Run
    production expiry with a grace comfortably above the longest
    commit (e.g. 3600).  Long READERS register :class:`Pin` files (r9):
    a version named by an ACTIVE pin (pin-file age within its own
    ``ttl_seconds``) is retained — files and manifest — regardless of
    ``keep_last``; stale pins (crashed readers) are swept here.  An
    UNPINNED long reader still races expiry — pin, or size
    ``keep_last`` to cover reader lag.

    ``dry_run=True`` reports what WOULD happen — kept versions and the
    counts of files/manifests/pins that would drop — while touching
    NOTHING on disk (no deletes, no stale-pin sweep, no delta-manifest
    materialization): the audit step before a production retention
    change."""
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    now = time.time()
    cutoff = now - grace_seconds

    def _old_enough(p: Path) -> bool:
        try:
            return p.stat().st_mtime <= cutoff
        except FileNotFoundError:
            return False

    versions = list_versions(path)
    keep = set(versions[-keep_last:])
    # reader pins: active ones extend retention, stale ones are swept
    swept_pins = honored_pins = 0
    for pf in sorted(Path(path).glob("_pins/r*.json")):
        try:
            body = json.loads(pf.read_text())
            age = now - pf.stat().st_mtime
        except (FileNotFoundError, json.JSONDecodeError):
            continue  # racing release/registration — leave it alone
        if age <= float(body.get("ttl_seconds", 3600.0)):
            v = int(body["version"])
            if v in versions:
                keep.add(v)
                honored_pins += 1
        else:
            if not dry_run:
                pf.unlink(missing_ok=True)
            swept_pins += 1
    # named refs: tagged versions are retained until the tag is deleted
    for tv in list_tags(path).values():
        if tv in versions:
            keep.add(tv)
    live: set[str] = set()
    for v in keep:
        mv = _load_manifest(path, v)
        live.update(mv["files"])
        # MoR delete sidecars live under data/ too — a kept version's
        # sidecars are part of its content
        live.update(d["path"] for d in mv.get("deletes") or [])
    dropped_files = 0
    root = Path(path)
    data = root / "data"
    for f in sorted(data.rglob("*.parquet")):
        if str(f.relative_to(data)) not in live and _old_enough(f):
            if not dry_run:
                f.unlink()
            dropped_files += 1
    # prune now-empty partition dirs
    if not dry_run:
        for d in sorted(
            (p for p in data.rglob("*") if p.is_dir()), reverse=True
        ):
            if not any(d.iterdir()):
                d.rmdir()
    # a kept DELTA-form manifest whose ancestor chain is about to be
    # expired is first MATERIALIZED into a full (checkpoint) manifest —
    # same logical view, atomically swapped in — so retention never has
    # to keep expired ancestors alive just for reconstruction.  (A
    # reader that loaded the delta form just before this and walks its
    # ancestors after they drop hits the same already-documented
    # reader-vs-expiry race grace_seconds/pins exist for.)
    for v in sorted(keep) if not dry_run else []:
        try:
            raw = json.loads(_manifest_path(path, v).read_text())
        except (FileNotFoundError, json.JSONDecodeError):
            continue
        if "files" in raw or raw.get("parent") in keep:
            continue
        full = _load_manifest(path, v)
        for k in ("added", "removed", "depth"):
            full.pop(k, None)
        tmp = _manifest_dir(path) / f".ckpt-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(full, indent=1))
        os.replace(tmp, _manifest_path(path, v))
    dropped_manifests = 0
    head = latest_version(path) or 0
    for mp in _manifest_dir(path).glob("m*.json"):
        v = int(mp.stem[1:])
        if (v not in keep or v > head) and _old_enough(mp):
            if not dry_run:
                mp.unlink()
            dropped_manifests += 1
    for st in root.glob("_stage-*"):
        if _old_enough(st):
            if not dry_run:
                shutil.rmtree(st)
    if not dry_run:
        _bump("expired_files_total", dropped_files)
        _bump("expired_manifests_total", dropped_manifests)
        # VERDICT r9 #8: a production operator watching retention needs
        # to SEE it being blocked by a stuck (or legitimate) reader —
        # pins_honored rising with zero pins_swept means a pin is
        # pinning every run
        _bump("pins_honored_total", honored_pins)
        _bump("pins_swept_total", swept_pins)
    return {
        "kept_versions": sorted(keep),
        "dropped_manifests": dropped_manifests,
        "dropped_files": dropped_files,
        "honored_pins": honored_pins,
        "swept_pins": swept_pins,
        "dry_run": dry_run,
    }


def compact_table_version(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 1,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    target_file_bytes: int | None = None,
) -> int:
    """Concurrent-writer-safe wrapper around one compaction pass (see
    :func:`upsert_table_version` for the conflict protocol).
    ``zorder_by`` turns the pass into OPTIMIZE ZORDER BY;
    ``target_file_bytes`` turns it into size-targeted bin-packing
    (both below)."""
    return _retry_conflicts(
        lambda: _compact_table_version_once(
            spark, path, max_files_per_partition, zorder_by, bits_per_col,
            target_file_bytes,
        ),
        f"compaction of {path}",
    )


def _compact_table_version_once(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 1,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    target_file_bytes: int | None = None,
) -> int:
    """OPTIMIZE: rewrite fragmented partitions into at most
    ``max_files_per_partition`` files each, committed as a new
    content-identical version.

    File-level COW upserts accumulate one file set per touched epoch —
    a hot partition upserted N times carries N small files, and small
    files are the classic table killer at scale (footer overhead, task
    scheduling, row-group fragmentation).  Compaction is the missing
    lifecycle step between upsert and :func:`expire_versions`: only
    partitions OVER the threshold rewrite (coalesced to the target file
    count); already-compact partitions' files carry over verbatim, and
    every older version still reads its own files byte-identically.
    Unpartitioned tables compact as one unit.  Stats columns are
    inherited; rewritten files get fresh footer stats.

    ``zorder_by`` (OPTIMIZE ZORDER BY parity): instead of coalescing
    fragmented partitions, rewrite EVERY data file with the whole head
    z-order clustered on those columns (:func:`catalog.zorder_frame` —
    quantile-bucketed Morton keys, one range exchange + in-file sort).
    The freshly computed per-file [min, max] stats then cover small
    disjoint hyper-rectangles, so subsequent ``prune``/``point`` reads
    on ANY clustered column skip most files — the re-layout step that
    makes manifest stats pruning actually bite after random-order
    ingestion.  File budget: ``max_files_per_partition`` × the head's
    partition-directory count (one unit when unpartitioned).

    ``target_file_bytes`` (Delta OPTIMIZE bin-packing parity, r10 s3):
    instead of a uniform file-count threshold, each partition's target
    output count is ``ceil(partition_bytes / target_file_bytes)`` and
    only partitions where merging actually REDUCES the file count
    rewrite — a partition holding one over-target file is never
    touched (no file splitting, like Delta), and a 100-partition table
    with one hot fragmented partition rewrites exactly that one.  The
    packing is approximate by design: byte sizes are the compressed
    on-disk sizes (recompression shifts them), and slot allocation can
    merge adjacent slots (files land OVER target rather than under —
    the cheap direction, fewer-larger files).  Mutually exclusive with
    ``zorder_by``; ``max_files_per_partition`` is ignored when set."""
    if target_file_bytes is not None:
        if zorder_by:
            raise ValueError(
                "target_file_bytes does not compose with zorder_by — "
                "run the z-order pass first, then size-compact"
            )
        if target_file_bytes <= 0:
            raise ValueError("target_file_bytes must be positive")
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    partition_by = m.get("partition_by") or None
    stats_cols = m.get("stats_cols") or None

    def part_of(f: str) -> str:
        return f.rsplit("/", 1)[0] if "/" in f else ""

    by_part: dict[str, list[str]] = {}
    for f in m["files"]:
        by_part.setdefault(part_of(f), []).append(f)
    if zorder_by:
        from etl_rust_spark.catalog import zorder_frame

        if not m["files"] or not m["count"]:
            # empty table (possibly schema-only part files): no layout
            return head
        data = str(Path(path) / "data")
        scope = _plan_with_deletes(
            spark, data, m["files"], m.get("deletes"), _synth_of(m)
        )
        n_files = max_files_per_partition * max(1, len(by_part))
        rewritten = zorder_frame(
            scope, [_phys_col(m, c) for c in zorder_by],
            n_files, bits_per_col,
        )
        new_files = _stage_files(rewritten, path, partition_by)
        bloom_conf = m.get("blooms_conf")
        stats = _new_file_meta(
            spark, path, new_files, stats_cols, bloom_conf
        )
        return _commit(
            path, new_files, m["count"], head, partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="zorder",
        )
    # a partition is compactable when it is FRAGMENTED (too many files)
    # or carries MoR delete-sidecar debt (rewriting folds the mask into
    # clean files — "the compactor folds them", VERDICT r9 #3)
    masked = set()
    for d in m.get("deletes") or []:
        masked.update(part_of(f) for f in d["files"])
    n_out: dict[str, int] = {}
    if target_file_bytes is not None:
        import math

        data_dir = Path(path) / "data"
        for p, fs in by_part.items():
            part_bytes = sum((data_dir / f).stat().st_size for f in fs)
            n_out[p] = max(1, math.ceil(part_bytes / target_file_bytes))
        fragmented = sorted(
            p for p, fs in by_part.items()
            if len(fs) > n_out[p] or p in masked
        )
    else:
        fragmented = sorted(
            p for p, fs in by_part.items()
            if len(fs) > max_files_per_partition or p in masked
        )
    if not fragmented:
        return head  # nothing to do — no empty commits
    if partition_by:
        # Plan the fragmented partitions from their FILES directly —
        # no value-level filter, so Hive-escaped directory names
        # (':' → '%3A', __HIVE_DEFAULT_PARTITION__, date rendering)
        # never round-trip through str() (ADVICE r7); also reads only
        # the partitions being rewritten instead of the whole head.
        frag = set(fragmented)
        data = str(Path(path) / "data")
        frag_files = [f for f in m["files"] if part_of(f) in frag]
        carried = [f for f in m["files"] if part_of(f) not in frag]
    else:
        data = str(Path(path) / "data")
        frag_files = list(m["files"])
        carried = []
    if target_file_bytes is None:
        # deletes-aware: compaction FOLDS sidecars for the partitions it
        # rewrites (masked rows physically drop, the sidecar's scope
        # shrinks to the carried files)
        scope = _plan_with_deletes(spark, data, frag_files, m.get("deletes"),
                                   _synth_of(m))
        rewritten = scope.coalesce(max_files_per_partition)
    else:
        # size-targeted bin-pack: route each row to one of its
        # partition's ceil(bytes/target) output slots.  Fragmented
        # files group BY SLOT COUNT into one plan branch each (distinct
        # counts are few — log-ish in partition sizes), every branch
        # carrying its count as a literal, so no input_file_name (it is
        # rejected over the MoR anti-join union) and no directory-name
        # round-trip (the ADVICE-r7 escaping lesson).  Slot assignment
        # is a wide row hash mod the count (duplicates colocate); the
        # range exchange keeps (partition, slot) groups contiguous so
        # output files stay single-partition-value.
        by_n: dict[int, list[str]] = {}
        for f in frag_files:
            by_n.setdefault(n_out[part_of(f)], []).append(f)
        total = sum(n_out[p] for p in fragmented) or 1
        keyed = None
        for n, fs in sorted(by_n.items()):
            b = _plan_with_deletes(spark, data, fs, m.get("deletes"),
                                   _synth_of(m))
            slot = F.pmod(
                F.xxhash64(*[F.col(c) for c in b.columns]), F.lit(n)
            )
            b = b.withColumn("__slot", slot)
            keyed = b if keyed is None else keyed.unionByName(b)
        cols = ([F.col(partition_by)] if partition_by else []) + [
            F.col("__slot")
        ]
        rewritten = keyed.repartitionByRange(total, *cols).drop("__slot")
    new_files = _stage_files(rewritten, path, partition_by)
    bloom_conf = m.get("blooms_conf")
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(_new_file_meta(spark, path, new_files, stats_cols, bloom_conf))
    return _commit(
        path, carried + new_files, m["count"], head, partition_by,
        stats_cols, stats, bloom_conf=bloom_conf, op="compact",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )
