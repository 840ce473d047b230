"""Metadata queries and table metadata DDL: DESCRIBE DETAIL, metadata-
only aggregates, partitions, history, tags, CHECK constraints and
properties, diff/CDC reads.

Mechanical split of the former single-module versions.py (r11); see the package __init__ for the public surface."""

from __future__ import annotations

import json
import os
import re
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import (
    list_tags,
    _commit,
    _load_manifest,
    _manifest_path,
    _retry_conflicts,
    latest_version,
    list_versions,
)
from .layout import (
    _column_map,
    _logical_pb,
    _phys_col,
    _transform_of,
)
from .read import (
    read_table_version,
    version_at_timestamp,
)
from .stats import (
    _ROWS_KEY,
    _STATS_TRUNCATE,
    _TRUNC_KEY,
)


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
