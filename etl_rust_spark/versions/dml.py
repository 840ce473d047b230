"""Data-changing operations: write/snapshot, external-file commits,
upsert, DELETE/UPDATE (CoW + MoR), MERGE INTO, and compaction.

Mechanical split of the former single-module versions.py (r11); see the package __init__ for the public surface."""

from __future__ import annotations

import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import (
    _commit,
    _load_manifest,
    _retry_conflicts,
    _stage_files,
    latest_version,
)
from .layout import (
    _column_map,
    _footer_canon,
    _hive_escape,
    _logical_pb,
    _parse_partition_spec,
    _phys_col,
    _same_transform,
    _spark_json_canon,
    _synth_of,
    _to_logical,
    _to_physical,
    _transform_expr,
    _transform_of,
)
from .metadata import (
    _validate_constraints,
    _validate_constraints_duckdb,
)
from .read import (
    _MOR_MAX_ROWS,
    _POS_COLS,
    _carry_deletes,
    _check_mor_size,
    _files_matching,
    _plan_with_deletes,
    _sidecar_rows,
    _stage_delete_sidecar,
    read_table_version,
)
from .stats import (
    _new_file_meta,
    _new_file_meta_local,
    _rel_from_file_uri,
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


def upsert_table_version(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
    mode: str = "cow",
    mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    """Concurrent-writer-safe wrapper: the merge is computed against a
    fixed head snapshot; if another writer commits first the CAS in
    :func:`_commit` raises and the WHOLE merge re-runs against the new
    head (losers never orphan a commit — VERDICT r7 #5).

    ``mode="mor"``/``"auto"`` (r12): a small delta into a huge
    partition need not rewrite it — the upsert routes through
    :func:`merge_table_version`'s merge-on-read path (update ``*`` +
    insert, same keys): matched old images mask via a positional
    sidecar, the delta appends, ZERO data files rewrite (manifest op
    reads ``merge(mor)``).  Two contract differences from the CoW
    leg, both safety-positive: duplicate delta keys RAISE (the CoW
    leg would insert both), and a key that moves partition masks its
    OLD copy instead of duplicating it.  Schema evolution (delta
    carries new columns) cannot mask — ``auto`` falls back to the
    CoW re-baseline, explicit ``mor`` refuses."""
    if mode not in ("cow", "mor", "auto"):
        raise ValueError(f"mode must be cow|mor|auto, got {mode!r}")
    if mode != "cow" and latest_version(path) is not None:
        from .merge import merge_table_version

        head_cols = set(
            read_table_version(spark, path).columns
        )
        evolved = set(delta.columns) - head_cols
        if not evolved:
            return merge_table_version(
                spark, path, delta, keys,
                when_matched_update="*",
                when_not_matched_insert=True,
                mode=mode, mor_max_rows=mor_max_rows,
            )
        if mode == "mor":
            raise ValueError(
                f"MoR upsert cannot add columns {sorted(evolved)} — "
                "masked files keep their old schema; use mode='cow' "
                "(or 'auto') for the re-baselining snapshot"
            )
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
    :func:`_check_mor_size`).

    ``mode="auto"`` (r12) makes the cost model self-executing: matches
    at or under ``mor_max_rows`` take the sidecar path, broader
    predicates route to CoW — never a refusal, same parity either
    way."""
    if mode not in ("cow", "mor", "auto"):
        raise ValueError(f"mode must be cow|mor|auto, got {mode!r}")
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
        positions=mode in ("mor", "auto"),
    )
    ldf = _to_logical(hdf, m)  # user predicate space
    stats_cols = m.get("stats_cols") or None
    bloom_conf = m.get("blooms_conf")
    if mode in ("mor", "auto"):
        matched = ldf.filter(F.coalesce(cond, F.lit(False)))
        n_matched = matched.count()
        if not n_matched:
            return head
        if mode == "auto" and n_matched > mor_max_rows:
            # the cost model, self-executing: a broad predicate pays
            # the rewrite ONCE instead of riding every read as an
            # over-sized broadcast delete side.  The position
            # annotations are MoR bookkeeping — never staged
            mode = "cow"
            ldf = ldf.drop(*_POS_COLS)
        else:
            if mode == "mor":  # auto never refuses; explicit mor does
                _check_mor_size(n_matched, mor_max_rows, "MoR delete",
                                path)
            mode = "mor"
    if mode == "mor":
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
    sidecar must stay broadcast-sized (see :func:`_check_mor_size`).
    ``mode="auto"`` (r12) routes instead of refusing: small matches
    take the sidecar, broad ones pay the rewrite once."""
    if mode not in ("cow", "mor", "auto"):
        raise ValueError(f"mode must be cow|mor|auto, got {mode!r}")
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
                             _synth_of(m),
                             positions=mode in ("mor", "auto"))
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
    if mode in ("mor", "auto"):
        matched_rows = ldf.filter(F.coalesce(cond, F.lit(False)))
        n_matched = matched_rows.count()
        if not n_matched:
            return head
        if mode == "auto" and n_matched > mor_max_rows:
            # self-executing cost model: broad predicates rewrite once
            # (CoW) instead of riding reads as an over-sized broadcast
            mode = "cow"
            ldf = ldf.drop(*_POS_COLS)
        else:
            if mode == "mor":  # auto never refuses; explicit mor does
                _check_mor_size(n_matched, mor_max_rows, "MoR update",
                                path)
            mode = "mor"
    if mode == "mor":
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


