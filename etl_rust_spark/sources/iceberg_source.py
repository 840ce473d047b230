"""Iceberg tables as a Spark SOURCE: ``spark.read.format
("iceberg_log")`` / ``spark.readStream.format("iceberg_log")`` over
the jar-free metadata reader in :mod:`etl_rust_spark.iceberg` — the
Iceberg half of the streaming-interop story next to
:mod:`~.delta_source`, built on the same Spark 4 Python DataSource
API.

Streaming follows Iceberg's incremental-append-scan contract:

- **Offsets are snapshot-log positions.**  The metadata's
  ``snapshot-log`` is the table's committed, append-only history;
  micro-batch N consumes the entries in ``(last, head]`` and the
  checkpoint stores the position, so restart resumes exactly-once.
- **Append snapshots stream their ADDED files** (manifest entries
  with status ADDED belonging to that snapshot — the incremental
  scan Iceberg itself defines).  Column projection follows the spec:
  field-id resolution where footers carry ids, identity-partition
  injection for metadata-only columns (r11), by-name behind the
  sampled guard otherwise.
- **Non-append snapshots fail loudly** (overwrite / delete / replace
  — not representable as an append stream) unless
  ``skipChangeCommits=true`` skips them, mirroring the Delta source.
- **Expired history refuses with the re-bootstrap story**: a cursor
  below the oldest surviving snapshot cannot be replayed (snapshot
  expiry removed it) — the same contract as the versioned-table CDC
  consumer.
- **Schema changes stop the stream** (a bound stream reads one
  schema; restart picks up the new one).
- ``startingSnapshot`` = ``latest`` (default) | ``earliest``;
  ``maxSnapshotsPerTrigger`` paces backlog draining.

Batch reads plan one executor task per live data file of the resolved
snapshot (``snapshotId`` / ``asOf`` options); snapshots carrying v2
delete files are routed to :func:`~.iceberg.read_iceberg_table`,
which can apply them.

Scale: driver touches only metadata (the bounded manifest walk);
every data file is one executor task; payload bytes never pass
through the driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
)

from .delta_source import _Slice, _read_slice

__all__ = ["IcebergLogDataSource"]


class _IOpts:
    def __init__(self, options: dict) -> None:
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError("iceberg_log requires a 'path' option")
        self.starting = str(
            options.get("startingsnapshot", "latest")
        ).lower()
        self.skip_changes = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        self.snapshot_id = options.get("snapshotid")
        self.as_of = options.get("asof")
        mv = int(options.get("maxsnapshotspertrigger", 0))
        if mv < 0:
            raise ValueError("maxSnapshotsPerTrigger must be >= 1")
        self.max_snapshots = mv or None


def _log_entries(table: str) -> list[dict]:
    from etl_rust_spark.iceberg import _check_format, _current_metadata

    meta = _current_metadata(table)
    _check_format(meta, table)
    return list(meta.get("snapshot-log") or [])


_INJECT_TYPE = {"int": "integer", "long": "long", "string": "string"}


def _file_slices(
    table: str, records: list[dict], schema_cols: list[str]
) -> list[_Slice]:
    """Per-file read slices with the spec's column-projection rules:

    - files whose footers carry parquet field ids read each schema
      field under its PHYSICAL (possibly pre-rename) name, and inject
      a typed NULL for ids absent from the file (added-later columns)
      — the same rule as read_iceberg_table, so a renamed table
      streams correctly instead of silently NULLing the column;
    - schema fields absent from a no-ids estate's footers that the
      DEFAULT spec identity-partitions resolve from each manifest
      entry's partition struct (how an exported hive-layout table
      streams back, r11); other absences refuse via the sampled-footer
      guard (ADVICE r10)."""
    from etl_rust_spark.iceberg import (
        IcebergProtocolError,
        _abs_file,
        _check_names_resolve,
        _current_metadata,
        _current_schema,
        _identity_injection,
        _name_mapping,
        _names_missing,
        _resolve_phys_cols,
    )

    if not records:
        return []
    meta = _current_metadata(table)
    sch = _current_schema(meta)
    by_name = {f["name"]: f for f in sch["fields"]}
    fields = [by_name[c] for c in schema_cols]
    file_paths = [_abs_file(table, r["file_path"]) for r in records]
    phys = _resolve_phys_cols(sorted(file_paths), fields,
                              _name_mapping(meta))
    if phys is None:
        schema = {"fields": fields}
        missing = _names_missing(sorted(file_paths), schema)
        inject = (_identity_injection(missing, meta, schema)
                  if missing else {})
        if any(n not in inject for n in missing):
            _check_names_resolve(sorted(file_paths), schema)  # raises
        for c in inject:
            if by_name[c]["type"] not in _INJECT_TYPE:
                raise IcebergProtocolError(
                    f"identity-partition field {c!r} of type "
                    f"{by_name[c]['type']!r} cannot inject through the "
                    "per-file source; read via read_iceberg_table"
                )
        out = []
        for r in records:
            part = r.get("partition") or {}
            pv, cols = [], []
            for c in schema_cols:
                if c in inject:
                    v = part.get(inject[c])
                    pv.append((c, None if v is None else str(v),
                               _INJECT_TYPE[by_name[c]["type"]]))
                    cols.append(None)
                else:
                    cols.append(c)
            out.append(_Slice(_abs_file(table, r["file_path"]),
                              pv, cols))
        return out
    # identity-partition fallback composes with id/mapping resolution
    # (spec projection order): fields unresolved in some files fill
    # from those files' partition metadata
    unresolved = [c for i, c in enumerate(schema_cols)
                  if any(phys[fp][i] is None for fp in file_paths)]
    inj = (_identity_injection(unresolved, meta, {"fields": fields})
           if unresolved else {})
    out = []
    for r, fp in zip(records, file_paths):
        part = r.get("partition") or {}
        pv, cols = [], []
        for c, p in zip(schema_cols, phys[fp]):
            if p is not None:
                cols.append(p)
                continue
            cols.append(None)
            if c in inj:
                t = by_name[c]["type"]
                if t not in _INJECT_TYPE:
                    raise IcebergProtocolError(
                        f"identity-partition field {c!r} of type "
                        f"{t!r} cannot inject through the per-file "
                        "source; read via read_iceberg_table"
                    )
                v = part.get(inj[c])
                pv.append((c, None if v is None else str(v),
                           _INJECT_TYPE[t]))
            else:
                pv.append((c, None, "string"))  # NULL-inject
        out.append(_Slice(fp, pv, cols))
    return out


def _slices_for_snapshot(
    table: str, sid: int, skip_changes: bool, schema_cols: list[str],
) -> list[_Slice] | None:
    """The ADDED data files of one snapshot as read slices, or None
    when skipChangeCommits drops a non-append snapshot."""
    from etl_rust_spark.iceberg import (
        IcebergProtocolError,
        _abs_file,
        _current_metadata,
        _read_ocf,
        _select_snapshot,
    )

    meta = _current_metadata(table)
    snap = _select_snapshot(meta, table, sid, None)
    op = (snap.get("summary") or {}).get("operation")
    added: list[dict] = []
    change = op not in (None, "append")
    if not change:
        for mf in _read_ocf(_abs_file(table, snap["manifest-list"])):
            # incremental-scan narrowing: a manifest that records which
            # snapshot added it and is NOT ours holds only carried
            # entries — skip the whole file (real manifest lists always
            # carry added_snapshot_id; absent means walk it)
            mf_sid = mf.get("added_snapshot_id")
            if mf_sid is not None and mf_sid != sid:
                continue
            for entry in _read_ocf(_abs_file(table,
                                             mf["manifest_path"])):
                df = entry["data_file"]
                if int(df.get("content", 0)) != 0:
                    change = True  # delete files present
                    break
                st = int(entry.get("status", 1))
                if st == 2:
                    change = True  # removals in an "append"?
                    break
                # v2 inheritance: a null manifest-entry snapshot_id
                # inherits the manifest-list row's added_snapshot_id
                # (mirrors iceberg_snapshot's sequence_number rule) —
                # real v2 manifests rely on it, and treating null as
                # "not ours" would silently skip ADDED files
                entry_sid = entry.get("snapshot_id")
                if entry_sid is None:
                    entry_sid = mf.get("added_snapshot_id")
                if st == 1 and entry_sid == sid:
                    fmt = str(df.get("file_format", "PARQUET")).upper()
                    if fmt != "PARQUET":
                        raise IcebergProtocolError(
                            f"file {df.get('file_path')!r} is {fmt}"
                        )
                    added.append(df)
            if change:
                break
    if change:
        if skip_changes:
            return None
        raise ValueError(
            f"Iceberg snapshot {sid} of {table} (operation {op!r}) is "
            "not an append — not representable as an append stream.  "
            "Set skipChangeCommits=true to skip such snapshots, or "
            "read snapshots via iceberg.read_iceberg_table"
        )
    return _file_slices(table, added, schema_cols)


class _IcebergBatchReader(DataSourceReader):
    def __init__(self, opts: _IOpts, schema_cols: list[str]) -> None:
        self.opts = opts
        self.schema_cols = schema_cols

    def partitions(self):
        from etl_rust_spark.iceberg import iceberg_snapshot

        o = self.opts
        sid = int(o.snapshot_id) if o.snapshot_id is not None else None
        as_of = None
        if o.as_of is not None:
            try:
                as_of = float(o.as_of)
            except ValueError:
                as_of = o.as_of
            sid = None
        snap = iceberg_snapshot(o.table, sid, as_of)
        if snap["pos_deletes"] or snap["eq_deletes"]:
            raise ValueError(
                f"snapshot {snap['snapshot']['snapshot-id']} of "
                f"{o.table} carries v2 delete files — the per-file "
                "batch source cannot apply the anti-joins; read via "
                "iceberg.read_iceberg_table"
            )
        return _file_slices(o.table, snap["files"], self.schema_cols)

    def read(self, partition: _Slice):
        yield from _read_slice(partition, self.schema_cols)


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, opts: _IOpts, schema_cols: list[str]) -> None:
        from etl_rust_spark.iceberg import (
            _current_metadata,
            _current_schema,
        )

        self.opts = opts
        self.schema_cols = schema_cols
        meta = _current_metadata(opts.table)
        # schema binding (Delta-source parity): streamed snapshots
        # must share the schema captured at start
        self._schema_id = _current_schema(meta).get("schema-id", 0)
        self._pos: int | None = None

    def _start_offset(self) -> int:
        n = len(_log_entries(self.opts.table))
        return n if self.opts.starting == "latest" else 0

    def initialOffset(self) -> dict:
        off = self._start_offset()
        self._pos = off if self._pos is None else max(self._pos, off)
        return {"pos": off}

    def latestOffset(self) -> dict:
        head = len(_log_entries(self.opts.table))
        if self.opts.max_snapshots:
            if self._pos is None:
                self._pos = self._start_offset()
            return {"pos": min(head,
                               self._pos + self.opts.max_snapshots)}
        return {"pos": head}

    def partitions(self, start: dict, end: dict):
        from etl_rust_spark.iceberg import _current_metadata

        self._pos = max(self._pos or 0, int(end["pos"]))
        t = self.opts.table
        lo, hi = int(start["pos"]), int(end["pos"])
        log = _log_entries(t)
        if lo > len(log):
            raise ValueError(
                f"stream cursor {lo} is beyond {t}'s snapshot log "
                f"({len(log)} entries) — the table was replaced; "
                "restart the stream"
            )
        meta = _current_metadata(t)
        live = {s["snapshot-id"] for s in meta.get("snapshots") or []}
        out: list[_Slice] = []
        for entry in log[lo:hi]:
            sid = entry["snapshot-id"]
            if sid not in live:
                raise ValueError(
                    f"snapshot {sid} of {t} was expired by retention "
                    "before this stream consumed it — re-bootstrap the "
                    "downstream from iceberg.read_iceberg_table and "
                    "restart from latest"
                )
            snap = next(s for s in meta["snapshots"]
                        if s["snapshot-id"] == sid)
            if snap.get("schema-id", 0) != self._schema_id:
                raise ValueError(
                    f"snapshot {sid} of {t} changes the table schema — "
                    "a bound stream cannot follow it; restart the "
                    "stream to pick up the new schema"
                )
            slices = _slices_for_snapshot(
                t, sid, self.opts.skip_changes, self.schema_cols
            )
            if slices:
                out.extend(slices)
        return out or [_Slice("", [], [])]

    def read(self, partition: _Slice):
        if not partition.path:
            return
        yield from _read_slice(partition, self.schema_cols)

    def commit(self, end: dict) -> None:
        self._pos = max(self._pos or 0, int(end["pos"]))


class IcebergLogDataSource(DataSource):
    """``spark.read/readStream.format("iceberg_log")``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_log"

    def schema(self):
        from etl_rust_spark.iceberg import (
            _current_metadata,
            _current_schema,
            _spark_schema,
        )

        opts = _IOpts(self.options)
        return _spark_schema(_current_schema(
            _current_metadata(opts.table)
        ))

    def _cols(self, schema) -> list[str]:
        return [f.name for f in schema.fields]

    def reader(self, schema) -> DataSourceReader:
        return _IcebergBatchReader(_IOpts(self.options),
                                   self._cols(schema))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IcebergStreamReader(_IOpts(self.options),
                                    self._cols(schema))
