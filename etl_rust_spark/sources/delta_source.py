"""Delta tables as a Spark SOURCE: ``spark.read.format("delta_log")``
/ ``spark.readStream.format("delta_log")`` over the jar-free
transaction-log reader in :mod:`etl_rust_spark.deltalake` — so a real
Delta table (written by any engine) can feed this engine's batch jobs
AND Structured Streaming pipelines without the delta-spark jar,
through the same Spark 4 Python DataSource API as the
``versioned_table`` and ``kafka_wire`` sources.

Streaming follows Delta's own source contract, deliberately:

- **Offsets are Delta versions.**  Micro-batch N covers the commits in
  ``(last_committed, head]``; the checkpoint stores the version
  cursor, so restart resumes exactly-once (the S-08 discipline).
- **Only dataChange=true actions stream.**  OPTIMIZE/compaction
  commits (add+remove with ``dataChange=false``) are invisible to the
  stream — exactly Delta's rule — so maintenance never duplicates or
  drops rows.
- **Change commits fail loudly**: a commit that removes data
  (``remove`` with dataChange) or rewrites it under a deletion vector
  is not representable as an append stream; like Delta, the source
  raises naming the version unless ``skipChangeCommits=true``.
- **Schema changes stop the stream.**  A mid-stream ``metaData``
  action with a different schema raises with the restart remediation
  (Delta parity: streams bind one schema).
- ``startingVersion`` = ``latest`` (default) | ``earliest`` | N;
  ``maxVersionsPerTrigger`` paces backlog draining after downtime.

Batch reads (``spark.read``) plan one input partition per live file of
the resolved snapshot (``version`` / ``asOf`` options).  Snapshots
whose files carry deletion vectors are refused here — the per-file
pyarrow path cannot apply the positional anti-join; use
:func:`etl_rust_spark.deltalake.read_delta_table`, which can.

Scale: the driver touches only the log (KBs per commit); every added
parquet file is one executor task; payload bytes never pass through
the driver.  Partition values are injected executor-side from the
add's ``partitionValues``, typed per the snapshot schema.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["DeltaLogDataSource"]


class _Slice(InputPartition):
    def __init__(self, path: str, part_vals: list[tuple[str, str, str]],
                 phys_cols: list[str]) -> None:
        self.path = path           # absolute data-file path
        # [(logical_col, serialized_value_or_None, type_name)]
        self.part_vals = part_vals
        self.phys_cols = phys_cols  # physical file columns, data cols only


class _DOpts:
    def __init__(self, options: dict) -> None:
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError("delta_log requires a 'path' option")
        self.starting = str(options.get("startingversion", "latest")).lower()
        self.skip_changes = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        self.version = options.get("version", "latest")
        self.as_of = options.get("asof")
        self.read_change_feed = (
            str(options.get("readchangefeed", "false")).lower()
            == "true"
        )
        mv = int(options.get("maxversionspertrigger", 0))
        if mv < 0:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        self.max_versions = mv or None


def _typed_part_value(s: str | None, type_name: str):
    """Serialized partitionValues string → python value matching the
    Spark type the schema declares for the column (the executor-side
    twin of deltalake._typed_partition_value, which only needs the
    driver-comparable subset)."""
    import datetime as _dt

    if s is None:
        return None
    if type_name in ("byte", "short", "integer", "long"):
        return int(s)
    if type_name in ("float", "double"):
        return float(s)
    if type_name == "boolean":
        return s == "true"
    if type_name == "string":
        return s
    if type_name == "date":
        return _dt.date.fromisoformat(s)
    raise ValueError(
        f"delta_log cannot inject a partition value of type "
        f"{type_name!r} — its string rendering is engine-ambiguous; "
        "read via deltalake.read_delta_table (Spark casts it) instead"
    )


def _phys_resolver(table: str, meta: dict, schema):
    """logical column → physical parquet column, PER FILE: mode
    ``name`` is uniform (the recorded physicalName); mode ``id``
    (r12) reads each file's parquet footer field ids — a converted
    estate may carry the same column under different parquet names
    per writer generation, which is exactly what per-file slices can
    express and a uniform map cannot.  An id absent from a footer
    maps to an impossible sentinel name so the slice reader's
    missing-column path NULL-fills it (the id-mode read contract); a
    file with NO ids refuses loudly (ids are the only resolution
    contract in this mode).  Other modes are identity."""
    from etl_rust_spark.deltalake import (
        DeltaProtocolError,
        _abs_file,
        _mapping_mode,
        _physical_name,
    )

    mode = _mapping_mode(meta)
    if mode == "id":
        from etl_rust_spark.iceberg import _footer_field_ids

        ids = {
            f.name: (f.metadata or {}).get("delta.columnMapping.id")
            for f in schema.fields
        }

        def per_file(add: dict) -> dict:
            m = _footer_field_ids(_abs_file(table, add["path"]))
            if m is None:
                raise DeltaProtocolError(
                    f"column mapping mode 'id': data file "
                    f"{add['path']!r} carries no parquet field ids"
                )
            return {
                n: (m.get(i) if m.get(i) is not None
                    else f"\x00absent:{n}")
                for n, i in ids.items()
            }

        return per_file
    if mode == "name":
        po = {f.name: _physical_name(f) for f in schema.fields}
    else:
        po = {f.name: f.name for f in schema.fields}
    return lambda add: po


def _read_slice(s: _Slice, logical_cols: list[str]) -> Iterator[tuple]:
    import pyarrow.parquet as pq

    from etl_rust_spark.versions import _footer_canon

    wanted = [c for c in s.phys_cols if c is not None]
    present = set(pq.read_schema(s.path).names)
    tbl = pq.read_table(s.path, columns=[c for c in wanted
                                         if c in present])
    pdf = tbl.to_pandas()
    canon = _footer_canon(s.path)
    for c in pdf.columns:
        if (
            canon.get(c) == "ts:utc"
            and str(pdf[c].dtype).startswith("datetime64")
            and getattr(pdf[c].dtype, "tz", None) is None
        ):
            pdf[c] = pdf[c].dt.tz_localize("UTC")
    pvals = {
        col: _typed_part_value(v, t) for col, v, t in s.part_vals
    }
    # pre-evolution files lack later-added columns: NULL-fill, the
    # Delta read contract
    for c in wanted:
        if c not in present:
            pdf[c] = None
    n = len(pdf)
    cols = []
    for logical, phys in zip(logical_cols, s.phys_cols):
        if phys is None:  # a partition column: injected, not scanned
            cols.append([pvals[logical]] * n)
        else:
            cols.append(list(pdf[phys]))
    for row in zip(*cols):
        yield tuple(
            None if isinstance(v, float) and v != v else v for v in row
        )


def _plan_version_slices(
    table: str, meta: dict, actions: list[dict], v: int,
    skip_changes: bool, cdf: bool = False,
) -> list[_Slice] | None:
    """The slices one Delta commit contributes to the stream, or None
    when skipChangeCommits drops the whole version.  ``cdf``
    (readChangeFeed, r12): change commits stream their ``cdc`` files
    (``_change_type`` comes from the file), pure appends stream as
    inserts with the literal type injected, and ``_commit_version``
    rides the same constant-injection channel as partition values —
    a change commit with NO cdc data still raises/skips (the feed
    was not captured for it)."""
    from etl_rust_spark.deltalake import (
        _abs_file,
        _mapping_mode,
        _physical_name,
        _snapshot_schema,
    )

    adds = [a["add"] for a in actions
            if a.get("add") and a["add"].get("dataChange", True)]
    removes = [a["remove"] for a in actions
               if a.get("remove") and a["remove"].get("dataChange", True)]
    dv_adds = [a for a in adds if a.get("deletionVector")]
    cdcs = [a["cdc"] for a in actions if a.get("cdc")] if cdf else []
    if (removes or dv_adds) and not cdcs:
        if skip_changes:
            return None
        raise ValueError(
            f"Delta version {v} of {table} is a CHANGE commit "
            f"({len(removes)} removes, {len(dv_adds)} deletion-vector "
            "rewrites) — not representable as an append stream"
            + (" and it carries no cdc data for readChangeFeed"
               if cdf else "") +
            ".  Set skipChangeCommits=true to skip such versions, or "
            "read snapshots via deltalake.read_delta_table"
        )
    schema = _snapshot_schema(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    # partitionValues keys are the RECORDED physical names in both
    # mapped modes (id-mode footers never hold partition columns)
    pv_of = {f.name: _physical_name(f) for f in schema.fields} \
        if _mapping_mode(meta) in ("name", "id") else \
        {f.name: f.name for f in schema.fields}
    resolve = _phys_resolver(table, meta, schema)
    out = []
    if cdf and cdcs:
        # the captured feed IS the version's stream contribution
        for a in cdcs:
            pv = a.get("partitionValues") or {}
            part_vals = [
                (c, pv.get(pv_of[c]), schema[c].dataType.typeName())
                for c in part_cols
            ] + [("_commit_version", str(v), "long")]
            phys_cols = [
                None if f.name in part_cols else pv_of[f.name]
                for f in schema.fields
            ] + ["_change_type", None]
            out.append(_Slice(_abs_file(table, a["path"]), part_vals,
                              phys_cols))
        return out
    for a in adds:
        pv = a.get("partitionValues") or {}
        phys_of = resolve(a)
        part_vals = [
            (c, pv.get(pv_of[c]), schema[c].dataType.typeName())
            for c in part_cols
        ]
        phys_cols = [
            None if f.name in part_cols else phys_of[f.name]
            for f in schema.fields
        ]
        if cdf:
            part_vals += [("_change_type", "insert", "string"),
                          ("_commit_version", str(v), "long")]
            phys_cols += [None, None]
        out.append(_Slice(_abs_file(table, a["path"]), part_vals,
                          phys_cols))
    return out


class _DeltaBatchReader(DataSourceReader):
    def __init__(self, opts: _DOpts, schema_cols: list[str]) -> None:
        self.opts = opts
        self.schema_cols = schema_cols

    def partitions(self):
        from etl_rust_spark.deltalake import (
            _abs_file,
            _mapping_mode,
            _physical_name,
            _snapshot_schema,
            delta_snapshot,
        )

        o = self.opts
        v = None if str(o.version) == "latest" else int(o.version)
        as_of = None
        if o.as_of is not None:
            try:
                as_of = float(o.as_of)
            except ValueError:
                as_of = o.as_of
            v = None
        snap = delta_snapshot(o.table, v, as_of)
        meta = snap["metaData"]
        schema = _snapshot_schema(meta)
        part_cols = list(meta.get("partitionColumns") or [])
        pv_of = {f.name: _physical_name(f) for f in schema.fields} \
            if _mapping_mode(meta) in ("name", "id") else \
            {f.name: f.name for f in schema.fields}
        resolve = _phys_resolver(o.table, meta, schema)
        out = []
        for a in snap["adds"].values():
            if a.get("deletionVector"):
                raise ValueError(
                    f"file {a['path']!r} carries a deletion vector — "
                    "the per-file batch source cannot apply the "
                    "positional anti-join; read via "
                    "deltalake.read_delta_table"
                )
            pv = a.get("partitionValues") or {}
            phys_of = resolve(a)
            out.append(_Slice(
                _abs_file(o.table, a["path"]),
                [(c, pv.get(pv_of[c]), schema[c].dataType.typeName())
                 for c in part_cols],
                [None if f.name in part_cols else phys_of[f.name]
                 for f in schema.fields],
            ))
        return out

    def read(self, partition: _Slice):
        yield from _read_slice(partition, self.schema_cols)


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, opts: _DOpts, schema_cols: list[str]) -> None:
        from etl_rust_spark.deltalake import delta_snapshot

        self.opts = opts
        self.schema_cols = schema_cols
        # schema binding: the stream reads every version with the
        # metaData captured at start; a later metaData action with a
        # DIFFERENT schema raises (Delta parity).  Identical re-stamps
        # (e.g. our exporter writing the same metaData) pass.
        snap = delta_snapshot(opts.table)
        self._meta = snap["metaData"]
        self._schema_str = self._meta["schemaString"]
        self._pos: int | None = None

    def _start_offset(self) -> int:
        from etl_rust_spark.deltalake import delta_latest_version

        head = delta_latest_version(self.opts.table)
        if self.opts.starting == "latest":
            return head
        if self.opts.starting == "earliest":
            return -1
        return int(self.opts.starting) - 1

    def initialOffset(self) -> dict:
        off = self._start_offset()
        self._pos = off if self._pos is None else max(self._pos, off)
        return {"version": off}

    def latestOffset(self) -> dict:
        from etl_rust_spark.deltalake import delta_latest_version

        head = delta_latest_version(self.opts.table)
        if self.opts.max_versions:
            if self._pos is None:
                self._pos = self._start_offset()
            return {"version": min(head,
                                   self._pos + self.opts.max_versions)}
        return {"version": head}

    def partitions(self, start: dict, end: dict):
        self._pos = max(self._pos or 0, int(end["version"]))
        from etl_rust_spark.deltalake import _commit_actions

        t = self.opts.table
        lo, hi = int(start["version"]), int(end["version"])
        out: list[_Slice] = []
        for v in range(lo + 1, hi + 1):
            actions = _commit_actions(t, v)
            for a in actions:
                md = a.get("metaData")
                if md and md["schemaString"] != self._schema_str:
                    raise ValueError(
                        f"Delta version {v} of {t} changes the table "
                        "schema — a bound stream cannot follow it; "
                        "restart the stream to pick up the new schema"
                    )
            slices = _plan_version_slices(
                t, self._meta, actions, v, self.opts.skip_changes,
                self.opts.read_change_feed,
            )
            if slices:
                out.extend(slices)
        return out or [_Slice("", [], [])]

    def read(self, partition: _Slice):
        if not partition.path:
            return
        yield from _read_slice(partition, self.schema_cols)

    def commit(self, end: dict) -> None:
        self._pos = max(self._pos or 0, int(end["version"]))


class DeltaLogDataSource(DataSource):
    """``spark.read/readStream.format("delta_log")``."""

    @classmethod
    def name(cls) -> str:
        return "delta_log"

    def schema(self):
        from etl_rust_spark.deltalake import (
            _snapshot_schema,
            delta_snapshot,
        )

        opts = _DOpts(self.options)
        # the snapshot schema with mapping metadata stripped: Spark
        # only needs names + types here, and the reader resolves
        # physical names per slice
        schema = _snapshot_schema(delta_snapshot(opts.table)["metaData"])
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        fields = [StructField(f.name, f.dataType, True)
                  for f in schema.fields]
        if opts.read_change_feed:
            fields += [StructField("_change_type", StringType(), True),
                       StructField("_commit_version", LongType(), True)]
        return StructType(fields)

    def _cols(self, schema) -> list[str]:
        return [f.name for f in schema.fields]

    def reader(self, schema) -> DataSourceReader:
        return _DeltaBatchReader(_DOpts(self.options), self._cols(schema))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _DeltaStreamReader(_DOpts(self.options), self._cols(schema))
