"""Versioned tables as a Spark SOURCE: ``spark.read.format
("versioned_table")`` / ``spark.readStream.format("versioned_table")``
over the manifest log in versions.py — the "Delta table as a streaming
source" composition (r10), jar-free via the same Spark 4 Python
DataSource API as kafka_source.py.

Semantics are Delta's streaming-source contract, deliberately:

- **Offsets are version numbers.**  Micro-batch N covers the versions
  committed in ``(last_committed, head]``; the checkpoint stores the
  version cursor, so restart resumes exactly-once (the S-08 discipline).
- **Appends stream.**  A version's APPENDED files (files(v) −
  files(parent)) are the batch's rows — one input partition per added
  file, read executor-side with pyarrow (no SparkSession inside a
  DataSource reader, and none needed: the manifest names the files).
  The append-only shape is the streaming-ingest layout this repo's
  ``streaming/tables.py`` produces when each epoch lands in fresh
  partition directories.
- **Change commits fail loudly** — a version that REMOVES files
  (upsert rewrite, CoW delete/update, compaction) or adds MoR delete
  sidecars is not representable as an append stream; like Delta, the
  source raises naming the version and op unless
  ``skipChangeCommits=true``, which skips those versions' rows (reads
  stay correct for downstream full-table consumers; the skipped
  changes are the CDC feed's job — ``read_table_changes`` /
  ``sync_table_changes``).
- ``startingVersion`` = ``latest`` (default: only future commits) |
  ``earliest`` (replay from version 1) | an integer (replay from that
  version, inclusive).

Batch reads (``spark.read``) plan the file list of one resolved
version (``version`` = number | ``latest``, or ``asOf`` = ISO-8601 /
epoch timestamp) — a distributed time-travel read with one input
partition per data file.  MoR-masked versions read correctly: the
delete sidecars' (file, position) pairs — recorded at delete time,
broadcast-sized by the writer's ``mor_max_rows`` guard — ship with
each slice and mask rows executor-side (r11); pre-r11 fingerprint-
only sidecars refuse loudly with the remediations named.

Hive-style partition-directory values surface as a STRING column
(``__HIVE_DEFAULT_PARTITION__`` → NULL, percent-escapes decoded);
consumers cast — documented, the one place this source is narrower
than ``read_table_version``'s basePath-anchored read.

Scale: the driver touches only manifests (KBs); each added parquet
file is one executor task, so a 1000-file commit fans out 1000 ways;
payload bytes never pass through the driver.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from pathlib import Path
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

__all__ = ["VersionedTableDataSource"]

_PA_TO_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "float": "float", "double": "double",
    "string": "string", "large_string": "string", "bool": "boolean",
    "date32[day]": "date", "binary": "binary", "large_binary": "binary",
}


def _ddl_of(pa_type) -> str:
    s = str(pa_type)
    if s in _PA_TO_DDL:
        return _PA_TO_DDL[s]
    if s.startswith("timestamp"):
        # parquet stores isAdjustedToUTC as a boolean: a tz-tagged
        # arrow type is Spark's TimestampType, a bare one is NTZ
        return "timestamp" if "tz=" in s else "timestamp_ntz"
    if s.startswith("decimal"):
        return s
    raise ValueError(
        f"versioned_table source cannot map parquet type {s!r} to a "
        "Spark DDL type — pass an explicit .schema(...) to the reader"
    )


class _FileSlice(InputPartition):
    def __init__(self, path: str, part_col: str | None,
                 part_val: str | None,
                 phys_cols: list[str] | None = None,
                 masked_pos: frozenset[int] | None = None) -> None:
        self.path = path
        self.part_col = part_col
        self.part_val = part_val
        # physical names of the reader's (logical) columns, resolved
        # from this slice's own version manifest — column-mapped
        # tables read correctly even mid-stream across a rename
        self.phys_cols = phys_cols
        # MoR: row positions masked by delete sidecars (None = none) —
        # broadcast-sized by the writer's mor_max_rows guard
        self.masked_pos = masked_pos


def _masked_positions(
    table: str, v: int, m: dict
) -> dict[str, frozenset[int]]:
    """Data-relative file → masked row positions from the version's
    MoR delete sidecars — the jar-free twin of versions.
    _plan_with_deletes' broadcast anti-join, keyed on the (file, pos)
    pairs sidecars record at delete time (r11).  Pre-r11 sidecars
    carry only fingerprints, whose string-cast encode a pyarrow reader
    cannot replicate — those refuse with the remediations named."""
    deletes = m.get("deletes") or []
    if not deletes:
        return {}
    import pyarrow.parquet as pq

    out: dict[str, set[int]] = {}
    for d in deletes:
        sp = Path(table) / "data" / d["path"]
        names = set(pq.read_schema(sp).names)
        if not {"_file", "_pos"} <= names:
            raise ValueError(
                f"version {v} of {table} carries a pre-r11 merge-on-"
                "read sidecar without row positions — this source "
                "cannot replicate the fingerprint anti-join; read via "
                "versions.read_table_version, or compact_table_version "
                "to fold the debt first"
            )
        scope = set(d["files"])
        t = pq.read_table(sp, columns=["_file", "_pos"])
        for f, p in zip(t.column(0).to_pylist(),
                        t.column(1).to_pylist()):
            if f in scope:  # carry rule: rewritten files left scope
                out.setdefault(f, set()).add(p)
    return {f: frozenset(ps) for f, ps in out.items()}


class _Opts:
    def __init__(self, options: dict) -> None:
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError("versioned_table requires a 'path' option")
        self.starting = str(options.get("startingversion", "latest")).lower()
        self.skip_changes = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        self.version = options.get("version", "latest")
        self.as_of = options.get("asof")
        self.txn_app = options.get("txnappid")
        self.txn_version = options.get("txnversion")
        mv = int(options.get("maxversionspertrigger", 0))
        if mv < 0:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        self.max_versions = mv or None
        pom = str(options.get("partitionoverwritemode", "static")).lower()
        if pom not in ("static", "dynamic"):
            raise ValueError(
                "partitionOverwriteMode must be static|dynamic"
            )
        self.dynamic_overwrite = pom == "dynamic"


def _manifest(table: str, v: int) -> dict:
    from etl_rust_spark.versions import _load_manifest

    return _load_manifest(table, v)


def _phys_cols_of(m: dict, logical_cols: list[str]) -> list[str]:
    """Map the reader's (logical) column list to the PHYSICAL names
    the data files carry (column mapping, r10 s2): identity when the
    manifest has no map."""
    cm = m.get("column_map") or {}
    return [cm.get(c, c) for c in logical_cols]


def _part_of(table: str, rel: str) -> tuple[str | None, str | None]:
    """Hive directory segment of a data-relative path → (col, value);
    value None for __HIVE_DEFAULT_PARTITION__."""
    if "/" not in rel:
        return None, None
    seg = rel.rsplit("/", 1)[0]
    col, _, raw = seg.partition("=")
    val = unquote(raw)
    return col, (None if val == "__HIVE_DEFAULT_PARTITION__" else val)


def _read_slice(table: str, s: _FileSlice, schema_cols: list[str]) -> Iterator[tuple]:
    import pyarrow.parquet as pq

    fpath = str(Path(table) / "data" / s.path)
    tbl = pq.read_table(fpath)
    pdf = tbl.to_pandas()
    if s.masked_pos:
        # MoR: drop sidecar-masked rows by file position (to_pandas
        # yields a RangeIndex in file order, so index == row position)
        pdf = pdf[~pdf.index.isin(list(s.masked_pos))]
    # Columns Spark reads as TimestampType (UTC-adjusted micros, or
    # INT96 which arrow surfaces TZ-NAIVE) must be tz-aware before the
    # DataSource harness converts them — a naive Timestamp makes its
    # tz_convert throw on every timestamp table (r10 s3 find).  The
    # parquet-level canon already decides utc-vs-ntz the way Spark will.
    from etl_rust_spark.versions import _footer_canon

    canon = _footer_canon(fpath)
    for c in pdf.columns:
        if (
            canon.get(c) == "ts:utc"
            and str(pdf[c].dtype).startswith("datetime64")
            and getattr(pdf[c].dtype, "tz", None) is None
        ):
            pdf[c] = pdf[c].dt.tz_localize("UTC")
    if s.part_col is not None:
        pdf[s.part_col] = s.part_val
    # s.phys_cols: the files' PHYSICAL names, positionally matching the
    # logical schema_cols (identity when the table is unmapped)
    cols = list(s.phys_cols or schema_cols)
    missing = [c for c in cols if c not in pdf.columns]
    if missing:
        raise ValueError(
            f"file {s.path!r} lacks columns {missing} — the table's "
            "physical schema changed under this reader (a re-baselining "
            "re-snapshot, or an explicit .schema() naming pre-rename "
            "columns); restart the read against the current head"
        )
    for row in pdf[cols].itertuples(index=False, name=None):
        # pandas NaN → None for SQL NULL fidelity
        yield tuple(None if v != v and isinstance(v, float) else v
                    for v in row)


class _TableBatchReader(DataSourceReader):
    def __init__(self, opts: _Opts, schema_cols: list[str]) -> None:
        self.opts = opts
        self.schema_cols = schema_cols

    def partitions(self):
        from etl_rust_spark.versions import (
            latest_version, version_at_timestamp,
        )

        t = self.opts.table
        if self.opts.as_of is not None:
            try:
                ts: object = float(self.opts.as_of)
            except ValueError:
                ts = self.opts.as_of
            v = version_at_timestamp(t, ts)
        elif str(self.opts.version) == "latest":
            v = latest_version(t)
            if v is None:
                raise FileNotFoundError(f"no committed versions under {t}")
        else:
            v = int(self.opts.version)
        m = _manifest(t, v)
        masked = _masked_positions(t, v, m)
        phys = _phys_cols_of(m, self.schema_cols)
        hidden = bool(m.get("partition_transform"))
        out = []
        for f in m["files"]:
            # hidden partitioning: the directory value is DERIVED from a
            # payload column the files already carry — never surface it
            col, val = (None, None) if hidden else _part_of(t, f)
            out.append(_FileSlice(f, col, val, phys,
                                  masked.get(f)))
        return out

    def read(self, partition: _FileSlice):
        yield from _read_slice(self.opts.table, partition, self.schema_cols)


class _TableStreamReader(DataSourceStreamReader):
    def __init__(self, opts: _Opts, schema_cols: list[str]) -> None:
        self.opts = opts
        self.schema_cols = schema_cols
        # physical resolution captured ONCE from the head (the same
        # head schema() resolved against): physical names are FROZEN
        # across metadata renames, so this stays correct for every
        # version the stream will read — before and after later
        # renames.  A RE-BASELINE (full re-snapshot) changes physical
        # names, but it is a change commit (files removed), which the
        # stream already raises on / skips
        from etl_rust_spark.versions import latest_version

        head = latest_version(opts.table)
        self._phys = (
            _phys_cols_of(_manifest(opts.table, head), schema_cols)
            if head is not None
            else list(schema_cols)
        )
        # pacing position for maxVersionsPerTrigger.  Traced call
        # order (pinned in the pacing test): fresh start is
        # latestOffset → initialOffset → partitions, so the FIRST
        # latestOffset derives the start itself; on restart Spark
        # re-plans the offset log's last batch through partitions()
        # BEFORE any latestOffset, so _pos is always checkpoint-
        # accurate there and backlogs after downtime pace too.
        self._pos: int | None = None

    def _start_offset(self) -> int:
        from etl_rust_spark.versions import latest_version

        head = latest_version(self.opts.table)
        if head is None:
            raise FileNotFoundError(
                f"no committed versions under {self.opts.table}"
            )
        if self.opts.starting == "latest":
            return head
        if self.opts.starting == "earliest":
            return 0
        return int(self.opts.starting) - 1

    def initialOffset(self) -> dict:
        off = self._start_offset()
        self._pos = max(self._pos or 0, off)
        return {"version": off}

    def latestOffset(self) -> dict:
        from etl_rust_spark.versions import latest_version

        # the manifest log IS the offset authority (the chainstream
        # lesson) — maxVersionsPerTrigger only SLOWS the walk toward
        # it, never invents offsets beyond it
        head = latest_version(self.opts.table) or 0
        if self.opts.max_versions:
            if self._pos is None:
                self._pos = self._start_offset()
            return {"version": min(head, self._pos + self.opts.max_versions)}
        return {"version": head}

    def partitions(self, start: dict, end: dict):
        self._pos = max(self._pos or 0, int(end["version"]))
        return self._partitions(start, end)

    def _partitions(self, start: dict, end: dict):
        t = self.opts.table
        lo, hi = int(start["version"]), int(end["version"])
        out: list[_FileSlice] = []
        for v in range(lo + 1, hi + 1):
            m = _manifest(t, v)
            parent = m.get("parent")
            pfiles: set[str] = set()
            pdeletes: list = []
            if parent:
                pm = _manifest(t, parent)
                pfiles = set(pm["files"])
                pdeletes = pm.get("deletes") or []
            added = [f for f in m["files"] if f not in pfiles]
            removed = pfiles - set(m["files"])
            new_sidecars = len(m.get("deletes") or []) > len(pdeletes)
            if removed or new_sidecars:
                if self.opts.skip_changes:
                    continue  # Delta's skipChangeCommits semantics
                raise ValueError(
                    f"version {v} of {t} (op {m.get('op')!r}) is a "
                    "CHANGE commit (removes files or adds delete "
                    "sidecars) — not representable as an append "
                    "stream.  Set skipChangeCommits=true to skip such "
                    "versions, or consume the CDC feed "
                    "(read_table_changes / sync_table_changes) instead"
                )
            hidden = bool(m.get("partition_transform"))
            for f in added:
                col, val = (None, None) if hidden else _part_of(t, f)
                out.append(_FileSlice(f, col, val, self._phys))
        # Spark requires >= 1 partition per batch
        return out or [_FileSlice("", None, None)]

    def read(self, partition: _FileSlice):
        if not partition.path:
            return
        yield from _read_slice(self.opts.table, partition, self.schema_cols)

    def commit(self, end: dict) -> None:
        # the checkpoint is the commit marker; remember the position so
        # maxVersionsPerTrigger paces from it
        self._pos = max(self._pos or 0, int(end["version"]))


# ------------------------------------------------------------- the SINK
# df.write.format("versioned_table").mode("append"|"overwrite") and
# writeStream: executors stage parquet files (pyarrow, under the
# table's _stage-dsw-* dirs so a crash's leftovers are expire-swept),
# the driver folds them into ONE manifest commit via
# versions.commit_appended_files — CHECK constraints validated first,
# CAS-retried against concurrent writers.  Streaming is EXACTLY-ONCE
# through the Delta txnAppId/txnVersion ledger: the sink requires a
# ``txnAppId`` option and commits each epoch with txnVersion=batchId,
# so a replayed epoch is skipped (its staged files unlinked), never
# double-appended.  Partitioned tables: each writer task groups its
# rows by partition value, stages one parquet per value WITHOUT the
# partition column (it lives in the directory, as Spark writes it),
# and names the target directory via versions._hive_part_segment —
# Spark-escaping parity pinned against Spark-written directories.


_SPARK_TO_PA = {
    "long": "int64", "integer": "int32", "short": "int16",
    "byte": "int8", "double": "float64", "float": "float32",
    "string": "string", "boolean": "bool", "binary": "binary",
    "date": "date32",
}


def _pa_schema_of(schema):
    import pyarrow as pa

    fields = []
    for f in schema.fields:
        t = f.dataType.typeName()
        if t == "timestamp":
            # Spark's TimestampType writes parquet isAdjustedToUTC=true;
            # staging without the tz made appended files read back as
            # timestamp_NTZ and silently flip the whole table's dtype
            # (wrong values on any non-UTC session timezone)
            pat = pa.timestamp("us", tz="UTC")
        elif t == "timestamp_ntz":
            pat = pa.timestamp("us")
        elif t in _SPARK_TO_PA:
            pat = getattr(pa, _SPARK_TO_PA[t])()
        else:
            raise ValueError(
                f"versioned_table sink cannot write column "
                f"{f.name!r} of type {t!r}"
            )
        fields.append(pa.field(f.name, pat, nullable=True))
    return pa.schema(fields)


class _Staged(WriterCommitMessage):
    def __init__(self, entries: list[tuple[str, str | None]],
                 count: int) -> None:
        self.entries, self.count = entries, count


def _session_tz() -> str:
    """The writer's session timezone, captured DRIVER-side at planner
    construction (Python workers have no SparkSession): TimestampType
    values reach the worker as naive datetimes rendered in this zone,
    and the days/hours transform's UTC epoch arithmetic needs the
    instant back."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return "UTC"
    return spark.conf.get("spark.sql.session.timeZone") or "UTC"


def _resolve_layout(
    table: str,
) -> tuple[str | None, dict[str, str], dict | None]:
    """(physical partition column, logical→physical column map,
    partition transform) of the head — the sink stages PHYSICAL like
    everything under data/.  Hidden-partitioned tables stage through
    the pure-Python transform replica (`_py_transform_value`): the
    synth directory value derives per row from the source column the
    payload keeps."""
    from etl_rust_spark.versions import _load_manifest, latest_version

    head = latest_version(table)
    if head is None:
        return None, {}, None
    m = _load_manifest(table, head)
    return (m.get("partition_by") or None,
            dict(m.get("column_map") or {}),
            m.get("partition_transform") or None)


def _stage_rows(
    table: str, schema, iterator, partition_by: str | None,
    col_map: dict[str, str] | None = None,
    transform: dict | None = None, tz_name: str = "UTC",
) -> _Staged:
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_rust_spark.versions import (
        _hive_part_segment,
        _py_transform_value,
    )

    cm = col_map or {}
    # the DataFrame carries LOGICAL names; staged files (and partition
    # directory segments) are PHYSICAL, like everything under data/
    names = [f.name for f in schema.fields]
    lpb = None
    src_idx = None
    if transform is not None:
        # hidden partitioning: the directory value DERIVES from the
        # source column (which the payload keeps — nothing is dropped);
        # the synth column itself never exists in the frame
        inv = {p: l for l, p in cm.items()}
        src_l = inv.get(transform["source"], transform["source"])
        if src_l not in names:
            raise ValueError(
                f"DataFrame is missing the transform source column "
                f"{src_l!r}"
            )
        src_idx = names.index(src_l)
    elif partition_by is not None:  # physical name from the manifest
        inv = {p: l for l, p in cm.items()}
        lpb = inv.get(partition_by, partition_by)
        if lpb not in names:
            raise ValueError(
                f"DataFrame is missing the table's partition column "
                f"{lpb!r}"
            )
    p_idx = names.index(lpb) if lpb is not None else None
    payload_fields = [f for f in schema.fields if f.name != lpb]
    pa_schema = _pa_schema_of(type(schema)(payload_fields))
    pa_schema = pa.schema(
        [pa_schema.field(i).with_name(
            cm.get(pa_schema.field(i).name, pa_schema.field(i).name)
        ) for i in range(len(pa_schema))]
    )
    # one column-list set per partition value (None key = unpartitioned)
    groups: dict[object, list[list]] = {}
    counts: dict[object, int] = {}
    for row in iterator:
        if src_idx is not None:
            key = _py_transform_value(transform, row[src_idx], tz_name)
        else:
            key = row[p_idx] if p_idx is not None else None
        cols = groups.get(key)
        if cols is None:
            cols = groups[key] = [[] for _ in payload_fields]
            counts[key] = 0
        j = 0
        for i in range(len(names)):
            if i == p_idx:
                continue
            cols[j].append(row[i])
            j += 1
        counts[key] += 1
    if not groups:
        return _Staged([], 0)
    stage = Path(table) / f"_stage-dsw-{_uuid.uuid4().hex}"
    stage.mkdir(parents=True, exist_ok=True)
    entries: list[tuple[str, str | None]] = []
    for gi, (key, cols) in enumerate(groups.items()):
        arrays = [
            pa.array(cols[i], type=pa_schema.field(i).type)
            for i in range(len(payload_fields))
        ]
        out = stage / f"part-{gi}.parquet"
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=pa_schema), str(out)
        )
        seg = (
            _hive_part_segment(partition_by, key)
            if p_idx is not None or src_idx is not None
            else None
        )
        entries.append((str(out), seg))
    return _Staged(entries, sum(counts.values()))


def _fold_staged(opts: _Opts, messages, txn_app, txn_version, overwrite):
    import shutil

    from pyspark.sql import SparkSession

    from etl_rust_spark.versions import commit_appended_files

    spark = SparkSession.getActiveSession()
    staged = [e for m in messages if m for e in m.entries]
    count = sum(m.count for m in messages if m)
    try:
        commit_appended_files(
            spark, opts.table, staged, count,
            txn_app=txn_app, txn_version=txn_version, overwrite=overwrite,
            dynamic_partitions=overwrite and opts.dynamic_overwrite,
        )
    finally:
        for m in messages:
            if m and m.entries:
                shutil.rmtree(
                    Path(m.entries[0][0]).parent, ignore_errors=True
                )


def _drop_staged(messages) -> None:
    import shutil

    for m in messages:
        if m and getattr(m, "entries", None):
            shutil.rmtree(Path(m.entries[0][0]).parent, ignore_errors=True)


class _TableBatchWriter(DataSourceWriter):
    def __init__(self, opts: _Opts, schema, overwrite: bool) -> None:
        self.opts, self.schema_, self.overwrite = opts, schema, overwrite
        (self.partition_by, self.col_map,
         self.transform) = _resolve_layout(opts.table)
        self.tz_name = _session_tz()
        self.txn_app = opts.txn_app
        self.txn_version = opts.txn_version
        if (self.txn_app is None) != (self.txn_version is None):
            raise ValueError("txnAppId and txnVersion come as a pair")

    def write(self, iterator):
        return _stage_rows(
            self.opts.table, self.schema_, iterator, self.partition_by,
            self.col_map, self.transform, self.tz_name,
        )

    def commit(self, messages) -> None:
        _fold_staged(
            self.opts, messages, self.txn_app,
            int(self.txn_version) if self.txn_version is not None else None,
            self.overwrite,
        )

    def abort(self, messages) -> None:
        _drop_staged(messages)


class _TableStreamWriter(DataSourceStreamWriter):
    def __init__(self, opts: _Opts, schema) -> None:
        self.opts, self.schema_ = opts, schema
        (self.partition_by, self.col_map,
         self.transform) = _resolve_layout(opts.table)
        self.tz_name = _session_tz()
        if not opts.txn_app:
            raise ValueError(
                "the versioned_table streaming sink requires a txnAppId "
                "option — it is the exactly-once ledger key that makes a "
                "replayed epoch a no-op instead of a duplicate append"
            )

    def write(self, iterator):
        return _stage_rows(
            self.opts.table, self.schema_, iterator, self.partition_by,
            self.col_map, self.transform, self.tz_name,
        )

    def commit(self, messages, batchId) -> None:
        _fold_staged(self.opts, messages, self.opts.txn_app,
                     int(batchId), overwrite=False)

    def abort(self, messages, batchId) -> None:
        _drop_staged(messages)


class VersionedTableDataSource(DataSource):
    """``spark.read/readStream.format("versioned_table")``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self) -> str:
        from etl_rust_spark.versions import latest_version

        import pyarrow.parquet as pq

        opts = _Opts(self.options)
        head = latest_version(opts.table)
        if head is None:
            raise FileNotFoundError(
                f"no committed versions under {opts.table}"
            )
        m = _manifest(opts.table, head)
        inv = {p: l for l, p in (m.get("column_map") or {}).items()}
        if not m["files"]:
            raise ValueError(
                f"version {head} of {opts.table} is empty — pass an "
                "explicit .schema(...)"
            )
        first = m["files"][0]
        # the shared parquet-level canon decides timestamp vs NTZ the
        # way Spark's reader will (arrow's schema string can't: INT96
        # surfaces tz-naive yet reads as TimestampType)
        from etl_rust_spark.versions import _footer_canon

        canon = _footer_canon(str(Path(opts.table) / "data" / first))
        pa_schema = pq.read_schema(
            str(Path(opts.table) / "data" / first)
        )
        fields = [
            # surface LOGICAL names (column mapping); types from the
            # physical footers
            f"{inv.get(name, name)} "
            + (
                {"ts:utc": "timestamp", "ts:ntz": "timestamp_ntz"}[
                    canon[name]
                ]
                if canon[name].startswith("ts:")
                else _ddl_of(pa_schema.field(name).type)
            )
            for name in pa_schema.names
        ]
        col, _ = _part_of(opts.table, first)
        if col is not None and not m.get("partition_transform"):
            # hive directory values surface as STRING (documented);
            # a TRANSFORM directory is derived from a payload column the
            # schema already carries — hidden, never surfaced
            fields.append(f"{inv.get(col, col)} string")
        return ", ".join(fields)

    def _cols(self, schema) -> list[str]:
        return [f.name for f in schema.fields]

    def reader(self, schema) -> DataSourceReader:
        return _TableBatchReader(_Opts(self.options), self._cols(schema))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _TableStreamReader(_Opts(self.options), self._cols(schema))

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _TableBatchWriter(_Opts(self.options), schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _TableStreamWriter(_Opts(self.options), schema)
