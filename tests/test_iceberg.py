"""Iceberg reader (etl_rust_spark.iceberg) vs spec-built fixtures.

No Iceberg jar exists in this container, so fixtures are assembled
per the public Iceberg table spec (metadata JSON, manifest-list Avro,
manifest Avro via the repo's own OCF writer — which the reader does
NOT share a schema with: it decodes from each container's embedded
schema, like any Avro reader of real manifests).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import pytest

from etl_rust_spark import versions as V
from etl_rust_spark.functions.wireformats import write_avro_container
from etl_rust_spark.iceberg import (
    IcebergProtocolError,
    iceberg_snapshot,
    iceberg_snapshots,
    iceberg_table_files,
    read_iceberg_table,
)

# ----------------------------------------------------- fixture builder

_BOUND_T = [None, {
    "type": "array",
    "items": {
        "type": "record", "name": "kv",
        "fields": [{"name": "key", "type": "int"},
                   {"name": "value", "type": "bytes"}],
    },
}]

_DATA_FILE_T = {
    "type": "record", "name": "r2",
    "fields": [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        {"name": "lower_bounds", "type": _BOUND_T},
        {"name": "upper_bounds", "type": _BOUND_T},
        {"name": "equality_ids", "type": [None, {"type": "array",
                                                 "items": "int"}]},
        {"name": "partition", "type": [None, {
            "type": "record", "name": "pt",
            "fields": [{"name": "p", "type": [None, "long"]},
                       {"name": "d", "type": [None, "int"]}],
        }]},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": [None, "long"]},
        {"name": "sequence_number", "type": [None, "long"]},
        {"name": "data_file", "type": _DATA_FILE_T},
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _avro_fix_nulls(schema):
    """write_avro_container unions use 'null' strings."""
    s = json.dumps(schema)
    return json.loads(s.replace("[null,", '["null",'))


def _lb(field_id: int, raw: bytes):
    return {"key": field_id, "value": raw}


def _long_b(v: int) -> bytes:
    return struct.pack("<q", v)


def _str_b(v: str) -> bytes:
    return v.encode("utf-8")


class IceFix:
    """Assemble an Iceberg table: add parquet files + snapshots, then
    finish() writes manifests, manifest lists, metadata and hint."""

    def __init__(self, root: Path, fields: list[dict],
                 format_version: int = 2):
        self.root = root
        self.fields = fields
        self.fv = format_version
        self.snapshots: list[dict] = []
        (root / "metadata").mkdir(parents=True)
        (root / "data").mkdir()
        self._n = 0

    def write_file(self, rows: list[dict], bounds=None,
                   fmt: str = "PARQUET", content: int = 0,
                   equality_ids: list[int] | None = None,
                   schema=None, partition: dict | None = None) -> dict:
        import pyarrow as pa
        import pyarrow.parquet as pq

        self._n += 1
        fp = self.root / "data" / f"f{self._n:03d}.parquet"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), fp)
        return {
            "content": content,
            "file_path": "file://" + str(fp),
            "file_format": fmt,
            "record_count": len(rows),
            "file_size_in_bytes": fp.stat().st_size,
            "lower_bounds": (bounds or {}).get("lower"),
            "upper_bounds": (bounds or {}).get("upper"),
            "equality_ids": equality_ids,
            "partition": partition,
        }

    def add_snapshot(self, data_files: list[dict], ts_ms: int,
                     manifest_content: int = 0,
                     statuses: list[int] | None = None,
                     schema_id: int = 0, seq: int = 0,
                     entry_seqs: list[int | None] | None = None,
                     null_entry_sids: bool = False) -> int:
        sid = 1000 + len(self.snapshots)
        mpath = self.root / "metadata" / f"manifest-{sid}.avro"
        entries = [
            {"status": (statuses or [1] * len(data_files))[i],
             # the v2 spec allows null here, inherited from the
             # manifest-list row's added_snapshot_id
             "snapshot_id": None if null_entry_sids else sid,
             "sequence_number": (entry_seqs or [None] * len(data_files))[i],
             "data_file": df}
            for i, df in enumerate(data_files)
        ]
        write_avro_container(
            str(mpath), entries, _avro_fix_nulls(_MANIFEST_ENTRY_SCHEMA),
            codec="deflate",
        )
        lpath = self.root / "metadata" / f"snap-{sid}.avro"
        write_avro_container(
            str(lpath),
            [{"manifest_path": "file://" + str(mpath),
              "manifest_length": mpath.stat().st_size,
              "partition_spec_id": 0, "content": manifest_content,
              "sequence_number": seq,
              "added_snapshot_id": sid}],
            _avro_fix_nulls(_MANIFEST_FILE_SCHEMA), codec="deflate",
        )
        self.snapshots.append({
            "snapshot-id": sid, "timestamp-ms": ts_ms,
            "manifest-list": "file://" + str(lpath),
            "summary": {"operation": "append"}, "schema-id": schema_id,
        })
        return sid

    def finish(self, schemas: list[dict] | None = None,
               current_schema_id: int = 0):
        meta = {
            "format-version": self.fv,
            "table-uuid": "11111111-2222-3333-4444-555555555555",
            "location": "file://" + str(self.root),
            "last-updated-ms": max(
                (s["timestamp-ms"] for s in self.snapshots), default=0),
            "last-column-id": max(f["id"] for f in self.fields),
            "schemas": schemas or [
                {"schema-id": 0, "type": "struct", "fields": self.fields}
            ],
            "current-schema-id": current_schema_id,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "snapshots": self.snapshots,
            "current-snapshot-id": self.snapshots[-1]["snapshot-id"]
            if self.snapshots else None,
            "snapshot-log": [
                {"snapshot-id": s["snapshot-id"],
                 "timestamp-ms": s["timestamp-ms"]}
                for s in self.snapshots
            ],
        }
        (self.root / "metadata" / "v1.metadata.json").write_text(
            json.dumps(meta))
        (self.root / "metadata" / "version-hint.text").write_text("1")
        return self


_FIELDS = [
    {"id": 1, "name": "k", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "string"},
]


def _basic(tmp_path: Path) -> IceFix:
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}],
        bounds={"lower": [_lb(1, _long_b(1)), _lb(2, _str_b("a"))],
                "upper": [_lb(1, _long_b(2)), _lb(2, _str_b("b"))]})
    f2 = fx.write_file(
        [{"k": 10, "v": "z"}],
        bounds={"lower": [_lb(1, _long_b(10))],
                "upper": [_lb(1, _long_b(10))]})
    fx.add_snapshot([f1], ts_ms=1_000_000)
    fx.add_snapshot([f1, f2], ts_ms=2_000_000)
    return fx.finish()


# --------------------------------------------------------------- tests


def test_read_current_and_by_snapshot(spark, tmp_path):
    fx = _basic(tmp_path)
    t = str(fx.root)
    head = read_iceberg_table(spark, t)
    assert sorted(r.k for r in head.collect()) == [1, 2, 10]
    assert head.columns == ["k", "v"]
    first = read_iceberg_table(spark, t, snapshot_id=1000)
    assert sorted(r.k for r in first.collect()) == [1, 2]
    with pytest.raises(FileNotFoundError, match="no snapshot 777"):
        read_iceberg_table(spark, t, snapshot_id=777)


def test_read_as_of(spark, tmp_path):
    fx = _basic(tmp_path)
    t = str(fx.root)
    df = read_iceberg_table(spark, t, as_of=1_500)  # epoch seconds
    assert sorted(r.k for r in df.collect()) == [1, 2]
    with pytest.raises(ValueError, match="at or before"):
        read_iceberg_table(spark, t, as_of=500)
    with pytest.raises(ValueError, match="snapshot_id OR as_of"):
        read_iceberg_table(spark, t, snapshot_id=1000, as_of=1_500)


def test_snapshots_history(tmp_path):
    fx = _basic(tmp_path)
    h = iceberg_snapshots(str(fx.root))
    assert [s["snapshot_id"] for s in h] == [1001, 1000]
    assert h[0]["operation"] == "append"


def test_bounds_pruning(spark, tmp_path):
    fx = _basic(tmp_path)
    t = str(fx.root)
    assert len(iceberg_table_files(t)) == 2
    hit = iceberg_table_files(t, prune=[("k", 10, None)])
    assert len(hit) == 1 and hit[0].endswith("f002.parquet")
    # string bounds prune too
    hit = iceberg_table_files(t, prune=[("v", "a", "b")])
    # f2 has no v-bounds -> kept (sound); f1 matches
    assert len(hit) == 2
    assert iceberg_table_files(t, prune=[("k", 99, None)]) == []
    # mistyped bound keeps everything instead of throwing
    assert len(iceberg_table_files(t, prune=[("k", "x", "y")])) == 2


def test_deleted_entries_dropped(spark, tmp_path):
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    f2 = fx.write_file([{"k": 2, "v": "b"}])
    # one manifest marks f1 DELETED (status 2), f2 EXISTING (0)
    fx.add_snapshot([f1, f2], ts_ms=1_000, statuses=[2, 0])
    fx.finish()
    df = read_iceberg_table(spark, str(fx.root))
    assert [r.k for r in df.collect()] == [2]


def test_position_deletes_applied(spark, tmp_path):
    """v2 MoR: (file_path, pos) delete rows drop exactly those rows;
    files the deletes never name are untouched."""
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}, {"k": 2, "v": "b"},
                        {"k": 3, "v": "c"}])
    f2 = fx.write_file([{"k": 10, "v": "z"}])
    pd = fx.write_file(
        [{"file_path": f1["file_path"], "pos": 0},
         {"file_path": f1["file_path"], "pos": 2}],
        content=1)
    fx.add_snapshot([f1, f2, pd], ts_ms=1_000, seq=1)
    fx.finish()
    rows = sorted(r.k for r in
                  read_iceberg_table(spark, str(fx.root)).collect())
    assert rows == [2, 10]


def test_position_delete_sequence_scoping(spark, tmp_path):
    """A position delete applies only to data files whose sequence
    number is <= the delete's — a file REWRITTEN after the delete
    keeps all its rows."""
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    pd = fx.write_file([{"file_path": f1["file_path"], "pos": 0}],
                       content=1)
    # data file seq 5, delete seq 1: delete must NOT apply
    fx.add_snapshot([f1, pd], ts_ms=1_000, seq=1, entry_seqs=[5, 1])
    fx.finish()
    rows = sorted(r.k for r in
                  read_iceberg_table(spark, str(fx.root)).collect())
    assert rows == [1, 2]


def test_equality_deletes_applied(spark, tmp_path):
    """Equality deletes drop null-safe-matching rows from STRICTLY
    older data files only."""
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f_old = fx.write_file([{"k": 1, "v": "a"}, {"k": 2, "v": None}])
    f_new = fx.write_file([{"k": 1, "v": "a2"}])
    import pyarrow as pa

    ed = fx.write_file(
        [{"k": 1}], content=2, equality_ids=[1],
        schema=pa.schema([("k", pa.int64())]))
    # old file seq 1, delete seq 2, new file seq 2 (same as delete —
    # strictly-older rule keeps it)
    fx.add_snapshot([f_old, f_new, ed], ts_ms=1_000, seq=2,
                    entry_seqs=[1, 2, 2])
    fx.finish()
    rows = sorted((r.k, r.v) for r in
                  read_iceberg_table(spark, str(fx.root)).collect())
    assert rows == [(1, "a2"), (2, None)]


def test_equality_delete_null_safe(spark, tmp_path):
    """NULL equals NULL for equality deletes (spec: null-safe)."""
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": None}, {"k": 2, "v": "b"}])
    import pyarrow as pa

    ed = fx.write_file(
        [{"v": None}], content=2, equality_ids=[2],
        schema=pa.schema([("v", pa.string())]))
    fx.add_snapshot([f1, ed], ts_ms=1_000, seq=2, entry_seqs=[1, 2])
    fx.finish()
    rows = sorted(r.k for r in
                  read_iceberg_table(spark, str(fx.root)).collect())
    assert rows == [2]


def test_unknown_content_refuses(spark, tmp_path):
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}], content=3)
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.finish()
    with pytest.raises(IcebergProtocolError, match="content 3"):
        iceberg_snapshot(str(fx.root))


def test_equality_delete_unknown_field_refuses(spark, tmp_path):
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    import pyarrow as pa

    ed = fx.write_file(
        [{"z": 9}], content=2, equality_ids=[99],
        schema=pa.schema([("z", pa.int64())]))
    fx.add_snapshot([f1, ed], ts_ms=1_000, seq=2, entry_seqs=[1, 2])
    fx.finish()
    with pytest.raises(IcebergProtocolError, match="99"):
        read_iceberg_table(spark, str(fx.root)).collect()


def test_non_parquet_refuses(spark, tmp_path):
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}], fmt="ORC")
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.finish()
    with pytest.raises(IcebergProtocolError, match="ORC"):
        iceberg_snapshot(str(fx.root))


def test_future_format_version_refuses(tmp_path):
    fx = IceFix(tmp_path / "ice", _FIELDS, format_version=3)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.finish()
    with pytest.raises(IcebergProtocolError, match="format-version 3"):
        iceberg_snapshots(str(fx.root))


def test_rename_detection_refuses(spark, tmp_path):
    """A renamed column exists in NO footer under its new name — the
    by-name reader must refuse, never return a silently-NULL column."""
    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "renamed_v", "required": False,
         "type": "string"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file([{"k": 1, "v": "a"}])  # footer says 'v'
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.finish()
    with pytest.raises(IcebergProtocolError, match="renamed_v"):
        read_iceberg_table(spark, str(fx.root))


def _ids_schema(cols: list[tuple[str, object, int]]):
    """A pyarrow schema whose columns carry parquet field ids, the way
    every Iceberg-written data file does."""
    import pyarrow as pa

    return pa.schema([
        pa.field(n, t, metadata={b"PARQUET:field_id": str(i).encode()})
        for n, t, i in cols
    ])


def test_field_id_resolution_reads_renamed_table(spark, tmp_path):
    """The spec's projection rule: files carrying parquet field ids
    resolve BY ID, so a renamed column reads its DATA under the new
    name — the silent-NULL regression this pins is a by-name scan
    returning NULL for every pre-rename file."""
    import pyarrow as pa

    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "renamed_v", "required": False,
         "type": "string"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    # pre-rename file: footer column 'v' with field id 2
    f1 = fx.write_file(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}],
        schema=_ids_schema([("k", pa.int64(), 1), ("v", pa.string(), 2)]),
    )
    # post-rename file: footer already says 'renamed_v', same id
    f2 = fx.write_file(
        [{"k": 3, "renamed_v": "c"}],
        schema=_ids_schema([("k", pa.int64(), 1),
                            ("renamed_v", pa.string(), 2)]),
    )
    fx.add_snapshot([f1, f2], ts_ms=1_000)
    fx.finish()
    df = read_iceberg_table(spark, str(fx.root))
    assert df.columns == ["k", "renamed_v"]
    got = {r.k: r.renamed_v for r in df.collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # data, not NULLs


def test_field_id_rename_swap_follows_ids(spark, tmp_path):
    """Swapped names (a<->b): by-name would silently SWAP the columns;
    by-id keeps each value with its field."""
    import pyarrow as pa

    fields = [
        {"id": 1, "name": "b", "required": False, "type": "long"},
        {"id": 2, "name": "a", "required": False, "type": "long"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file(
        [{"a": 10, "b": 20}],  # footer names are pre-swap
        schema=_ids_schema([("a", pa.int64(), 1), ("b", pa.int64(), 2)]),
    )
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.finish()
    r = read_iceberg_table(spark, str(fx.root)).collect()[0]
    # field id 1 (footer 'a', value 10) is now NAMED 'b'
    assert (r.b, r.a) == (10, 20)


def test_field_id_absent_reads_null(spark, tmp_path):
    """A field id absent from a file's footer was added after the file
    was written: it projects as a typed NULL (the added-later rule),
    even when an UNRELATED same-named column exists under another id."""
    import pyarrow as pa

    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 3, "name": "extra", "required": False, "type": "long"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file(
        [{"k": 1}], schema=_ids_schema([("k", pa.int64(), 1)]),
    )
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.finish()
    r = read_iceberg_table(spark, str(fx.root)).collect()[0]
    assert (r.k, r.extra) == (1, None)


def test_field_id_mixed_with_no_ids_refuses(spark, tmp_path):
    """A no-ids file inside an ids estate needs a name mapping
    (schema.name-mapping.default) — refuse, never guess."""
    import pyarrow as pa

    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file(
        [{"k": 1, "v": "a"}],
        schema=_ids_schema([("k", pa.int64(), 1), ("v", pa.string(), 2)]),
    )
    f2 = fx.write_file([{"k": 2, "v": "b"}])  # no field ids
    fx.add_snapshot([f1, f2], ts_ms=1_000)
    fx.finish()
    with pytest.raises(IcebergProtocolError, match="name mapping"):
        read_iceberg_table(spark, str(fx.root)).collect()


def _set_name_mapping(fx: IceFix, entries: list[dict]) -> None:
    mp = fx.root / "metadata" / "v1.metadata.json"
    meta = json.loads(mp.read_text())
    meta.setdefault("properties", {})[
        "schema.name-mapping.default"] = json.dumps(entries)
    mp.write_text(json.dumps(meta))


def test_name_mapping_resolves_no_id_files(spark, tmp_path):
    """schema.name-mapping.default: files without parquet field ids
    (add_files migrations) resolve through the mapping — a renamed
    column reads its data under the current name, a mixed ids/no-ids
    estate reads whole, and an unmapped added field reads NULL (the
    spec's rule)."""
    import pyarrow as pa

    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "renamed_v", "required": False,
         "type": "string"},
        {"id": 3, "name": "extra", "required": False, "type": "long"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file([{"k": 1, "v": "a"}])          # no ids: old name
    f2 = fx.write_file(                                # ids: same id
        [{"k": 2, "renamed_v": "b"}],
        schema=_ids_schema([("k", pa.int64(), 1),
                            ("renamed_v", pa.string(), 2)]),
    )
    fx.add_snapshot([f1, f2], ts_ms=1_000)
    fx.finish()
    _set_name_mapping(fx, [
        {"field-id": 1, "names": ["k"]},
        {"field-id": 2, "names": ["renamed_v", "v"]},
    ])
    df = read_iceberg_table(spark, str(fx.root))
    got = {(r.k, r.renamed_v, r.extra) for r in df.collect()}
    assert got == {(1, "a", None), (2, "b", None)}


def test_name_mapping_with_identity_partition_fallback(spark, tmp_path):
    """The classic Hive migration: no-ids files, a name mapping, and
    an identity-partitioned column absent from the files — the
    projection rules compose (mapping first, partition metadata for
    the unresolved field)."""
    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "region", "required": False,
         "type": "string"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file([{"k": 1}], partition={"p": None, "d": None})
    f2 = fx.write_file([{"k": 2}], partition={"p": None, "d": None})
    fx.add_snapshot([f1, f2], ts_ms=1_000)
    fx.finish()
    # identity spec over region (source-id 2) with string dir values
    mp = fx.root / "metadata" / "v1.metadata.json"
    meta = json.loads(mp.read_text())
    meta["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "region", "transform": "identity", "source-id": 2,
         "field-id": 1000},
    ]}]
    mp.write_text(json.dumps(meta))
    _set_name_mapping(fx, [{"field-id": 1, "names": ["k"]},
                           {"field-id": 2, "names": ["region"]}])
    # re-point the manifest partition structs at string region values
    # (the fixture's partition record has p/d slots; rewrite entries)
    from etl_rust_spark.functions.wireformats import (
        read_avro_container,
        write_avro_container,
    )

    man = next((fx.root / "metadata").glob("manifest-*.avro"))
    _, recs = read_avro_container(man.read_bytes())
    vals = {"f001.parquet": "eu", "f002.parquet": "us"}
    schema_json = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "pt", "fields": [
                            {"name": "region",
                             "type": ["null", "string"]}]}},
                ]}},
        ],
    }
    out = []
    for e in recs:
        d = e["data_file"]
        name = d["file_path"].rsplit("/", 1)[-1]
        out.append({"status": e["status"],
                    "snapshot_id": e["snapshot_id"], "data_file": {
            "content": d["content"], "file_path": d["file_path"],
            "file_format": d["file_format"],
            "record_count": d["record_count"],
            "file_size_in_bytes": d["file_size_in_bytes"],
            "partition": {"region": vals[name]}}})
    write_avro_container(str(man), out,
                         _avro_fix_nulls(schema_json), codec="deflate")
    df = read_iceberg_table(spark, str(fx.root))
    assert {(r.k, r.region) for r in df.collect()} == {
        (1, "eu"), (2, "us")
    }


def test_field_id_path_applies_position_deletes(spark, tmp_path):
    """MoR through the field-id path: the union of per-generation
    scans still carries per-scan (file, position) annotations, so
    position deletes mask rows in a RENAMED table too."""
    import pyarrow as pa

    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "renamed_v", "required": False,
         "type": "string"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}],
        schema=_ids_schema([("k", pa.int64(), 1), ("v", pa.string(), 2)]),
    )
    pd = fx.write_file([{"file_path": f1["file_path"], "pos": 0}],
                       content=1)
    fx.add_snapshot([f1, pd], ts_ms=1_000, seq=1)
    fx.finish()
    got = [(r.k, r.renamed_v) for r in
           read_iceberg_table(spark, str(fx.root)).collect()]
    assert got == [(2, "b")]


def test_added_column_reads_null_from_old_files(spark, tmp_path):
    """Evolution ADD: old files lack the column and read as NULL; the
    newest file has it, so the rename gate passes."""
    fields = _FIELDS + [
        {"id": 3, "name": "extra", "required": False, "type": "string"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    f2 = fx.write_file([{"k": 2, "v": "b", "extra": "e"}])
    fx.add_snapshot([f1, f2], ts_ms=1_000)
    fx.finish()
    rows = {r.k: r.extra
            for r in read_iceberg_table(spark, str(fx.root)).collect()}
    assert rows == {1: None, 2: "e"}


def test_snapshot_schema_id_resolution(spark, tmp_path):
    """Time travel reads the SNAPSHOT's schema, not the current one."""
    old = [{"id": 1, "name": "k", "required": False, "type": "long"},
           {"id": 2, "name": "v", "required": False, "type": "string"}]
    new = old + [{"id": 3, "name": "extra", "required": False,
                  "type": "long"}]
    fx = IceFix(tmp_path / "ice", new)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    f2 = fx.write_file([{"k": 2, "v": "b", "extra": 7}])
    fx.add_snapshot([f1], ts_ms=1_000, schema_id=0)
    fx.add_snapshot([f1, f2], ts_ms=2_000, schema_id=1)
    fx.finish(schemas=[
        {"schema-id": 0, "type": "struct", "fields": old},
        {"schema-id": 1, "type": "struct", "fields": new},
    ], current_schema_id=1)
    first = read_iceberg_table(spark, str(fx.root), snapshot_id=1000)
    assert first.columns == ["k", "v"]
    head = read_iceberg_table(spark, str(fx.root))
    assert head.columns == ["k", "v", "extra"]
    assert {r.k: r.extra for r in head.collect()} == {1: None, 2: 7}


def test_type_mapping(spark, tmp_path):
    import datetime as dt
    import decimal

    import pyarrow as pa

    fields = [
        {"id": 1, "name": "b", "required": False, "type": "boolean"},
        {"id": 2, "name": "i", "required": False, "type": "int"},
        {"id": 3, "name": "f", "required": False, "type": "float"},
        {"id": 4, "name": "d", "required": False, "type": "date"},
        {"id": 5, "name": "dec", "required": False,
         "type": "decimal(10, 2)"},
        {"id": 6, "name": "arr", "required": False,
         "type": {"type": "list", "element": "long",
                  "element-required": False}},
        {"id": 7, "name": "st", "required": False,
         "type": {"type": "struct", "fields": [
             {"id": 8, "name": "x", "required": False, "type": "long"},
         ]}},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    schema = pa.schema([
        ("b", pa.bool_()), ("i", pa.int32()), ("f", pa.float32()),
        ("d", pa.date32()), ("dec", pa.decimal128(10, 2)),
        ("arr", pa.list_(pa.int64())),
        ("st", pa.struct([("x", pa.int64())])),
    ])
    import pyarrow.parquet as pq

    fx._n += 1
    fp = fx.root / "data" / "f001.parquet"
    pq.write_table(pa.Table.from_pylist([{
        "b": True, "i": 3, "f": 1.5, "d": dt.date(2026, 8, 16),
        "dec": decimal.Decimal("12.34"), "arr": [1, 2],
        "st": {"x": 9},
    }], schema=schema), fp)
    df_rec = {"content": 0, "file_path": "file://" + str(fp),
              "file_format": "PARQUET", "record_count": 1,
              "file_size_in_bytes": fp.stat().st_size,
              "lower_bounds": None, "upper_bounds": None}
    fx.add_snapshot([df_rec], ts_ms=1_000)
    fx.finish()
    df = read_iceberg_table(spark, str(fx.root))
    assert dict(df.dtypes) == {
        "b": "boolean", "i": "int", "f": "float", "d": "date",
        "dec": "decimal(10,2)", "arr": "array<bigint>",
        "st": "struct<x:bigint>",
    }
    r = df.collect()[0]
    assert r.b is True and r.i == 3 and r.arr == [1, 2] and r.st.x == 9


def test_unsupported_type_refuses(tmp_path):
    from etl_rust_spark.iceberg import _to_spark_type

    with pytest.raises(IcebergProtocolError, match="uuid"):
        _to_spark_type("uuid")


def test_metadata_discovery_without_hint(spark, tmp_path):
    fx = _basic(tmp_path)
    (fx.root / "metadata" / "version-hint.text").unlink()
    # numerically newest metadata wins
    assert len(iceberg_table_files(str(fx.root))) == 2
    # a dangling hint refuses loudly
    (fx.root / "metadata" / "version-hint.text").write_text("99")
    with pytest.raises(FileNotFoundError, match="99"):
        iceberg_table_files(str(fx.root))


def test_metadata_discovery_sorts_numerically(spark, tmp_path):
    """Hadoop-catalog metadata names are NOT zero-padded: with the
    hint missing, `v10` must beat `v9` — raw string order would
    resolve the STALE v9 snapshot (ADVICE r10)."""
    fx = _basic(tmp_path)
    d = fx.root / "metadata"
    full = json.loads((d / "v1.metadata.json").read_text())
    stale = dict(full)
    # v9 = history truncated to the first (1-file) snapshot
    stale["snapshots"] = full["snapshots"][:1]
    stale["snapshot-log"] = full["snapshot-log"][:1]
    stale["current-snapshot-id"] = full["snapshots"][0]["snapshot-id"]
    (d / "v9.metadata.json").write_text(json.dumps(stale))
    (d / "v10.metadata.json").write_text(json.dumps(full))
    (d / "v1.metadata.json").unlink()
    (d / "version-hint.text").unlink()
    assert len(iceberg_table_files(str(fx.root))) == 2


def test_cli_read_iceberg(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    fx = _basic(tmp_path)
    out = str(tmp_path / "ice_read")
    assert main(["table", str(fx.root), "--read-iceberg", "1000",
                 "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 2
    assert main(["table", str(fx.root), "--read-iceberg", "latest",
                 "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 3
    assert main(["table", str(fx.root), "--read-iceberg", "latest",
                 "--as-of", "1500", "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 2


def test_partition_transform_pruning(spark, tmp_path):
    """The hidden-partitioning spec prunes on SOURCE columns: identity
    values compare exactly, `day` transforms compare by day ordinal."""
    import datetime as dt

    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "p", "required": False, "type": "long"},
        {"id": 3, "name": "ts", "required": False, "type": "timestamptz"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file([{"k": 1, "p": 7}],
                       partition={"p": 7, "d": 20_000})
    f2 = fx.write_file([{"k": 2, "p": 8}],
                       partition={"p": 8, "d": 20_100})
    fx.add_snapshot([f1, f2], ts_ms=1_000)
    fx.finish()
    # inject the partition spec: identity(p) + day(ts)
    mp = fx.root / "metadata" / "v1.metadata.json"
    meta = json.loads(mp.read_text())
    meta["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "p", "transform": "identity", "source-id": 2,
         "field-id": 1000},
        {"name": "d", "transform": "day", "source-id": 3,
         "field-id": 1001},
    ]}]
    mp.write_text(json.dumps(meta))
    t = str(fx.root)
    assert len(iceberg_table_files(t)) == 2
    hit = iceberg_table_files(t, prune=[("p", 8, 8)])
    assert len(hit) == 1 and hit[0].endswith("f002.parquet")
    assert iceberg_table_files(t, prune=[("p", 9, None)]) == []
    # day transform: epoch day 20000 = 2024-10-04, 20100 = 2025-01-12
    d1 = dt.date(1970, 1, 1) + dt.timedelta(days=20_000)
    hit = iceberg_table_files(t, prune=[("ts", d1, d1)])
    assert len(hit) == 1 and hit[0].endswith("f001.parquet")
    # ISO-string bounds convert too; garbage strings keep everything
    hit = iceberg_table_files(
        t, prune=[("ts", d1.isoformat(), d1.isoformat())])
    assert len(hit) == 1
    assert len(iceberg_table_files(t, prune=[("ts", "junk", "junk")])) \
        == 2


def test_import_iceberg_history(spark, tmp_path):
    """Import an Iceberg snapshot chain into a fresh versioned table:
    content parity per snapshot, hardlinked files, timestamps carried,
    stats usable for metadata count(*) and range pruning."""
    from etl_rust_spark.iceberg import import_iceberg_table

    fx = _basic(tmp_path)
    dest = str(tmp_path / "vt_from_ice")
    n = import_iceberg_table(spark, str(fx.root), dest)
    assert n == 2
    assert V.list_versions(dest) == [1, 2]
    for sid, ours_v in ((1000, 1), (1001, 2)):
        theirs = read_iceberg_table(spark, str(fx.root), snapshot_id=sid)
        ours = V.read_table_version(spark, dest, ours_v)
        assert sorted(map(tuple, theirs.collect())) == \
            sorted(map(tuple, ours.select(*theirs.columns).collect()))
    # hardlinked, not copied
    src_f1 = fx.root / "data" / "f001.parquet"
    dst = next((Path(dest) / "data").glob("*f001.parquet"))
    assert src_f1.stat().st_ino == dst.stat().st_ino
    # Iceberg's commit instants drive AS OF on the imported chain
    assert V.version_at_timestamp(dest, 1_500) == 1
    # record_count becomes exact per-file rows: metadata-only count(*)
    assert V.aggregate_table_metadata(dest, ["count(*)"]) == \
        {"count(*)": 3}
    # decoded bounds prune on the imported chain
    df = V.read_table_version(spark, dest, prune=[("k", 10, 10)])
    assert len(df.inputFiles()) == 1


def test_import_iceberg_position_deletes_as_mor(spark, tmp_path):
    """Position deletes import as positional MoR sidecars (r12): the
    strongest pin is the full loop — a MoR chain exports as v2
    position deletes, imports back, and every version reads
    identically to the original."""
    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        import_iceberg_table,
    )

    src = str(tmp_path / "vt_pd_src")
    V.write_table_version(
        spark.range(10).selectExpr("id as k", "id * 3 as v"), src)
    V.delete_table_version(spark, src, "k = 2", mode="mor")
    V.update_table_version(spark, src, "k = 7", {"v": "70"},
                           mode="mor")
    export_iceberg_metadata(spark, src)
    dest = str(tmp_path / "vt_pd_dst")
    assert import_iceberg_table(spark, src, dest) == 3
    for i, v in enumerate(V.list_versions(src)):
        a = V.read_table_version(spark, src, v)
        b = V.read_table_version(spark, dest, i + 1)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.select(*a.columns).collect())), (v, i)
    assert V._load_manifest(dest, 3)["deletes"]


def test_import_iceberg_equality_deletes_resolved(spark, tmp_path):
    """Equality deletes RESOLVE to positions at import time: the
    imported version reads identically to the independent reader's
    merge-on-read application (strictly-older scope, null-safe
    match)."""
    from etl_rust_spark.iceberg import import_iceberg_table

    fx = IceFix(tmp_path / "ice_eq", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}, {"k": 2, "v": "b"},
                        {"k": 3, "v": "c"}])
    ed = fx.write_file([{"k": 1}, {"k": 3}], content=2,
                       equality_ids=[1])
    fx.add_snapshot([f1, ed], ts_ms=1_000, seq=1, entry_seqs=[0, 1])
    fx.finish()
    dest = str(tmp_path / "vt_eq")
    assert import_iceberg_table(spark, str(fx.root), dest) == 1
    theirs = sorted(map(tuple, read_iceberg_table(spark, str(fx.root))
                        .select("k", "v").collect()))
    ours = sorted(map(tuple, V.read_table_version(spark, dest, 1)
                      .select("k", "v").collect()))
    assert ours == theirs == [(2, "b")]
    assert V._load_manifest(dest, 1)["deletes"]


def test_import_iceberg_refusals(spark, tmp_path):
    from etl_rust_spark.iceberg import import_iceberg_table
    # schema-set change across snapshots refuses
    old = [{"id": 1, "name": "k", "required": False, "type": "long"}]
    new = old + [{"id": 2, "name": "v", "required": False,
                  "type": "string"}]
    fx2 = IceFix(tmp_path / "ice2", new)
    g1 = fx2.write_file([{"k": 1}])
    g2 = fx2.write_file([{"k": 2, "v": "b"}])
    fx2.add_snapshot([g1], ts_ms=1_000, schema_id=0)
    fx2.add_snapshot([g1, g2], ts_ms=2_000, schema_id=1)
    fx2.finish(schemas=[
        {"schema-id": 0, "type": "struct", "fields": old},
        {"schema-id": 1, "type": "struct", "fields": new},
    ], current_schema_id=1)
    with pytest.raises(ValueError, match="field set"):
        import_iceberg_table(spark, str(fx2.root), str(tmp_path / "x2"))


def test_cli_import_iceberg(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    fx = _basic(tmp_path)
    dest = str(tmp_path / "vt_cli_ice")
    assert main(["table", str(fx.root), "--import-iceberg", dest]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["imported_versions"] == 2
    assert V.list_versions(dest) == [1, 2]


# -------------------------------------------------------------- exporter


def test_export_iceberg_roundtrip(spark, tmp_path):
    """versioned → Iceberg metadata → independent Iceberg reader:
    content-equal snapshot for version, AS OF parity, bounds pruning
    working on the exported metadata; a second export refuses; and the
    full circle back through import_iceberg_table re-pins content."""
    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        import_iceberg_table,
    )

    src = str(tmp_path / "vt_ice_src")
    V.write_table_version(
        spark.range(8).selectExpr("id as k", "id * 3 as v"), src,
        stats_cols=["k"])
    V.upsert_table_version(
        spark, src,
        spark.range(3).selectExpr("id + 6 as k", "id + 100 as v"),
        keys=["k"])
    V.delete_table_version(spark, src, "k = 2")
    n = export_iceberg_metadata(spark, src)
    assert n == 3
    vs = V.list_versions(src)
    for v in vs:
        ours = V.read_table_version(spark, src, v)
        theirs = read_iceberg_table(spark, src, snapshot_id=v)
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple, theirs.select(*ours.columns).collect()))
    # snapshot timestamps mirror our commit instants: AS OF agrees
    h = iceberg_snapshots(src)
    assert [s["snapshot_id"] for s in h] == [3, 2, 1]
    # +1 ms: the export truncates our float instants to whole millis
    mid_ts = h[1]["timestamp_ms"] / 1000.0 + 0.001
    assert V.version_at_timestamp(src, mid_ts) == 2
    via_ice = read_iceberg_table(spark, src, as_of=mid_ts)
    ours2 = V.read_table_version(spark, src, 2)
    assert sorted(map(tuple, via_ice.select(*ours2.columns).collect())) \
        == sorted(map(tuple, ours2.collect()))
    # exported bounds prune
    hit = iceberg_table_files(src, prune=[("k", 0, 0)])
    assert 0 < len(hit) < len(iceberg_table_files(src))
    with pytest.raises(FileExistsError, match="already holds"):
        export_iceberg_metadata(spark, src)
    # full circle: import the exported metadata into a new chain
    back = str(tmp_path / "vt_back")
    assert import_iceberg_table(spark, src, back) == 3
    for v in vs:
        a = V.read_table_version(spark, src, v)
        b = V.read_table_version(spark, back, v)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.select(*a.columns).collect()))


def test_export_iceberg_partitioned_roundtrip(spark, tmp_path):
    """VERDICT r10 #7: an identity-(hive-)partitioned versioned table
    exports with a partition spec + per-entry partition values, and
    the independent reader fills the metadata-only column back via the
    spec's column-projection rule — per-version parity incl. a NULL
    partition, and partition pruning through the exported spec."""
    from pyspark.sql import functions as F

    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        import_iceberg_table,
    )

    src = str(tmp_path / "vt_ice_part")
    df = spark.range(8).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 6,
               F.concat(F.lit("g"), (F.col("id") % 3).cast("string"))
               ).alias("p"),  # ids 6,7: NULL partition
    )
    V.write_table_version(df, src, partition_by="p")
    V.upsert_table_version(
        spark, src,
        spark.range(2).selectExpr("id + 100 as k", "'g9' as p"),
        keys=["k"], partition_by="p")
    V.delete_table_version(spark, src, "k = 1")
    n = export_iceberg_metadata(spark, src)
    assert n == 3
    for v in V.list_versions(src):
        ours = V.read_table_version(spark, src, v)
        theirs = read_iceberg_table(spark, src, snapshot_id=v)
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple, theirs.select(*ours.columns).collect())), v
    # NULL-partition rows survive the projection
    head = read_iceberg_table(spark, src)
    assert head.filter("p IS NULL").count() == 2
    # identity-transform pruning on the exported spec
    hit = iceberg_table_files(src, prune=[("p", "g9", "g9")])
    assert 0 < len(hit) < len(iceberg_table_files(src))
    # importing a metadata-only-column table refuses (silent NULLs)
    with pytest.raises(ValueError, match="materialize"):
        import_iceberg_table(spark, src, str(tmp_path / "back"))


def test_export_iceberg_int_partition_roundtrip(spark, tmp_path):
    """Integer partition directories (Spark infers int) export as int
    partition values and read back typed."""
    from etl_rust_spark.iceberg import export_iceberg_metadata

    src = str(tmp_path / "vt_ice_ipart")
    V.write_table_version(
        spark.range(6).selectExpr("id as k", "cast(id % 2 as int) as ds"),
        src, partition_by="ds")
    export_iceberg_metadata(spark, src)
    ours = V.read_table_version(spark, src)
    theirs = read_iceberg_table(spark, src)
    assert dict(theirs.dtypes)["ds"] == dict(ours.dtypes)["ds"]
    assert sorted(map(tuple, ours.collect())) == \
        sorted(map(tuple, theirs.select(*ours.columns).collect()))


def test_export_iceberg_mor_roundtrip(spark, tmp_path):
    """Outstanding MoR debt exports as real Iceberg v2 merge-on-read:
    positional sidecars become position-delete files, data sequence
    numbers scope them, and the independent reader masks exactly what
    read_table_version masks — per snapshot, across delete + update
    and a later append that must NOT be masked."""
    from etl_rust_spark.iceberg import export_iceberg_metadata

    src = str(tmp_path / "vt_ice_mor")
    V.write_table_version(
        spark.range(8).selectExpr("id as k", "id * 3 as v"), src)
    V.delete_table_version(spark, src, "k = 2", mode="mor")
    V.update_table_version(spark, src, "k = 5", {"v": "99"},
                           mode="mor")
    # a later upsert re-adds k=2 content in a NEW file: the old
    # delete must not mask it (sequence scoping)
    V.upsert_table_version(
        spark, src, spark.createDataFrame([(2, 6)], "k long, v long"),
        keys=["k"])
    n = export_iceberg_metadata(spark, src)
    assert n == 4
    snaps = json.loads(
        (Path(src) / "metadata" / "v1.metadata.json").read_text())
    assert snaps["format-version"] == 2
    for v, s in zip(V.list_versions(src), snaps["snapshots"]):
        ours = V.read_table_version(spark, src, v)
        theirs = read_iceberg_table(
            spark, src, snapshot_id=s["snapshot-id"])
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple, theirs.select(*ours.columns).collect())
                   ), v
    head = {(r.k, r.v) for r in read_iceberg_table(spark, src).collect()}
    assert (2, 6) in head        # the re-added row survives the delete
    assert (5, 99) in head       # the MoR update's new image
    assert (5, 15) not in head   # the old image is masked
    assert (2, 6 * 0) not in head


def test_export_iceberg_refusals(spark, tmp_path):
    from etl_rust_spark.iceberg import export_iceberg_metadata

    # identity partitioning exports (see the partitioned round-trip
    # test); a partition VALUE type outside int/long/string refuses
    p1 = str(tmp_path / "vt_part")
    V.write_table_version(
        spark.range(4).selectExpr("id as k", "id / 2.0 as p"),
        p1, partition_by="p")
    with pytest.raises(ValueError, match="unpartitioned"):
        export_iceberg_metadata(spark, p1)
    # MoR debt EXPORTS since r11 (see the MoR round-trip test); a
    # pre-r11 fingerprint-only sidecar (no positions) still refuses
    import pyarrow.parquet as pq

    p2 = str(tmp_path / "vt_mor")
    V.write_table_version(spark.range(4).selectExpr("id as k"), p2)
    V.delete_table_version(spark, p2, "k = 1", mode="mor")
    side = V._load_manifest(p2, 2)["deletes"][0]["path"]
    sp = Path(p2) / "data" / side
    pq.write_table(pq.read_table(sp, columns=["_fp"]), sp)
    with pytest.raises(ValueError, match="compact"):
        export_iceberg_metadata(spark, p2)


def test_export_iceberg_column_mapped(spark, tmp_path):
    """Column-mapped tables export natively (r12): field ids key by
    the stable PHYSICAL name, a rename is a new schema generation over
    the same ids, and schema.name-mapping.default resolves the id-less
    parquet — including after a rename done by the EXTERNAL engine on
    the exported metadata (this repo's own mapping path stands in for
    the external reader)."""
    from etl_rust_spark.iceberg import export_iceberg_metadata

    t = str(tmp_path / "vt_ice_cm")
    V.write_table_version(
        spark.range(6).selectExpr("id as k", "id * 2 as v"), t)
    V.rename_columns(spark, t, {"v": "val"})
    V.upsert_table_version(
        spark, t, spark.createDataFrame([(10, 100)], "k long, val long"),
        keys=["k"])
    n = export_iceberg_metadata(spark, t)
    assert n == 3
    mp = Path(t) / "metadata" / "v1.metadata.json"
    meta = json.loads(mp.read_text())
    mapping = {e["field-id"]: e["names"] for e in json.loads(
        meta["properties"]["schema.name-mapping.default"])}
    assert mapping == {1: ["k"], 2: ["v"]}  # physical footer names
    # two schema generations over the SAME field ids
    gens = [[(f["id"], f["name"]) for f in s["fields"]]
            for s in meta["schemas"]]
    assert gens == [[(1, "k"), (2, "v")], [(1, "k"), (2, "val")]]
    for v in V.list_versions(t):
        ours = V.read_table_version(spark, t, v)
        theirs = read_iceberg_table(spark, t, snapshot_id=v)
        assert theirs.columns == ours.columns, v
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple,
                       theirs.select(*ours.columns).collect())), v
    # a POST-EXPORT rename by the external engine: new display name,
    # same id — the name mapping must keep reading data, not NULLs
    for s in meta["schemas"]:
        for f in s["fields"]:
            if f["name"] == "val":
                f["name"] = "value2"
    mp.write_text(json.dumps(meta))
    head = read_iceberg_table(spark, t)
    assert "value2" in head.columns
    vals = {r.value2 for r in head.collect()}
    assert None not in vals and 100 in vals


def test_export_iceberg_transform_days(spark, tmp_path):
    """days-partitioned tables export as Iceberg's own `day` transform
    with exact directory→ordinal conversion: the independent reader
    both round-trips the data AND prunes files by day through the
    exported partition values."""
    import datetime as dt

    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        iceberg_table_files,
    )

    t = str(tmp_path / "vt_ice_days")
    df = spark.range(4).selectExpr(
        "id as k",
        "timestamp_micros(cast(id * 86400e6 as long)) as ts")
    V.write_table_version(df, t, partition_by=("days", "ts"))
    V.delete_table_version(spark, t, "k = 1")
    assert export_iceberg_metadata(spark, t) == 2
    meta = json.loads(
        (Path(t) / "metadata" / "v1.metadata.json").read_text())
    spec = meta["partition-specs"][0]["fields"]
    assert spec == [{"name": "ts_days", "transform": "day",
                     "source-id": 2, "field-id": 1000}]
    for v in V.list_versions(t):
        ours = V.read_table_version(spark, t, v)
        theirs = read_iceberg_table(spark, t, snapshot_id=v)
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple,
                       theirs.select(*ours.columns).collect())), v
    # exported day ordinals prune: k=2 lives on epoch day 2
    d = dt.date(1970, 1, 3)
    hit = iceberg_table_files(t, prune=[("ts", d, d)])
    assert len(hit) == 1
    assert iceberg_table_files(
        t, prune=[("ts", dt.date(1980, 1, 1), None)]) == []


def test_export_iceberg_transform_truncate_and_bucket(spark, tmp_path):
    """truncate[W] exports 1:1 (leading code points both sides);
    bucket exports an EMPTY spec on purpose — the synthetic bucket is
    xxhash64 while Iceberg's bucket[N] is murmur3, so advertising the
    spec would mis-prune external engines."""
    from etl_rust_spark.iceberg import export_iceberg_metadata

    t1 = str(tmp_path / "vt_ice_trunc")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alto"), (3, "beta"), (4, None)],
        "k long, s string")
    V.write_table_version(df, t1, partition_by=("truncate", "s", 2))
    assert export_iceberg_metadata(spark, t1) == 1
    meta = json.loads(
        (Path(t1) / "metadata" / "v1.metadata.json").read_text())
    assert meta["partition-specs"][0]["fields"][0]["transform"] == \
        "truncate[2]"
    ours = V.read_table_version(spark, t1)
    theirs = read_iceberg_table(spark, t1)
    assert sorted(map(tuple, ours.collect()),
                  key=lambda r: (r[0],)) == \
        sorted(map(tuple, theirs.select(*ours.columns).collect()),
               key=lambda r: (r[0],))

    t2 = str(tmp_path / "vt_ice_bucket")
    V.write_table_version(
        spark.range(10).selectExpr("id as k", "id * 7 as v"),
        t2, partition_by=("bucket", "k", 4))
    assert export_iceberg_metadata(spark, t2) == 1
    meta2 = json.loads(
        (Path(t2) / "metadata" / "v1.metadata.json").read_text())
    assert meta2["partition-specs"] == [{"spec-id": 0, "fields": []}]
    ours2 = V.read_table_version(spark, t2)
    theirs2 = read_iceberg_table(spark, t2)
    assert sorted(map(tuple, ours2.collect())) == \
        sorted(map(tuple, theirs2.select(*ours2.columns).collect()))


def test_cli_export_iceberg(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "vt_cli_exp")
    V.write_table_version(spark.range(5).selectExpr("id as k"), p)
    assert main(["table", p, "--export-iceberg"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["iceberg_snapshots"] == 1
    assert read_iceberg_table(spark, p).count() == 5


def test_export_iceberg_empty_version(spark, tmp_path):
    """A delete-all version exports as an empty-manifest snapshot and
    reads back as an empty typed frame."""
    from etl_rust_spark.iceberg import export_iceberg_metadata

    src = str(tmp_path / "vt_ice_empty")
    V.write_table_version(
        spark.range(3).selectExpr("id as k", "id as v").coalesce(1),
        src)
    V.delete_table_version(spark, src, "true")
    assert V._load_manifest(src, 2)["files"] == []  # truly file-empty
    export_iceberg_metadata(spark, src)
    head = read_iceberg_table(spark, src)
    assert head.count() == 0 and head.columns == ["k", "v"]
    assert read_iceberg_table(spark, src, snapshot_id=1).count() == 3
    assert iceberg_table_files(src, snapshot_id=2) == []


def test_spark_side_manifest_planning_parity(spark, tmp_path):
    """Above the routing threshold the manifest avro decode fans out
    over executors; the snapshot fold must equal the driver-side walk
    — position deletes, sequence numbers and partition values
    included — and reads routed through it stay mask-correct."""
    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        iceberg_snapshot,
        iceberg_table_files,
    )

    t = str(tmp_path / "vt_spark_plan")
    V.write_table_version(
        spark.range(20).selectExpr("id as k", "id * 3 as v"), t,
        stats_cols=["k"])
    V.delete_table_version(spark, t, "k = 2", mode="mor")
    V.upsert_table_version(
        spark, t, spark.createDataFrame([(2, 6)], "k long, v long"),
        keys=["k"])
    export_iceberg_metadata(spark, t)
    drv = iceberg_snapshot(t)
    via = iceberg_snapshot(t, spark=spark,
                           spark_plan_threshold_bytes=0)
    key = lambda d: d["file_path"]
    for part in ("files", "pos_deletes", "eq_deletes"):
        assert sorted(via[part], key=key) == \
            sorted(drv[part], key=key), part
    assert via["schema"] == drv["schema"]
    assert iceberg_table_files(
        t, prune=[("k", 0, 5)], spark=spark,
        spark_plan_threshold_bytes=0
    ) == iceberg_table_files(t, prune=[("k", 0, 5)])
    assert iceberg_table_files(
        t, spark=spark, spark_plan_threshold_bytes=0
    ) == iceberg_table_files(t)
    import etl_rust_spark.iceberg as I

    old = I._SPARK_PLAN_THRESHOLD_BYTES
    I._SPARK_PLAN_THRESHOLD_BYTES = 0
    try:
        ours = V.read_table_version(spark, t)
        theirs = read_iceberg_table(spark, t)
        assert sorted(map(tuple,
                          theirs.select(*ours.columns).collect())) \
            == sorted(map(tuple, ours.collect()))
    finally:
        I._SPARK_PLAN_THRESHOLD_BYTES = old


def test_export_incremental_manifest_reuse(spark, tmp_path):
    """Exported manifest lists re-reference prior manifests (Iceberg's
    incremental discipline): an append's snapshot reuses the previous
    manifest file verbatim and adds one for the new files; a delete
    rewrites ONLY the manifest that lost files.  Export cost is
    O(churn), not O(live x versions)."""
    from etl_rust_spark.functions.wireformats import read_avro_container
    from etl_rust_spark.iceberg import export_iceberg_metadata

    t = str(tmp_path / "vt_incr")
    V.write_table_version(
        spark.range(8).selectExpr("id as k", "id * 2 as v")
        .coalesce(2), t)
    import pyarrow as pa
    import pyarrow.parquet as pq

    stage = tmp_path / "stage.parquet"
    pq.write_table(pa.table({"k": [100], "v": [200]}), stage)
    V.commit_appended_files(spark, t, [str(stage)], 1)  # pure append
    V.delete_table_version(spark, t, "k = 100")
    export_iceberg_metadata(spark, t)

    def manifest_paths(snap_avro):
        with open(snap_avro, "rb") as f:
            _, rows = read_avro_container(f.read())
        return [r["manifest_path"] for r in rows if r.get("content", 0) == 0]

    md = Path(t) / "metadata"
    l1 = manifest_paths(md / "snap-1.avro")
    l2 = manifest_paths(md / "snap-2.avro")
    l3 = manifest_paths(md / "snap-3.avro")
    # append: v2 reuses v1's manifest file and adds exactly one
    assert set(l1) <= set(l2) and len(l2) == len(l1) + 1
    # delete of only the appended file: v1's manifests survive; the
    # v2 add-manifest is gone (fully superseded), nothing rewritten
    assert set(l3) == set(l1)
    # round trip unchanged
    for v in V.list_versions(t):
        ours = V.read_table_version(spark, t, v)
        theirs = read_iceberg_table(spark, t, snapshot_id=v)
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple, theirs.select(*ours.columns).collect())), v


def test_import_iceberg_reconstructs_transform_spec(spark, tmp_path):
    """A never-evolved single-field day/hour/string-truncate spec
    imports as the HIDDEN transform (r12): files hardlink into synth
    directories derived from each file's partition-struct value —
    parity per snapshot masks included, post-import DML routes
    through the transform, point/range prune works.  Bucket stays
    flat (murmur3 vs xxhash64 would mis-route new DML)."""
    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        import_iceberg_table,
    )

    for name, pb, mk in [
        ("days", ("days", "ts"), lambda: spark.range(12).selectExpr(
            "id as k",
            "timestamp_micros(cast(id * 86400e6 as long)) as ts",
            "concat('v', id) as val")),
        ("truncate", ("truncate", "val", 2), lambda: spark.range(9)
            .selectExpr("id as k", "concat('ab', id) as val")),
    ]:
        p = str(tmp_path / f"src_{name}")
        q = str(tmp_path / f"imp_{name}")
        V.write_table_version(mk(), p, partition_by=pb)
        V.delete_table_version(spark, p, "k = 3", mode="mor")
        export_iceberg_metadata(spark, p)
        assert import_iceberg_table(spark, p, q) == 2
        t = V._load_manifest(q, 1).get("partition_transform")
        assert t and t["kind"] == pb[0] and t["source"] == pb[1], name
        for i, v in enumerate(V.list_versions(p)):
            a = sorted(map(tuple,
                           V.read_table_version(spark, p, v).collect()))
            b = sorted(map(tuple,
                           V.read_table_version(spark, q, i + 1)
                           .collect()))
            assert a == b, f"{name} v{v}"
        assert not any(c.startswith("_p_")
                       for c in V.read_table_version(spark, q).columns)
    # bucket: imports, but stays UNPARTITIONED — never a transform
    # whose routing hash disagrees with the source layout
    p = str(tmp_path / "src_bucket")
    q = str(tmp_path / "imp_bucket")
    V.write_table_version(
        spark.range(16).selectExpr("id as k", "concat('v', id) as val"),
        p, partition_by=("bucket", "k", 4))
    export_iceberg_metadata(spark, p)
    import_iceberg_table(spark, p, q)
    m = V._load_manifest(q, 1)
    assert not m.get("partition_transform") and not m.get("partition_by")
    assert V.read_table_version(spark, q).count() == 16


def test_iceberg_changelog_net_changes(spark, tmp_path):
    """iceberg_table_changes (r12): net row changes per snapshot step
    from the file-set + delete-state diff — a CoW rewrite of one row
    nets exactly one delete+insert (carried rows cancel), a MoR
    position delete nets one delete, compaction is skipped, and the
    exclusive-start window contract matches the repo's own CDC."""
    from etl_rust_spark.iceberg import (
        export_iceberg_metadata,
        iceberg_table_changes,
    )

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(12)], ["k", "ds", "val"]
    ).repartition(2, "ds")
    V.write_table_version(df, p, "ds")
    V.delete_table_version(spark, p, "k = 3", mode="mor")
    V.update_table_version(spark, p, "k = 5", {"val": "'X'"})
    V.compact_table_version(spark, p)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(99, 1, "I")], ["k", "ds", "val"]),
        keys=["k"], partition_by="ds")
    export_iceberg_metadata(spark, p)
    ch = iceberg_table_changes(spark, p)
    assert set(ch.columns) == {"k", "ds", "val", "_change_type",
                               "_snapshot_id", "_commit_timestamp"}
    byv: dict = {}
    for r in ch.collect():
        byv.setdefault(r._snapshot_id, []).append(
            (r.k, r._change_type, r.val))
    assert len(byv[1]) == 12
    assert all(t == "insert" for _, t, _ in byv[1])
    assert byv[2] == [(3, "delete", "v3")]
    assert sorted(byv[3]) == [(5, "delete", "v5"), (5, "insert", "X")]
    assert 4 not in byv  # compaction skipped
    assert byv[5] == [(99, "insert", "I")]
    # exclusive-start window
    w = iceberg_table_changes(spark, p, 2, 3)
    assert sorted((r.k, r._change_type) for r in w.collect()) \
        == [(5, "delete"), (5, "insert")]
    # caught-up consumer: empty frame, full schema
    empty = iceberg_table_changes(spark, p, 5, 5)
    assert empty.count() == 0 and "_change_type" in empty.columns
