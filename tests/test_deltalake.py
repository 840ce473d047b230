"""Delta Lake interop (etl_rust_spark.deltalake).

Two families:

1. READER vs hand-written logs — fixtures are constructed line-by-line
   per the public Delta protocol (PROTOCOL.md), since the container
   has no delta-spark jar to write "real" logs.  Every structural
   feature the reader claims (checkpoints, multi-part checkpoints,
   column mapping, protocol gates, deletion-vector refusal, absolute
   paths, schema evolution, time travel) gets its own fixture.
2. ROUND TRIP through the exporter — our versioned tables exported as
   a Delta log must read back content-equal VERSION FOR VERSION via
   the independent reader path, including through the checkpoint.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from etl_rust_spark import versions as V
from etl_rust_spark.deltalake import (
    DeltaProtocolError,
    delta_history,
    delta_latest_version,
    delta_snapshot,
    delta_table_files,
    export_delta_log,
    read_delta_table,
)


def _write_parquet(path: Path, rows: list[dict], schema=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path.parent.mkdir(parents=True, exist_ok=True)
    t = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(t, path)
    return path.stat().st_size


def _commit(log: Path, v: int, actions: list[dict], ts_ms: int | None = None):
    log.mkdir(parents=True, exist_ok=True)
    if ts_ms is not None:
        actions = actions + [{"commitInfo": {"timestamp": ts_ms,
                                             "operation": "TEST"}}]
    (log / f"{v:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in actions)
    )


def _schema_str(fields: list[tuple[str, str]], metadata=None) -> str:
    return json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True,
             "metadata": (metadata or {}).get(n, {})}
            for n, t in fields
        ],
    })


def _meta(schema_str: str, parts: list[str] | None = None, conf=None):
    return {"metaData": {
        "id": "00000000-0000-0000-0000-000000000001",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_str,
        "partitionColumns": parts or [],
        "configuration": conf or {},
    }}


_P1 = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _simple_table(tmp_path: Path) -> Path:
    """3 commits: add f1+f2 / add f3 / remove f1 (compaction-ish)."""
    t = tmp_path / "delta_simple"
    log = t / "_delta_log"
    sz1 = _write_parquet(t / "f1.parquet", [{"k": 1, "v": "a"},
                                            {"k": 2, "v": "b"}])
    sz2 = _write_parquet(t / "f2.parquet", [{"k": 3, "v": "c"}])
    sz3 = _write_parquet(t / "f3.parquet", [{"k": 4, "v": "d"}])
    sch = _schema_str([("k", "long"), ("v", "string")])

    def add(name, sz, stats=None):
        a = {"path": name, "partitionValues": {}, "size": sz,
             "modificationTime": 1000, "dataChange": True}
        if stats:
            a["stats"] = json.dumps(stats)
        return {"add": a}

    _commit(log, 0, [_P1, _meta(sch),
                     add("f1.parquet", sz1,
                         {"numRecords": 2, "minValues": {"k": 1},
                          "maxValues": {"k": 2}}),
                     add("f2.parquet", sz2,
                         {"numRecords": 1, "minValues": {"k": 3},
                          "maxValues": {"k": 3}})],
            ts_ms=1_000_000)
    _commit(log, 1, [add("f3.parquet", sz3,
                         {"numRecords": 1, "minValues": {"k": 4},
                          "maxValues": {"k": 4}})],
            ts_ms=2_000_000)
    _commit(log, 2, [{"remove": {"path": "f1.parquet",
                                 "deletionTimestamp": 3_000_000,
                                 "dataChange": True}}],
            ts_ms=3_000_000)
    return t


# ------------------------------------------------------------- reader


def test_read_latest_and_time_travel(spark, tmp_path):
    t = _simple_table(tmp_path)
    assert delta_latest_version(str(t)) == 2
    head = read_delta_table(spark, str(t))
    assert sorted(r.k for r in head.collect()) == [3, 4]
    v0 = read_delta_table(spark, str(t), version=0)
    assert sorted(r.k for r in v0.collect()) == [1, 2, 3]
    v1 = read_delta_table(spark, str(t), version=1)
    assert sorted(r.k for r in v1.collect()) == [1, 2, 3, 4]
    assert head.columns == ["k", "v"]


def test_read_as_of_timestamp(spark, tmp_path):
    t = _simple_table(tmp_path)
    # commitInfo timestamps: 1000/2000/3000 s
    df = read_delta_table(spark, str(t), as_of=2_500)
    assert sorted(r.k for r in df.collect()) == [1, 2, 3, 4]
    df = read_delta_table(spark, str(t), as_of=1_000)
    assert sorted(r.k for r in df.collect()) == [1, 2, 3]
    with pytest.raises(ValueError, match="at or before"):
        read_delta_table(spark, str(t), as_of=500)
    with pytest.raises(ValueError, match="version OR as_of"):
        read_delta_table(spark, str(t), version=1, as_of=2_500)


def test_missing_version_raises(spark, tmp_path):
    t = _simple_table(tmp_path)
    with pytest.raises(FileNotFoundError, match="no Delta version 9"):
        delta_snapshot(str(t), 9)


def test_stats_skipping(spark, tmp_path):
    t = _simple_table(tmp_path)
    all_f = delta_table_files(str(t), version=1)
    assert len(all_f) == 3
    hit = delta_table_files(str(t), version=1, prune=[("k", 4, None)])
    assert [Path(f).name for f in hit] == ["f3.parquet"]
    # missing stats keep the file: strip stats from one add
    hit2 = delta_table_files(str(t), version=1, prune=[("k", 1, 2)])
    assert [Path(f).name for f in hit2] == ["f1.parquet"]


def test_partitioned_read_and_prune(spark, tmp_path):
    t = tmp_path / "delta_part"
    log = t / "_delta_log"
    # data files do NOT carry the partition column — the Delta layout
    sz1 = _write_parquet(t / "p=x/f1.parquet", [{"k": 1}, {"k": 2}])
    sz2 = _write_parquet(t / "p=y/f2.parquet", [{"k": 3}])
    sz3 = _write_parquet(t / "f3.parquet", [{"k": 9}])  # null partition
    sch = _schema_str([("k", "long"), ("p", "string")])
    _commit(log, 0, [
        _P1, _meta(sch, parts=["p"]),
        {"add": {"path": "p%3Dx/f1.parquet",  # percent-encoded path
                 "partitionValues": {"p": "x"}, "size": sz1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "p=y/f2.parquet",
                 "partitionValues": {"p": "y"}, "size": sz2,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "f3.parquet",
                 "partitionValues": {"p": None}, "size": sz3,
                 "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta_table(spark, str(t))
    rows = {r.k: r.p for r in df.collect()}
    assert rows == {1: "x", 2: "x", 3: "y", 9: None}
    assert df.columns == ["k", "p"]
    # exact partition-value pruning, driver-side
    assert sorted(
        Path(f).name for f in
        delta_table_files(str(t), prune=[("p", "y", "y")])
    ) == ["f2.parquet", "f3.parquet"]  # NULL kept (sound)


def test_scan_uri_normalization_scheme_invariant(spark):
    """The partition-injection join keys on the scan-side file URI
    normalized to a PLAIN absolute path; java renders file URIs as
    file:/abs, file://host/abs or file:///abs depending on the code
    path, and keying on any one rendering makes every row miss the
    join — silent-NULL partition columns (ADVICE r10)."""
    from pyspark.sql import functions as F

    from etl_rust_spark.deltalake import _decoded_file_col

    uris = ["file:/x y/f.parquet", "file:///x%20y/f.parquet",
            "file:/x%20y/f.parquet", "/x y/f.parquet"]
    got = (
        spark.createDataFrame([(u,) for u in uris], ["u"])
        .select(F.regexp_replace(
            _decoded_file_col(F.col("u")), "^file:/+", "/"
        ).alias("p"))
        .collect()
    )
    assert {r.p for r in got} == {"/x y/f.parquet"}


def test_typed_partition_values(spark, tmp_path):
    t = tmp_path / "delta_typed"
    log = t / "_delta_log"
    sz = _write_parquet(t / "f1.parquet", [{"v": "a"}])
    sch = _schema_str([("v", "string"), ("d", "date"), ("n", "integer"),
                       ("b", "boolean")])
    _commit(log, 0, [
        _P1, _meta(sch, parts=["d", "n", "b"]),
        {"add": {"path": "f1.parquet",
                 "partitionValues": {"d": "2026-08-16", "n": "7",
                                     "b": "true"},
                 "size": sz, "modificationTime": 0, "dataChange": True}},
    ])
    r = read_delta_table(spark, str(t)).collect()[0]
    import datetime as dt

    assert (r.d, r.n, r.b) == (dt.date(2026, 8, 16), 7, True)
    # typed driver-side comparison prunes on the date partition
    assert delta_table_files(
        str(t), prune=[("d", dt.date(2026, 9, 1), None)]) == []
    assert len(delta_table_files(
        str(t), prune=[("n", 7, 7)])) == 1
    assert delta_table_files(str(t), prune=[("n", 8, None)]) == []


def test_schema_evolution_nulls_missing_columns(spark, tmp_path):
    t = tmp_path / "delta_evo"
    log = t / "_delta_log"
    sz1 = _write_parquet(t / "f1.parquet", [{"k": 1}])
    sz2 = _write_parquet(t / "f2.parquet", [{"k": 2, "extra": "e"}])
    _commit(log, 0, [_P1, _meta(_schema_str([("k", "long")])),
                     {"add": {"path": "f1.parquet", "partitionValues": {},
                              "size": sz1, "modificationTime": 0,
                              "dataChange": True}}])
    _commit(log, 1, [_meta(_schema_str([("k", "long"),
                                        ("extra", "string")])),
                     {"add": {"path": "f2.parquet", "partitionValues": {},
                              "size": sz2, "modificationTime": 0,
                              "dataChange": True}}])
    rows = {r.k: r.extra for r in read_delta_table(spark, str(t)).collect()}
    assert rows == {1: None, 2: "e"}  # pre-evolution file reads as NULL


def test_column_mapping_name_mode(spark, tmp_path):
    t = tmp_path / "delta_cm"
    log = t / "_delta_log"
    # physical parquet names differ from the logical schema
    sz = _write_parquet(t / "f1.parquet",
                        [{"col-aaa": 1, "col-bbb": "x"}])
    md = {
        "k": {"delta.columnMapping.id": 1,
              "delta.columnMapping.physicalName": "col-aaa"},
        "v": {"delta.columnMapping.id": 2,
              "delta.columnMapping.physicalName": "col-bbb"},
    }
    sch = _schema_str([("k", "long"), ("v", "string")], metadata=md)
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta(sch, conf={"delta.columnMapping.mode": "name"}),
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": sz,
                 "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta_table(spark, str(t))
    assert df.columns == ["k", "v"]
    assert df.collect()[0].asDict() == {"k": 1, "v": "x"}


def _write_parquet_ids(path: Path, rows: list[dict],
                       ids: dict[str, int], types: dict[str, str]):
    """Parquet with field ids in the footer (PARQUET:field_id), the
    id-mode resolution contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pa_t = {"long": pa.int64(), "string": pa.string()}
    schema = pa.schema([
        pa.field(n, pa_t[types[n]],
                 metadata={b"PARQUET:field_id": str(i).encode()})
        for n, i in ids.items()
    ])
    path.parent.mkdir(parents=True, exist_ok=True)
    t = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(t, path)
    return path.stat().st_size


_CMID_MD = {
    "k": {"delta.columnMapping.id": 1,
          "delta.columnMapping.physicalName": "col-aaa"},
    "v": {"delta.columnMapping.id": 2,
          "delta.columnMapping.physicalName": "col-bbb"},
}


def test_column_mapping_id_mode_resolves_by_footer_ids(spark, tmp_path):
    """Mode 'id' (r12): columns resolve by parquet footer FIELD IDS,
    not names — a file whose parquet names differ from the recorded
    physicalName (the case mode-name resolution cannot read) still
    reads correctly; files from different writer generations group
    into separate scans; an id absent from a file projects typed
    NULL."""
    t = tmp_path / "delta_cmid"
    log = t / "_delta_log"
    # gen-A file: parquet names are the physicalNames (Spark-written)
    sz1 = _write_parquet_ids(
        t / "f1.parquet", [{"col-aaa": 1, "col-bbb": "x"}],
        {"col-aaa": 1, "col-bbb": 2},
        {"col-aaa": "long", "col-bbb": "string"})
    # gen-B file: SAME ids under different parquet names (converted
    # estate) — only id resolution reads this one right
    sz2 = _write_parquet_ids(
        t / "f2.parquet", [{"zz_k": 2, "zz_v": "y"}],
        {"zz_k": 1, "zz_v": 2}, {"zz_k": "long", "zz_v": "string"})
    # gen-C file: id 2 missing entirely -> typed NULL for v
    sz3 = _write_parquet_ids(
        t / "f3.parquet", [{"only_k": 3}], {"only_k": 1},
        {"only_k": "long"})
    sch = _schema_str([("k", "long"), ("v", "string")],
                      metadata=_CMID_MD)
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta(sch, conf={"delta.columnMapping.mode": "id"}),
        *({"add": {"path": p, "partitionValues": {}, "size": z,
                   "modificationTime": 0, "dataChange": True}}
          for p, z in [("f1.parquet", sz1), ("f2.parquet", sz2),
                       ("f3.parquet", sz3)]),
    ])
    df = read_delta_table(spark, str(t))
    assert df.columns == ["k", "v"]
    rows = {r.k: r.v for r in df.collect()}
    assert rows == {1: "x", 2: "y", 3: None}


def test_column_mapping_id_mode_refuses_no_ids_file(spark, tmp_path):
    """A data file with NO footer field ids cannot resolve in id mode
    — refusing beats guessing by name."""
    t = tmp_path / "delta_cmid_bad"
    sz = _write_parquet(t / "f1.parquet", [{"col-aaa": 1,
                                            "col-bbb": "x"}])
    sch = _schema_str([("k", "long"), ("v", "string")],
                      metadata=_CMID_MD)
    _commit(t / "_delta_log", 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta(sch, conf={"delta.columnMapping.mode": "id"}),
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": sz, "modificationTime": 0,
                 "dataChange": True}},
    ])
    with pytest.raises(DeltaProtocolError, match="no parquet field"):
        read_delta_table(spark, str(t)).collect()


def test_protocol_gates(spark, tmp_path):
    sch = _schema_str([("k", "long")])
    t1 = tmp_path / "d1"
    _commit(t1 / "_delta_log", 0,
            [{"protocol": {"minReaderVersion": 4}}, _meta(sch)])
    with pytest.raises(DeltaProtocolError, match="minReaderVersion=4"):
        delta_snapshot(str(t1))
    t2 = tmp_path / "d2"
    _commit(t2 / "_delta_log", 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["someFutureFeature"]}},
        _meta(sch)])
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        delta_snapshot(str(t2))
    # supported features pass the gate
    t3 = tmp_path / "d3"
    sz = _write_parquet(t3 / "f1.parquet", [{"k": 1}])
    _commit(t3 / "_delta_log", 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["timestampNtz", "columnMapping"]}},
        _meta(sch),
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": sz,
                 "modificationTime": 0, "dataChange": True}}])
    assert read_delta_table(spark, str(t3)).count() == 1
    # non-parquet provider
    t4 = tmp_path / "d4"
    m = _meta(sch)
    m["metaData"]["format"]["provider"] = "csv"
    _commit(t4 / "_delta_log", 0, [_P1, m])
    with pytest.raises(DeltaProtocolError, match="'csv'"):
        delta_snapshot(str(t4))


def test_malformed_deletion_vector_raises(spark, tmp_path):
    """An undecodable DV must fail the READ loudly (a swallowed decode
    error would resurrect deleted rows); unknown storage types too."""
    t = tmp_path / "delta_dv"
    sz = _write_parquet(t / "f1.parquet", [{"k": 1}])
    _commit(t / "_delta_log", 0, [
        _P1, _meta(_schema_str([("k", "long")])),
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": sz,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {"storageType": "z", "pathOrInlineDv":
                                    "x", "offset": 1, "sizeInBytes": 40,
                                    "cardinality": 1}}},
    ])
    with pytest.raises(DeltaProtocolError, match="storageType"):
        read_delta_table(spark, str(t))
    # a truncated Z85 inline payload is loud too
    log = t / "_delta_log"
    acts = (log / f"{0:020d}.json").read_text().replace(
        '"storageType": "z"', '"storageType": "i"')
    (log / f"{0:020d}.json").write_text(acts)
    with pytest.raises(DeltaProtocolError, match="Z85"):
        read_delta_table(spark, str(t))


def test_absolute_path_adds(spark, tmp_path):
    # shallow-clone shape: the add points OUTSIDE the table root
    src = tmp_path / "elsewhere"
    sz = _write_parquet(src / "f1.parquet", [{"k": 42}])
    t = tmp_path / "delta_abs"
    _commit(t / "_delta_log", 0, [
        _P1, _meta(_schema_str([("k", "long")])),
        {"add": {"path": "file://" + str(src / "f1.parquet"),
                 "partitionValues": {}, "size": sz,
                 "modificationTime": 0, "dataChange": True}},
    ])
    assert read_delta_table(spark, str(t)).collect()[0].k == 42


def test_checkpoint_replaces_missing_commits(spark, tmp_path):
    """After log cleanup only the checkpoint + later commits survive —
    the reader must snapshot from the checkpoint, and a hole BELOW the
    target version without a covering checkpoint must raise."""
    t = _simple_table(tmp_path)
    # hand-write a classic checkpoint for version 1 via pyarrow
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = delta_snapshot(str(t), 1)
    log = t / "_delta_log"
    add_rows = [None, None] + [
        {**a, "partitionValues": list((a.get("partitionValues") or
                                       {}).items()),
         "stats": a.get("stats")}
        for a in snap["adds"].values()
    ]
    n = len(add_rows)
    table = pa.Table.from_pydict({
        "protocol": [snap["protocol"]] + [None] * (n - 1),
        "metaData": [None, {
            "id": snap["metaData"]["id"],
            "format": {"provider": "parquet", "options": []},
            "schemaString": snap["metaData"]["schemaString"],
            "partitionColumns": [],
            "configuration": [],
        }] + [None] * (n - 2),
        "add": add_rows,
    }, schema=pa.schema([
        ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                ("minWriterVersion", pa.int32())])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", pa.map_(pa.string(),
                                                      pa.string()))])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string()))])),
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string())])),
    ]))
    pq.write_table(table, log / f"{1:020d}.checkpoint.parquet")
    (log / "_last_checkpoint").write_text(json.dumps({"version": 1,
                                                      "size": n}))
    os.remove(log / f"{0:020d}.json")
    os.remove(log / f"{1:020d}.json")
    head = read_delta_table(spark, str(t))  # checkpoint + commit 2
    assert sorted(r.k for r in head.collect()) == [3, 4]
    # version 0 needs commit 0, which is gone and below the checkpoint
    with pytest.raises(FileNotFoundError, match="commit 0"):
        delta_snapshot(str(t), 0)


_V2_UUID = "0a1b2c3d-4e5f-4a6b-8c7d-9e0f1a2b3c4d"


def _sidecar_schema():
    import pyarrow as pa

    return pa.schema([
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string())])),
    ])


def _write_v2_checkpoint(t: Path, v: int, fmt: str = "json",
                         inline: bool = False,
                         cm_version: int | None = None,
                         omit_cm: bool = False) -> None:
    """A spec-shaped v2 checkpoint at version ``v`` from the live
    snapshot: json or parquet manifest, adds in a _sidecars parquet
    (default) or inline."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = delta_snapshot(str(t), v)
    log = t / "_delta_log"
    adds = [
        {"path": a["path"],
         "partitionValues": a.get("partitionValues") or {},
         "size": a["size"], "modificationTime": 0, "dataChange": True,
         "stats": a.get("stats")}
        for a in snap["adds"].values()
    ]
    meta = {
        "id": snap["metaData"]["id"],
        "format": {"provider": "parquet", "options": {}},
        "schemaString": snap["metaData"]["schemaString"],
        "partitionColumns":
            snap["metaData"].get("partitionColumns") or [],
        "configuration": {},
    }
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"],
             "writerFeatures": ["v2Checkpoint"]}
    cm = {"version": v if cm_version is None else cm_version}
    side_rel = f"{_V2_UUID}.parquet"
    if not inline:
        (log / "_sidecars").mkdir(exist_ok=True)
        side_rows = [
            {"add": {**a, "partitionValues":
                     list(a["partitionValues"].items())}}
            for a in adds
        ]
        pq.write_table(
            pa.Table.from_pylist(side_rows, schema=_sidecar_schema()),
            log / "_sidecars" / side_rel,
        )
    sidecar = {"path": side_rel,
               "sizeInBytes": 0 if inline else
               (log / "_sidecars" / side_rel).stat().st_size,
               "modificationTime": 0}
    name = f"{v:020d}.checkpoint.{_V2_UUID}.{fmt}"
    if fmt == "json":
        lines = [] if omit_cm else [{"checkpointMetadata": cm}]
        lines += [{"protocol": proto}, {"metaData": meta}]
        lines += ([{"add": a} for a in adds] if inline
                  else [{"sidecar": sidecar}])
        (log / name).write_text(
            "".join(json.dumps(ln) + "\n" for ln in lines)
        )
    else:
        rows = [] if omit_cm else [{"checkpointMetadata": cm}]
        rows += [{"protocol": proto},
                 {"metaData": {**meta, "configuration": []}}]
        rows += ([{"add": {**a, "partitionValues":
                           list(a["partitionValues"].items())}}
                  for a in adds] if inline else [{"sidecar": sidecar}])
        schema = pa.schema([
            ("checkpointMetadata", pa.struct([("version", pa.int64())])),
            ("protocol", pa.struct([
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string()))])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([
                    ("provider", pa.string()),
                    ("options", pa.map_(pa.string(), pa.string()))])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string()))])),
            ("add", _sidecar_schema().field("add").type),
            ("sidecar", pa.struct([
                ("path", pa.string()),
                ("sizeInBytes", pa.int64()),
                ("modificationTime", pa.int64())])),
        ])
        pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                       log / name)
    (log / "_last_checkpoint").write_text(json.dumps({"version": v}))


@pytest.mark.parametrize("fmt,inline", [("json", False),
                                        ("parquet", False),
                                        ("json", True),
                                        ("parquet", True)])
def test_v2_checkpoint_reads(spark, tmp_path, fmt, inline):
    """V2 spec checkpoints (Delta 3.x default on new tables): json and
    parquet manifests, adds inline or via _sidecars parquet — after
    log cleanup the v2-checkpoint-only log reads version-for-version
    equal to what commit replay produced."""
    t = _simple_table(tmp_path)
    # ground truth from pure commit replay, before any cleanup
    want_v1 = sorted(r.k for r in
                     read_delta_table(spark, str(t), version=1).collect())
    want_head = sorted(r.k for r in
                       read_delta_table(spark, str(t)).collect())
    _write_v2_checkpoint(t, 1, fmt=fmt, inline=inline)
    log = t / "_delta_log"
    os.remove(log / f"{0:020d}.json")
    os.remove(log / f"{1:020d}.json")  # classic checkpoints "cleaned"
    assert sorted(
        r.k for r in read_delta_table(spark, str(t), version=1).collect()
    ) == want_v1 == [1, 2, 3, 4]
    assert sorted(
        r.k for r in read_delta_table(spark, str(t)).collect()
    ) == want_head == [3, 4]
    # below the checkpoint with commits gone still raises
    with pytest.raises(FileNotFoundError, match="commit 0"):
        delta_snapshot(str(t), 0)
    # discovery also works without the _last_checkpoint pointer
    os.remove(log / "_last_checkpoint")
    assert sorted(
        r.k for r in read_delta_table(spark, str(t)).collect()
    ) == [3, 4]


def test_v2_checkpoint_honesty_gates(spark, tmp_path):
    t = _simple_table(tmp_path)
    log = t / "_delta_log"
    # a manifest without the REQUIRED checkpointMetadata action
    _write_v2_checkpoint(t, 1, omit_cm=True)
    with pytest.raises(DeltaProtocolError, match="checkpointMetadata"):
        delta_snapshot(str(t), 1)
    os.remove(log / f"{1:020d}.checkpoint.{_V2_UUID}.json")
    # a manifest whose checkpointMetadata disagrees with its name
    _write_v2_checkpoint(t, 1, cm_version=7)
    with pytest.raises(DeltaProtocolError, match="corrupt"):
        delta_snapshot(str(t), 1)
    os.remove(log / f"{1:020d}.checkpoint.{_V2_UUID}.json")
    # a sidecar pointer whose file is gone
    _write_v2_checkpoint(t, 1)
    os.remove(log / "_sidecars" / f"{_V2_UUID}.parquet")
    with pytest.raises(DeltaProtocolError, match="missing"):
        delta_snapshot(str(t), 1)


def test_multipart_checkpoint(spark, tmp_path):
    """Classic multi-part checkpoints: parts are read and an
    incomplete set raises."""
    t = tmp_path / "delta_mp"
    log = t / "_delta_log"
    sz1 = _write_parquet(t / "f1.parquet", [{"k": 1}])
    sz2 = _write_parquet(t / "f2.parquet", [{"k": 2}])
    sch = _schema_str([("k", "long")])
    import pyarrow as pa
    import pyarrow.parquet as pq

    def part(rows, name):
        schema = pa.schema([
            ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                    ("minWriterVersion", pa.int32())])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([
                    ("provider", pa.string()),
                    ("options", pa.map_(pa.string(), pa.string()))])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string()))])),
            ("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_())])),
        ])
        pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                       log / name)

    log.mkdir(parents=True)
    part([
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": []},
                      "schemaString": sch, "partitionColumns": [],
                      "configuration": []},
         "add": None},
    ], f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet")
    part([
        {"protocol": None, "metaData": None,
         "add": {"path": "f1.parquet", "partitionValues": [],
                 "size": sz1, "modificationTime": 0, "dataChange": True}},
        {"protocol": None, "metaData": None,
         "add": {"path": "f2.parquet", "partitionValues": [],
                 "size": sz2, "modificationTime": 0, "dataChange": True}},
    ], f"{0:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
    (log / "_last_checkpoint").write_text(json.dumps({"version": 0,
                                                      "parts": 2}))
    assert sorted(
        r.k for r in read_delta_table(spark, str(t)).collect()
    ) == [1, 2]
    os.remove(log / f"{0:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
    with pytest.raises(DeltaProtocolError, match="1/2 parts"):
        delta_snapshot(str(t))


def test_history(tmp_path):
    t = _simple_table(tmp_path)
    h = delta_history(str(t))
    assert [r["version"] for r in h] == [2, 1, 0]
    assert h[0]["timestamp"] == 3_000_000
    assert h[0]["operation"] == "TEST"


# ---------------------------------------------------------- round trip


def _roundtrip(spark, path):
    n = export_delta_log(spark, str(path))
    ours_versions = V.list_versions(str(path))
    assert n == len(ours_versions)
    for i, v in enumerate(ours_versions):
        ours = V.read_table_version(spark, str(path), v)
        theirs = read_delta_table(spark, str(path), version=i)
        assert sorted(theirs.columns) == sorted(ours.columns)
        a = sorted(map(tuple, ours.collect()))
        b = sorted(map(tuple,
                       theirs.select(*ours.columns).collect()))
        assert a == b, f"our v{v} != delta {i}"


def test_export_roundtrip_partitioned(spark, tmp_path):
    t = tmp_path / "vt"
    df1 = spark.range(20).selectExpr(
        "id as k", "id * 2 as v", "cast(id % 3 as string) as p")
    V.write_table_version(df1, str(t), partition_by="p", stats_cols=["k"])
    df2 = spark.range(6).selectExpr(
        "id + 17 as k", "id * 100 as v", "cast(id % 3 as string) as p")
    V.upsert_table_version(spark, t and str(t), df2, keys=["k"],
                           partition_by="p")
    V.delete_table_version(spark, str(t), "k = 5")
    _roundtrip(spark, t)
    # partition column dtype matches the versioned read exactly (Spark
    # partition inference types "p=0" dirs as int on BOTH paths)
    df = read_delta_table(spark, str(t))
    ours = V.read_table_version(spark, str(t))
    assert dict(df.dtypes)["p"] == dict(ours.dtypes)["p"]
    # commitInfo carries the source-version mapping
    h = delta_history(str(t))
    assert [r["operationParameters"]["sourceVersion"] for r in h] == \
        ["3", "2", "1"]


def test_export_roundtrip_unpartitioned_and_checkpoint(spark, tmp_path):
    t = tmp_path / "vt2"
    V.write_table_version(
        spark.range(10).selectExpr("id as k", "id * 3 as v"),
        str(t), stats_cols=["k"])
    V.update_table_version(spark, str(t), "k >= 5", {"v": "v + 1"})
    _roundtrip(spark, t)
    # the exporter wrote a checkpoint: a JSON-less log still reads
    log = t / "_delta_log"
    for f in log.iterdir():
        if f.suffix == ".json" and f.stem.isdigit():
            f.unlink()
    head = read_delta_table(spark, str(t))
    ours = V.read_table_version(spark, str(t))
    assert sorted(map(tuple, head.select(*ours.columns).collect())) == \
        sorted(map(tuple, ours.collect()))


def test_export_roundtrip_column_mapped(spark, tmp_path):
    t = tmp_path / "vt3"
    V.write_table_version(
        spark.range(8).selectExpr("id as k", "id * 2 as v"),
        str(t), stats_cols=["k"])
    V.rename_columns(spark, str(t), {"v": "value"})
    V.upsert_table_version(
        spark, str(t),
        spark.range(3).selectExpr("id + 6 as k", "id * 9 as value"),
        keys=["k"])
    _roundtrip(spark, t)
    snap = delta_snapshot(str(t))
    assert (snap["metaData"]["configuration"]
            ["delta.columnMapping.mode"]) == "name"
    assert snap["protocol"]["minReaderVersion"] == 2
    # logical rename visible, physical parquet names untouched
    assert read_delta_table(spark, str(t)).columns == ["k", "value"]


def test_export_mor_as_deletion_vectors(spark, tmp_path):
    """Outstanding MoR debt exports as real Delta deletion vectors:
    positional sidecars re-encode as RoaringBitmapArray descriptors,
    the mask applies per exported version, and a later re-insert of
    masked content is NOT masked (the DV belongs to the old file)."""
    t = tmp_path / "vt4"
    V.write_table_version(
        spark.range(8).selectExpr("id as k", "id * 3 as v"), str(t))
    V.delete_table_version(spark, str(t), "k = 2", mode="mor")
    V.update_table_version(spark, str(t), "k = 5", {"v": "99"},
                           mode="mor")
    # re-adds k=2 content in a NEW file: must not be masked (the
    # upsert also folds the earlier sidecars — carried debt drops
    # when its files rewrite, exactly like read_table_version)
    V.upsert_table_version(
        spark, str(t),
        spark.createDataFrame([(2, 6)], "k long, v long"), keys=["k"])
    # head carries live debt so the checkpoint must encode it too
    V.delete_table_version(spark, str(t), "k = 1", mode="mor")
    _roundtrip(spark, t)
    snap = delta_snapshot(str(t))
    assert snap["protocol"]["minReaderVersion"] == 3
    assert "deletionVectors" in snap["protocol"]["readerFeatures"]
    assert (snap["metaData"]["configuration"]
            ["delta.enableDeletionVectors"]) == "true"
    descs = [a["deletionVector"] for a in snap["adds"].values()
             if a.get("deletionVector")]
    assert descs, "head snapshot lost its deletion vectors"
    head = {(r.k, r.v)
            for r in read_delta_table(spark, str(t)).collect()}
    assert (2, 6) in head      # re-added content survives
    assert (5, 99) in head     # MoR update's new image
    assert (5, 15) not in head  # old image masked
    assert (1, 3) not in head  # the head MoR delete applies
    # the exporter's checkpoint carries the DVs: a JSON-less log
    # still reads with masks applied
    log = t / "_delta_log"
    for f in log.iterdir():
        if f.suffix == ".json" and f.stem.isdigit():
            f.unlink()
    ours = V.read_table_version(spark, str(t))
    theirs = read_delta_table(spark, str(t))
    assert sorted(map(tuple, theirs.select(*ours.columns).collect())) \
        == sorted(map(tuple, ours.collect()))


def test_export_mor_on_disk_dv_and_compaction(spark, tmp_path):
    """A mask too big to inline goes to a deletion_vector_*.bin
    sidecar with the spec framing (CRC verified on read), and a later
    compaction folds the debt — the re-added clean files carry no
    descriptor."""
    t = tmp_path / "vt4b"
    V.write_table_version(
        spark.range(6000).selectExpr("id as k", "id as v")
        .coalesce(1), str(t))
    V.delete_table_version(spark, str(t), "k % 2 = 0", mode="mor",
                           mor_max_rows=10_000)
    V.compact_table_version(spark, str(t))
    _roundtrip(spark, t)
    # delta version 1 (the MoR delete) used an on-disk 'u' DV
    from etl_rust_spark.deltalake import _commit_actions

    adds = [a["add"] for a in _commit_actions(str(t), 1)
            if a.get("add")]
    dv = next(a["deletionVector"] for a in adds
              if a.get("deletionVector"))
    assert dv["storageType"] == "u"
    assert dv["cardinality"] == 3000
    assert list(Path(t).glob("deletion_vector_*.bin"))
    # the compacted head has no DV state left
    snap = delta_snapshot(str(t))
    assert not any(a.get("deletionVector")
                   for a in snap["adds"].values())


def test_export_mor_refuses_fingerprint_only_sidecar(spark, tmp_path):
    """Pre-r11 sidecars carry no row positions — nothing a deletion
    vector can encode; the compact remediation is named."""
    import pyarrow.parquet as pq

    t = tmp_path / "vt4c"
    V.write_table_version(
        spark.range(10).selectExpr("id as k", "id as v"), str(t))
    V.delete_table_version(spark, str(t), "k = 3", mode="mor")
    side = V._load_manifest(str(t), 2)["deletes"][0]["path"]
    sp = Path(t) / "data" / side
    pq.write_table(pq.read_table(sp, columns=["_fp"]), sp)
    with pytest.raises(ValueError, match="compact"):
        export_delta_log(spark, str(t))


def test_export_mor_resume_protocol_upgrade(spark, tmp_path):
    """A clean export resumed after MoR commits upgrades the protocol
    to table features mid-log and masks from the upgrade commit on."""
    t = tmp_path / "vt4d"
    V.write_table_version(
        spark.range(10).selectExpr("id as k", "id * 2 as v"), str(t))
    assert export_delta_log(spark, str(t)) == 1
    snap0 = delta_snapshot(str(t))
    assert snap0["protocol"]["minReaderVersion"] == 1
    V.delete_table_version(spark, str(t), "k = 4", mode="mor")
    V.delete_table_version(spark, str(t), "k = 7", mode="mor")
    assert export_delta_log(spark, str(t), resume=True) == 2
    snap = delta_snapshot(str(t))
    assert snap["protocol"]["minReaderVersion"] == 3
    for i, v in enumerate(V.list_versions(str(t))):
        ours = V.read_table_version(spark, str(t), v)
        theirs = read_delta_table(spark, str(t), version=i)
        assert sorted(map(tuple,
                          theirs.select(*ours.columns).collect())) \
            == sorted(map(tuple, ours.collect())), (v, i)


def test_roaring_serialize_decode_parity():
    """The DV encoder round-trips through this module's own decoder
    across every container form: array, dense bitmap (>4096 values in
    one 16-bit key space), and multi-bitmap (>2^32 positions) with an
    EMPTY implicit bitmap in the gap."""
    from etl_rust_spark.deltalake import (
        _roaring_array_positions,
        _serialize_roaring_array,
    )

    cases = [
        [],
        [0],
        [5, 70_000, 70_001],            # two 16-bit containers
        list(range(10_000)),            # dense → bitmap container
        [3, (2 << 32) + 7],             # gap bitmap 1 is empty
        [65_535, 65_536, (1 << 32) - 1, 1 << 32],
    ]
    for positions in cases:
        data = _serialize_roaring_array(sorted(positions))
        assert _roaring_array_positions(data) == sorted(positions), \
            positions


def test_z85_encode_decode_parity():
    from etl_rust_spark.deltalake import _z85_decode, _z85_encode

    for raw in [b"", b"\x00", b"abc", b"abcd", b"abcdefgh",
                bytes(range(37))]:
        enc = _z85_encode(raw)
        assert len(enc) % 5 == 0
        dec = _z85_decode(enc)
        assert dec[: len(raw)] == raw
        assert not any(dec[len(raw):])  # zero padding only


def test_export_transform_as_generated_partition_column(spark, tmp_path):
    """Hidden transforms export as GENERATED partition columns (r12):
    the synthetic column joins the schema with an exact Spark-SQL
    generationExpression, partitionValues carry the directory value,
    and per-version reads round-trip; the generation expression is
    pinned row-for-row against the engine's own routing expression
    for every transform kind."""
    import json as _json
    from pathlib import Path as _P

    from pyspark.sql import functions as F

    from etl_rust_spark.versions.layout import _transform_expr

    for name, pb, mk in [
        ("days", ("days", "ts"), lambda: spark.range(10).selectExpr(
            "id as k",
            "timestamp_micros(cast(id * 86400e6 as long)) as ts")),
        ("hours", ("hours", "ts"), lambda: spark.range(10).selectExpr(
            "id as k",
            "timestamp_micros(cast(id * 3700e6 as long)) as ts")),
        ("bucket", ("bucket", "k", 4), lambda: spark.range(16)
            .selectExpr("id as k", "concat('u', id) as u")),
        ("truncate", ("truncate", "u", 2), lambda: spark.range(9)
            .selectExpr("id as k", "concat('ab', id) as u")),
    ]:
        t = str(tmp_path / f"vt5_{name}")
        V.write_table_version(mk(), t, partition_by=pb)
        V.delete_table_version(spark, t, "k = 1", mode="mor")
        n = export_delta_log(spark, t)
        assert n == 2
        log0 = sorted(_P(t, "_delta_log").glob("*.json"))[0]
        acts = [_json.loads(x) for x in log0.read_text().splitlines()]
        proto = next(a["protocol"] for a in acts if "protocol" in a)
        assert "generatedColumns" in proto["writerFeatures"]
        assert "generatedColumns" not in (
            proto.get("readerFeatures") or [])
        meta = next(a["metaData"] for a in acts if "metaData" in a)
        synth = meta["partitionColumns"][0]
        assert synth.startswith("_p_")
        fld = [f for f in _json.loads(meta["schemaString"])["fields"]
               if f["name"] == synth][0]
        expr = fld["metadata"]["delta.generationExpression"]
        m = V._load_manifest(t, 1)
        base = V.read_table_version(spark, t, 1)
        assert base.select(
            F.expr(expr).alias("a"),
            _transform_expr(m["partition_transform"]).alias("b"),
        ).filter("a <> b").count() == 0
        add = next(a["add"] for a in acts if "add" in a)
        assert synth in add["partitionValues"]
        for i, vv in enumerate(V.list_versions(t)):
            ours_df = V.read_table_version(spark, t, vv)
            cols = ours_df.columns
            ours = sorted(map(tuple, ours_df.collect()))
            got = sorted(map(tuple, read_delta_table(
                spark, t, version=i).select(*cols).collect()))
            assert ours == got, f"{name} mismatch at v{vv}"


def test_export_refuses_double_export(spark, tmp_path):
    t = tmp_path / "vt6"
    V.write_table_version(spark.range(3).selectExpr("id as k"), str(t))
    export_delta_log(spark, str(t))
    with pytest.raises(FileExistsError, match="already holds"):
        export_delta_log(spark, str(t))


def test_export_stats_prune_parity(spark, tmp_path):
    """Exported add.stats prune the same way the manifest stats do."""
    t = tmp_path / "vt7"
    df = spark.range(100).selectExpr(
        "id as k", "cast(id % 10 as string) as p")
    V.write_table_version(df, str(t), partition_by="p", stats_cols=["k"])
    export_delta_log(spark, str(t))
    allf = delta_table_files(str(t))
    # partition inference types the "p=3" dirs as int on both paths,
    # so typed bounds are ints; a mistyped (string) bound must KEEP
    # everything rather than throw or wrongly prune
    hit = delta_table_files(str(t), prune=[("p", 3, 3)])
    assert 0 < len(hit) < len(allf)
    assert len(delta_table_files(str(t), prune=[("p", "3", "3")])) == \
        len(allf)
    got = read_delta_table(spark, str(t), prune=[("p", 3, 3)])
    got = got.where("p = 3")
    assert sorted(r.k for r in got.collect()) == sorted(
        range(3, 100, 10))


# -------------------------------------------------------------- CLI


def test_cli_export_and_read_delta(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    feed1, feed2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    spark.range(10).selectExpr("id as k", "id * 2 as v").write.parquet(feed1)
    spark.range(4).selectExpr("id + 8 as k", "id * 9 as v").write.parquet(
        feed2)
    table = str(tmp_path / "vt_cli")
    assert main(["table", table, "--snapshot", feed1]) == 0
    assert main(["table", table, "--upsert", feed2, "--keys", "k"]) == 0
    capsys.readouterr()
    assert main(["table", table, "--export-delta"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["delta_commits"] == 2
    out = str(tmp_path / "delta_read")
    assert main(["table", table, "--read-delta", "0", "--out", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 10
    back = spark.read.parquet(out)
    ours = V.read_table_version(spark, table, 1)
    assert sorted(map(tuple, back.select(*ours.columns).collect())) == \
        sorted(map(tuple, ours.collect()))
    # latest + the read_rows report
    assert main(["table", table, "--read-delta", "latest",
                 "--out", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 12


# ---------------------------------------------------- deletion vectors


def _roaring_serialize(values):
    """Test-side 32-bit roaring serializer (RoaringFormatSpec portable,
    no-run cookie) — structurally independent of the module's decoder;
    both are pinned to the spec by test_roaring_pinned_bytes."""
    import struct as st
    from collections import defaultdict

    conts = defaultdict(list)
    for v in sorted(set(values)):
        conts[v >> 16].append(v & 0xFFFF)
    keys = sorted(conts)
    n = len(keys)
    out = bytearray(st.pack("<I", 12346) + st.pack("<I", n))
    for k in keys:
        out += st.pack("<HH", k, len(conts[k]) - 1)
    off = 4 + 4 + 4 * n + 4 * n
    for k in keys:
        out += st.pack("<I", off)
        c = len(conts[k])
        off += 8192 if c > 4096 else 2 * c
    for k in keys:
        c = conts[k]
        if len(c) > 4096:
            words = [0] * 1024
            for v in c:
                words[v >> 6] |= 1 << (v & 63)
            out += st.pack("<1024Q", *words)
        else:
            out += st.pack(f"<{len(c)}H", *c)
    return bytes(out)


def _rba_serialize(positions):
    """Delta RoaringBitmapArray portable form (implicit bitmap keys)."""
    import struct as st
    from collections import defaultdict

    groups = defaultdict(list)
    for p in positions:
        groups[p >> 32].append(p & 0xFFFFFFFF)
    nb = (max(groups) + 1) if groups else 0
    out = bytearray(st.pack("<i", 1681511377) + st.pack("<q", nb))
    for i in range(nb):
        out += _roaring_serialize(groups.get(i, []))
    return bytes(out)


def _z85_encode(b: bytes) -> str:
    from etl_rust_spark.deltalake import _Z85_ALPHABET

    assert len(b) % 4 == 0
    s = ""
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i:i + 4], "big")
        chunk = ""
        for _ in range(5):
            chunk = _Z85_ALPHABET[acc % 85] + chunk
            acc //= 85
        s += chunk
    return s


def _inline_dv(positions):
    data = _rba_serialize(positions)
    pad = (-len(data)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": _z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": len(set(positions)),
    }


def _dv_file(table: Path, dv_datas: list[bytes], prefix: str = ""):
    """One on-disk DV file holding several DVs; returns descriptors."""
    import struct as st
    import uuid as _uuid
    import zlib

    u = _uuid.uuid4()
    d = table / prefix if prefix else table
    d.mkdir(parents=True, exist_ok=True)
    fp = d / f"deletion_vector_{u}.bin"
    raw = bytearray(b"\x01")
    descs = []
    for data in dv_datas:
        off = len(raw)
        raw += st.pack(">i", len(data)) + data
        raw += st.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descs.append({
            "storageType": "u",
            "pathOrInlineDv": prefix + _z85_encode(u.bytes),
            "offset": off,
            "sizeInBytes": len(data),
            "cardinality": None,  # caller fills
        })
    fp.write_bytes(bytes(raw))
    return fp, descs


def test_roaring_pinned_bytes():
    """Pin BOTH sides to the spec with hand-computed bytes for the
    bitmap {1, 3}: no-run cookie 12346, one container (key 0,
    cardinality 2), one offset, array container values 1 and 3."""
    from etl_rust_spark.deltalake import _roaring_bitmap_positions

    expected = bytes.fromhex(
        "3a300000" "01000000" "0000" "0100" "10000000" "0100" "0300"
    )
    assert _roaring_serialize([1, 3]) == expected
    vals, pos = _roaring_bitmap_positions(expected, 0)
    assert vals == [1, 3] and pos == len(expected)


def test_rba_positions_above_32_bits():
    from etl_rust_spark.deltalake import _roaring_array_positions

    data = _rba_serialize([5, (1 << 32) + 7])
    assert _roaring_array_positions(data) == [5, (1 << 32) + 7]


def test_dv_inline(spark, tmp_path):
    """Inline ('i') DV masks exactly its positions; time travel to the
    pre-DV commit still sees every row."""
    t = tmp_path / "delta_dv_i"
    log = t / "_delta_log"
    import pyarrow as pa
    import pyarrow.parquet as pq

    fp = t / "f1.parquet"
    fp.parent.mkdir(parents=True)
    pq.write_table(
        pa.Table.from_pylist([{"k": i} for i in range(6)]), fp)
    sz = fp.stat().st_size
    sch = _schema_str([("k", "long")])
    base = {"path": "f1.parquet", "partitionValues": {}, "size": sz,
            "modificationTime": 0, "dataChange": True}
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(sch), {"add": base}])
    _commit(log, 1, [
        {"add": {**base, "deletionVector": _inline_dv([1, 3])}}])
    head = read_delta_table(spark, str(t))
    assert sorted(r.k for r in head.collect()) == [0, 2, 4, 5]
    v0 = read_delta_table(spark, str(t), version=0)
    assert sorted(r.k for r in v0.collect()) == [0, 1, 2, 3, 4, 5]


def test_dv_on_disk_with_prefix_and_offsets(spark, tmp_path):
    """Two DVs share one 'u'-style .bin under a random prefix; each
    file's DV masks its own rows.  A corrupted byte fails the CRC."""
    t = tmp_path / "delta_dv_u"
    log = t / "_delta_log"
    import pyarrow as pa
    import pyarrow.parquet as pq

    t.mkdir(parents=True)
    for name, n in (("f1.parquet", 4), ("f2.parquet", 3)):
        pq.write_table(
            pa.Table.from_pylist([{"k": i} for i in range(n)]), t / name)
    fp, descs = _dv_file(
        t, [_rba_serialize([0]), _rba_serialize([1, 2])], prefix="ab")
    descs[0]["cardinality"] = 1
    descs[1]["cardinality"] = 2
    sch = _schema_str([("k", "long")])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta(sch),
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": descs[0]}},
        {"add": {"path": "f2.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": descs[1]}},
    ])
    # f1 loses row 0 -> {1,2,3}; f2 loses rows 1,2 -> {0}
    assert sorted(r.k for r in
                  read_delta_table(spark, str(t)).collect()) == \
        [0, 1, 2, 3]
    # corrupt one bitmap byte: CRC must catch it
    raw = bytearray(fp.read_bytes())
    raw[6] ^= 0xFF
    fp.write_bytes(bytes(raw))
    with pytest.raises(DeltaProtocolError, match="checksum"):
        read_delta_table(spark, str(t)).collect()


def test_dv_bitmap_and_run_containers(spark, tmp_path):
    """Cardinality > 4096 exercises the 8 KB bitmap container; a hand-
    built run container (cookie 12347) decodes too."""
    import struct as st

    from etl_rust_spark.deltalake import _roaring_bitmap_positions

    # run container: values 10..20 as one run
    run = (st.pack("<I", 12347 | ((1 - 1) << 16)) + b"\x01"
           + st.pack("<HH", 0, 10)      # key 0, cardinality-1 = 10
           + st.pack("<H", 1)            # one run
           + st.pack("<HH", 10, 10))     # start 10, length 10
    vals, _ = _roaring_bitmap_positions(run, 0)
    assert vals == list(range(10, 21))

    t = tmp_path / "delta_dv_big"
    log = t / "_delta_log"
    import pyarrow as pa
    import pyarrow.parquet as pq

    t.mkdir(parents=True)
    n = 6000
    pq.write_table(
        pa.Table.from_pylist([{"k": i} for i in range(n)]),
        t / "f1.parquet")
    dead = list(range(5000))  # > 4096 -> bitmap container
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta(_schema_str([("k", "long")])),
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": _inline_dv(dead)}},
    ])
    got = sorted(r.k for r in read_delta_table(spark, str(t)).collect())
    assert got == list(range(5000, 6000))


def test_dv_partitioned_composes(spark, tmp_path):
    """DV anti-join composes with partition-value injection."""
    t = tmp_path / "delta_dv_part"
    log = t / "_delta_log"
    import pyarrow as pa
    import pyarrow.parquet as pq

    (t / "p=x").mkdir(parents=True)
    pq.write_table(
        pa.Table.from_pylist([{"k": i} for i in range(4)]),
        t / "p=x" / "f1.parquet")
    sch = _schema_str([("k", "long"), ("p", "string")])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta(sch, parts=["p"]),
        {"add": {"path": "p=x/f1.parquet", "partitionValues": {"p": "x"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": _inline_dv([0, 2])}},
    ])
    rows = sorted((r.k, r.p) for r in
                  read_delta_table(spark, str(t)).collect())
    assert rows == [(1, "x"), (3, "x")]


# -------------------------------------------------------------- importer


def test_import_delta_history(spark, tmp_path):
    """Import a hand-built Delta log into a fresh versioned chain:
    version-for-version content parity, timestamps carried for AS OF,
    stats usable by the metadata-only count(*)."""
    from etl_rust_spark.deltalake import import_delta_log

    t = _simple_table(tmp_path)
    dest = str(tmp_path / "vt_imported")
    n = import_delta_log(spark, str(t), dest)
    assert n == 3
    assert V.list_versions(dest) == [1, 2, 3]
    for dv, ours_v in ((0, 1), (1, 2), (2, 3)):
        theirs = read_delta_table(spark, str(t), version=dv)
        ours = V.read_table_version(spark, dest, ours_v)
        assert sorted(map(tuple, theirs.collect())) == \
            sorted(map(tuple, ours.select(*theirs.columns).collect()))
    # data files HARDLINKED, not copied
    src_f2 = t / "f2.parquet"
    dst_f2 = Path(dest) / "data" / "f2.parquet"
    assert src_f2.stat().st_ino == dst_f2.stat().st_ino
    # Delta's commit instants drive AS OF on the imported chain
    assert V.version_at_timestamp(dest, 2_500) == 2
    # carried add.stats serve the metadata-only count path
    assert V.aggregate_table_metadata(dest, ["count(*)"]) == \
        {"count(*)": 2}
    # history records the source Delta versions
    ops = [h["op"] for h in V.history(dest)]
    assert ops[0].startswith("import_delta(2)")


def test_import_dv_as_mor_sidecar(spark, tmp_path):
    """Live deletion vectors import as positional MoR sidecars (r12):
    every imported version reads masked exactly as Delta reads it,
    with zero data rewritten — pinned by exporting a MoR chain and
    importing it back (export -> import -> read parity per version)."""
    from etl_rust_spark.deltalake import import_delta_log

    t = tmp_path / "vt_dv_imp"
    V.write_table_version(
        spark.range(10).selectExpr("id as k", "id * 3 as v"), str(t))
    V.delete_table_version(spark, str(t), "k = 2", mode="mor")
    V.update_table_version(spark, str(t), "k = 7", {"v": "70"},
                           mode="mor")
    export_delta_log(spark, str(t))
    dest = str(tmp_path / "vt_dv_imp2")
    assert import_delta_log(spark, str(t), dest) == 3
    for i, v in enumerate(V.list_versions(str(t))):
        a = V.read_table_version(spark, str(t), v)
        b = V.read_table_version(spark, dest, i + 1)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.select(*a.columns).collect())), (v, i)
    # the import carried the debt as sidecars, not rewrites
    m = V._load_manifest(dest, 3)
    assert m["deletes"], "DV state should import as MoR sidecars"
    assert V.table_detail(dest)["delete_sidecar_bytes"] > 0


def test_import_dv_refuses_partial_duplicate_mask(spark, tmp_path):
    """A DV masking one of two identical rows has no fingerprint
    representation — the import refuses instead of over-deleting."""
    from etl_rust_spark.deltalake import import_delta_log

    t = tmp_path / "d_dv_dup"
    sz = _write_parquet(t / "f1.parquet",
                        [{"k": 1}, {"k": 1}, {"k": 2}])
    _commit(t / "_delta_log", 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta(_schema_str([("k", "long")])),
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": sz,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": _inline_dv([0])}},
    ])
    with pytest.raises(ValueError, match="duplicates"):
        import_delta_log(spark, str(t), str(tmp_path / "x1"))


def test_import_refuses_multipartition(spark, tmp_path):
    from etl_rust_spark.deltalake import import_delta_log

    t2 = tmp_path / "d_mp"
    sz = _write_parquet(t2 / "f1.parquet", [{"k": 1}])
    _commit(t2 / "_delta_log", 0, [
        _P1, _meta(_schema_str([("k", "long"), ("a", "string"),
                                ("b", "string")]), parts=["a", "b"]),
        {"add": {"path": "f1.parquet",
                 "partitionValues": {"a": "1", "b": "2"}, "size": sz,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="one partition column"):
        import_delta_log(spark, str(t2), str(tmp_path / "x2"))


def test_import_partitioned_hive_layout(spark, tmp_path):
    from etl_rust_spark.deltalake import import_delta_log

    t = tmp_path / "d_part"
    sz1 = _write_parquet(t / "p=x/f1.parquet", [{"k": 1}])
    sz2 = _write_parquet(t / "p=y/f2.parquet", [{"k": 2}])
    sch = _schema_str([("k", "long"), ("p", "string")])
    _commit(t / "_delta_log", 0, [
        _P1, _meta(sch, parts=["p"]),
        {"add": {"path": "p=x/f1.parquet", "partitionValues": {"p": "x"},
                 "size": sz1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "p=y/f2.parquet", "partitionValues": {"p": "y"},
                 "size": sz2, "modificationTime": 0, "dataChange": True}},
    ])
    dest = str(tmp_path / "vt_part")
    import_delta_log(spark, str(t), dest)
    ours = V.read_table_version(spark, dest)
    assert sorted((r.k, r.p) for r in ours.collect()) == \
        [(1, "x"), (2, "y")]
    # non-hive layout refuses
    t2 = tmp_path / "d_flat"
    sz = _write_parquet(t2 / "f1.parquet", [{"k": 1}])
    _commit(t2 / "_delta_log", 0, [
        _P1, _meta(sch, parts=["p"]),
        {"add": {"path": "f1.parquet", "partitionValues": {"p": "x"},
                 "size": sz, "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="hive-style"):
        import_delta_log(spark, str(t2), str(tmp_path / "x3"))


def test_roundtrip_export_import_export(spark, tmp_path):
    """versioned → Delta → versioned: the re-imported chain is
    content-equal version for version (history-preserving both ways)."""
    from etl_rust_spark.deltalake import import_delta_log

    src = str(tmp_path / "vt_src")
    V.write_table_version(
        spark.range(6).selectExpr("id as k", "id * 2 as v"), src,
        stats_cols=["k"])
    V.upsert_table_version(
        spark, src, spark.range(2).selectExpr("id + 5 as k",
                                              "id + 100 as v"),
        keys=["k"])
    export_delta_log(spark, src)
    dest = str(tmp_path / "vt_back")
    n = import_delta_log(spark, src, dest)
    assert n == 2
    for v in (1, 2):
        a = V.read_table_version(spark, src, v)
        b = V.read_table_version(spark, dest, v)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.select(*a.columns).collect()))


def test_cli_import_delta(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    t = _simple_table(tmp_path)
    dest = str(tmp_path / "vt_cli_import")
    assert main(["table", str(t), "--import-delta", dest]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["imported_versions"] == 3
    assert V.list_versions(dest) == [1, 2, 3]


def test_export_resume_publish_on_commit(spark, tmp_path):
    """Commit → export → commit more → export(resume=True): external
    Delta readers follow the chain; the seam diffs correctly, the
    checkpoint moves, table id and timestamps stay coherent."""
    src = str(tmp_path / "vt_pub")
    V.write_table_version(
        spark.range(4).selectExpr("id as k", "id * 2 as v"), src,
        stats_cols=["k"])
    assert export_delta_log(spark, src) == 1
    id0 = delta_snapshot(src)["metaData"]["id"]
    # two more versions while the export is stale
    V.upsert_table_version(
        spark, src, spark.range(2).selectExpr("id + 3 as k",
                                              "id + 50 as v"),
        keys=["k"])
    V.delete_table_version(spark, src, "k = 0")
    assert export_delta_log(spark, src, resume=True) == 2
    assert delta_latest_version(src) == 2
    assert delta_snapshot(src)["metaData"]["id"] == id0
    for i, v in enumerate(V.list_versions(src)):
        ours = V.read_table_version(spark, src, v)
        theirs = read_delta_table(spark, src, version=i)
        assert sorted(map(tuple, ours.collect())) == \
            sorted(map(tuple, theirs.select(*ours.columns).collect()))
    # idle resume is a no-op
    assert export_delta_log(spark, src, resume=True) == 0
    # the moved checkpoint serves a JSON-less read of the new head
    log = Path(src) / "_delta_log"
    assert (log / f"{2:020d}.checkpoint.parquet").exists()
    for f in log.iterdir():
        if f.suffix == ".json" and f.stem.isdigit():
            f.unlink()
    head = read_delta_table(spark, src)
    ours = V.read_table_version(spark, src)
    assert sorted(map(tuple, head.select(*ours.columns).collect())) == \
        sorted(map(tuple, ours.collect()))


def test_export_resume_column_mapping_upgrade(spark, tmp_path):
    """A plain export resumed after the table gained column mapping
    emits the protocol upgrade and keeps reading."""
    src = str(tmp_path / "vt_pub_cm")
    V.write_table_version(
        spark.range(3).selectExpr("id as k", "id as v"), src)
    export_delta_log(spark, src)
    V.rename_columns(spark, src, {"v": "val"})
    assert export_delta_log(spark, src, resume=True) == 1
    snap = delta_snapshot(src)
    assert snap["protocol"]["minReaderVersion"] == 2
    assert (snap["metaData"]["configuration"]
            ["delta.columnMapping.mode"]) == "name"
    df = read_delta_table(spark, src)
    assert df.columns == ["k", "val"]
    assert sorted(r.val for r in df.collect()) == [0, 1, 2]


def test_export_resume_refuses_foreign_log(spark, tmp_path):
    src = tmp_path / "vt_foreign"
    V.write_table_version(
        spark.range(2).selectExpr("id as k"), str(src))
    # a hand-made (non-exporter) log in place
    _commit(src / "_delta_log", 0, [
        _P1, _meta(_schema_str([("k", "long")]))])
    with pytest.raises(ValueError, match="foreign"):
        export_delta_log(spark, str(src), resume=True)


def test_export_and_read_empty_version(spark, tmp_path):
    """A delete-all version exports as a remove-only Delta commit and
    reads back as an empty typed frame on both sides."""
    src = str(tmp_path / "vt_empty")
    V.write_table_version(
        spark.range(3).selectExpr("id as k", "id as v").coalesce(1),
        src)
    V.delete_table_version(spark, src, "true")
    assert V._load_manifest(src, 2)["files"] == []  # truly file-empty
    export_delta_log(spark, src)
    empty = read_delta_table(spark, src)  # head = the empty version
    assert empty.count() == 0
    assert empty.columns == ["k", "v"]
    full = read_delta_table(spark, src, version=0)
    assert full.count() == 3
    # and the importer reproduces the empty head
    from etl_rust_spark.deltalake import import_delta_log

    back = str(tmp_path / "vt_empty_back")
    import_delta_log(spark, src, back)
    assert V.read_table_version(spark, back).count() == 0


def test_import_cleaned_log_refuses_clearly(spark, tmp_path):
    from etl_rust_spark.deltalake import import_delta_log

    t = _simple_table(tmp_path)
    os.remove(t / "_delta_log" / f"{1:020d}.json")
    with pytest.raises(ValueError, match="log cleanup"):
        import_delta_log(spark, str(t), str(tmp_path / "x"))


def test_cli_curate_from_delta_corpus(spark, tmp_path, capsys):
    """A documents corpus living as a Delta table feeds the curation
    pipeline directly (--input-format delta) — the lakehouse-in,
    training-data-out composition."""
    from etl_rust_spark.__main__ import main

    t = tmp_path / "docs_delta"
    rows = [
        {"doc_id": "a", "text": "The quick brown fox jumps over the "
                                "lazy dog near the river bank today."},
        {"doc_id": "b", "text": "The quick brown fox jumps over the "
                                "lazy dog near the river bank today."},
        {"doc_id": "c", "text": "zz"},  # fails the quality floor
    ]
    sz = _write_parquet(t / "f1.parquet", rows)
    sch = _schema_str([("doc_id", "string"), ("text", "string")])
    _commit(t / "_delta_log", 0, [
        _P1, _meta(sch),
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": sz,
                 "modificationTime": 0, "dataChange": True}},
    ])
    out = str(tmp_path / "curated")
    assert main([
        "curate", str(t), "--input-format", "delta", "--out", out,
        "--min-quality-bp", "2000",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    # exact dedup dropped one of the identical twins
    assert len(kept & {"a", "b"}) == 1
    assert rep["input"] == 3

    # profile reads the Delta table too (one JSON line per column)
    assert main(["profile", str(t), "--input-format", "delta"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()
             if x.startswith("{")]
    by_col = {r["col_name"]: r for r in lines if "col_name" in r}
    assert by_col["doc_id"]["n_rows"] == 3


def test_plus_and_space_in_file_paths(spark, tmp_path):
    """File paths with a literal '+' (and a space) survive the scan-
    side URI decode: java's URLDecoder turns '+' into a space, which
    used to silently NULL the injected partition columns and unmask
    DV rows for such paths."""
    t = tmp_path / "delta_plus"
    log = t / "_delta_log"
    import pyarrow as pa
    import pyarrow.parquet as pq

    (t / "p=x").mkdir(parents=True)
    name = "a+b c.parquet"
    pq.write_table(pa.Table.from_pylist(
        [{"k": i} for i in range(4)]), t / "p=x" / name)
    sch = _schema_str([("k", "long"), ("p", "string")])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta(sch, parts=["p"]),
        {"add": {"path": "p%3Dx/a%2Bb%20c.parquet",
                 "partitionValues": {"p": "x"}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": _inline_dv([0])}},
    ])
    rows = sorted((r.k, r.p) for r in
                  read_delta_table(spark, str(t)).collect())
    assert rows == [(1, "x"), (2, "x"), (3, "x")]  # row 0 DV-masked,
    # partition value injected (not NULL) despite '+' in the name


def test_export_resume_rejects_overlapping_versions(spark, tmp_path):
    src = str(tmp_path / "vt_overlap")
    V.write_table_version(spark.range(3).selectExpr("id as k"), src)
    V.upsert_table_version(
        spark, src, spark.range(1).selectExpr("id + 9 as k"),
        keys=["k"])
    export_delta_log(spark, src)
    with pytest.raises(ValueError, match="duplicate"):
        export_delta_log(spark, src, versions=[1, 2], resume=True)


def test_spark_side_checkpoint_planning_parity(spark, tmp_path):
    """Above the routing threshold the checkpoint decode runs THROUGH
    Spark (JVM-side toJSON, streamed back); the snapshot fold must be
    byte-equal to the driver-side pyarrow decode — deletion vectors,
    stats and partition values included."""
    t = tmp_path / "vt_sp"
    V.write_table_version(
        spark.range(40).selectExpr(
            "id as k", "cast(id % 3 as string) as p"),
        str(t), partition_by="p", stats_cols=["k"])
    V.delete_table_version(spark, str(t), "k = 7", mode="mor")
    export_delta_log(spark, str(t))
    drv = delta_snapshot(str(t))
    via = delta_snapshot(str(t), spark=spark, spark_plan_threshold=0)
    assert via["metaData"] == drv["metaData"]
    assert via["protocol"] == drv["protocol"]
    assert set(via["adds"]) == set(drv["adds"])
    # the JVM JSON render drops null struct fields (e.g. an inline
    # DV's offset) where pyarrow yields explicit Nones — semantically
    # identical to every consumer (.get() everywhere); normalize
    def norm(d):
        return {k: v for k, v in (d or {}).items() if v is not None}

    for p, a in drv["adds"].items():
        b = via["adds"][p]
        for k in ("path", "size", "stats"):
            assert b.get(k) == a.get(k), (p, k)
        assert norm(b.get("deletionVector")) == \
            norm(a.get("deletionVector")), p
        assert (b.get("partitionValues") or {}) == \
            (a.get("partitionValues") or {})
    # the pruning surface agrees too, and the routed read masks MoR
    assert delta_table_files(
        str(t), prune=[("k", 0, 3)], spark=spark,
        spark_plan_threshold=0
    ) == delta_table_files(str(t), prune=[("k", 0, 3)])
    ours = V.read_table_version(spark, str(t))
    import etl_rust_spark.deltalake as D

    old = D._SPARK_PLAN_THRESHOLD
    D._SPARK_PLAN_THRESHOLD = 0
    try:
        theirs = read_delta_table(spark, str(t))
        assert sorted(map(tuple,
                          theirs.select(*ours.columns).collect())) \
            == sorted(map(tuple, ours.collect()))
    finally:
        D._SPARK_PLAN_THRESHOLD = old


def test_export_v2_checkpoint_roundtrip(spark, tmp_path):
    """checkpoint_format='v2' writes the spec's manifest+sidecar form;
    a JSON-less log reads back through this module's own v2 decode
    path — deletion vectors included — proving write/read symmetry on
    self-written artifacts."""
    t = tmp_path / "vt_v2w"
    V.write_table_version(
        spark.range(12).selectExpr("id as k", "id * 2 as v"), str(t),
        stats_cols=["k"])
    V.delete_table_version(spark, str(t), "k = 5", mode="mor")
    export_delta_log(spark, str(t), checkpoint_format="v2")
    from etl_rust_spark.deltalake import _CKPT_V2_RE

    log = t / "_delta_log"
    assert any(_CKPT_V2_RE.match(p.name) for p in log.iterdir())
    assert (log / "_sidecars").exists()
    # kill the JSON commits: only the v2 checkpoint remains
    for f in log.iterdir():
        if f.suffix == ".json" and f.stem.isdigit():
            f.unlink()
    ours = V.read_table_version(spark, str(t))
    theirs = read_delta_table(spark, str(t))
    assert sorted(map(tuple, theirs.select(*ours.columns).collect())) \
        == sorted(map(tuple, ours.collect()))
    assert not any(r.k == 5 for r in theirs.collect())
    # stats survive the sidecar round trip: prune still reaches 1 file
    from etl_rust_spark.deltalake import delta_table_files

    assert len(delta_table_files(str(t), prune=[("k", 0, 0)])) <= \
        len(delta_table_files(str(t)))


def test_import_reconstructs_hidden_transform(spark, tmp_path):
    """Import of a table this module exported with a generated
    partition column (r12): the canonical generationExpression parses
    back into the HIDDEN transform — the synthetic column stays out of
    the logical schema, every version round-trips masks included, and
    post-import DML routes through the reconstructed transform."""
    from etl_rust_spark.deltalake import import_delta_log

    for name, pb, mk in [
        ("days", ("days", "ts"), lambda: spark.range(12).selectExpr(
            "id as k",
            "timestamp_micros(cast(id * 86400e6 as long)) as ts",
            "concat('v', id) as val")),
        ("bucket", ("bucket", "k", 4), lambda: spark.range(16)
            .selectExpr("id as k", "concat('v', id) as val")),
    ]:
        p = str(tmp_path / f"src_{name}")
        q = str(tmp_path / f"imp_{name}")
        V.write_table_version(mk(), p, partition_by=pb)
        V.delete_table_version(spark, p, "k = 3", mode="mor")
        V.update_table_version(spark, p, "k = 5", {"val": "'X'"})
        export_delta_log(spark, p)
        n = import_delta_log(spark, p, q)
        assert n == 3
        t = V._load_manifest(q, 1).get("partition_transform")
        assert t and t["kind"] == pb[0] and t["source"] == pb[1]
        for v in V.list_versions(q):
            a = sorted(map(tuple,
                           V.read_table_version(spark, p, v).collect()))
            b = sorted(map(tuple,
                           V.read_table_version(spark, q, v).collect()))
            assert a == b, f"{name} v{v}"
        # synth never surfaces; DML routes through the transform
        assert not any(c.startswith("_p_")
                       for c in V.read_table_version(spark, q).columns)
        delta = mk().filter("k = 0").selectExpr(
            "k + 100 as k", *[c for c in mk().columns if c != "k"])
        V.upsert_table_version(spark, q, delta.select(*mk().columns),
                               keys=["k"])
        assert V.read_table_version(spark, q) \
            .filter("k = 100").count() == 1


def test_import_foreign_generation_expr_stays_identity(spark, tmp_path):
    """A generated partition column whose expression is NOT one of
    this module's canonical transform forms imports as an identity
    partition column — never a silently-wrong transform."""
    import json as _json
    from pathlib import Path as _P

    from etl_rust_spark.deltalake import import_delta_log

    p = str(tmp_path / "src")
    q = str(tmp_path / "imp")
    V.write_table_version(
        spark.range(8).selectExpr(
            "id as k",
            "timestamp_micros(cast(id * 86400e6 as long)) as ts",
            "concat('v', id) as val"),
        p, partition_by=("days", "ts"))
    export_delta_log(spark, p)
    # rewrite the log's generationExpression to a near-miss (session-tz
    # day boundary — Delta's own common idiom, NOT our canonical form)
    log0 = sorted(_P(p, "_delta_log").glob("*.json"))[0]
    txt = log0.read_text()
    acts = [_json.loads(x) for x in txt.splitlines()]
    for a in acts:
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            for f in sch["fields"]:
                md = f.get("metadata") or {}
                if "delta.generationExpression" in md:
                    md["delta.generationExpression"] = \
                        "date_format(CAST(`ts` AS DATE), 'yyyy-MM-dd')"
            a["metaData"]["schemaString"] = _json.dumps(sch)
    log0.write_text("".join(_json.dumps(a) + "\n" for a in acts))
    for ck in _P(p, "_delta_log").glob("*.checkpoint*"):
        ck.unlink()
    (_P(p, "_delta_log") / "_last_checkpoint").unlink(missing_ok=True)
    import_delta_log(spark, p, q)
    m = V._load_manifest(q, 1)
    assert not m.get("partition_transform")
    assert m["partition_by"] == "_p_days_ts"  # identity, visible
    got = V.read_table_version(spark, q)
    assert "_p_days_ts" in got.columns
    assert got.count() == 8


def test_import_own_partitioned_export_roundtrip(spark, tmp_path):
    """Our own identity-partitioned export round-trips through import
    (r12: add paths prefix `data/`; the hive normalization finds the
    partition segment at any depth) — masks included, partitioning
    preserved as identity."""
    from etl_rust_spark.deltalake import import_delta_log

    p = str(tmp_path / "src")
    q = str(tmp_path / "imp")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(32)], ["k", "ds", "val"]
    ).repartition(4, "ds")
    V.write_table_version(df, p, "ds", stats_cols=["k"])
    V.delete_table_version(spark, p, "k = 3", mode="mor")
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(1, 1, "U")], ["k", "ds", "val"]),
        keys=["k"], partition_by="ds")
    export_delta_log(spark, p)
    assert import_delta_log(spark, p, q) == 3
    m = V._load_manifest(q, 1)
    assert m["partition_by"] == "ds" and not m.get("partition_transform")
    for i, v in enumerate(V.list_versions(p)):
        a = sorted(map(tuple, V.read_table_version(spark, p, v)
                       .select("k", "ds", "val").collect()))
        b = sorted(map(tuple, V.read_table_version(spark, q, i + 1)
                       .select("k", "ds", "val").collect()))
        assert a == b, f"v{v}"


def test_cdf_export_and_read(spark, tmp_path):
    """change_data_keys (r12): change commits export spec cdc files;
    delta_table_changes returns Delta's CDF contract — insert /
    delete / update pre+post images with _commit_version — deriving
    pure-append versions from the adds, and compaction versions
    (dataChange: false) are correctly absent."""
    from etl_rust_spark.deltalake import delta_table_changes

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(12)], ["k", "ds", "val"]
    ).repartition(2, "ds")
    V.write_table_version(df, p, "ds")
    V.delete_table_version(spark, p, "k = 3", mode="mor")
    V.update_table_version(spark, p, "k = 5", {"val": "'X'"})
    V.compact_table_version(spark, p)
    assert export_delta_log(spark, p, change_data_keys=["k"]) == 4
    ch = delta_table_changes(spark, p, 0)
    assert set(ch.columns) == {"k", "ds", "val", "_change_type",
                               "_commit_version", "_commit_timestamp"}
    byv = {}
    for r in ch.collect():
        byv.setdefault(r._commit_version, []).append(
            (r.k, r._change_type, r.val))
    assert len([1 for k, t, _ in byv[0] if t == "insert"]) == 12
    assert byv[1] == [(3, "delete", "v3")]
    assert sorted(byv[2]) == [(5, "update_postimage", "X"),
                              (5, "update_preimage", "v5")]
    assert 3 not in byv  # compaction: dataChange false, no changes
    # windowed read: only the delete version
    w = delta_table_changes(spark, p, 1, 1).collect()
    assert [(r.k, r._change_type) for r in w] == [(3, "delete")]


def test_cdf_reader_refuses_uncaptured_change_commit(spark, tmp_path):
    """A change commit exported WITHOUT change_data_keys has no cdc
    data — deriving deletes would be guessing, so the reader refuses
    with the remediation named."""
    from etl_rust_spark.deltalake import delta_table_changes

    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), p)
    V.delete_table_version(spark, p, "k = 1")
    export_delta_log(spark, p)
    with pytest.raises(ValueError, match="no cdc actions"):
        delta_table_changes(spark, p, 0).collect()
    # the pure-append prefix still reads
    ins = delta_table_changes(spark, p, 0, 0).collect()
    assert sorted(r.k for r in ins) == [1, 2]


def test_cdf_transform_table(spark, tmp_path):
    """CDF composes with the generated-partition-column export: cdc
    files partition by the synth column and partition values inject
    on read."""
    from etl_rust_spark.deltalake import delta_table_changes

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 86400, f"v{i}") for i in range(8)],
        ["k", "sec", "val"]
    ).selectExpr("k", "timestamp_micros(sec * 1000000) as ts", "val")
    V.write_table_version(df, p, ("days", "ts"))
    V.delete_table_version(spark, p, "k = 3", mode="mor")
    export_delta_log(spark, p, change_data_keys=["k"])
    ch = delta_table_changes(spark, p, 1)
    rows = [(r.k, r._change_type) for r in ch.collect()]
    assert rows == [(3, "delete")]
    # the deleted row's payload round-trips through the cdc file
    assert ch.collect()[0].val == "v3"


def test_cdf_resume_publish_on_commit(spark, tmp_path):
    """The publish-on-commit loop with CDF: resume exports the new
    change commits WITH cdc data (protocol/config carried across the
    seam); resuming a CDF log without the keys refuses — the new
    commits would be uncapturable."""
    from etl_rust_spark.deltalake import delta_table_changes

    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), p)
    V.delete_table_version(spark, p, "k = 1")
    assert export_delta_log(spark, p, change_data_keys=["k"]) == 2
    V.update_table_version(spark, p, "k = 2", {"v": "'B'"})
    with pytest.raises(ValueError, match="change_data_keys"):
        export_delta_log(spark, p, resume=True)
    assert export_delta_log(spark, p, resume=True,
                            change_data_keys=["k"]) == 1
    ch = delta_table_changes(spark, p, 2)
    assert sorted((r.k, r._change_type, r.v) for r in ch.collect()) \
        == [(2, "update_postimage", "B"), (2, "update_preimage", "b")]
