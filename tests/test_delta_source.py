"""delta_log DataSource (etl_rust_spark.sources.delta_source): Delta
tables as jar-free batch and STREAMING Spark sources, over hand-built
spec logs plus our own exporter's logs (the two fixture families the
deltalake tests establish)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from etl_rust_spark import versions as V


@pytest.fixture()
def _registered(spark):
    from etl_rust_spark.sources.delta_source import DeltaLogDataSource

    spark.dataSource.register(DeltaLogDataSource)
    return spark


def _commit(log: Path, v: int, actions: list[dict]):
    log.mkdir(parents=True, exist_ok=True)
    (log / f"{v:020d}.json").write_text(
        "".join(json.dumps(a) + "\n" for a in actions)
    )


def _meta(schema_fields, parts=None):
    return {"metaData": {
        "id": "00000000-0000-0000-0000-00000000000d",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [{"name": n, "type": t, "nullable": True,
                        "metadata": {}} for n, t in schema_fields],
        }),
        "partitionColumns": parts or [],
        "configuration": {},
    }}


_P1 = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _write_pq(path: Path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path.stat().st_size


def _add(name, sz, pv=None, data_change=True, dv=None):
    a = {"path": name, "partitionValues": pv or {}, "size": sz,
         "modificationTime": 0, "dataChange": data_change}
    if dv:
        a["deletionVector"] = dv
    return {"add": a}


def _mk_table(tmp_path: Path) -> Path:
    t = tmp_path / "dsrc"
    log = t / "_delta_log"
    sz1 = _write_pq(t / "f1.parquet", [{"k": 1}, {"k": 2}])
    _commit(log, 0, [_P1, _meta([("k", "long")]),
                     _add("f1.parquet", sz1)])
    return t


def _append(t: Path, v: int, name: str, rows):
    sz = _write_pq(t / name, rows)
    _commit(t / "_delta_log", v, [_add(name, sz)])


def _run_stream(spark, t, out, ckpt, starting="earliest", **opts):
    rd = (spark.readStream.format("delta_log").option("path", str(t))
          .option("startingVersion", starting))
    for k, v in opts.items():
        rd = rd.option(k, v)
    q = (rd.load().writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_batch_read(_registered, tmp_path):
    spark = _registered
    t = _mk_table(tmp_path)
    _append(t, 1, "f2.parquet", [{"k": 3}])
    df = spark.read.format("delta_log").option("path", str(t)).load()
    assert sorted(r.k for r in df.collect()) == [1, 2, 3]
    old = (spark.read.format("delta_log").option("path", str(t))
           .option("version", "0").load())
    assert sorted(r.k for r in old.collect()) == [1, 2]


def test_batch_partition_values_typed(_registered, tmp_path):
    spark = _registered
    t = tmp_path / "dsrc_p"
    log = t / "_delta_log"
    sz = _write_pq(t / "f1.parquet", [{"k": 1}])
    _commit(log, 0, [
        _P1, _meta([("k", "long"), ("d", "date"), ("n", "integer")],
                   parts=["d", "n"]),
        _add("f1.parquet", sz, pv={"d": "2026-08-16", "n": "7"}),
    ])
    import datetime as dt

    r = (spark.read.format("delta_log").option("path", str(t))
         .load().collect()[0])
    assert (r.k, r.d, r.n) == (1, dt.date(2026, 8, 16), 7)


def test_batch_refuses_dv(_registered, tmp_path):
    spark = _registered
    t = tmp_path / "dsrc_dv"
    log = t / "_delta_log"
    sz = _write_pq(t / "f1.parquet", [{"k": 1}])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta([("k", "long")]),
        _add("f1.parquet", sz,
             dv={"storageType": "i", "pathOrInlineDv": "x",
                 "sizeInBytes": 1, "cardinality": 1}),
    ])
    with pytest.raises(Exception, match="read_delta_table"):
        (spark.read.format("delta_log").option("path", str(t))
         .load().collect())


def test_stream_appends_exactly_once_across_restart(
    _registered, tmp_path
):
    spark = _registered
    t = _mk_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _append(t, 1, "f2.parquet", [{"k": 3}])
    _run_stream(spark, t, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]
    # commits land while the stream is DOWN; resume delivers exactly once
    _append(t, 2, "f3.parquet", [{"k": 4}])
    _append(t, 3, "f4.parquet", [{"k": 5}])
    _run_stream(spark, t, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]
    _run_stream(spark, t, out, ckpt)  # idle re-run: no dupes
    assert sorted(r.k for r in
                  spark.read.parquet(out).collect()) == [1, 2, 3, 4, 5]


def test_stream_change_commit_raises_and_skip_skips(
    _registered, tmp_path
):
    spark = _registered
    t = _mk_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    # version 1: a data-changing remove (a DELETE rewrote f1 into f2)
    sz = _write_pq(t / "f2.parquet", [{"k": 2}])
    _commit(t / "_delta_log", 1, [
        {"remove": {"path": "f1.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        _add("f2.parquet", sz),
    ])
    with pytest.raises(Exception, match="CHANGE commit"):
        _run_stream(spark, t, out, ckpt)
    out2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    _run_stream(spark, t, out2, ckpt2, skipChangeCommits="true")
    got = sorted(r.k for r in spark.read.parquet(out2).collect())
    assert got == [1, 2]  # v0's rows only; the rewrite version skipped


def test_stream_ignores_datachange_false(_registered, tmp_path):
    """OPTIMIZE-shaped commits (add+remove, dataChange=false) are
    invisible to the stream — Delta's exact rule."""
    spark = _registered
    t = _mk_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    sz = _write_pq(t / "compacted.parquet", [{"k": 1}, {"k": 2}])
    _commit(t / "_delta_log", 1, [
        {"remove": {"path": "f1.parquet", "deletionTimestamp": 0,
                    "dataChange": False}},
        _add("compacted.parquet", sz, data_change=False),
    ])
    _append(t, 2, "f3.parquet", [{"k": 9}])
    _run_stream(spark, t, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 9]  # compaction neither duplicated nor dropped


def test_stream_schema_change_raises(_registered, tmp_path):
    spark = _registered
    t = _mk_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    sz = _write_pq(t / "f2.parquet", [{"k": 3, "extra": "e"}])
    _commit(t / "_delta_log", 1, [
        _meta([("k", "long"), ("extra", "string")]),
        _add("f2.parquet", sz),
    ])
    with pytest.raises(Exception, match="restart the stream"):
        _run_stream(spark, t, out, ckpt)


def test_stream_starting_latest_and_pacing(_registered, tmp_path):
    spark = _registered
    t = _mk_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    # startingVersion=latest plants the cursor at head: the backlog
    # (version 0) never streams
    _run_stream(spark, t, out, ckpt, starting="latest")
    _append(t, 1, "f2.parquet", [{"k": 7}])
    _run_stream(spark, t, out, ckpt, starting="latest")
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [7]
    # maxVersionsPerTrigger paces a backlog into one-version batches
    t2 = _mk_table(tmp_path / "second")
    for v, k in ((1, 10), (2, 11), (3, 12)):
        _append(t2, v, f"g{v}.parquet", [{"k": k}])
    out2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    _run_stream(spark, t2, out2, ckpt2, maxVersionsPerTrigger="1")
    got = sorted(r.k for r in spark.read.parquet(out2).collect())
    assert got == [1, 2, 10, 11, 12]
    odir = Path(ckpt2) / "offsets"
    assert len(list(odir.iterdir())) >= 4  # one batch per version


def test_stream_from_exported_versioned_table(_registered, tmp_path):
    """Composition: export a versioned table to a Delta log, stream the
    Delta log — append-only chains replay version for version."""
    from etl_rust_spark.deltalake import export_delta_log

    spark = _registered
    p = str(tmp_path / "vt")
    V.write_table_version(
        spark.range(3).selectExpr("id as k"), p, stats_cols=["k"])
    from etl_rust_spark.versions import commit_appended_files

    # append-only second version through the sink-shaped API
    import pyarrow as pa
    import pyarrow.parquet as pq

    stage = tmp_path / "stage.parquet"
    pq.write_table(
        pa.Table.from_pylist([{"k": 10}, {"k": 11}]), stage)
    commit_appended_files(spark, p, [str(stage)], 2)
    export_delta_log(spark, p)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, p, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 10, 11]


def test_column_mapped_stream(_registered, tmp_path):
    spark = _registered
    t = tmp_path / "dsrc_cm"
    log = t / "_delta_log"
    sz = _write_pq(t / "f1.parquet", [{"col-x": 5, "col-y": "q"}])
    meta = {"metaData": {
        "id": "00000000-0000-0000-0000-00000000000e",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName":
                              "col-x"}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName":
                              "col-y"}},
            ],
        }),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name"},
    }}
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta, _add("f1.parquet", sz),
    ])
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, t, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert [(r.k, r.v) for r in rows] == [(5, "q")]


def test_batch_reads_column_mapping_id_mode(_registered, tmp_path):
    """Mode 'id' (r12): the per-file slice resolves columns by parquet
    FOOTER field ids — two writer generations carrying the same ids
    under different parquet names both read right, and a file missing
    an id NULL-fills that column.  The silent-NULL hazard (resolving
    by logical name) is exactly what this closes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = _registered
    t = tmp_path / "dsrc_id"
    log = t / "_delta_log"

    def pq_ids(name, rows, ids, types):
        pa_t = {"long": pa.int64(), "string": pa.string()}
        sch = pa.schema([
            pa.field(n, pa_t[types[n]],
                     metadata={b"PARQUET:field_id": str(i).encode()})
            for n, i in ids.items()
        ])
        p = t / name
        p.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows, schema=sch), p)
        return p.stat().st_size

    sz1 = pq_ids("f1.parquet", [{"col-aaa": 1, "col-bbb": "x"}],
                 {"col-aaa": 1, "col-bbb": 2},
                 {"col-aaa": "long", "col-bbb": "string"})
    sz2 = pq_ids("f2.parquet", [{"zz_k": 2, "zz_v": "y"}],
                 {"zz_k": 1, "zz_v": 2},
                 {"zz_k": "long", "zz_v": "string"})
    sz3 = pq_ids("f3.parquet", [{"only_k": 3}], {"only_k": 1},
                 {"only_k": "long"})
    md = {
        "k": {"delta.columnMapping.id": 1,
              "delta.columnMapping.physicalName": "col-aaa"},
        "v": {"delta.columnMapping.id": 2,
              "delta.columnMapping.physicalName": "col-bbb"},
    }
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "00000000-0000-0000-0000-00000000001d",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "long", "nullable": True,
                     "metadata": md["k"]},
                    {"name": "v", "type": "string", "nullable": True,
                     "metadata": md["v"]},
                ],
            }),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
        _add("f1.parquet", sz1),
        _add("f2.parquet", sz2),
        _add("f3.parquet", sz3),
    ])
    df = (spark.read.format("delta_log")
          .option("path", str(t)).load())
    rows = {r.k: r.v for r in df.collect()}
    assert rows == {1: "x", 2: "y", 3: None}


def test_stream_read_change_feed(_registered, tmp_path):
    """readChangeFeed (r12): the stream emits the captured Change
    Data Feed — cdc files for change commits (typed from the file),
    pure appends as inserts — with _commit_version injected; a change
    commit without cdc data still raises."""
    from etl_rust_spark.deltalake import export_delta_log

    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), p)
    V.delete_table_version(spark, p, "k = 1")
    V.update_table_version(spark, p, "k = 2", {"v": "'B'"})
    export_delta_log(spark, p, change_data_keys=["k"])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, p, out, ckpt, starting="earliest",
                readChangeFeed="true")
    rows = sorted(
        (r._commit_version, r.k, r._change_type, r.v)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (0, 1, "insert", "a"),
        (0, 2, "insert", "b"),
        (1, 1, "delete", "a"),
        (2, 2, "update_postimage", "B"),
        (2, 2, "update_preimage", "b"),
    ]
    # without cdc data the change commit still fails loudly
    p2 = str(tmp_path / "t2")
    V.write_table_version(
        spark.createDataFrame([(1, "a")], ["k", "v"]), p2)
    V.delete_table_version(spark, p2, "k = 1")
    from etl_rust_spark.deltalake import export_delta_log as _e
    _e(spark, p2)
    with pytest.raises(Exception, match="no cdc data|CHANGE commit"):
        _run_stream(spark, p2, str(tmp_path / "o2"),
                    str(tmp_path / "c2"), starting="earliest",
                    readChangeFeed="true")
