"""iceberg_log DataSource: Iceberg tables as jar-free batch and
STREAMING Spark sources — the incremental-append-scan contract over
the spec-built fixtures from test_iceberg (carried files marked
EXISTING, added files ADDED-by-snapshot, the way real manifests are
written)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tests.test_iceberg import _FIELDS, IceFix


@pytest.fixture()
def _registered(spark):
    from etl_rust_spark.sources.iceberg_source import IcebergLogDataSource

    spark.dataSource.register(IcebergLogDataSource)
    return spark


def _run_stream(spark, t, out, ckpt, starting="earliest", **opts):
    rd = (spark.readStream.format("iceberg_log").option("path", str(t))
          .option("startingSnapshot", starting))
    for k, v in opts.items():
        rd = rd.option(k, v)
    q = (rd.load().writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _incremental_table(tmp_path: Path) -> IceFix:
    """Three append snapshots with correct EXISTING/ADDED statuses."""
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    f2 = fx.write_file([{"k": 3, "v": "c"}])
    f3 = fx.write_file([{"k": 4, "v": "d"}])
    fx.add_snapshot([f1], ts_ms=1_000, statuses=[1])
    fx.add_snapshot([f1, f2], ts_ms=2_000, statuses=[0, 1])
    fx.add_snapshot([f1, f2, f3], ts_ms=3_000, statuses=[0, 0, 1])
    return fx.finish()


def test_batch_read(_registered, tmp_path):
    spark = _registered
    fx = _incremental_table(tmp_path)
    df = (spark.read.format("iceberg_log")
          .option("path", str(fx.root)).load())
    assert sorted(r.k for r in df.collect()) == [1, 2, 3, 4]
    old = (spark.read.format("iceberg_log").option("path", str(fx.root))
           .option("snapshotId", "1000").load())
    assert sorted(r.k for r in old.collect()) == [1, 2]


def test_batch_refuses_delete_files(_registered, tmp_path):
    spark = _registered
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    pd = fx.write_file([{"file_path": f1["file_path"], "pos": 0}],
                       content=1)
    fx.add_snapshot([f1, pd], ts_ms=1_000, seq=1)
    fx.finish()
    with pytest.raises(Exception, match="read_iceberg_table"):
        (spark.read.format("iceberg_log")
         .option("path", str(fx.root)).load().collect())


def test_stream_appends_exactly_once_across_restart(
    _registered, tmp_path
):
    """Snapshot-log positions are offsets: each append streams its
    ADDED files exactly once (carried EXISTING files never re-stream),
    restart resumes from the checkpoint."""
    spark = _registered
    fx = _incremental_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, fx.root, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]
    # a snapshot lands while the stream is down; resume delivers it once
    f4 = fx.write_file([{"k": 5, "v": "e"}])
    fx.add_snapshot([f4], ts_ms=4_000, statuses=[1])
    fx.finish()
    _run_stream(spark, fx.root, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]
    _run_stream(spark, fx.root, out, ckpt)  # idle: no dupes
    assert sorted(r.k for r in
                  spark.read.parquet(out).collect()) == [1, 2, 3, 4, 5]


def test_stream_inherits_null_entry_snapshot_id(_registered, tmp_path):
    """The v2 spec allows a null manifest-entry snapshot_id inherited
    from the manifest-list row's added_snapshot_id; real manifests use
    it.  Treating null as 'not this snapshot' would silently skip the
    ADDED files — empty micro-batches, silent data loss (ADVICE r10)."""
    spark = _registered
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    f2 = fx.write_file([{"k": 2, "v": "b"}])
    fx.add_snapshot([f1], ts_ms=1_000, null_entry_sids=True)
    fx.add_snapshot([f2], ts_ms=2_000, null_entry_sids=True)
    fx.finish()
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, fx.root, out, ckpt)
    assert sorted(r.k for r in
                  spark.read.parquet(out).collect()) == [1, 2]


def test_source_field_id_resolution_renamed_table(
    _registered, tmp_path
):
    """Batch AND stream reads resolve columns by parquet field id, so
    a renamed table's pre-rename files deliver their DATA under the
    current name — the DataSource twin of the read_iceberg_table rule
    (ADVICE r10: this path used to NULL-fill silently)."""
    import pyarrow as pa

    from tests.test_iceberg import _ids_schema

    spark = _registered
    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "renamed_v", "required": False,
         "type": "string"},
    ]
    fx = IceFix(tmp_path / "ice", fields)
    f1 = fx.write_file(
        [{"k": 1, "v": "a"}],  # pre-rename footer name, same id
        schema=_ids_schema([("k", pa.int64(), 1), ("v", pa.string(), 2)]),
    )
    f2 = fx.write_file(
        [{"k": 2, "renamed_v": "b"}],
        schema=_ids_schema([("k", pa.int64(), 1),
                            ("renamed_v", pa.string(), 2)]),
    )
    fx.add_snapshot([f1], ts_ms=1_000)
    fx.add_snapshot([f1, f2], ts_ms=2_000, statuses=[0, 1])
    fx.finish()
    df = (spark.read.format("iceberg_log")
          .option("path", str(fx.root)).load())
    assert {(r.k, r.renamed_v) for r in df.collect()} == {
        (1, "a"), (2, "b")
    }
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, fx.root, out, ckpt)
    got = {(r.k, r.renamed_v)
           for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_stream_change_snapshot_raises_and_skip_skips(
    _registered, tmp_path
):
    spark = _registered
    fx = IceFix(tmp_path / "ice", _FIELDS)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    f2 = fx.write_file([{"k": 2, "v": "b"}])
    fx.add_snapshot([f1], ts_ms=1_000, statuses=[1])
    # an overwrite snapshot: f1 replaced by f2
    sid = fx.add_snapshot([f2], ts_ms=2_000, statuses=[1])
    fx.snapshots[-1]["summary"] = {"operation": "overwrite"}
    fx.finish()
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="not an append"):
        _run_stream(spark, fx.root, out, ckpt)
    out2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    _run_stream(spark, fx.root, out2, ckpt2, skipChangeCommits="true")
    assert sorted(r.k for r in
                  spark.read.parquet(out2).collect()) == [1]


def test_stream_expired_snapshot_refuses(_registered, tmp_path):
    """A cursor below the oldest SURVIVING snapshot cannot replay —
    the re-bootstrap contract."""
    spark = _registered
    fx = _incremental_table(tmp_path)
    # expire snapshot 1000: drop it from the snapshots list while the
    # log still names it (Iceberg keeps the full snapshot-log)
    mp = fx.root / "metadata" / "v1.metadata.json"
    meta = json.loads(mp.read_text())
    meta["snapshots"] = [s for s in meta["snapshots"]
                         if s["snapshot-id"] != 1000]
    mp.write_text(json.dumps(meta))
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="re-bootstrap"):
        _run_stream(spark, fx.root, out, ckpt, starting="earliest")


def test_stream_starting_latest_and_pacing(_registered, tmp_path):
    spark = _registered
    fx = _incremental_table(tmp_path)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, fx.root, out, ckpt, starting="latest")
    f4 = fx.write_file([{"k": 9, "v": "z"}])
    fx.add_snapshot([f4], ts_ms=4_000, statuses=[1])
    fx.finish()
    _run_stream(spark, fx.root, out, ckpt, starting="latest")
    assert sorted(r.k for r in
                  spark.read.parquet(out).collect()) == [9]
    # pacing: one snapshot per micro-batch over a backlog
    fx2 = _incremental_table(tmp_path / "second")
    out2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    _run_stream(spark, fx2.root, out2, ckpt2,
                maxSnapshotsPerTrigger="1")
    assert sorted(r.k for r in
                  spark.read.parquet(out2).collect()) == [1, 2, 3, 4]
    assert len(list((Path(ckpt2) / "offsets").iterdir())) >= 3


def test_stream_schema_change_raises(_registered, tmp_path):
    spark = _registered
    old = [{"id": 1, "name": "k", "required": False, "type": "long"},
           {"id": 2, "name": "v", "required": False, "type": "string"}]
    new = old + [{"id": 3, "name": "x", "required": False,
                  "type": "long"}]
    fx = IceFix(tmp_path / "ice", new)
    f1 = fx.write_file([{"k": 1, "v": "a"}])
    f2 = fx.write_file([{"k": 2, "v": "b", "x": 9}])
    fx.add_snapshot([f1], ts_ms=1_000, statuses=[1], schema_id=1)
    fx.add_snapshot([f1, f2], ts_ms=2_000, statuses=[0, 1],
                    schema_id=0)
    fx.finish(schemas=[
        {"schema-id": 1, "type": "struct", "fields": old},
        {"schema-id": 0, "type": "struct", "fields": new},
    ], current_schema_id=0)
    # the stream binds the CURRENT schema (id 0); snapshot 1000 carries
    # schema-id 1 -> raises at the first batch
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="restart the stream"):
        _run_stream(spark, fx.root, out, ckpt)


def test_stream_from_exported_versioned_table(_registered, tmp_path):
    """Composition: export a versioned chain to Iceberg metadata, then
    stream it — carried files export as EXISTING with their original
    snapshot id, so each append streams exactly once."""
    from etl_rust_spark import versions as V
    from etl_rust_spark.iceberg import export_iceberg_metadata
    from etl_rust_spark.versions import commit_appended_files

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = _registered
    p = str(tmp_path / "vt")
    V.write_table_version(
        spark.range(3).selectExpr("id as k").coalesce(1), p)
    for i, ks in enumerate(([10, 11], [20])):
        stage = tmp_path / f"stage{i}.parquet"
        pq.write_table(pa.Table.from_pylist([{"k": k} for k in ks]),
                       stage)
        commit_appended_files(spark, p, [str(stage)], len(ks))
    export_iceberg_metadata(spark, p)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, p, out, ckpt)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 10, 11, 20]


def test_source_injects_identity_partition_values(
    _registered, tmp_path
):
    """An exported hive-partitioned table keeps the partition column
    in metadata only; the source injects each slice's value from the
    manifest partition struct (r11) — batch and stream, NULL partition
    included."""
    from pyspark.sql import functions as F

    from etl_rust_spark import versions as V
    from etl_rust_spark.iceberg import export_iceberg_metadata

    spark = _registered
    p = str(tmp_path / "vt")
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 4,
               (F.col("id") % 2).cast("string")).alias("g"),
    )
    V.write_table_version(df, p, partition_by="g")
    export_iceberg_metadata(spark, p)
    # parity target: read_table_version (partition type inference
    # makes g an int — the exported schema records the same type)
    want = {(r.k, r.g)
            for r in V.read_table_version(spark, p).collect()}
    assert (4, None) in want  # the NULL partition row
    got = (spark.read.format("iceberg_log").option("path", p).load())
    rows = {(r.k, r.g) for r in got.collect()}
    assert rows == want
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    _run_stream(spark, p, out, ckpt)
    srows = {(r.k, r.g) for r in spark.read.parquet(out).collect()}
    assert srows == rows
