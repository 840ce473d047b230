"""versioned_table DataSource (r10): the manifest log as a Spark
source — batch time-travel reads and Delta-contract streaming (appends
stream, change commits raise or skip, version numbers are the
offsets)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from etl_rust_spark import versions as V
from etl_rust_spark.sources.table_source import VersionedTableDataSource


@pytest.fixture(scope="module")
def _registered(spark):
    spark.dataSource.register(VersionedTableDataSource)
    return spark


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "ds", "val"])


def _append(spark, p, rows):
    """Append-only commit: upsert into FRESH partition values only."""
    V.upsert_table_version(spark, p, _df(spark, rows), keys=["k"],
                           partition_by="ds")


def test_batch_read_time_travel_and_schema(_registered, tmp_path):
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), p, "ds")
    _append(spark, p, [(3, 30, "c")])
    df = spark.read.format("versioned_table").option("path", p).load()
    # hive partition values surface as string (documented)
    assert dict(df.dtypes)["ds"] == "string"
    got = {(r.k, r.ds, r.val) for r in df.collect()}
    assert got == {(1, "10", "a"), (2, "20", "b"), (3, "30", "c")}
    # explicit version
    old = (spark.read.format("versioned_table").option("path", p)
           .option("version", "1").load())
    assert {r.k for r in old.collect()} == {1, 2}
    # asOf timestamp resolution rides version_at_timestamp
    ts1 = json.loads(
        (Path(p) / "_manifests" / "m00000001.json").read_text()
    )["ts"]
    aso = (spark.read.format("versioned_table").option("path", p)
           .option("asOf", str(ts1)).load())
    assert {r.k for r in aso.collect()} == {1, 2}


def test_batch_read_rejects_mor_masked_version(_registered, tmp_path):
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), p, "ds")
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    df = spark.read.format("versioned_table").option("path", p).load()
    with pytest.raises(Exception, match="merge-on-read|sidecar"):
        df.collect()


def test_stream_appends_exactly_once_across_restart(
    _registered, tmp_path
):
    """Version numbers are offsets: each append-only commit streams
    exactly once, restarts resume from the checkpoint, commits landing
    while the stream is down arrive on resume — no dupes, no gaps."""
    spark = _registered
    p = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    V.write_table_version(_df(spark, [(1, 10, "a")]), p, "ds")

    def run():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", p)
            .option("startingVersion", "earliest")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _append(spark, p, [(2, 20, "b")])
    run()
    got = spark.read.parquet(out)
    assert {(r.k, r.ds, r.val) for r in got.collect()} == {
        (1, "10", "a"), (2, "20", "b")
    }
    # two more commits while the stream is DOWN; resume delivers both
    _append(spark, p, [(3, 30, "c")])
    _append(spark, p, [(4, 40, "d")])
    run()
    got = {(r.k, r.val) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    # idle re-run: nothing new, nothing duplicated
    run()
    assert spark.read.parquet(out).count() == 4


def test_stream_change_commit_raises_and_skip_option_skips(
    _registered, tmp_path
):
    """Delta's contract: a version that rewrites/removes files (CoW
    delete) is not an append stream — raise naming the version unless
    skipChangeCommits=true, which skips it but keeps streaming later
    appends."""
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), p, "ds")
    V.delete_table_version(spark, p, "k = 1")  # CoW: removes a file
    _append(spark, p, [(3, 30, "c")])

    def run(skip: bool, sink: str, ck: str):
        rd = (
            spark.readStream.format("versioned_table")
            .option("path", p)
            .option("startingVersion", "earliest")
        )
        if skip:
            rd = rd.option("skipChangeCommits", "true")
        q = (
            rd.load().writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    with pytest.raises(Exception, match="CHANGE commit|skipChangeCommits"):
        run(False, str(tmp_path / "s1"), str(tmp_path / "c1"))
    run(True, str(tmp_path / "s2"), str(tmp_path / "c2"))
    got = {(r.k, r.val)
           for r in spark.read.parquet(str(tmp_path / "s2")).collect()}
    # v1's appends + v3's append; v2 (the delete) skipped
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_stream_starting_version_latest_skips_backlog(
    _registered, tmp_path
):
    spark = _registered
    p = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    V.write_table_version(_df(spark, [(1, 10, "old")]), p, "ds")

    q = (
        spark.readStream.format("versioned_table")
        .option("path", p)  # default startingVersion=latest
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # plans the initial offset at head
    finally:
        q.stop()
    _append(spark, p, [(2, 20, "new")])
    q = (
        spark.readStream.format("versioned_table")
        .option("path", p)
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    vals = sorted(r.val for r in spark.read.parquet(out).collect())
    assert vals == ["new"]  # the backlog row never streamed
