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


def test_batch_read_applies_mor_masks(_registered, tmp_path):
    """VERDICT r10 #6: a MoR-masked version reads correctly through
    the DataSource — sidecars record (file, position) at delete time
    and each slice masks executor-side; parity-pinned against
    read_table_version across delete, update, and time travel."""
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(
        _df(spark, [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]), p, "ds"
    )
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    V.update_table_version(spark, p, "k = 2", {"val": "'B'"},
                           mode="mor")

    def via_source(v=None):
        rd = spark.read.format("versioned_table").option("path", p)
        if v is not None:
            rd = rd.option("version", str(v))
        return {(r.k, r.ds, r.val) for r in rd.load().collect()}

    head = {(r.k, str(r.ds), r.val)
            for r in V.read_table_version(spark, p).collect()}
    assert via_source() == head == {(2, "20", "B"), (3, "30", "c")}
    # time travel: the mid-chain MoR version masks only its own debt
    v2 = {(r.k, str(r.ds), r.val)
          for r in V.read_table_version(spark, p, 2).collect()}
    assert via_source(2) == v2 == {(2, "20", "b"), (3, "30", "c")}
    assert via_source(1) == {(1, "10", "a"), (2, "20", "b"),
                             (3, "30", "c")}
    # compaction folds the debt; the read is unchanged
    V.compact_table_version(spark, p)
    assert via_source() == head


def test_batch_read_rejects_legacy_fingerprint_sidecar(
    _registered, tmp_path
):
    """A pre-r11 sidecar (fingerprints only, no positions) cannot be
    applied by a pyarrow reader — refuse with remediations, never
    resurrect masked rows."""
    import pyarrow.parquet as pq

    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(_df(spark, [(1, 10, "a"), (2, 20, "b")]), p, "ds")
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    side = V._load_manifest(p, 2)["deletes"][0]["path"]
    sp = Path(p) / "data" / side
    t = pq.read_table(sp, columns=["_fp"])  # strip the positions
    pq.write_table(t, sp)
    df = spark.read.format("versioned_table").option("path", p).load()
    with pytest.raises(Exception, match="read_table_version"):
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


def test_sink_batch_append_and_overwrite(_registered, tmp_path):
    """df.write.format('versioned_table'): append folds executor-staged
    files into one manifest commit (count/stats/history correct);
    overwrite replaces the content as a new version; the old version
    stays time-travelable."""
    spark = _registered
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string") \
        .write.format("versioned_table").option("path", p).mode("append").save()
    assert V.latest_version(p) == 1
    assert {(r.k, r.val) for r in V.read_table_version(spark, p).collect()} \
        == {(1, "a"), (2, "b")}
    spark.createDataFrame([(3, "c")], "k long, val string") \
        .write.format("versioned_table").option("path", p).mode("append").save()
    m2 = V._load_manifest(p, 2)
    assert m2["count"] == 3 and V.history(p)[0]["op"] == "append"
    spark.createDataFrame([(9, "z")], "k long, val string") \
        .write.format("versioned_table").option("path", p) \
        .mode("overwrite").save()
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {9}
    assert {r.k for r in V.read_table_version(spark, p, 2).collect()} \
        == {1, 2, 3}
    # no leftover staging dirs
    assert not list(Path(p).glob("_stage-dsw-*"))


def test_sink_enforces_constraints_and_partitioned_guard(
    _registered, tmp_path
):
    spark = _registered
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, val string") \
        .write.format("versioned_table").option("path", p).mode("append").save()
    V.add_table_constraint(spark, p, "k_pos", "k > 0")
    with pytest.raises(Exception, match="k_pos"):
        spark.createDataFrame([(-1, "bad")], "k long, val string") \
            .write.format("versioned_table").option("path", p).mode("append").save()
    assert V.latest_version(p) == 2  # nothing committed
    assert not list(Path(p).glob("_stage-dsw-*"))  # staging cleaned
    # constraints referencing the partition column fail LOUDLY on the
    # partitioned append path (the staged payload cannot carry it)
    p2 = str(tmp_path / "part")
    V.write_table_version(_df(spark, [(1, 1, "a")]), p2, "ds")
    V.add_table_constraint(spark, p2, "ds_pos", "ds > 0")
    with pytest.raises(Exception, match="ds_pos|could not be evaluated"):
        spark.createDataFrame([(2, 2, "b")], ["k", "ds", "val"]) \
            .write.format("versioned_table").option("path", p2).mode("append").save()


def test_sink_txn_ledger_skips_replayed_epoch(_registered, tmp_path):
    """Delta txnAppId/txnVersion parity: a commit whose txnVersion is
    not newer than the ledger entry is skipped and its staged files are
    unlinked — the exactly-once spine of the streaming sink."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = _registered
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, val string") \
        .write.format("versioned_table").option("path", p) \
        .option("txnAppId", "job1").option("txnVersion", "7").mode("append").save()
    assert V._load_manifest(p, 1)["txn"] == {"job1": 7}

    def stage_one(k):
        d = Path(p) / f"_stage-dsw-x{k}"
        d.mkdir(parents=True)
        f = d / "part.parquet"
        pq.write_table(
            pa.table({"k": pa.array([k], pa.int64()),
                      "val": pa.array(["r"], pa.string())}), str(f))
        return str(f)

    # replay of version 7: skipped, staged file unlinked, head unchanged
    f = stage_one(100)
    assert V.commit_appended_files(
        spark, p, [f], 1, txn_app="job1", txn_version=7) is None
    assert not Path(f).exists()
    assert V.latest_version(p) == 1
    # a NEWER txn version commits and advances the ledger
    f = stage_one(101)
    assert V.commit_appended_files(
        spark, p, [f], 1, txn_app="job1", txn_version=8) == 2
    assert V._load_manifest(p, 2)["txn"] == {"job1": 8}
    assert V.read_table_version(spark, p).count() == 2
    # an unrelated app id keeps its own ledger entry
    f = stage_one(102)
    V.commit_appended_files(spark, p, [f], 1, txn_app="job2",
                            txn_version=1)
    assert V._load_manifest(p, 3)["txn"] == {"job1": 8, "job2": 1}


def test_sink_append_builds_stats_and_blooms_sparkless(
    _registered, tmp_path
):
    """The sink's commit hook has no SparkSession (Python worker) — the
    appended files still get [min,max] footer stats AND bloom entries
    via the pyarrow-local build, with the same probe-rendering contract
    (a point read prunes to the appended file and finds the key)."""
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame(
            [("seed-key", "s")], "doc_id string, val string"
        ).coalesce(1),
        p, None, stats_cols=["doc_id"], bloom_cols=["doc_id"],
    )
    spark.createDataFrame([("appended-key", "a")], "doc_id string, val string") \
        .write.format("versioned_table").option("path", p) \
        .mode("append").save()
    m2 = V._load_manifest(p, 2)
    assert all("bloom:doc_id" in m2["stats"].get(f, {}) for f in m2["files"])
    assert all("doc_id" in m2["stats"].get(f, {}) for f in m2["files"])
    got = V.read_table_version(spark, p, point=[("doc_id", "appended-key")])
    assert got.filter("doc_id = 'appended-key'").count() == 1
    assert len(set(got.inputFiles())) == 1  # pruned to the new file


def test_sink_append_preserves_timestamp_dtypes(_registered, tmp_path):
    """Regression: the sink staged TimestampType as tz-naive parquet
    (isAdjustedToUTC=false), so ONE append silently flipped the whole
    table's dtype to timestamp_ntz — wrong values on any non-UTC
    session.  Staged timestamps now carry tz=UTC; NTZ stays NTZ; the
    source reader surfaces each as its own Spark type."""
    from pyspark.sql import functions as F

    spark = _registered
    p = str(tmp_path / "t")
    base = spark.range(0, 3).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 1000).alias("ts"),
        F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("tsn"),
    )
    V.write_table_version(base, p)
    before = dict(V.read_table_version(spark, p).dtypes)
    assert before == {"k": "bigint", "ts": "timestamp", "tsn": "timestamp_ntz"}
    spark.range(3, 5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 1000).alias("ts"),
        F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("tsn"),
    ).write.format("versioned_table").option("path", p).mode("append").save()
    head = V.read_table_version(spark, p)
    assert dict(head.dtypes) == before  # the flip is the bug
    assert head.count() == 5
    assert {r.k for r in head.filter("ts = timestamp_seconds(4000)")
            .collect()} == {4}
    # the DataSource reader maps the footer types back faithfully
    rd = spark.read.format("versioned_table").option("path", p).load()
    assert dict(rd.dtypes) == before


def test_append_schema_guard_rejects_incompatible_files(
    _registered, tmp_path
):
    """commit_appended_files validates staged footers against the
    table's schema BEFORE folding them in: a mismatched append used to
    commit fine and then silently NULL columns / flip dtypes at read
    (Spark reconciles a mixed file list from sampled footers)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = _registered
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, val string") \
        .write.format("versioned_table").option("path", p).mode("append").save()

    def stage(tbl, name="part.parquet"):
        d = Path(tmp_path / "stage")
        d.mkdir(exist_ok=True)
        f = d / name
        pq.write_table(tbl, str(f))
        return str(f)

    # wrong column name
    f = stage(pa.table({"k": pa.array([2], pa.int64()),
                        "value": pa.array(["b"], pa.string())}))
    with pytest.raises(ValueError, match="schema-incompatible.*val"):
        V.commit_appended_files(spark, p, [f], 1)
    # wrong dtype, named in the diff
    f = stage(pa.table({"k": pa.array([2], pa.int32()),
                        "val": pa.array(["b"], pa.string())}))
    with pytest.raises(ValueError, match="int64.*int32|int32.*int64"):
        V.commit_appended_files(spark, p, [f], 1)
    assert V.latest_version(p) == 1  # nothing folded in
    # large_string is read-identical to string: accepted
    f = stage(pa.table({"k": pa.array([2], pa.int64()),
                        "val": pa.array(["b"], pa.large_string())}))
    assert V.commit_appended_files(spark, p, [f], 1) == 2
    # empty head (delete-all) validates against the recorded schema json
    V.delete_table_version(spark, p, "k > 0")
    f = stage(pa.table({"k": pa.array(["9"], pa.string()),
                        "val": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError, match="recorded schema"):
        V.commit_appended_files(spark, p, [f], 1)
    # overwrite only needs the staged files to agree with EACH OTHER
    f1 = stage(pa.table({"z": pa.array([1], pa.int64())}), "a.parquet")
    f2 = stage(pa.table({"z": pa.array(["x"], pa.string())}), "b.parquet")
    with pytest.raises(ValueError, match="schema-incompatible"):
        V.commit_appended_files(spark, p, [f1, f2], 2, overwrite=True)
    f1 = stage(pa.table({"z": pa.array([1], pa.int64())}), "a.parquet")
    f2 = stage(pa.table({"z": pa.array([2], pa.int64())}), "b.parquet")
    V.commit_appended_files(spark, p, [f1, f2], 2, overwrite=True)
    assert {r.z for r in V.read_table_version(spark, p).collect()} == {1, 2}


def test_stream_table_to_table_append_replication(_registered, tmp_path):
    """The source and sink compose: readStream from one versioned table
    into another — appends flow through exactly once across a restart,
    version offsets on the read side, the txn ledger on the write
    side."""
    spark = _registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    V.write_table_version(_df(spark, [(1, 10, "a")]), src, "ds")

    def run():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", src).option("startingVersion", "earliest")
            .load()
            .writeStream.format("versioned_table")
            .option("path", dst).option("txnAppId", "repl")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    assert {(r.k, r.val) for r in V.read_table_version(spark, dst).collect()} \
        == {(1, "a")}
    _append(spark, src, [(2, 20, "b")])
    _append(spark, src, [(3, 30, "c")])
    run()
    got = {(r.k, r.val) for r in V.read_table_version(spark, dst).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # idle rerun: no new version on the target beyond the txn no-op
    head = V.latest_version(dst)
    run()
    assert V.read_table_version(spark, dst).count() == 3
    assert V.latest_version(dst) == head


def test_stream_sink_requires_txn_app_id(_registered, tmp_path):
    spark = _registered
    src = str(tmp_path / "src")
    V.write_table_version(_df(spark, [(1, 10, "a")]), src, "ds")
    # the writer is constructed lazily — the error surfaces when the
    # first batch plans, via the StreamingQuery
    with pytest.raises(Exception, match="txnAppId"):
        q = (
            spark.readStream.format("versioned_table")
            .option("path", src)
            .option("startingVersion", "earliest")
            .load()
            .writeStream.format("versioned_table")
            .option("path", str(tmp_path / "dst"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            q.awaitTermination(10)
        finally:
            q.stop()


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


def test_stream_max_versions_per_trigger_paces_backlog(
    _registered, tmp_path
):
    """maxVersionsPerTrigger=1 splits a 4-version backlog into one
    micro-batch per version (offset-log entries prove the pacing)
    instead of one giant batch — content still exactly-once.  Pacing
    holds ACROSS RESTART too: Spark re-plans the offset log's last
    batch through partitions() before the first latestOffset, so the
    reader's position is checkpoint-accurate (traced; the fresh-start
    first latestOffset derives the start itself because Spark calls it
    BEFORE initialOffset)."""
    spark = _registered
    p = str(tmp_path / "t")
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    V.write_table_version(_df(spark, [(1, 10, "a")]), p, "ds")
    for i in range(2, 5):
        _append(spark, p, [(i, i * 10, chr(96 + i))])

    def run():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", p)
            .option("startingVersion", "earliest")
            .option("maxVersionsPerTrigger", "1")
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

    run()
    got = {(r.k, r.val) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    n_batches = len(list((Path(ckpt) / "offsets").glob("[0-9]*")))
    assert n_batches == 4  # one per version, not one giant batch
    # 3 more versions land while the stream is DOWN; the restarted
    # stream paces the backlog too (one batch per version)
    for i in range(5, 8):
        _append(spark, p, [(i, i * 10, chr(96 + i))])
    run()
    assert spark.read.parquet(out).count() == 7  # exactly-once
    n_batches = len(list((Path(ckpt) / "offsets").glob("[0-9]*")))
    assert n_batches == 7
    with pytest.raises(Exception, match="maxVersionsPerTrigger"):
        (spark.readStream.format("versioned_table")
         .option("path", p).option("maxVersionsPerTrigger", "-2").load())


def test_sink_partitioned_append_hive_escaping_parity(
    _registered, tmp_path
):
    """Partitioned appends: each writer task groups rows by partition
    value and stages one payload parquet per value WITHOUT the
    partition column; the directory segment's Hive escaping must land
    in the SAME directory Spark's own writer uses (tricky values
    pinned), reads/stats/clean-file carry all compose."""
    spark = _registered
    p = str(tmp_path / "t")
    tricky = ["a:b", "x%y", "d#e", "q=r", "s*t", "plain", "spa ce", "中文"]
    V.write_table_version(
        spark.createDataFrame(
            [(i, v, "seed") for i, v in enumerate(tricky)],
            ["k", "ds", "val"],
        ),
        p, "ds", stats_cols=["k"],
    )
    m1 = V._load_manifest(p, 1)
    spark_dirs = {f.rsplit("/", 1)[0] for f in m1["files"]}
    # append one row into EVERY existing partition value + a new one
    spark.createDataFrame(
        [(100 + i, v, "app") for i, v in enumerate(tricky)]
        + [(999, "new:part", "app")],
        ["k", "ds", "val"],
    ).write.format("versioned_table").option("path", p).mode("append").save()
    m2 = V._load_manifest(p, 2)
    sink_dirs = {f.rsplit("/", 1)[0] for f in m2["files"]} - {
        f.rsplit("/", 1)[0] for f in m1["files"]
    }
    # escaping parity: appended files reuse Spark's directory names
    # (only the brand-new partition value adds a directory)
    new_dirs = {d for d in sink_dirs if d not in spark_dirs}
    assert len(new_dirs) == 1 and next(iter(new_dirs)).startswith("ds=new")
    got = {(r.k, r.ds, r.val)
           for r in V.read_table_version(spark, p).collect()}
    assert got == (
        {(i, v, "seed") for i, v in enumerate(tricky)}
        | {(100 + i, v, "app") for i, v in enumerate(tricky)}
        | {(999, "new:part", "app")}
    )
    # the clean seed files carried verbatim (append never rewrites)
    assert set(m1["files"]) <= set(m2["files"])
    assert m2["count"] == len(tricky) * 2 + 1
    # the DataSource batch reader surfaces the partition values too
    rd = spark.read.format("versioned_table").option("path", p).load()
    assert {r.ds for r in rd.collect()} == set(tricky) | {"new:part"}
    # NULL partition value rejected loudly
    with pytest.raises(Exception, match="NULL partition"):
        spark.createDataFrame([(1, None, "x")], "k long, ds string, val string") \
            .write.format("versioned_table").option("path", p).mode("append").save()
    # float partition values have no append-safe rendering
    p3 = str(tmp_path / "f")
    V.write_table_version(
        spark.createDataFrame([(1, 1.5, "a")], "k long, ds double, val string"),
        p3, "ds",
    )
    with pytest.raises(Exception, match="append-safe"):
        spark.createDataFrame([(2, 2.5, "b")], "k long, ds double, val string") \
            .write.format("versioned_table").option("path", p3).mode("append").save()


def test_stream_sink_partitioned_exactly_once(_registered, tmp_path):
    """The streaming sink handles partitioned tables: epochs land one
    file per (task, partition value), the txn ledger still dedupes
    replays, and the table stays readable with partition pruning."""
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(_df(spark, [(1, 1, "seed")]), p, "ds")
    src_dir, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    _df(spark, [(2, 1, "a"), (3, 2, "b")]).write.json(src_dir)
    q = (
        spark.readStream.schema("k long, ds long, val string")
        .json(src_dir)
        .writeStream.format("versioned_table")
        .option("path", p)
        .option("txnAppId", "partjob")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.k, r.val) for r in V.read_table_version(spark, p).collect()}
    assert got == {(1, "seed"), (2, "a"), (3, "b")}
    assert V._load_manifest(p, 2)["partition_by"] == "ds"


def test_sink_dynamic_partition_overwrite(_registered, tmp_path):
    """partitionOverwriteMode=dynamic replaces ONLY the partitions
    present in the written data (Spark/Delta parity): untouched
    partitions' files carry verbatim, counts follow the replaced
    files' footers, static overwrite still replaces everything, and a
    MoR-masked replaced partition is refused (footer counts would
    mis-count)."""
    spark = _registered
    p = str(tmp_path / "t")
    V.write_table_version(
        _df(spark, [(1, 1, "a"), (2, 2, "b"), (3, 3, "c")]), p, "ds"
    )
    m1 = V._load_manifest(p, 1)
    spark.createDataFrame([(20, 2, "B2"), (21, 2, "B3")], ["k", "ds", "val"]) \
        .write.format("versioned_table").option("path", p) \
        .option("partitionOverwriteMode", "dynamic") \
        .mode("overwrite").save()
    m2 = V._load_manifest(p, 2)
    assert m2["op"] == "overwrite(dynamic)"
    got = {(r.k, r.ds, r.val)
           for r in V.read_table_version(spark, p).collect()}
    assert got == {(1, 1, "a"), (20, 2, "B2"), (21, 2, "B3"),
                   (3, 3, "c")}
    assert m2["count"] == 4
    # ds=1 and ds=3 files carried verbatim
    keep = {f for f in m1["files"] if not f.startswith("ds=2/")}
    assert keep <= set(m2["files"])
    # time travel intact
    assert V.read_table_version(spark, p, 1).count() == 3
    # MoR-masked partition: dynamic overwrite refused with remediation
    V.delete_table_version(spark, p, "k = 3", mode="mor")
    with pytest.raises(Exception, match="compact_table_version"):
        spark.createDataFrame([(30, 3, "x")], ["k", "ds", "val"]) \
            .write.format("versioned_table").option("path", p) \
            .option("partitionOverwriteMode", "dynamic") \
            .mode("overwrite").save()
    # static overwrite of a partitioned table replaces everything
    spark.createDataFrame([(9, 9, "z")], ["k", "ds", "val"]) \
        .write.format("versioned_table").option("path", p) \
        .mode("overwrite").save()
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {9}
