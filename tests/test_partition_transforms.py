"""Hidden partitioning (Iceberg-shaped partition transforms, r10 s3):
``partition_by=("days", ts)`` / ``("hours", ts)`` / ``("bucket", col,
n)`` / ``("truncate", str_col, w)`` on versioned tables.  The directory
layout derives from a SOURCE column the payload keeps — the synthetic
column exists only in directory names, the user schema never shows it,
range predicates on the source column prune whole directories, and DML
routes rows by the recomputed transform (an UPDATE that changes the
source value moves the row to its new directory).  Reference shape:
Iceberg partition transforms / hidden partitioning; the reference repo
has no table format at all."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_rust_spark import versions as V


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _days_table(spark, p, stats=None):
    df = spark.createDataFrame(
        [
            (1, _ts("2026-01-01T05:00"), "a"),
            (2, _ts("2026-01-01T09:00"), "b"),
            (3, _ts("2026-01-02T07:00"), "c"),
            (4, _ts("2026-01-03T01:00"), "d"),
        ],
        ["k", "ts", "val"],
    )
    V.write_table_version(df, p, partition_by=("days", "ts"),
                          stats_cols=stats)
    return df


def _dirs(p, v=None):
    m = V._load_manifest(p, v or V.latest_version(p))
    return sorted({f.rsplit("/", 1)[0] for f in m["files"] if "/" in f})


# ------------------------------------------------------------- write/read


def test_days_layout_and_hidden_schema(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    m = V._load_manifest(p, 1)
    assert m["partition_by"] == "_p_days_ts"
    assert m["partition_transform"] == {
        "kind": "days", "source": "ts", "src_type": "timestamp",
    }
    assert m["format"] == 2  # pre-transform readers must refuse
    assert _dirs(p) == [
        "_p_days_ts=2026-01-01", "_p_days_ts=2026-01-02",
        "_p_days_ts=2026-01-03",
    ]
    r = V.read_table_version(spark, p)
    # the synth column is HIDDEN: user schema is exactly the input's
    assert r.columns == ["k", "ts", "val"] and r.count() == 4
    # payload parquet never carries the synth column
    import pyarrow.parquet as pq
    from pathlib import Path

    first = m["files"][0]
    names = pq.read_schema(str(Path(p) / "data" / first)).names
    assert "_p_days_ts" not in names


def test_source_range_prunes_directories(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    m = V._load_manifest(p, 1)
    pruned = V.read_table_version(
        spark, p, prune=[("ts", "2026-01-02", "2026-01-02T23:59")]
    )
    assert len(pruned.inputFiles()) < len(m["files"])
    assert [r.k for r in pruned.collect()] == [3]
    # datetime bounds map too
    pr2 = V.read_table_version(
        spark, p, prune=[("ts", _ts("2026-01-03T00:00"), None)]
    )
    assert sorted(r.k for r in pr2.collect()) == [4]
    assert len(pr2.inputFiles()) == 1
    # pruning is an optimization, never a filter: un-mappable bounds
    # (epoch ints) keep everything
    assert V.read_table_version(
        spark, p, prune=[("ts", 0, None)]
    ).count() == 4


def test_bucket_and_truncate_transforms(spark, tmp_path):
    pb = str(tmp_path / "b")
    V.write_table_version(
        spark.createDataFrame([(i, f"u{i}") for i in range(40)], ["k", "u"]),
        pb, partition_by=("bucket", "k", 4),
    )
    assert len(_dirs(pb)) == 4 and all(
        d.startswith("_p_bucket4_k=") for d in _dirs(pb)
    )
    r = V.read_table_version(spark, pb)
    assert r.columns == ["k", "u"] and r.count() == 40
    pt = str(tmp_path / "tr")
    V.write_table_version(
        spark.createDataFrame(
            [(1, "apple"), (2, "apricot"), (3, "zebra")], ["k", "w"]
        ),
        pt, partition_by=("truncate", "w", 2),
    )
    assert _dirs(pt) == ["_p_truncate2_w=ap", "_p_truncate2_w=ze"]
    pr = V.read_table_version(spark, pt, prune=[("w", "za", None)])
    assert len(pr.inputFiles()) == 1 and pr.count() == 1
    # a value sharing the truncation prefix is never wrongly pruned
    pr2 = V.read_table_version(spark, pt, prune=[("w", "apz", "apz")])
    assert "_p_truncate2_w=ap" in pr2.inputFiles()[0]


def test_spec_validation(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], ["k", "w"])
    p = str(tmp_path / "t")
    with pytest.raises(ValueError, match="timestamp/date"):
        V.write_table_version(df, p, partition_by=("days", "k"))
    with pytest.raises(ValueError, match="string source"):
        V.write_table_version(df, p, partition_by=("truncate", "k", 4))
    with pytest.raises(ValueError, match="unknown partition transform"):
        V.write_table_version(df, p, partition_by=("weeks", "k"))
    with pytest.raises(ValueError, match="n>0"):
        V.write_table_version(df, p, partition_by=("bucket", "k", 0))
    with pytest.raises(ValueError, match="not in the"):
        V.write_table_version(df, p, partition_by=("bucket", "nope", 4))


# ------------------------------------------------------------------- DML


def test_upsert_routes_by_transform_and_carries_clean_days(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    m1 = V._load_manifest(p, 1)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame(
            [(2, _ts("2026-01-01T09:00"), "B")], ["k", "ts", "val"]
        ),
        keys=["k"],
    )
    m2 = V._load_manifest(p, 2)
    carried = set(m1["files"]) & set(m2["files"])
    # only the dirty DAY rewrites; the other two days carry verbatim
    assert {f for f in m1["files"] if not f.startswith("_p_days_ts=2026-01-01")} <= carried
    assert all(
        f.startswith("_p_days_ts=2026-01-01")
        for f in set(m2["files"]) - carried
    )
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # a mismatched layout spec is rejected loudly
    with pytest.raises(ValueError, match="hidden-partitioned"):
        V.upsert_table_version(
            spark, p,
            spark.createDataFrame(
                [(9, _ts("2026-01-01T00:00"), "x")], ["k", "ts", "val"]
            ),
            keys=["k"], partition_by="ts",
        )
    # the matching tuple is accepted
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame(
            [(9, _ts("2026-01-09T00:00"), "x")], ["k", "ts", "val"]
        ),
        keys=["k"], partition_by=("days", "ts"),
    )
    assert "_p_days_ts=2026-01-09" in _dirs(p)


def test_update_of_source_moves_row_to_new_directory(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    V.update_table_version(
        spark, p, "k = 4", {"ts": "timestamp'2026-01-05 00:00:00'"}
    )
    assert "_p_days_ts=2026-01-05" in _dirs(p)
    assert "_p_days_ts=2026-01-03" not in _dirs(p)
    row = V.read_table_version(spark, p).filter("k = 4").collect()[0]
    assert row.ts == _ts("2026-01-05T00:00")


def test_mor_delete_fold_and_cow_delete(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    assert sorted(r.k for r in V.read_table_version(spark, p).collect()) == [2, 3, 4]
    # parity: the CoW result of the same delete equals the MoR read
    V.compact_table_version(spark, p, target_file_bytes=1 << 30)
    assert not V._load_manifest(p, V.latest_version(p)).get("deletes")
    assert sorted(r.k for r in V.read_table_version(spark, p).collect()) == [2, 3, 4]
    V.delete_table_version(spark, p, "k = 2")
    assert sorted(r.k for r in V.read_table_version(spark, p).collect()) == [3, 4]


def test_merge_routes_inserts_by_transform(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    src = spark.createDataFrame(
        [(3, _ts("2026-01-02T07:00"), "C"), (8, _ts("2026-02-01T00:00"), "new")],
        ["k", "ts", "val"],
    )
    V.merge_table_version(
        spark, p, src, ["k"],
        when_matched_update="*", when_not_matched_insert=True,
    )
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[3] == "C" and got[8] == "new"
    assert "_p_days_ts=2026-02-01" in _dirs(p)


# ------------------------------------------------------ lifecycle / misc


def test_time_travel_restore_clone_inherit_transform(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    V.delete_table_version(spark, p, "k = 1")
    V.restore_table_version(p, 1)
    assert V.read_table_version(spark, p).count() == 4
    assert V._load_manifest(p, V.latest_version(p))["partition_transform"]
    dst = str(tmp_path / "c")
    V.clone_table(p, dst)
    mc = V._load_manifest(dst, 1)
    assert mc["partition_transform"]["source"] == "ts"
    assert V.read_table_version(spark, dst).columns == ["k", "ts", "val"]


def test_expire_and_partitions_report(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame(
            [(5, _ts("2026-01-02T12:00"), "e")], ["k", "ts", "val"]
        ),
        keys=["k"],
    )
    V.expire_versions(p, keep_last=1, grace_seconds=0)
    assert V.read_table_version(spark, p).count() == 5
    tp = V.table_partitions(p)
    assert tp["transform"]["kind"] == "days"
    by = {x["value"]: x["rows"] for x in tp["partitions"]}
    assert by["2026-01-02"] == 2


def test_alter_follows_source_rename_and_sets_transform(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    # rename the SOURCE column via full-re-snapshot alter: the
    # transform follows, the synth directory name re-derives
    V.alter_table_version(spark, p, rename={"ts": "event_ts"})
    m = V._load_manifest(p, V.latest_version(p))
    assert (m["partition_transform"]["kind"], m["partition_transform"]["source"]) == ("days", "event_ts")
    assert m["partition_by"] == "_p_days_event_ts"
    assert V.read_table_version(spark, p).columns == ["k", "event_ts", "val"]
    # dropping the source without a new layout is rejected
    with pytest.raises(ValueError, match="source of the table"):
        V.alter_table_version(spark, p, drop=["event_ts"])
    # and ALTER can SET a transform on a plain table
    p2 = str(tmp_path / "u")
    V.write_table_version(
        spark.createDataFrame([(i, f"w{i}") for i in range(8)], ["k", "w"]),
        p2,
    )
    V.alter_table_version(spark, p2, new_partition_by=("bucket", "k", 2))
    m2 = V._load_manifest(p2, V.latest_version(p2))
    assert m2["partition_transform"]["kind"] == "bucket"
    assert len(_dirs(p2)) == 2
    assert V.read_table_version(spark, p2).columns == ["k", "w"]


def test_metadata_rename_keeps_transform_working(spark, tmp_path):
    """Column mapping composes: a METADATA-ONLY rename of the source
    leaves the physical transform untouched; upserts in the new logical
    name still route by day."""
    p = str(tmp_path / "t")
    _days_table(spark, p)
    V.rename_columns(spark, p, {"ts": "event_ts"})
    assert V.read_table_version(spark, p).columns == ["k", "event_ts", "val"]
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame(
            [(7, _ts("2026-03-01T00:00"), "g")], ["k", "event_ts", "val"]
        ),
        keys=["k"],
    )
    assert "_p_days_ts=2026-03-01" in _dirs(p)  # physical synth stable
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[7] == "g" and len(got) == 5


def test_datasource_hides_synth_and_sink_appends_transform(
    spark, tmp_path
):
    """The jar-free sink derives transform directories per row via the
    pure-Python replica (r10 s4 — closes the documented refusal): the
    appended file must land in the SAME directory Spark's own staging
    would pick (a wrong directory silently drops the row from later
    day-range prunes), and reads/prunes compose."""
    from etl_rust_spark.sources.table_source import VersionedTableDataSource

    spark.dataSource.register(VersionedTableDataSource)
    p = str(tmp_path / "t")
    _days_table(spark, p)
    df = (
        spark.read.format("versioned_table").option("path", p).load()
    )
    assert df.columns == ["k", "ts", "val"]
    assert df.count() == 4
    # sink-append one row into an EXISTING day and one into a new day
    spark.createDataFrame(
        [(9, _ts("2026-01-01T23:59"), "x"),
         (10, _ts("2026-03-05T00:00"), "y")],
        ["k", "ts", "val"],
    ).write.format("versioned_table").option("path", p).mode(
        "append"
    ).save()
    out = V.read_table_version(spark, p)
    assert out.count() == 6
    assert "_p_days_ts" not in out.columns
    # the sink-staged file shares the directory with Spark-staged ones
    jan1 = V.read_table_version(
        spark, p,
        prune=[("ts", _ts("2026-01-01T00:00"), _ts("2026-01-01T23:59"))],
    )
    dirs = {f.rsplit("/", 2)[-2] for f in jan1.inputFiles()}
    assert dirs == {"_p_days_ts=2026-01-01"}
    assert {r.k for r in jan1.where("ts >= timestamp'2026-01-01'")
            .where("ts < timestamp'2026-01-02'").collect()} >= {9}
    # the new day pruned exactly
    mar = V.read_table_version(
        spark, p,
        prune=[("ts", _ts("2026-03-05T00:00"), _ts("2026-03-05T23:59"))],
    )
    assert {f.rsplit("/", 2)[-2] for f in mar.inputFiles()} == {
        "_p_days_ts=2026-03-05"
    }
    assert [r.k for r in mar.collect()] == [10]


def test_sink_appends_bucket_table_point_probe_finds_row(
    spark, tmp_path
):
    """Bucket tables: the sink's xxhash64 replica must place the row
    in the bucket Spark's point probe will look in — the silent-drop
    hazard the replica's parity pin exists for."""
    from etl_rust_spark.sources.table_source import VersionedTableDataSource

    spark.dataSource.register(VersionedTableDataSource)
    p = str(tmp_path / "b")
    V.write_table_version(
        spark.createDataFrame([(i, f"u{i}") for i in range(16)],
                              ["k", "u"]),
        p, partition_by=("bucket", "k", 8),
    )
    spark.createDataFrame([(99, "u99"), (100, "u100")], ["k", "u"]) \
        .write.format("versioned_table").option("path", p) \
        .mode("append").save()
    for probe in (99, 100):
        r = V.read_table_version(spark, p, point=[("k", probe)])
        dirs = {f.split("/")[-2] for f in r.inputFiles()}
        assert len(dirs) == 1, dirs
        assert [x.u for x in r.where(F.col("k") == probe).collect()] \
            == [f"u{probe}"]  # found — never a silent drop


def test_sink_transform_null_source_raises(spark, tmp_path):
    from etl_rust_spark.sources.table_source import VersionedTableDataSource

    spark.dataSource.register(VersionedTableDataSource)
    p = str(tmp_path / "t")
    _days_table(spark, p)
    with pytest.raises(Exception, match="NULL"):
        spark.createDataFrame(
            [(9, None, "x")],
            V.read_table_version(spark, p).schema,
        ).write.format("versioned_table").option("path", p).mode(
            "append"
        ).save()


def test_cdc_over_transform_table(spark, tmp_path):
    p = str(tmp_path / "t")
    _days_table(spark, p)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame(
            [(2, _ts("2026-01-01T09:00"), "B")], ["k", "ts", "val"]
        ),
        keys=["k"],
    )
    V.delete_table_version(spark, p, "k = 3")
    ch = V.read_table_changes(spark, p, ["k"], 1)
    by = {(r.k, r._commit_version): r._change_type for r in ch.collect()}
    assert by[(2, 2)] == "update_postimage" and by[(3, 3)] == "delete"
    assert "_change_type" in ch.columns and "_p_days_ts" not in ch.columns


# -------------------------------------- bucket probes / hours pruning


def test_bucket_point_probe_prunes_to_one_directory(spark, tmp_path):
    """point=[(source, v)] on a bucket table reads only v's bucket —
    the driver-side xxhash64 replica must agree with Spark's."""
    p = str(tmp_path / "b")
    V.write_table_version(
        spark.createDataFrame([(i, f"u{i}") for i in range(64)], ["k", "u"]),
        p, partition_by=("bucket", "k", 8),
    )
    m = V._load_manifest(p, 1)
    assert m["partition_transform"]["src_type"] == "bigint"
    for probe in (0, 17, 63):
        r = V.read_table_version(spark, p, point=[("k", probe)])
        dirs = {f.split("/")[-2] for f in r.inputFiles()}
        assert len(dirs) == 1, dirs
        assert [x.u for x in r.filter(F.col("k") == probe).collect()] == [
            f"u{probe}"
        ]  # never a false negative
    # string-source buckets prune too
    ps = str(tmp_path / "bs")
    V.write_table_version(
        spark.createDataFrame([(i, f"user-{i}") for i in range(64)], ["k", "u"]),
        ps, partition_by=("bucket", "u", 8),
    )
    r = V.read_table_version(spark, ps, point=[("u", "user-33")])
    assert len({f.split("/")[-2] for f in r.inputFiles()}) == 1
    assert r.filter("u = 'user-33'").count() == 1
    # two probes in DIFFERENT buckets: AND semantics — no file can hold
    # both, so everything prunes (and the filter returns nothing)
    vals = {d: None for d in range(3)}
    r2 = V.read_table_version(spark, ps, point=[("u", "user-1"), ("u", "user-2")])
    segs = {V._bucket_seg_of(V._transform_of(V._load_manifest(ps, 1)), v)
            for v in ("user-1", "user-2")}
    if len(segs) == 2:
        assert r2.count() == 0


def test_bucket_probe_unknown_dtype_keeps_everything(spark, tmp_path):
    """A probe whose Python type doesn't match the recorded source
    dtype must prune NOTHING (a wrong bucket would silently drop
    rows)."""
    p = str(tmp_path / "b")
    V.write_table_version(
        spark.createDataFrame([(i, f"u{i}") for i in range(16)], ["k", "u"]),
        p, partition_by=("bucket", "k", 4),
    )
    m = V._load_manifest(p, 1)
    r = V.read_table_version(spark, p, point=[("k", "17")])  # str vs bigint
    assert len(r.inputFiles()) == len(m["files"])


def test_xxhash64_parity_is_pinned(spark):
    """The driver-side bucket replica's byte encodings vs Spark's
    XxHash64 — the soundness foundation of bucket probe pruning."""
    t_long = {"kind": "bucket", "source": "k", "n": 1 << 62,
              "src_type": "bigint"}
    t_int = {**t_long, "src_type": "int"}
    t_str = {**t_long, "src_type": "string"}
    rows = spark.createDataFrame(
        [(5, 5, "abc"), (-17, -17, "héllo"), (1 << 40, 7, "")],
        "l long, i int, s string",
    ).select(
        F.xxhash64("l").alias("hl"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("s").alias("hs"),
        "l", "i", "s",
    ).collect()
    n = 1 << 62
    for r in rows:
        assert V._bucket_seg_of(t_long, r.l) == str(r.hl % n)
        assert V._bucket_seg_of(t_int, r.i) == str(r.hi % n)
        assert V._bucket_seg_of(t_str, r.s) == str(r.hs % n)
    # bool is an int subtype but hashes differently — refused
    assert V._bucket_seg_of(t_long, True) is None


def test_hours_transform_layout_and_pruning(spark, tmp_path):
    p = str(tmp_path / "h")
    df = spark.createDataFrame(
        [(1, _ts("2026-01-01T05:10")), (2, _ts("2026-01-01T09:20")),
         (3, _ts("2026-01-01T09:45")), (4, _ts("2026-01-02T00:00"))],
        ["k", "ts"],
    )
    V.write_table_version(df, p, partition_by=("hours", "ts"))
    assert _dirs(p) == [
        "_p_hours_ts=2026-01-01-05", "_p_hours_ts=2026-01-01-09",
        "_p_hours_ts=2026-01-02-00",
    ]
    pr = V.read_table_version(
        spark, p, prune=[("ts", "2026-01-01T09:00", "2026-01-01T09:59")]
    )
    assert {f.split("/")[-2] for f in pr.inputFiles()} == {
        "_p_hours_ts=2026-01-01-09"
    }
    assert sorted(r.k for r in pr.collect()) == [2, 3]
    pr2 = V.read_table_version(
        spark, p, prune=[("ts", _ts("2026-01-02T00:00"), None)]
    )
    assert sorted(r.k for r in pr2.collect()) == [4]


def test_days_are_utc_days_regardless_of_session_timezone(spark, tmp_path):
    """Iceberg parity: days(ts) of an INSTANT source uses UTC epoch
    arithmetic — a writer on a Tokyo-configured session must produce
    the same directory layout as a UTC one (a session-tz-dependent
    boundary would split one table's layout across writers)."""
    p = str(tmp_path / "t")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        # 2026-01-01 23:30 UTC == 2026-01-02 08:30 Tokyo: the UTC day
        # is the layout, whatever the session renders
        df = spark.sql(
            "SELECT 1 AS k, timestamp'2026-01-01 23:30:00 UTC' AS ts"
        )
        V.write_table_version(df, p, partition_by=("days", "ts"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert _dirs(p) == ["_p_days_ts=2026-01-01"]
    # and the directory prune agrees with the UTC contract
    pr = V.read_table_version(
        spark, p, prune=[("ts", "2026-01-01", "2026-01-01T23:59")]
    )
    assert pr.count() == 1


def test_model_fuzz_over_transform_table(spark, tmp_path):
    """The v2 model fuzz's op mix — upsert / delete / mor_delete /
    update / merge / compact / zorder / expire / restore — over a
    days-TRANSFORM table: head equality after every op, exact time
    travel for every surviving version.  The transform must stay
    invisible to every op's semantics while silently routing rows."""
    import random

    rng = random.Random(0x7F0)
    p = str(tmp_path / "t")
    model: dict[int, dict[int, str]] = {}
    counter = 0

    def frame(rows):
        return spark.createDataFrame(
            [(k, _ts(f"2026-01-0{1 + k % 3}T06:00"), k * 7 % 5, v)
             for k, v in rows],
            ["k", "ts", "y", "val"],
        )

    V.write_table_version(
        frame([(1, "s0"), (2, "s1")]), p, ("days", "ts"),
        stats_cols=["k", "y"],
    )
    state = {1: "s0", 2: "s1"}
    model[1] = dict(state)
    for step in range(12):
        op = rng.choice(
            ["upsert", "upsert", "delete", "mor_delete", "update",
             "merge", "mor_merge", "compact", "zorder", "expire",
             "restore"]
        )
        if op == "upsert":
            counter += 1
            rows = list({
                rng.randint(1, 12): f"u{counter}.{j}"
                for j in range(rng.randint(1, 3))
            }.items())
            v = V.upsert_table_version(spark, p, frame(rows), keys=["k"])
            state.update(dict(rows))
            model[v] = dict(state)
        elif op in ("delete", "mor_delete"):
            kdel = rng.randint(1, 12)
            head_before = V.latest_version(p)
            v = V.delete_table_version(
                spark, p, f"k = {kdel}",
                mode="mor" if op == "mor_delete" else "cow",
            )
            if kdel in state:
                assert v == head_before + 1
                del state[kdel]
                model[v] = dict(state)
            else:
                assert v == head_before
        elif op == "update":
            kup = rng.randint(1, 12)
            head_before = V.latest_version(p)
            v = V.update_table_version(
                spark, p, f"k = {kup}", {"val": "concat(val, '!')"}
            )
            if kup in state:
                state[kup] = state[kup] + "!"
                model[v] = dict(state)
            else:
                assert v == head_before
        elif op in ("merge", "mor_merge"):
            counter += 1
            feed = {
                rng.randint(1, 12): rng.choice(["U", "D", "I"])
                for _ in range(rng.randint(1, 3))
            }
            src = spark.createDataFrame(
                [(k, _ts(f"2026-01-0{1 + k % 3}T06:00"), k * 7 % 5,
                  f"m{counter}.{k}", o) for k, o in feed.items()],
                ["k", "ts", "y", "val", "op"],
            )
            head_before = V.latest_version(p)
            v = V.merge_table_version(
                spark, p, src, keys=["k"],
                when_matched_update="*",
                when_matched_delete="s.op = 'D'",
                when_not_matched_insert="s.op = 'I'",
                update_condition="s.op = 'U'",
                mode="mor" if op == "mor_merge" else "cow",
            )
            changed = any(k in state for k in feed) or any(
                k not in state and o == "I" for k, o in feed.items()
            )
            for k, o in feed.items():
                if k in state:
                    if o == "D":
                        del state[k]
                    elif o == "U":
                        state[k] = f"m{counter}.{k}"
                elif o == "I":
                    state[k] = f"m{counter}.{k}"
            if changed:
                assert v == head_before + 1
                model[v] = dict(state)
            else:
                assert v == head_before
        elif op == "compact":
            v = V.compact_table_version(spark, p, target_file_bytes=1 << 30)
            model[v] = dict(state)
        elif op == "zorder":
            v = V.compact_table_version(spark, p, 2, zorder_by=["k", "y"])
            model[v] = dict(state)
        elif op == "restore":
            tgt = rng.choice(sorted(model))
            v = V.restore_table_version(p, tgt)
            state = dict(model[tgt])
            model[v] = dict(state)
        else:
            keep = rng.randint(1, 3)
            V.expire_versions(p, keep_last=keep)
            live = sorted(model)[-keep:]
            model = {v: c for v, c in model.items() if v in live}
        if state:
            head = {
                r.k: r.val for r in V.read_table_version(spark, p).collect()
            }
            assert head == state, f"step {step} ({op})"
            # the synth column never leaks into any read
            assert all(
                not c.startswith("_p_")
                for c in V.read_table_version(spark, p).columns
            )
    for v, want in model.items():
        got = {
            r.k: r.val for r in V.read_table_version(spark, p, v).collect()
        }
        assert got == want, f"time travel to v{v}"


def test_streaming_epoch_upserts_into_transform_table(spark, tmp_path):
    """The foreachBatch epoch processor composes with hidden
    partitioning: epochs route rows by the transform, and an epoch
    REPLAY (crash-recovery) is content-idempotent."""
    from etl_rust_spark.streaming.tables import versioned_upsert_processor

    p = str(tmp_path / "t")
    _days_table(spark, p)
    proc = versioned_upsert_processor(p, keys=["k"])
    e1 = spark.createDataFrame(
        [(2, _ts("2026-01-01T09:00"), "B"), (8, _ts("2026-01-08T00:00"), "h")],
        ["k", "ts", "val"],
    )
    proc(e1, 1)
    assert "_p_days_ts=2026-01-08" in _dirs(p)
    head = V.latest_version(p)
    proc(e1, 1)  # replay: content-idempotent (a content-equal version)
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d", 8: "h"}
    assert {
        r.k: r.val for r in V.read_table_version(spark, p, head).collect()
    } == got


def test_replicate_changes_between_transform_tables(spark, tmp_path):
    """CDC replication source→target where BOTH are hidden-partitioned:
    bootstrap takes the transform spec, incremental steps apply as
    merges, target content tracks the source head."""
    from etl_rust_spark.streaming.tables import replicate_table_changes

    src = str(tmp_path / "s")
    dst = str(tmp_path / "d")
    cur = str(tmp_path / "cur")
    _days_table(spark, src)
    n = replicate_table_changes(
        spark, src, dst, ["k"], cur, partition_by=("days", "ts")
    )
    assert V._load_manifest(dst, 1)["partition_transform"]["kind"] == "days"
    V.upsert_table_version(
        spark, src,
        spark.createDataFrame(
            [(9, _ts("2026-02-01T00:00"), "i")], ["k", "ts", "val"]
        ),
        keys=["k"],
    )
    V.delete_table_version(spark, src, "k = 1")
    replicate_table_changes(spark, src, dst, ["k"], cur)
    want = sorted(
        (r.k, r.val) for r in V.read_table_version(spark, src).collect()
    )
    got = sorted(
        (r.k, r.val) for r in V.read_table_version(spark, dst).collect()
    )
    assert got == want
    assert "_p_days_ts=2026-02-01" in _dirs(dst)


def test_sink_days_utc_under_tokyo_session(spark, tmp_path):
    """The SINK's Python-side day derivation must also be UTC-pinned:
    a Tokyo-configured session hands the Python worker naive datetimes
    RENDERED IN TOKYO, and the replica must convert them back to the
    instant before the UTC day arithmetic — otherwise the appended
    file lands in the wrong (local) day directory and vanishes from
    day-range prunes."""
    from etl_rust_spark.sources.table_source import VersionedTableDataSource

    spark.dataSource.register(VersionedTableDataSource)
    p = str(tmp_path / "t")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        seed = spark.sql(
            "SELECT 1 AS k, timestamp'2026-01-01 10:00:00 UTC' AS ts"
        )
        V.write_table_version(seed, p, partition_by=("days", "ts"))
        # 23:30 UTC is ALREADY Jan 2 in Tokyo: the sink must still
        # stage under the UTC day
        spark.sql(
            "SELECT 2 AS k, timestamp'2026-01-01 23:30:00 UTC' AS ts"
        ).write.format("versioned_table").option("path", p).mode(
            "append"
        ).save()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert _dirs(p) == ["_p_days_ts=2026-01-01"]
    pr = V.read_table_version(
        spark, p, prune=[("ts", "2026-01-01", "2026-01-01T23:59")]
    )
    assert sorted(r.k for r in pr.collect()) == [1, 2]


def test_py_transform_replica_matches_spark_fuzz(spark, tmp_path):
    """Property pin for the sink's pure-Python transform twin: over
    random values, _py_transform_value must equal Spark's own
    _transform_expr rendering for every transform kind — the replica's
    whole contract is byte-for-byte directory parity."""
    import random

    from etl_rust_spark.versions import (
        _py_transform_value,
        _transform_expr,
    )

    rng = random.Random(0x7AB5)

    # instants across decades incl. negative epochs and day boundaries
    instants = [rng.randint(-10**9, 2 * 10**9) for _ in range(40)]
    instants += [0, -1, 86399, 86400, -86400]
    df = spark.createDataFrame(
        [(e,) for e in instants], ["e"]
    ).selectExpr("timestamp_seconds(e) as ts", "e")
    for kind in ("days", "hours"):
        t = {"kind": kind, "source": "ts", "src_type": "timestamp"}
        got = df.select(
            "e", _transform_expr(t).alias("s")
        ).collect()
        for r in got:
            py = _py_transform_value(
                t, datetime.datetime.fromtimestamp(
                    r.e, datetime.timezone.utc
                ), "UTC",
            )
            assert py == r.s, (kind, r.e, py, r.s)

    # fractional seconds on PRE-1970 instants: Spark's cast-to-bigint
    # floors, so the twin must floor too — int() truncation toward
    # zero puts e.g. -0.5 s in 1970-01-01 instead of 1969-12-31
    # (ADVICE r10)
    frac = [-0.5, -1.25, -86399.5, -86400.5, 0.5, 86399.5]
    frac += [e + 0.5 for e in instants[:10]]
    fdf = spark.createDataFrame(
        [(e,) for e in frac], "e double"
    ).selectExpr("timestamp_seconds(e) as ts", "e")
    for kind in ("days", "hours"):
        t = {"kind": kind, "source": "ts", "src_type": "timestamp"}
        got = fdf.select("e", _transform_expr(t).alias("s")).collect()
        for r in got:
            py = _py_transform_value(
                t, datetime.datetime.fromtimestamp(
                    r.e, datetime.timezone.utc
                ), "UTC",
            )
            assert py == r.s, (kind, r.e, py, r.s)

    # bucket over bigint incl. negatives (xxhash64 sign handling)
    keys = [rng.randint(-2**62, 2**62) for _ in range(60)] + [0, -1, 1]
    bt = {"kind": "bucket", "source": "k", "n": 16,
          "src_type": "bigint"}
    got = spark.createDataFrame([(k,) for k in keys], ["k"]).select(
        "k", _transform_expr(bt).alias("s")
    ).collect()
    for r in got:
        assert _py_transform_value(bt, r.k) == r.s, r.k

    # bucket over strings (UTF-8 incl. multibyte)
    words = ["", "a", "naïve", "東京", "x" * 100] + [
        f"u{rng.randint(0, 10**6)}" for _ in range(30)
    ]
    bs = {"kind": "bucket", "source": "w", "n": 8,
          "src_type": "string"}
    got = spark.createDataFrame([(w,) for w in words], ["w"]).select(
        "w", _transform_expr(bs).alias("s")
    ).collect()
    for r in got:
        assert _py_transform_value(bs, r.w) == r.s, r.w

    # truncate slices by code points, exactly like substring
    tt = {"kind": "truncate", "source": "w", "n": 3,
          "src_type": "string"}
    got = spark.createDataFrame(
        [(w,) for w in words if w], ["w"]
    ).select("w", _transform_expr(tt).alias("s")).collect()
    for r in got:
        assert _py_transform_value(tt, r.w) == r.s, r.w
