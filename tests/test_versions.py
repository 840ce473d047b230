"""Manifest-based table versioning (etl_rust_spark/versions.py):
time travel, atomic commits, file-level copy-on-write upserts, version
diff, and retention."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from etl_rust_spark import versions as V


def _t(spark, rows):
    return spark.createDataFrame(rows, ["k", "ds", "val"])


def test_time_travel_reads_old_versions_byte_identically(spark, tmp_path):
    p = str(tmp_path / "t")
    v1 = V.write_table_version(_t(spark, [(1, 1, "a"), (2, 1, "b")]), p, "ds")
    v2 = V.upsert_table_version(
        spark, p, _t(spark, [(2, 1, "B"), (3, 2, "c")]), keys=["k"],
        partition_by="ds",
    )
    assert (v1, v2) == (1, 2)
    old = {r.k: r.val for r in V.read_table_version(spark, p, 1).collect()}
    new = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert old == {1: "a", 2: "b"}          # v1 unchanged after the upsert
    assert new == {1: "a", 2: "B", 3: "c"}  # v2 merged
    assert V.list_versions(p) == [1, 2] and V.latest_version(p) == 2
    # partition column survives the explicit-file-list read
    assert {r.ds for r in V.read_table_version(spark, p).collect()} == {1, 2}


def test_upsert_reuses_clean_partition_files(spark, tmp_path):
    """File-level COW: the untouched partition's files appear verbatim
    in the new manifest; only the dirty partition's files are new."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds"
    )
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 2, "c")]), keys=["k"], partition_by="ds"
    )
    m1 = V._load_manifest(p, 1)
    m2 = V._load_manifest(p, 2)
    f1_clean = {f for f in m1["files"] if f.startswith("ds=1/")}
    assert f1_clean and f1_clean <= set(m2["files"])  # shared, not copied
    f1_dirty = {f for f in m1["files"] if f.startswith("ds=2/")}
    assert f1_dirty.isdisjoint(m2["files"])           # rewritten
    assert m2["count"] == 3


def test_crash_before_marker_is_invisible(spark, tmp_path):
    """Files + manifest landing WITHOUT the marker replace (a writer
    crash) leave the table at the old version; expire sweeps the
    leftovers."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    # simulate the crash window: stage a manifest beyond _latest
    files = V._stage_files(_t(spark, [(9, 9, "z")]), p, "ds")
    (Path(p) / "_manifests" / "m00000002.json").write_text(
        json.dumps({"version": 2, "parent": 1, "partition_by": "ds",
                    "count": 1, "files": files})
    )
    assert V.latest_version(p) == 1
    assert V.list_versions(p) == [1]
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {1}
    rep = V.expire_versions(p, keep_last=5)
    assert rep["dropped_manifests"] == 1 and rep["dropped_files"] >= 1
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {1}


def test_diff_and_expire_share_files_safely(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "B")]), keys=["k"], partition_by="ds"
    )
    V.upsert_table_version(
        spark, p, _t(spark, [(4, 2, "d")]), keys=["k"], partition_by="ds"
    )
    d = {r.k: r.diff for r in
         V.diff_table_versions(spark, p, 1, 3, keys=["k"]).collect()}
    assert d == {2: "changed", 4: "added"}
    rep = V.expire_versions(p, keep_last=2)
    assert rep["kept_versions"] == [2, 3]
    # v2 and v3 still read (they share ds=1 files with dropped v1)
    assert {r.k for r in V.read_table_version(spark, p, 2).collect()} == {1, 2}
    assert {r.k for r in V.read_table_version(spark, p, 3).collect()} == {1, 2, 4}
    with pytest.raises(FileNotFoundError):
        V._load_manifest(p, 1)


def test_unpartitioned_and_guards(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p)
    V.upsert_table_version(spark, p, _t(spark, [(1, 1, "A")]), keys=["k"])
    assert {r.val for r in V.read_table_version(spark, p).collect()} == {"A"}
    with pytest.raises(ValueError, match="partitioned"):
        V.upsert_table_version(
            spark, p, _t(spark, [(1, 1, "x")]), keys=["k"], partition_by="ds"
        )
    with pytest.raises(ValueError, match="key"):
        V.upsert_table_version(
            spark, p, spark.createDataFrame([(1,)], ["z"]), keys=["k"]
        )
    with pytest.raises(FileNotFoundError):
        V.read_table_version(spark, str(tmp_path / "nope"))


def test_cli_table_verb_snapshot_upsert_read_expire(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    feed1, feed2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    _t(spark, [(1, 1, "a"), (2, 2, "b")]).write.parquet(feed1)
    _t(spark, [(2, 2, "B")]).write.parquet(feed2)
    table = str(tmp_path / "versioned")
    assert main(["table", table, "--snapshot", feed1, "--partition-by", "ds"]) == 0
    assert main(["table", table, "--upsert", feed2, "--keys", "k",
                 "--partition-by", "ds"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "asof1")
    assert main(["table", table, "--read", "1", "--out", out,
                 "--expire-keep", "2"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 2 and rep["versions"] == [1, 2]
    assert {r.val for r in spark.read.parquet(out).collect()} == {"a", "b"}


def test_versioned_read_still_prunes_partitions(spark, tmp_path):
    """The explicit-file-list read keeps directory-partition pruning: a
    ds filter scans only that partition's files (basePath anchoring)."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(i, i % 4, "x") for i in range(40)]), p, "ds"
    )
    df = V.read_table_version(spark, p).filter("ds = 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*ds[^\]]*\]", plan)
    assert m, plan[:800]  # ds filter became a partition filter, not a row filter
    assert df.count() == 10


def test_upsert_add_column_evolution(spark, tmp_path):
    """A delta with an added column commits a FULL new snapshot with
    NULL backfill; old versions keep reading the old schema
    byte-identically."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    delta = spark.createDataFrame(
        [(2, 2, "B", 9.5)], ["k", "ds", "val", "score"]
    )
    V.upsert_table_version(spark, p, delta, keys=["k"], partition_by="ds")
    new = {r.k: (r.val, r.score) for r in
           V.read_table_version(spark, p).collect()}
    assert new == {1: ("a", None), 2: ("B", 9.5)}
    # old version keeps the old schema (partition col reads back last)
    assert set(V.read_table_version(spark, p, 1).columns) == {"k", "ds", "val"}
    # dropped columns are rejected, not silently NULL-filled
    with pytest.raises(ValueError, match="missing table columns"):
        V.upsert_table_version(
            spark, p, spark.createDataFrame([(1, 1)], ["k", "ds"]),
            keys=["k"], partition_by="ds",
        )


def test_streaming_versioned_upsert_replay_idempotent(spark, tmp_path):
    """Epoch replay commits a redundant version whose CONTENT equals the
    head — readers of latest never see dupes or lost updates."""
    from etl_rust_spark.streaming.tables import versioned_upsert_processor

    p = str(tmp_path / "t")
    process = versioned_upsert_processor(p, keys=["k"], partition_by="ds")
    process(_t(spark, [(1, 1, "a"), (2, 2, "b")]), 0)
    process(_t(spark, [(2, 2, "B"), (3, 1, "c")]), 1)
    head = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert head == {1: "a", 2: "B", 3: "c"}
    v_before = V.latest_version(p)
    process(_t(spark, [(2, 2, "B"), (3, 1, "c")]), 1)  # crash replay
    assert V.latest_version(p) == v_before + 1  # a version committed...
    again = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert again == head                        # ...with identical content
    process(spark.createDataFrame([], _t(spark, [(1, 1, "a")]).schema), 2)
    assert V.latest_version(p) == v_before + 1  # empty epochs commit nothing


def test_manifest_stats_prune_files_on_nonpartition_predicates(spark, tmp_path):
    """Iceberg-style manifest stats: a clustered versioned table prunes
    FILES driver-side on a non-partition range predicate — the skipping
    a directory-partition read cannot give an explicit file list."""
    p = str(tmp_path / "t")
    df = (
        spark.range(8000)
        .selectExpr("id AS k", "CAST(id % 500 AS BIGINT) AS x", "id AS payload")
        .repartitionByRange(8, "x")
        .sortWithinPartitions("x")
    )
    V.write_table_version(df, p, stats_cols=["x"])
    full = V.read_table_version(spark, p)
    assert len(full.inputFiles()) == 8
    pruned = V.read_table_version(spark, p, prune=[("x", 10, 20)])
    assert 1 <= len(pruned.inputFiles()) <= 2  # 8 disjoint x-ranges
    # pruning is an optimization, never a filter: same answer both ways
    want = full.filter("x BETWEEN 10 AND 20").count()
    assert pruned.filter("x BETWEEN 10 AND 20").count() == want
    # a disjoint range prunes to the empty frame, schema intact
    none = V.read_table_version(spark, p, prune=[("x", 10_000, 20_000)])
    assert none.count() == 0 and set(none.columns) == {"k", "x", "payload"}


def test_upsert_inherits_and_carries_stats(spark, tmp_path):
    """stats_cols inherit from the parent manifest; carried files keep
    their recorded stats without a re-read, new files get fresh ones."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, partition_by="ds",
        stats_cols=["k"],
    )
    V.upsert_table_version(
        spark, p, _t(spark, [(30, 2, "c")]), keys=["k"], partition_by="ds"
    )
    m2 = V._load_manifest(p, 2)
    assert m2["stats_cols"] == ["k"]
    assert all(f in m2["stats"] for f in m2["files"])
    pruned = V.read_table_version(spark, p, prune=[("k", 25, None)])
    assert {r.k for r in pruned.collect()} == {30}  # ds=1 file pruned out


def test_compact_rewrites_only_fragmented_partitions(spark, tmp_path):
    """Three upserts fragment ds=2 into several files; compaction
    coalesces JUST that partition as a content-identical new version,
    carries ds=1's file verbatim, and leaves old versions readable."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds", stats_cols=["k"]
    )
    for i, kk in enumerate((20, 21, 22)):
        V.upsert_table_version(
            spark, p, _t(spark, [(kk, 2, f"v{i}")]), keys=["k"],
            partition_by="ds",
        )
    head = V.latest_version(p)
    m = V._load_manifest(p, head)
    frag = [f for f in m["files"] if f.startswith("ds=2/")]
    # partition-granular COW rewrites the dirty partition whole, so
    # fragmentation here comes from WRITE PARALLELISM (one file per
    # task), not epoch accumulation — still >1 file to coalesce
    assert len(frag) >= 2
    ds1 = {f for f in m["files"] if f.startswith("ds=1/")}

    v = V.compact_table_version(spark, p)
    mc = V._load_manifest(p, v)
    assert len([f for f in mc["files"] if f.startswith("ds=2/")]) == 1
    assert ds1 <= set(mc["files"])  # compact partition carried verbatim
    before = {(r.k, r.val) for r in V.read_table_version(spark, p, head).collect()}
    after = {(r.k, r.val) for r in V.read_table_version(spark, p, v).collect()}
    assert before == after and mc["count"] == m["count"]
    assert all(f in mc["stats"] for f in mc["files"])  # stats follow
    # idempotent: a second compaction is a no-op, no empty commit
    assert V.compact_table_version(spark, p) == v


def test_model_based_random_op_sequence(spark, tmp_path):
    """Stateful fuzz: a seeded random sequence of snapshot / upsert /
    compact / expire ops against a pure-Python model of each committed
    version's expected {key: val} content.  After EVERY op, the head
    must match the model; at the end, every surviving version must
    time-travel to its recorded content exactly."""
    import random

    rng = random.Random(0xE71)
    p = str(tmp_path / "t")
    model: dict[int, dict[int, str]] = {}  # version -> {k: val}
    state: dict[int, str] = {}
    counter = 0

    def frame(rows):
        return _t(spark, [(k, k % 3, v) for k, v in rows])

    V.write_table_version(frame([(1, "s0")]), p, "ds", stats_cols=["k"])
    state = {1: "s0"}
    model[1] = dict(state)
    for step in range(14):
        op = rng.choice(["upsert", "upsert", "upsert", "compact", "expire"])
        if op == "upsert":
            counter += 1
            rows = [
                (rng.randint(1, 12), f"u{counter}.{j}")
                for j in range(rng.randint(1, 3))
            ]
            # last-wins within one delta, like the DataFrame union path?
            # keep the model unambiguous: unique keys per delta
            rows = list({k: v for k, v in rows}.items())
            v = V.upsert_table_version(
                spark, p, frame(rows), keys=["k"], partition_by="ds"
            )
            state.update(dict(rows))
            model[v] = dict(state)
        elif op == "compact":
            v = V.compact_table_version(spark, p)
            model[v] = dict(state)  # content-identical (may be a no-op)
        else:
            keep = rng.randint(1, 3)
            V.expire_versions(p, keep_last=keep)
            live = sorted(model)[-keep:]
            model = {v: c for v, c in model.items() if v in live}
        head = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
        assert head == state, f"step {step} ({op})"
    for v, want in model.items():
        got = {r.k: r.val for r in V.read_table_version(spark, p, v).collect()}
        assert got == want, f"time travel to v{v}"


def test_cli_table_compact(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    feed = str(tmp_path / "f")
    _t(spark, [(i, i % 2, "x") for i in range(20)]).repartition(4).write.parquet(feed)
    table = str(tmp_path / "vt")
    assert main(["table", table, "--snapshot", feed, "--partition-by", "ds"]) == 0
    capsys.readouterr()
    assert main(["table", table, "--compact", "1"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["version"] == 2
    m = V._load_manifest(table, 2)
    per_part: dict[str, int] = {}
    for f in m["files"]:
        per_part[f.split("/")[0]] = per_part.get(f.split("/")[0], 0) + 1
    assert all(n == 1 for n in per_part.values())
    assert V.read_table_version(spark, table).count() == 20


def test_curated_corpus_snapshots_diff_by_policy(spark, sf_dir, tmp_path):
    """Composition: successive curation policies commit corpus versions;
    the version diff names exactly the documents the stricter policy
    dropped — the audit trail a training-data pipeline wants."""
    from etl_rust_spark.operators import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "corpus")
    loose = curate.curate_corpus(docs, near_dup_threshold=None).select(
        "doc_id", "text", "quality_bp"
    )
    V.write_table_version(loose, p)
    floor = int(
        loose.approxQuantile("quality_bp", [0.5], 0.0)[0]
    )
    strict = loose.where(f"quality_bp >= {floor}")
    V.upsert_table_version(spark, p, strict, keys=["doc_id"])
    # an upsert cannot REMOVE rows — the strict corpus is its own snapshot
    V.write_table_version(strict, p)
    d = V.diff_table_versions(spark, p, 1, 3, keys=["doc_id"])
    removed = d.filter("diff = 'removed'").count()
    assert removed == loose.count() - strict.count() > 0
    assert d.filter("diff = 'added'").count() == 0


def test_upsert_hive_escaped_partition_values(spark, tmp_path):
    """Partition values Spark Hive-escapes in directory names (':' →
    '%3A') must still be recognized as DIRTY: before the r8 fix the
    carried-file check str()-formatted the Python value, missed the
    escaped directory, and the new version held BOTH the old and the
    merged rows (duplicate keys, resurfaced data).  ADVICE r7 medium."""
    p = str(tmp_path / "t")
    rows = [(1, "2024-01-01T00:00", "a"), (2, "2024-01-02T00:00", "b")]
    V.write_table_version(_t(spark, rows), p, "ds")
    # directory really is escaped — the premise of the bug
    m1 = V._load_manifest(p, 1)
    assert any("%3A" in f for f in m1["files"])
    V.upsert_table_version(
        spark, p,
        _t(spark, [(1, "2024-01-01T00:00", "A")]),
        keys=["k"], partition_by="ds",
    )
    got = {(r.k, r.val) for r in V.read_table_version(spark, p).collect()}
    assert got == {(1, "A"), (2, "b")}       # no duplicate key 1
    m2 = V._load_manifest(p, 2)
    assert len(m2["files"]) == len(set(m2["files"]))
    # the clean escaped partition's files still carry over verbatim
    clean = {f for f in m1["files"] if "2024-01-02" in f}
    assert clean and clean <= set(m2["files"])
    assert m2["count"] == 2


def test_upsert_null_partition_value_rejected(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, "d1", "a")]), p, "ds")
    bad = spark.createDataFrame(
        [(2, None, "b")], "k bigint, ds string, val string"
    )
    with pytest.raises(ValueError, match="NULL partition"):
        V.upsert_table_version(spark, p, bad, keys=["k"], partition_by="ds")


def test_compact_hive_escaped_partition(spark, tmp_path):
    """Compaction scopes fragmented partitions by FILE list, not by an
    unescaped value filter — an escaped partition ('a:b' → 'a%3Ab')
    used to compact to an EMPTY rewrite (rows silently dropped)."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a:b", f"v{i}") for i in range(8)], ["k", "ds", "val"]
    ).repartition(8)
    V.write_table_version(df, p, "ds")
    v = V.compact_table_version(spark, p, max_files_per_partition=2)
    assert v == 2
    got = {r.k for r in V.read_table_version(spark, p).collect()}
    assert got == set(range(8))              # nothing dropped
    m2 = V._load_manifest(p, 2)
    assert len(m2["files"]) <= 2


def test_empty_manifest_read_raises_not_recurses(spark, tmp_path):
    """write of an empty frame commits an empty manifest; reading it
    raises the documented ValueError instead of RecursionError
    (ADVICE r7 low)."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]).limit(0), p, "ds")
    with pytest.raises(ValueError, match="empty"):
        V.read_table_version(spark, p)


def test_prune_all_files_returns_empty_frame_not_recursion(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds", stats_cols=["k"]
    )
    out = V.read_table_version(spark, p, prune=[("k", 100, 200)])
    assert out.count() == 0
    assert set(out.columns) == {"k", "ds", "val"}


def test_concurrent_upserts_both_survive(spark, tmp_path):
    """Two writers upserting different keys at once: the CAS commit
    (O_EXCL manifest claim + re-merge on conflict) serializes them —
    BOTH deltas are present at the final head and the version chain is
    linear.  Before r8 the last _latest writer silently won and the
    loser's commit was orphaned (VERDICT r7 #5)."""
    import threading

    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(i, i % 2, f"v{i}") for i in range(4)]), p, "ds"
    )
    errs = []

    def writer(key, val):
        try:
            V.upsert_table_version(
                spark, p, _t(spark, [(key, key % 2, val)]), keys=["k"],
                partition_by="ds",
            )
        except Exception as exc:  # surfaces in the main thread
            errs.append(exc)

    for trial in range(3):  # the race is probabilistic — drive it thrice
        t1 = threading.Thread(target=writer, args=(10 + trial, f"a{trial}"))
        t2 = threading.Thread(target=writer, args=(20 + trial, f"b{trial}"))
        t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    head = V.latest_version(p)
    assert head == 7  # 1 snapshot + 6 serialized upserts, none lost
    got = {(r.k, r.val) for r in V.read_table_version(spark, p).collect()}
    for trial in range(3):
        assert (10 + trial, f"a{trial}") in got
        assert (20 + trial, f"b{trial}") in got
    # linear parent chain
    for v in range(2, head + 1):
        m = json.loads((Path(p) / "_manifests" / f"m{v:08d}.json").read_text())
        assert m["parent"] == v - 1


def test_commit_conflict_raised_when_head_moves(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    with pytest.raises(V.CommitConflict):
        V._commit(p, ["ds=1/zz.parquet"], 1, parent=0, partition_by="ds")


def test_crashed_claim_is_swept_after_staleness(spark, tmp_path):
    """A manifest claimed by a crashed writer (no _latest swap) blocks
    its slot only until _STALE_MANIFEST_SECONDS; then the next commit
    sweeps it and takes the slot."""
    import os as _os

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    orphan = Path(p) / "_manifests" / "m00000002.json"
    orphan.write_text("{}")  # claimed, never committed
    old = 10_000
    _os.utime(orphan, (old, old))
    v = V.upsert_table_version(
        spark, p, _t(spark, [(2, 1, "b")]), keys=["k"], partition_by="ds"
    )
    assert v == 2
    got = {r.k for r in V.read_table_version(spark, p).collect()}
    assert got == {1, 2}


def test_expire_grace_protects_inflight_writer_artifacts(spark, tmp_path):
    import os as _os

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "b")]), keys=["k"], partition_by="ds"
    )
    # a fresh uncommitted claim + a fresh orphan data file (in-flight
    # writer) survive a graced expiry...
    claim = Path(p) / "_manifests" / "m00000099.json"
    claim.write_text("{}")
    orphan_data = Path(p) / "data" / "ds=9" / "inflight.parquet"
    orphan_data.parent.mkdir(parents=True)
    orphan_data.write_bytes(b"x")
    rep = V.expire_versions(p, keep_last=1, grace_seconds=3600)
    assert claim.exists() and orphan_data.exists()
    assert 1 not in rep["kept_versions"]  # old version still expired...
    # ...but its files were young, so a graced run keeps them; an
    # ungraced run then reclaims everything dangling
    rep2 = V.expire_versions(p, keep_last=1, grace_seconds=0)
    assert not claim.exists() and not orphan_data.exists()
    assert rep2["dropped_files"] >= 1


def test_stalled_writer_loses_loudly_when_sweep_steals_slot(spark, tmp_path):
    """ADVICE r8 TOCTOU: a writer stalled >_STALE_MANIFEST_SECONDS
    between its manifest claim and the _latest swap can have the slot
    reclaimed by the sweep.  The stalled writer must then raise
    CommitConflict (and re-merge at a higher level) — never return N
    while m{N}.json holds the RIVAL's content, which would silently
    lose one of the two commits."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")

    def steal(mp):
        import os as _os

        V._commit._pause_before_swap = None  # rival commits un-stalled
        # simulate the sweep: age out the stalled claim, then let a
        # rival writer sweep it and take the slot
        _os.utime(mp, (10_000, 10_000))
        V._commit(p, ["ds=1/rival.parquet"], 1, parent=1, partition_by="ds")

    V._commit._pause_before_swap = steal
    try:
        with pytest.raises(V.CommitConflict, match="reclaimed"):
            V._commit(p, ["ds=1/stalled.parquet"], 1, parent=1,
                      partition_by="ds")
    finally:
        V._commit._pause_before_swap = None
    # the rival's commit is the one at version 2, and the head is sane
    assert V.latest_version(p) == 2
    m = V._load_manifest(p, 2)
    assert m["files"] == ["ds=1/rival.parquet"]
    # the loser can now retry against the new head and land cleanly
    v3 = V._commit(p, ["ds=1/stalled.parquet"], 1, parent=2,
                   partition_by="ds")
    assert v3 == 3


def test_sweep_serializes_with_victim_swap_under_latest_lock(spark, tmp_path):
    """ADVICE r9 (medium): the stale-claim sweep must run UNDER
    _latest.lock.  A victim stalled between its in-lock writer-id
    re-verify and its pointer swap (claim already aged past
    _STALE_MANIFEST_SECONDS) races a rival's sweep: unserialized, the
    sweep rewrites m{N}.json while the victim still publishes N — BOTH
    return success and one commit is silently lost.  With the fix the
    sweep blocks on the lock, sees the victim's swap landed, and the
    rival loses LOUDLY via CommitConflict; whichever interleaving wins
    the lock, exactly one writer owns version N and the other raises."""
    import os as _os
    import threading

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    rival_err: list[Exception] = []
    rival = threading.Thread(
        target=lambda: rival_err.append(_rival_commit(p)),
    )

    def _rival_commit(path):
        try:
            V._commit(path, ["ds=1/rival.parquet"], 1, parent=1,
                      partition_by="ds")
            return None
        except V.CommitConflict as exc:
            return exc

    def stall(mp):
        V._commit._pause_after_verify = None
        # the victim's claim looks stale (>60s old) while it holds the
        # lock post-verify; the rival now attempts the same slot — its
        # sweep must BLOCK on _latest.lock instead of rewriting m2
        _os.utime(mp, (10_000, 10_000))
        rival.start()
        import time as _time

        _time.sleep(0.3)  # give the rival time to reach the lock wait

    V._commit._pause_after_verify = stall
    try:
        v = V._commit(p, ["ds=1/victim.parquet"], 1, parent=1,
                      partition_by="ds")
    finally:
        V._commit._pause_after_verify = None
    rival.join(timeout=30)
    assert v == 2
    # exactly one winner: the victim's content is what version 2 holds,
    # and the rival raised instead of silently sharing the slot
    assert V._load_manifest(p, 2)["files"] == ["ds=1/victim.parquet"]
    assert len(rival_err) == 1 and isinstance(rival_err[0], V.CommitConflict)


def test_reader_pin_protects_version_from_expiry(spark, tmp_path):
    """VERDICT r8 #2: a reader holding a Pin on version N survives an
    expire_versions run that would otherwise delete N's files — the
    pinned version's files AND manifest are retained, and the read
    completes byte-identically after the expiry."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 1, "c")]), keys=["k"], partition_by="ds"
    )
    V.upsert_table_version(
        spark, p, _t(spark, [(4, 2, "d")]), keys=["k"], partition_by="ds"
    )
    with V.pin_version(p, version=1) as pin:
        assert pin.version == 1
        before = {tuple(r) for r in V.read_table_version(spark, p, 1).collect()}
        base = V.table_metrics().get("pins_honored_total", 0)
        rep = V.expire_versions(p, keep_last=1)
        # v1 retained by the pin, v2 expired as usual — and the save is
        # visible to a metrics scraper (VERDICT r9 #8)
        assert 1 in rep["kept_versions"] and 2 not in rep["kept_versions"]
        assert rep["honored_pins"] == 1
        assert V.table_metrics()["pins_honored_total"] == base + 1
        after = {tuple(r) for r in V.read_table_version(spark, p, 1).collect()}
        assert after == before
        with pytest.raises(FileNotFoundError):
            V._load_manifest(p, 2)
    # pin released on exit: the next expiry reclaims v1
    rep2 = V.expire_versions(p, keep_last=1)
    assert rep2["kept_versions"] == [3]
    with pytest.raises(FileNotFoundError):
        V._load_manifest(p, 1)


def test_stale_pin_is_swept_and_refresh_extends(spark, tmp_path):
    """A crashed reader's pin ages past its ttl and is swept (its
    version becomes expirable); refresh() re-arms the window."""
    import os as _os
    import time as _time

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 1, "b")]), keys=["k"], partition_by="ds"
    )
    pin = V.Pin(p, 1, ttl_seconds=0.05)
    pin.refresh()  # refresh is a utime — liveness window restarts now
    _time.sleep(0.15)  # ...then the reader "crashes" and the pin ages out
    base = V.table_metrics().get("pins_swept_total", 0)
    rep = V.expire_versions(p, keep_last=1)
    assert rep["swept_pins"] == 1 and rep["kept_versions"] == [2]
    assert V.table_metrics()["pins_swept_total"] == base + 1
    assert not pin.file.exists()
    # an ACTIVE pin (fresh mtime, generous ttl) is honored
    pin2 = V.Pin(p, 2, ttl_seconds=3600)
    rep2 = V.expire_versions(p, keep_last=1)
    assert rep2["swept_pins"] == 0 and 2 in rep2["kept_versions"]
    pin2.release()
    # pinning an already-expired version fails loudly at registration
    with pytest.raises(FileNotFoundError):
        V.Pin(p, 1, ttl_seconds=60)
    assert not list((Path(p) / "_pins").glob("r*.json"))  # no leak


def test_many_writers_version_chain_stays_linear(spark, tmp_path):
    """VERDICT r8 #6: N threaded writers x M upserts each — the CAS
    commit protocol must keep the version chain strictly linear, land
    EVERY delta exactly once, and leave no staged-file leaks after an
    ungraced expiry sweep."""
    import threading

    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(i, i % 2, f"seed{i}") for i in range(4)]), p, "ds"
    )
    N_WRITERS, M_COMMITS = 4, 3
    errs = []

    def writer(w):
        try:
            for m in range(M_COMMITS):
                key = 100 + w * 10 + m
                V.upsert_table_version(
                    spark, p, _t(spark, [(key, key % 2, f"w{w}m{m}")]),
                    keys=["k"], partition_by="ds",
                )
        except Exception as exc:
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(N_WRITERS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    head = V.latest_version(p)
    assert head == 1 + N_WRITERS * M_COMMITS  # every commit serialized
    # strictly linear parent chain, each manifest's writer id distinct
    writers_seen = set()
    for v in range(2, head + 1):
        m = json.loads((Path(p) / "_manifests" / f"m{v:08d}.json").read_text())
        assert m["parent"] == v - 1
        writers_seen.add(m["writer"])
    assert len(writers_seen) == head - 1
    # every delta survives exactly once at the head
    rows = V.read_table_version(spark, p).collect()
    got = {(r.k, r.val) for r in rows}
    assert len(rows) == len({r.k for r in rows})  # keyed: no dupes
    for w in range(N_WRITERS):
        for m in range(M_COMMITS):
            key = 100 + w * 10 + m
            assert (key, f"w{w}m{m}") in got
    # losing attempts may stage orphan files; an ungraced keep-all sweep
    # removes them and every version still reads
    V.expire_versions(p, keep_last=head, grace_seconds=0)
    for v in (1, head // 2, head):
        V.read_table_version(spark, p, v).count()
    data = Path(p) / "data"
    live = set()
    for v in range(1, head + 1):
        live.update(V._load_manifest(p, v)["files"])
    on_disk = {str(f.relative_to(data)) for f in data.rglob("*.parquet")}
    assert on_disk == live  # no leaked staged files


def test_read_table_changes_cdc_feed(spark, tmp_path):
    """CDC feed (r9): per-version-step inserts / deletes /
    update-postimages with payload and _commit_version; resume-by-
    version slicing matches the full feed; bounds validated."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "B"), (3, 1, "c")]), keys=["k"],
        partition_by="ds",
    )
    # v3 is a full snapshot that DROPS key 1 (upserts never delete)
    V.write_table_version(
        _t(spark, [(2, 2, "B"), (3, 1, "c"), (4, 2, "d")]), p, "ds"
    )
    ch = V.read_table_changes(spark, p, ["k"], from_version=1)
    got = {(r.k, r._commit_version): (r._change_type, r.val)
           for r in ch.collect()}
    assert got == {
        (2, 2): ("update_postimage", "B"),
        (3, 2): ("insert", "c"),
        (1, 3): ("delete", None),       # deletes carry NULL payload
        (4, 3): ("insert", "d"),
    }
    # schema: full payload + the two CDC columns
    assert set(ch.columns) == {"k", "ds", "val", "_change_type",
                               "_commit_version"}
    # resume: applying (1,2] then (2,3] sees exactly the full feed
    first = {(r.k, r._commit_version) for r in
             V.read_table_changes(spark, p, ["k"], 1, 2).collect()}
    rest = {(r.k, r._commit_version) for r in
            V.read_table_changes(spark, p, ["k"], 2).collect()}
    assert first | rest == set(got) and not first & rest
    with pytest.raises(ValueError, match="from_version"):
        V.read_table_changes(spark, p, ["k"], 0)
    with pytest.raises(ValueError, match="from_version"):
        V.read_table_changes(spark, p, ["k"], 2, 9)
    # (v, v] is a legal EMPTY range: a caught-up consumer polling with
    # cursor == head gets zero rows with the FULL feed schema (was an
    # IndexError before the r10 fix)
    empty = V.read_table_changes(spark, p, ["k"], 3)
    assert empty.count() == 0
    assert list(empty.columns) == list(ch.columns)
    assert dict(empty.dtypes) == dict(ch.dtypes)


def test_cli_table_changes_verb(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    f1, f2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    _t(spark, [(1, 1, "a"), (2, 2, "b")]).write.parquet(f1)
    _t(spark, [(2, 2, "B"), (3, 1, "c")]).write.parquet(f2)
    table = str(tmp_path / "vt")
    assert main(["table", table, "--snapshot", f1, "--partition-by", "ds"]) == 0
    assert main(["table", table, "--upsert", f2, "--keys", "k",
                 "--partition-by", "ds"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "changes")
    assert main(["table", table, "--changes", "1", "--keys", "k",
                 "--out", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["change_rows"] == 2
    assert rep["change_types"] == {"insert": 1, "update_postimage": 1}
    got = {(r.k, r._change_type) for r in spark.read.parquet(out).collect()}
    assert got == {(2, "update_postimage"), (3, "insert")}


def test_sync_table_changes_downstream_mirror(spark, tmp_path):
    """CDC consumer (r9): a keyed-mirror sink stays equal to the source
    table across inserts/updates/deletes via incremental syncs; the
    cursor makes re-runs no-ops, redelivery after a pre-cursor crash is
    idempotent, max_steps paces backlogs, cold start skips history."""
    from etl_rust_spark.streaming.tables import sync_table_changes

    src = str(tmp_path / "src")
    cursor = str(tmp_path / "cursor")
    mirror: dict = {}

    def apply(ch, up_to):
        for r in ch.collect():  # keyed upsert/delete — idempotent
            if r._change_type == "delete":
                mirror.pop(r.k, None)
            else:
                mirror[r.k] = r.val

    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), src, "ds")
    # cold start: bootstrap from the head read, then sync keeps current
    assert sync_table_changes(spark, src, ["k"], apply, cursor) == 0
    mirror.update({r.k: r.val
                   for r in V.read_table_version(spark, src).collect()})

    V.upsert_table_version(spark, src, _t(spark, [(2, 2, "B"), (3, 1, "c")]),
                           keys=["k"], partition_by="ds")
    V.write_table_version(  # drops key 1
        _t(spark, [(2, 2, "B"), (3, 1, "c"), (4, 2, "d")]), src, "ds"
    )
    # backlog of 2 versions, paced one at a time
    assert sync_table_changes(spark, src, ["k"], apply, cursor,
                              max_steps=1) == 1
    assert mirror == {1: "a", 2: "B", 3: "c"}
    assert sync_table_changes(spark, src, ["k"], apply, cursor) == 1
    assert mirror == {2: "B", 3: "c", 4: "d"}
    assert mirror == {r.k: r.val
                      for r in V.read_table_version(spark, src).collect()}
    # caught up: no-op
    assert sync_table_changes(spark, src, ["k"], apply, cursor) == 0
    # crash BEFORE the cursor write → same changes redeliver, same state
    Path(cursor).write_text("2")
    assert sync_table_changes(spark, src, ["k"], apply, cursor) == 1
    assert mirror == {2: "B", 3: "c", 4: "d"}
    # a cursor ahead of head is a wiring error, not silent data loss
    Path(cursor).write_text("99")
    with pytest.raises(ValueError, match="ahead"):
        sync_table_changes(spark, src, ["k"], apply, cursor)


def test_time_travel_by_timestamp(spark, tmp_path):
    """VERDICT r9 #4: AS OF <timestamp> resolves to the newest version
    committed <= ts — between-commits lands on the earlier version,
    before-first-commit raises, exact-instant includes, and the
    timestamp survives expiry's delta→checkpoint rewrite (it lives IN
    the manifest, not in mtime)."""
    import datetime
    import time as _time

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    t1 = json.loads((Path(p) / "_manifests" / "m00000001.json").read_text())["ts"]
    _time.sleep(0.05)
    mid = _time.time()
    _time.sleep(0.05)
    V.upsert_table_version(spark, p, _t(spark, [(2, 1, "b")]),
                           keys=["k"], partition_by="ds")
    t2 = json.loads((Path(p) / "_manifests" / "m00000002.json").read_text())["ts"]
    assert t2 > t1  # monotone
    # between the two commits → v1; at/after the second → v2
    assert V.version_at_timestamp(p, mid) == 1
    assert V.version_at_timestamp(p, t2) == 2
    assert V.version_at_timestamp(p, _time.time()) == 2
    got = V.read_table_version(spark, p, as_of=mid)
    assert {r.k for r in got.collect()} == {1}
    # ISO-8601 string and datetime forms resolve identically
    iso = datetime.datetime.fromtimestamp(
        mid, tz=datetime.timezone.utc
    ).isoformat().replace("+00:00", "Z")
    assert V.version_at_timestamp(p, iso) == 1
    assert V.version_at_timestamp(
        p, datetime.datetime.fromtimestamp(mid, tz=datetime.timezone.utc)
    ) == 1
    # edges: before the first commit, and version+as_of together
    with pytest.raises(ValueError, match="before the first"):
        V.version_at_timestamp(p, t1 - 10.0)
    with pytest.raises(ValueError, match="not both"):
        V.read_table_version(spark, p, version=1, as_of=mid)
    with pytest.raises(TypeError, match="as_of"):
        V.version_at_timestamp(p, [mid])


def test_timestamp_survives_checkpoint_materialization(spark, tmp_path):
    """Expiry rewrites a kept delta-form manifest into a checkpoint via
    os.replace — mtime changes, the recorded commit ts must not."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(i, i % 3, "x") for i in range(9)]),
                          p, "ds")
    V.upsert_table_version(spark, p, _t(spark, [(1, 1, "y")]),
                           keys=["k"], partition_by="ds")
    raw2 = json.loads((Path(p) / "_manifests" / "m00000002.json").read_text())
    assert "files" not in raw2  # delta form
    ts2 = raw2["ts"]
    V.expire_versions(p, keep_last=1)  # materializes m2 into a checkpoint
    raw2b = json.loads((Path(p) / "_manifests" / "m00000002.json").read_text())
    assert "files" in raw2b and raw2b["ts"] == ts2
    assert V.version_at_timestamp(p, ts2) == 2


def test_cli_table_read_as_of(spark, tmp_path, capsys):
    import subprocess
    import sys
    import time as _time

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    _time.sleep(0.05)
    mid = _time.time()
    _time.sleep(0.05)
    V.upsert_table_version(spark, p, _t(spark, [(2, 1, "b")]),
                           keys=["k"], partition_by="ds")
    out = str(tmp_path / "out")
    res = subprocess.run(
        [sys.executable, "-m", "etl_rust_spark", "table", p,
         "--as-of", str(mid), "--out", out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["resolved_version"] == 1 and line["read_rows"] == 1


def test_sync_table_changes_retention_hole_fails_with_rebootstrap(
    spark, tmp_path
):
    """ADVICE r9: a consumer lagging past the source's retention used to
    wedge forever (FileNotFoundError on the expired manifest, cursor
    never advances).  Now it raises CDCRetentionError naming the
    remediation, and deleting the cursor re-bootstraps cleanly."""
    from etl_rust_spark.streaming.tables import (
        CDCRetentionError, sync_table_changes,
    )

    src = str(tmp_path / "src")
    cursor = str(tmp_path / "cursor")
    V.write_table_version(_t(spark, [(1, 1, "a")]), src, "ds")
    applied: list[int] = []
    apply = lambda ch, up_to: applied.append(up_to)  # noqa: E731
    assert sync_table_changes(spark, src, ["k"], apply, cursor) == 0
    for i in range(2, 6):  # versions 2..5 while the consumer sleeps
        V.upsert_table_version(
            spark, src, _t(spark, [(i, 1, f"v{i}")]), keys=["k"],
            partition_by="ds",
        )
    V.expire_versions(src, keep_last=1)  # drops manifests 1..4
    with pytest.raises(CDCRetentionError, match="re-bootstrap"):
        sync_table_changes(spark, src, ["k"], apply, cursor)
    assert not applied  # nothing half-applied
    # remediation: drop the cursor, cold-start at the current head
    Path(cursor).unlink()
    assert sync_table_changes(spark, src, ["k"], apply, cursor) == 0
    assert int(Path(cursor).read_text()) == 5


def test_replicate_table_changes_table_to_table_with_kill_resume(
    spark, tmp_path
):
    """VERDICT r9 #6: the real use of the change feed — source table →
    target table replication through sync_table_changes + versioned
    DML, surviving a crash-redelivery mid-backlog.  Target head content
    equals source head after every catch-up, including across a DELETE
    step, a delete+reinsert of the same key in separate versions
    (commit order must hold), and a cursor rollback simulating a crash
    between apply and cursor write."""
    from etl_rust_spark.streaming.tables import replicate_table_changes

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cursor = str(tmp_path / "cursor")

    def content(p):
        return {(r.k, r.ds, r.val)
                for r in V.read_table_version(spark, p).collect()}

    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")]), src, "ds"
    )
    # cold start bootstraps the target from the source head snapshot
    assert replicate_table_changes(
        spark, src, dst, ["k"], cursor, partition_by="ds") == 0
    assert content(dst) == content(src)
    # v2: update + insert; v3: DELETE k=1; v4: reinsert k=1 (new value)
    V.upsert_table_version(spark, src, _t(spark, [(2, 2, "B"), (4, 2, "d")]),
                           keys=["k"], partition_by="ds")
    V.delete_table_version(spark, src, "k = 1")
    V.upsert_table_version(spark, src, _t(spark, [(1, 1, "A2")]),
                           keys=["k"], partition_by="ds")
    # paced catch-up, one source version per run
    assert replicate_table_changes(
        spark, src, dst, ["k"], cursor, partition_by="ds", max_steps=1) == 1
    assert content(dst) == {(1, 1, "a"), (2, 2, "B"), (3, 1, "c"),
                            (4, 2, "d")}
    assert replicate_table_changes(
        spark, src, dst, ["k"], cursor, partition_by="ds", max_steps=1) == 1
    assert content(dst) == {(2, 2, "B"), (3, 1, "c"), (4, 2, "d")}  # k=1 gone
    # crash between apply and cursor write: rewind the cursor one step
    # and resume — the delete step redelivers (matches nothing), then
    # the reinsert applies; content equals the source head exactly once
    Path(cursor).write_text("2")
    assert replicate_table_changes(
        spark, src, dst, ["k"], cursor, partition_by="ds") == 2
    assert content(dst) == content(src)
    assert (1, 1, "A2") in content(dst)
    # steady state: no-op run, still equal
    assert replicate_table_changes(
        spark, src, dst, ["k"], cursor, partition_by="ds") == 0
    assert content(dst) == content(src)


# ---------------------------------------------------------------- delete


def test_delete_rewrites_only_hit_files(spark, tmp_path):
    """Row-level DELETE is file-level COW: the partition with no
    matching row keeps its files verbatim in the new manifest; old
    versions still read the deleted rows."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]).repartition("ds"),
        p, "ds",
    )
    m1 = V._load_manifest(p, 1)
    assert len(m1["files"]) == 2  # one file per partition
    v2 = V.delete_table_version(spark, p, "k = 2")
    assert v2 == 2
    m2 = V._load_manifest(p, 2)
    clean = {f for f in m1["files"] if f.startswith("ds=2/")}
    assert clean and clean <= set(m2["files"])  # untouched file carried
    dirty = {f for f in m1["files"] if f.startswith("ds=1/")}
    assert dirty.isdisjoint(m2["files"])        # hit file rewritten
    assert m2["count"] == 2
    new = {r.k for r in V.read_table_version(spark, p).collect()}
    assert new == {1, 3}
    old = {r.k for r in V.read_table_version(spark, p, 1).collect()}
    assert old == {1, 2, 3}  # time travel unaffected


def test_delete_no_match_is_a_noop(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    assert V.delete_table_version(spark, p, "k = 99") == 1
    assert V.list_versions(p) == [1]  # no empty commit


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates NULL
    survive."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], ["k", "tag"]
    )
    V.write_table_version(df, p)
    V.delete_table_version(spark, p, "tag = 'x'")
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {1, 3}


def test_delete_stats_prune_skips_files(spark, tmp_path):
    """With a prune hint, files whose [min,max] cannot match are never
    candidates — their stats survive untouched in the new manifest."""
    p = str(tmp_path / "t")
    lo = spark.range(0, 100).selectExpr("id AS k", "1 AS ds", "'lo' AS val")
    hi = spark.range(1000, 1100).selectExpr(
        "id AS k", "2 AS ds", "'hi' AS val"
    )
    V.write_table_version(
        lo.unionByName(hi).repartition("ds"), p, "ds", stats_cols=["k"]
    )
    m1 = V._load_manifest(p, 1)
    V.delete_table_version(
        spark, p, "k = 1050", prune=[("k", 1050, 1050)]
    )
    m2 = V._load_manifest(p, 2)
    lo_files = {f for f in m1["files"] if f.startswith("ds=1/")}
    assert lo_files <= set(m2["files"])  # pruned file carried verbatim
    assert all(f in m2["stats"] for f in m2["files"])  # stats follow
    assert V.read_table_version(spark, p).count() == 199


def test_delete_all_rows_then_upsert_reseeds(spark, tmp_path):
    """Deleting every row commits an empty version whose manifest
    carries the schema; reads return a typed empty frame and a later
    upsert re-seeds the table on the same chain."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    v2 = V.delete_table_version(spark, p, "k >= 0")
    assert v2 == 2
    empty = V.read_table_version(spark, p)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "ds", "val"}
    v3 = V.upsert_table_version(
        spark, p, _t(spark, [(9, 1, "z")]), keys=["k"], partition_by="ds"
    )
    assert v3 == 3
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {9}
    # history intact throughout
    assert V.read_table_version(spark, p, 1).count() == 2


def test_delete_hive_escaped_partition_file_mapping(spark, tmp_path):
    """input_file_name() URIs double-encode Hive-escaped partition
    dirs; the rel-path mapping must land on the manifest's names."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024:01", "a"), (2, "2024:01", "b"), (3, "2024:02", "c")],
        ["k", "ds", "val"],
    )
    V.write_table_version(df, p, "ds")
    m1 = V._load_manifest(p, 1)
    assert any("%3A" in f for f in m1["files"])  # escaping is in play
    V.delete_table_version(spark, p, "k = 1")
    got = {(r.k, r.ds) for r in V.read_table_version(spark, p).collect()}
    assert got == {(2, "2024:01"), (3, "2024:02")}


def test_delete_shows_in_cdc_feed(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 1, "b")]), p, "ds")
    V.delete_table_version(spark, p, "k = 1")
    ch = V.read_table_changes(spark, p, keys=["k"], from_version=1).collect()
    assert {(r.k, r._change_type, r._commit_version) for r in ch} == {
        (1, "delete", 2)
    }


def test_cli_table_delete_where(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    assert main(["table", p, "--delete-where", "k = 1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 2 and out["versions"] == [1, 2]
    assert {r.k for r in V.read_table_version(spark, p).collect()} == {2}


# ------------------------------------------------- delta-form manifests


def test_small_upserts_write_delta_manifests(spark, tmp_path):
    """Commit metadata is O(changed files): a small upsert against a
    many-file table writes an added/removed delta on disk, and the
    reconstructed view equals what a full manifest would say."""
    p = str(tmp_path / "t")
    big = spark.range(0, 200).selectExpr(
        "id AS k", "CAST(id % 20 AS INT) AS ds", "'x' AS val"
    ).repartition(20, "ds")
    V.write_table_version(big, p, "ds", stats_cols=["k"])
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 3, "HOT")]), keys=["k"], partition_by="ds"
    )
    raw1 = json.loads((Path(p) / "_manifests" / "m00000001.json").read_text())
    raw2 = json.loads((Path(p) / "_manifests" / "m00000002.json").read_text())
    assert "files" in raw1                    # first commit: checkpoint
    assert "files" not in raw2 and raw2["depth"] == 1   # delta form
    # delta names only the churn, not the table
    assert len(raw2["added"]) + len(raw2["removed"]) < len(raw1["files"])
    assert set(raw2["stats"]) == set(raw2["added"])  # stats only for new
    m2 = V._load_manifest(p, 2)
    # only the dirty ds=3 directory's files changed hands
    assert all(f.startswith("ds=3/") for f in raw2["removed"])
    assert all(f.startswith("ds=3/") for f in raw2["added"])
    carried = set(raw1["files"]) - set(raw2["removed"])
    assert carried <= set(m2["files"])
    assert m2["count"] == 200  # k=3 existed: update, not insert
    assert all(f in m2["stats"] for f in m2["files"])  # stats reconstruct
    got = {r.val for r in V.read_table_version(spark, p).filter("k = 3").collect()}
    assert got == {"HOT"}
    # stats pruning still works through the reconstructed view: only
    # files whose [min,max] can hold k>=190 survive the prune
    pruned = V.read_table_version(spark, p, prune=[("k", 190, None)])
    assert pruned.count() < 200
    assert pruned.filter("k >= 190").count() == 10


def test_delta_chain_checkpoints_at_depth(spark, tmp_path):
    """The delta chain is bounded: after _CHECKPOINT_EVERY commits a
    full manifest lands again, and every version still reads."""
    p = str(tmp_path / "t")
    big = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 10 AS INT) AS ds", "'x' AS val"
    ).repartition(10, "ds")
    V.write_table_version(big, p, "ds")
    n_commits = V._CHECKPOINT_EVERY + 2
    for i in range(n_commits):
        V.upsert_table_version(
            spark, p, _t(spark, [(i, i % 10, f"u{i}")]),
            keys=["k"], partition_by="ds",
        )
    forms = {}
    for v in range(1, n_commits + 2):
        raw = json.loads(
            (Path(p) / "_manifests" / f"m{v:08d}.json").read_text()
        )
        forms[v] = "full" if "files" in raw else "delta"
    assert forms[1] == "full"
    assert "full" in {forms[v] for v in range(2, n_commits + 2)}  # re-checkpointed
    assert max(
        json.loads((Path(p) / "_manifests" / f"m{v:08d}.json").read_text())
        .get("depth", 0)
        for v in forms
    ) < V._CHECKPOINT_EVERY
    # every version in the chain reconstructs and reads
    for v in range(1, n_commits + 2):
        assert V.read_table_version(spark, p, v).count() == 100
    head = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    for i in range(n_commits):
        assert head[i] == f"u{i}"


def test_expire_materializes_kept_delta_manifests(spark, tmp_path):
    """Retention across a delta chain: kept delta manifests checkpoint
    themselves so expired ancestors' manifests can drop; kept versions
    keep reading."""
    p = str(tmp_path / "t")
    big = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 10 AS INT) AS ds", "'x' AS val"
    ).repartition(10, "ds")
    V.write_table_version(big, p, "ds")
    for i in range(3):
        V.upsert_table_version(
            spark, p, _t(spark, [(i, i, f"u{i}")]),
            keys=["k"], partition_by="ds",
        )
    raw3 = json.loads((Path(p) / "_manifests" / "m00000003.json").read_text())
    assert "files" not in raw3  # premise: kept version is delta-form
    rep = V.expire_versions(p, keep_last=2)
    assert rep["kept_versions"] == [3, 4]
    raw3 = json.loads((Path(p) / "_manifests" / "m00000003.json").read_text())
    assert "files" in raw3                       # materialized checkpoint
    raw4 = json.loads((Path(p) / "_manifests" / "m00000004.json").read_text())
    assert "files" not in raw4                   # parent kept: stays delta
    with pytest.raises(FileNotFoundError):
        V._load_manifest(p, 1)                   # ancestors really dropped
    assert V.read_table_version(spark, p, 3).count() == 100
    assert V.read_table_version(spark, p, 4).count() == 100
    head = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert head[2] == "u2"


def test_delete_writes_delta_manifest(spark, tmp_path):
    """Row-level delete against a many-file table commits O(hit) delta
    metadata too."""
    p = str(tmp_path / "t")
    big = spark.range(0, 200).selectExpr(
        "id AS k", "CAST(id % 20 AS INT) AS ds", "'x' AS val"
    ).repartition(20, "ds")
    V.write_table_version(big, p, "ds")
    V.delete_table_version(spark, p, "k = 7")
    raw2 = json.loads((Path(p) / "_manifests" / "m00000002.json").read_text())
    assert "files" not in raw2
    assert len(raw2["removed"]) >= 1 and len(raw2["added"]) >= 1
    assert V.read_table_version(spark, p).count() == 199


# ------------------------------------------------ bloom file skipping


def _uuid_table(spark, n=60):
    """Unordered high-cardinality key: every file's [min,max] spans the
    domain, so range stats cannot prune — the bloom's home turf."""
    import hashlib

    rows = [
        (hashlib.md5(str(i).encode()).hexdigest(), i % 6, f"v{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "ds", "val"])


def test_bloom_point_lookup_skips_files(spark, tmp_path):
    p = str(tmp_path / "t")
    df = _uuid_table(spark).repartition(6, "ds")
    V.write_table_version(df, p, "ds", bloom_cols=["doc_id"])
    all_files = set(V.read_table_version(spark, p).inputFiles())
    assert len(all_files) == 6
    import hashlib

    hits = misses = 0
    for i in range(0, 60, 7):
        key = hashlib.md5(str(i).encode()).hexdigest()
        got = V.read_table_version(spark, p, point=[("doc_id", key)])
        planned = set(got.inputFiles())
        assert planned  # never prunes to nothing for a present key
        hits += len(planned)
        misses += len(all_files) - len(planned)
        # no false negative: the real row is in the pruned plan
        assert got.filter(F.col("doc_id") == key).count() == 1
    assert misses > 0  # the bloom actually skipped files
    # absent key: typically prunes everything (FP-tolerant: just fewer)
    got = V.read_table_version(spark, p, point=[("doc_id", "not-a-key")])
    assert len(set(got.inputFiles())) < len(all_files)


def test_bloom_entries_inherited_by_upsert_and_compact(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _uuid_table(spark).repartition(6, "ds"), p, "ds",
        stats_cols=["ds"], bloom_cols=["doc_id"],
    )
    import hashlib

    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([("brand-new-key", 2, "nv")],
                              ["doc_id", "ds", "val"]),
        keys=["doc_id"], partition_by="ds",
    )
    m2 = V._load_manifest(p, 2)
    assert m2.get("blooms_conf", {}).get("cols") == ["doc_id"]
    # every file (carried AND new) has a bloom entry in the full view
    assert all("bloom:doc_id" in m2["stats"].get(f, {}) for f in m2["files"])
    got = V.read_table_version(spark, p, point=[("doc_id", "brand-new-key")])
    assert got.filter("doc_id = 'brand-new-key'").count() == 1
    assert len(set(got.inputFiles())) < len(m2["files"])
    # an old key still found after the upsert
    key = hashlib.md5(b"7").hexdigest()
    got = V.read_table_version(spark, p, point=[("doc_id", key)])
    assert got.filter(F.col("doc_id") == key).count() == 1
    # compaction keeps the blooms usable too
    V.compact_table_version(spark, p, max_files_per_partition=1)
    mc = V._load_manifest(p, 3)
    assert all("bloom:doc_id" in mc["stats"].get(f, {}) for f in mc["files"])
    got = V.read_table_version(spark, p, point=[("doc_id", key)])
    assert got.filter(F.col("doc_id") == key).count() == 1


def test_bloom_rides_delta_manifests(spark, tmp_path):
    """Delta-form commits store bloom entries only for ADDED files; the
    reconstructed view carries them for every live file."""
    p = str(tmp_path / "t")
    big = spark.range(0, 200).selectExpr(
        "CAST(id AS STRING) AS doc_id", "CAST(id % 20 AS INT) AS ds",
        "'x' AS val",
    ).repartition(20, "ds")
    V.write_table_version(big, p, "ds", bloom_cols=["doc_id"])
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([("7", 7, "HOT")], ["doc_id", "ds", "val"]),
        keys=["doc_id"], partition_by="ds",
    )
    raw2 = json.loads((Path(p) / "_manifests" / "m00000002.json").read_text())
    assert "files" not in raw2                     # delta form
    assert set(raw2["stats"]) == set(raw2["added"])
    m2 = V._load_manifest(p, 2)
    assert all("bloom:doc_id" in m2["stats"].get(f, {}) for f in m2["files"])
    got = V.read_table_version(spark, p, point=[("doc_id", "7")])
    assert got.filter("doc_id = '7'").count() == 1
    assert len(set(got.inputFiles())) < len(m2["files"])


def test_bloom_integer_keys_and_combined_prune(spark, tmp_path):
    """Integer keys probe through the same string cast; point and range
    pruning compose."""
    p = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 10 AS INT) AS ds", "'x' AS val"
    ).repartition(10, "ds")
    V.write_table_version(df, p, "ds", stats_cols=["k"], bloom_cols=["k"])
    got = V.read_table_version(
        spark, p, prune=[("k", 37, 37)], point=[("k", 37)]
    )
    assert got.filter("k = 37").count() == 1
    assert len(set(got.inputFiles())) <= 2


def test_bloom_point_probe_normalizes_bool_and_rejects_lossy_types(
    spark, tmp_path
):
    """ADVICE r9: the bloom was built from CAST(col AS STRING), but
    probes used Python str(val) — str(True)='True' vs Spark's 'true'
    made every bool probe a false NEGATIVE, silently pruning files that
    DO hold the key (rows dropped from reads, missed by delete/update).
    bool now normalizes to Spark's rendering; float/date/etc probes
    raise instead of silently lying."""
    import datetime

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 4, i % 2 == 0) for i in range(40)], ["k", "ds", "flag"]
    ).repartition(4, "ds")
    V.write_table_version(df, p, "ds", bloom_cols=["flag", "k"])
    # bool probe: flag is True exactly in the ds∈{0,2} files — the
    # normalized probe keeps those two and prunes the other two; the
    # old str(True)='True' probe false-negatived on EVERY file and
    # silently returned zero rows
    got = V.read_table_version(spark, p, point=[("flag", True)])
    assert len(set(got.inputFiles())) == 2
    assert got.filter("flag").count() == 20
    # unsupported probe types fail LOUDLY in read and delete alike
    with pytest.raises(TypeError, match="str/int/bool"):
        V.read_table_version(spark, p, point=[("k", 1.5)])
    with pytest.raises(TypeError, match="str/int/bool"):
        V.delete_table_version(
            spark, p, "k = 3", point=[("k", datetime.date(2026, 1, 1))]
        )
    # a delete narrowed by a bool probe still erases the right rows
    v = V.delete_table_version(spark, p, "k = 6", point=[("flag", True)])
    assert v == 2
    assert V.read_table_version(spark, p).filter("k = 6").count() == 0


def test_compact_zorder_relayouts_for_stats_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER BY: after random-order ingestion every file's
    [min,max] spans the domain (prune reads everything); the z-order
    compaction commit re-layouts so a 2-D point prune hits few files —
    and old versions still read the old layout."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1000), rng.randrange(1000), i) for i in range(4000)]
    df = spark.createDataFrame(rows, ["x", "y", "i"]).repartition(16)
    p = str(tmp_path / "t")
    V.write_table_version(df, p, stats_cols=["x", "y"])
    before = V.read_table_version(
        spark, p, prune=[("x", 100, 120), ("y", 100, 120)]
    )
    n_before = len(set(before.inputFiles()))
    v2 = V.compact_table_version(spark, p, 16, zorder_by=["x", "y"])
    assert v2 == 2
    after = V.read_table_version(
        spark, p, prune=[("x", 100, 120), ("y", 100, 120)]
    )
    n_after = len(set(after.inputFiles()))
    assert n_after < n_before  # the re-layout made stats pruning bite
    assert n_after <= 6        # ~sqrt(16) + slack
    # content identical, count carried, history intact
    assert after.filter("x BETWEEN 100 AND 120 AND y BETWEEN 100 AND 120").count() == \
        before.filter("x BETWEEN 100 AND 120 AND y BETWEEN 100 AND 120").count()
    assert V._load_manifest(p, 2)["count"] == 4000
    assert V.read_table_version(spark, p, 1).count() == 4000


# ---------------------------------------------------- alter (evolution)


def test_alter_rename_and_drop_columns(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds", stats_cols=["k"]
    )
    v2 = V.alter_table_version(
        spark, p, drop=["val"], rename={"k": "key"}
    )
    assert v2 == 2
    new = V.read_table_version(spark, p)
    assert set(new.columns) == {"key", "ds"}
    assert {r.key for r in new.collect()} == {1, 2}
    # stats follow the rename
    m2 = V._load_manifest(p, 2)
    assert m2["stats_cols"] == ["key"]
    assert all("key" in fs for fs in m2["stats"].values())
    # old version reads the old schema byte-identically
    old = V.read_table_version(spark, p, 1)
    assert set(old.columns) == {"k", "ds", "val"}
    # further upserts work against the new shape
    V.upsert_table_version(
        spark, p, spark.createDataFrame([(9, 1)], ["key", "ds"]),
        keys=["key"], partition_by="ds",
    )
    assert {r.key for r in V.read_table_version(spark, p).collect()} == {1, 2, 9}


def test_alter_partition_evolution(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 2, i % 3, f"v{i}") for i in range(12)],
        ["k", "a", "b", "val"],
    )
    V.write_table_version(df, p, "a")
    v2 = V.alter_table_version(spark, p, new_partition_by="b")
    m2 = V._load_manifest(p, 2)
    assert m2["partition_by"] == "b"
    assert all(f.startswith("b=") for f in m2["files"])
    assert V.read_table_version(spark, p).count() == 12
    # old layout still reads with its own partition column
    assert {r.a for r in V.read_table_version(spark, p, 1).collect()} == {0, 1}
    # flatten: partition_by=None
    V.alter_table_version(spark, p, new_partition_by=None)
    m3 = V._load_manifest(p, 3)
    assert m3["partition_by"] is None
    assert all("/" not in f for f in m3["files"])
    assert V.read_table_version(spark, p).count() == 12


def test_alter_guards(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    with pytest.raises(ValueError, match="no such columns"):
        V.alter_table_version(spark, p, drop=["nope"])
    with pytest.raises(ValueError, match="partition column"):
        V.alter_table_version(spark, p, drop=["ds"])
    with pytest.raises(ValueError, match="duplicate columns"):
        V.alter_table_version(spark, p, rename={"val": "k"})
    with pytest.raises(ValueError, match="dropped and renamed"):
        V.alter_table_version(spark, p, drop=["val"], rename={"val": "v2"})
    # dropping the partition column WITH a new one is fine
    V.alter_table_version(spark, p, drop=["ds"], new_partition_by=None)
    assert set(V.read_table_version(spark, p).columns) == {"k", "val"}


def test_alter_swap_and_chain_renames_are_simultaneous(spark, tmp_path):
    """ADVICE r9: renames apply as ONE simultaneous projection —
    {'a':'b','b':'a'} swaps and {'a':'b','b':'c'} chains, with every
    source reading the OLD row (never a half-renamed intermediate);
    sequential withColumnRenamed used to produce duplicate columns
    that failed much later at the parquet stage."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10, "x"), (2, 20, "y")], ["a", "b", "ds"])
    V.write_table_version(df, p, "ds", stats_cols=["a", "b"])
    # swap
    V.alter_table_version(spark, p, rename={"a": "b", "b": "a"})
    got = {(r.a, r.b) for r in V.read_table_version(spark, p).collect()}
    assert got == {(10, 1), (20, 2)}  # values followed their old names
    m = V._load_manifest(p, V.latest_version(p))
    assert sorted(m["stats_cols"]) == ["a", "b"]
    # chain: a→b, b→c in one alter (old a lands in b, old b in c)
    p2 = str(tmp_path / "t2")
    V.write_table_version(df, p2, "ds")
    V.alter_table_version(spark, p2, rename={"a": "b", "b": "c"})
    new = V.read_table_version(spark, p2)
    assert set(new.columns) == {"b", "c", "ds"}
    assert {(r.b, r.c) for r in new.collect()} == {(1, 10), (2, 20)}


# --------------------------------------------------- merge-on-read deletes


def _mor_table(spark, tmp_path, n=64, parts=8):
    """n rows across `parts` partition files, one file per partition."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % parts, f"v{i}") for i in range(n)], ["k", "ds", "val"]
    ).repartition(parts, "ds")
    V.write_table_version(df, p, "ds", stats_cols=["k"])
    return p


def test_mor_delete_rewrites_zero_data_files(spark, tmp_path):
    """VERDICT r9 #3 'done' clause: a 1-row takedown on an 8-file table
    rewrites ZERO data files — the new manifest re-references the exact
    same file list plus one KB-sized fingerprint sidecar; the row is
    gone from the head read, intact in time travel, and the manifest
    count reflects the live rows."""
    p = _mor_table(spark, tmp_path)
    m1 = V._load_manifest(p, 1)
    data_files_before = {
        str(f.relative_to(Path(p) / "data"))
        for f in (Path(p) / "data").rglob("*.parquet")
    }
    v = V.delete_table_version(spark, p, "k = 17", mode="mor")
    assert v == 2
    m2 = V._load_manifest(p, 2)
    assert m2["files"] == m1["files"]  # zero data files rewritten
    assert m2["count"] == m1["count"] - 1
    assert len(m2["deletes"]) == 1
    side = m2["deletes"][0]
    assert side["path"].startswith("_deletes/")
    assert set(side["files"]) <= set(m1["files"])
    data_files_after = {
        str(f.relative_to(Path(p) / "data"))
        for f in (Path(p) / "data").rglob("*.parquet")
    }
    assert data_files_after - data_files_before == {side["path"]}
    head = V.read_table_version(spark, p)
    assert head.filter("k = 17").count() == 0
    assert head.count() == 63
    # time travel: v1 still has the row, byte-identically
    assert V.read_table_version(spark, p, 1).filter("k = 17").count() == 1
    assert V.history(p)[0]["op"] == "delete(mor)"


def test_mor_size_guard_refuses_broad_predicates(spark, tmp_path):
    """VERDICT r10 #5: a MoR sidecar must stay broadcast-sized — a
    predicate matching more than mor_max_rows refuses with the CoW
    remediation instead of funneling one staging task and taxing every
    later read; the head is unchanged, and the explicit override (the
    read tax understood) still works."""
    p = _mor_table(spark, tmp_path)
    with pytest.raises(ValueError, match="mode='cow'"):
        V.delete_table_version(spark, p, "k < 10", mode="mor",
                               mor_max_rows=3)
    with pytest.raises(ValueError, match="mor_max_rows"):
        V.update_table_version(spark, p, "k < 10", {"val": "'X'"},
                               mode="mor", mor_max_rows=3)
    assert V.latest_version(p) == 1  # both refusals left no commit
    # explicit override: the same predicate commits
    v = V.delete_table_version(spark, p, "k < 10", mode="mor",
                               mor_max_rows=100)
    assert v == 2
    assert V.read_table_version(spark, p).filter("k < 10").count() == 0


def test_table_detail_surfaces_sidecar_bytes(spark, tmp_path):
    """DESCRIBE DETAIL must show the MoR read-tax size, not just the
    sidecar count — the cost-model observability half of VERDICT r10
    #5."""
    p = _mor_table(spark, tmp_path)
    assert V.table_detail(p)["delete_sidecar_bytes"] == 0
    V.delete_table_version(spark, p, "k = 17", mode="mor")
    d = V.table_detail(p)
    assert d["n_delete_sidecars"] == 1
    assert d["delete_sidecar_bytes"] > 0
    # compaction folds the debt: bytes return to zero
    V.compact_table_version(spark, p)
    d2 = V.table_detail(p)
    assert d2["n_delete_sidecars"] == 0
    assert d2["delete_sidecar_bytes"] == 0


def test_mor_read_parity_with_cow(spark, tmp_path):
    """The MoR head read equals the CoW head read for the same DELETE —
    including NULL-predicate rows (kept) and multi-file hits."""
    pa = _mor_table(spark, tmp_path / "a")
    pb = _mor_table(spark, tmp_path / "b")
    pred = "k % 7 = 3 AND val != 'v3'"
    V.delete_table_version(spark, pa, pred, mode="cow")
    V.delete_table_version(spark, pb, pred, mode="mor")
    rows_a = {tuple(r) for r in V.read_table_version(spark, pa).collect()}
    rows_b = {tuple(r) for r in V.read_table_version(spark, pb).collect()}
    assert rows_a == rows_b and rows_a
    assert (V._load_manifest(pa, 2)["count"]
            == V._load_manifest(pb, 2)["count"])


def test_mor_reinsert_of_identical_row_is_not_masked(spark, tmp_path):
    """Sidecar scoping: the sidecar applies only to the files recorded
    with it, so re-upserting a byte-identical row (lands in a NEW file)
    is visible — the hazard Iceberg solves with sequence numbers."""
    p = _mor_table(spark, tmp_path)
    V.delete_table_version(spark, p, "k = 9", mode="mor")
    assert V.read_table_version(spark, p).filter("k = 9").count() == 0
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(9, 1, "v9")], ["k", "ds", "val"]),
        keys=["k"], partition_by="ds",
    )
    got = V.read_table_version(spark, p).filter("k = 9").collect()
    assert [(r.k, r.val) for r in got] == [(9, "v9")]


def test_mor_sidecar_carries_on_upsert_and_folds_on_compact(spark, tmp_path):
    """An upsert of a DIFFERENT partition carries the sidecar (scoped to
    the untouched files); compaction folds it — the post-fold manifest
    has no deletes, the masked rows stay gone, and expiry then sweeps
    the sidecar file itself."""
    p = _mor_table(spark, tmp_path)
    V.delete_table_version(spark, p, "k = 10", mode="mor")  # ds=2 file
    V.upsert_table_version(  # dirty partition ds=1 only
        spark, p,
        spark.createDataFrame([(1, 1, "V1")], ["k", "ds", "val"]),
        keys=["k"], partition_by="ds",
    )
    m3 = V._load_manifest(p, 3)
    assert len(m3["deletes"]) == 1  # carried, still scoping ds=2's file
    assert V.read_table_version(spark, p).filter("k = 10").count() == 0
    # upserting the MASKED row's own partition folds that partition
    # (the rewrite re-stages live rows only)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(2, 2, "V2")], ["k", "ds", "val"]),
        keys=["k"], partition_by="ds",
    )
    m4 = V._load_manifest(p, 4)
    assert not m4.get("deletes")  # sidecar scope shrank to nothing
    head = V.read_table_version(spark, p)
    assert head.filter("k = 10").count() == 0
    assert head.filter("k = 2").collect()[0].val == "V2"
    # full-table compact from a fresh sidecar also folds
    V.delete_table_version(spark, p, "k = 11", mode="mor")
    sidecar = V._load_manifest(p, 5)["deletes"][0]["path"]
    v6 = V.compact_table_version(spark, p, max_files_per_partition=1)
    m6 = V._load_manifest(p, v6)
    assert not m6.get("deletes")
    assert V.read_table_version(spark, p).filter("k = 11").count() == 0
    # expiry keeps the sidecar while a referencing version survives,
    # sweeps it once none does
    assert (Path(p) / "data" / sidecar).exists()
    V.expire_versions(p, keep_last=1)
    assert not (Path(p) / "data" / sidecar).exists()


def test_mor_update_and_second_delete_do_not_resurrect(spark, tmp_path):
    """UPDATE and a second (CoW) DELETE on files with sidecars read
    through the mask: masked rows neither update nor reappear in the
    rewritten files, and the sidecar scope shrinks with the rewrite."""
    p = _mor_table(spark, tmp_path)
    V.delete_table_version(spark, p, "k = 12", mode="mor")  # ds=4
    # UPDATE hits the same partition file (k=4 lives in ds=4 too)
    V.update_table_version(spark, p, "k = 4", {"val": "'UP'"})
    m3 = V._load_manifest(p, 3)
    assert not m3.get("deletes")  # the one scoped file was rewritten
    head = V.read_table_version(spark, p)
    assert head.filter("k = 12").count() == 0  # still deleted, physically
    assert head.filter("k = 4").collect()[0].val == "UP"
    assert head.count() == 63
    # CoW delete over a MoR-masked file: counts stay consistent
    V.delete_table_version(spark, p, "k = 20", mode="mor")
    v5 = V.delete_table_version(spark, p, "k = 28", mode="cow")  # ds=4 again
    m5 = V._load_manifest(p, v5)
    assert m5["count"] == 61
    assert V.read_table_version(spark, p).count() == 61


def test_mor_update_appends_only_updated_rows(spark, tmp_path):
    """UPDATE mode='mor': old images masked by a sidecar, ONLY the
    updated rows appended as new files — all original data files carry
    verbatim, count invariant, read parity with CoW UPDATE, SET
    simultaneity (a=b, b=a swap) preserved, and compaction folds."""
    p = _mor_table(spark, tmp_path)
    m1 = V._load_manifest(p, 1)
    v = V.update_table_version(
        spark, p, "k = 17", {"val": "'UPDATED'"}, mode="mor"
    )
    assert v == 2
    m2 = V._load_manifest(p, 2)
    assert set(m1["files"]) <= set(m2["files"])  # originals all carried
    appended = sorted(set(m2["files"]) - set(m1["files"]))
    assert len(appended) == 1  # one tiny new file for one updated row
    assert m2["count"] == m1["count"]
    assert len(m2["deletes"]) == 1
    head = V.read_table_version(spark, p)
    assert head.count() == 64
    assert head.filter("k = 17").collect()[0].val == "UPDATED"
    assert V.read_table_version(spark, p, 1).filter(
        "k = 17").collect()[0].val == "v17"
    assert V.history(p)[0]["op"] == "update(mor)"
    # swap simultaneity through the MoR path
    p2 = str(tmp_path / "swap")
    V.write_table_version(
        spark.createDataFrame([(1, 1, 10, 20)], ["k", "ds", "a", "b"]),
        p2, "ds",
    )
    V.update_table_version(spark, p2, "k = 1", {"a": "b", "b": "a"},
                           mode="mor")
    r = V.read_table_version(spark, p2).collect()[0]
    assert (r.a, r.b) == (20, 10)
    # CoW parity on the same predicate+set
    pc = _mor_table(spark, tmp_path / "cowside")
    V.update_table_version(spark, pc, "k = 17", {"val": "'UPDATED'"})
    assert ({tuple(x) for x in V.read_table_version(spark, pc).collect()}
            == {tuple(x) for x in V.read_table_version(spark, p).collect()})
    # compact folds the update debt too
    vc = V.compact_table_version(spark, p, max_files_per_partition=1)
    mc = V._load_manifest(p, vc)
    assert not mc.get("deletes")
    assert V.read_table_version(spark, p).filter(
        "k = 17").collect()[0].val == "UPDATED"


def test_mor_delete_composes_with_cdc_and_timestamp_travel(spark, tmp_path):
    """read_table_changes across a MoR delete step reports the delete
    rows exactly like a CoW step (diff reads are deletes-aware), and
    AS OF timestamps straddling the MoR commit resolve to the right
    content."""
    import time as _time

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")]),
                          p, "ds")
    _time.sleep(0.05)
    mid = _time.time()
    _time.sleep(0.05)
    V.delete_table_version(spark, p, "k = 2", mode="mor")
    ch = V.read_table_changes(spark, p, ["k"], from_version=1)
    got = {(r.k, r._change_type, r._commit_version) for r in ch.collect()}
    assert got == {(2, "delete", 2)}
    assert V.read_table_version(spark, p, as_of=mid).count() == 3
    assert V.read_table_version(spark, p).count() == 2


def test_mor_delete_everything_then_reseed(spark, tmp_path):
    p = _mor_table(spark, tmp_path, n=8, parts=2)
    v = V.delete_table_version(spark, p, "k >= 0", mode="mor")
    m = V._load_manifest(p, v)
    assert m["count"] == 0 and m["files"]  # files carried, all masked
    head = V.read_table_version(spark, p)
    assert head.count() == 0
    assert set(head.columns) == {"k", "ds", "val"}
    # upsert re-populates on the same chain; old mask does not leak
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(0, 0, "v0")], ["k", "ds", "val"]),
        keys=["k"], partition_by="ds",
    )
    assert {(r.k, r.val) for r in V.read_table_version(spark, p).collect()} \
        == {(0, "v0")}


def test_cli_mor_delete(spark, tmp_path):
    import subprocess
    import sys

    p = _mor_table(spark, tmp_path, n=8, parts=2)
    res = subprocess.run(
        [sys.executable, "-m", "etl_rust_spark", "table", p,
         "--delete-where", "k = 3", "--mor"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = json.loads(res.stdout.strip().splitlines()[-1])
    assert line["version"] == 2
    m = V._load_manifest(p, 2)
    assert m["deletes"] and m["files"] == V._load_manifest(p, 1)["files"]


def test_alter_cast_widens_and_rejects_lossy(spark, tmp_path):
    """ALTER COLUMN TYPE (r10): widening casts commit a re-snapshot with
    the new schema (composing with rename in one projection); a cast
    that would NULL any non-NULL value is rejected with per-column
    violation counts BEFORE anything stages — widening-only, enforced
    against the data."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 1, "10"), (2, 2, "x"), (3, 1, "30")],
        "k int, ds int, val string",
    )
    V.write_table_version(df, p, "ds", stats_cols=["k"])
    # widen int → bigint, and cast+rename in one alter
    v2 = V.alter_table_version(
        spark, p, cast={"k": "bigint"}, rename={"k": "kid"}
    )
    assert v2 == 2
    new = V.read_table_version(spark, p)
    assert dict(new.dtypes)["kid"] == "bigint"
    assert {r.kid for r in new.collect()} == {1, 2, 3}
    m2 = V._load_manifest(p, 2)
    assert m2["stats_cols"] == ["kid"]  # stats follow the rename
    # old version keeps the old (narrow) schema byte-identically
    assert dict(V.read_table_version(spark, p, 1).dtypes)["k"] == "int"
    # lossy: string 'x' cannot cast to int — counted and rejected
    with pytest.raises(ValueError, match="lose values.*'val': 1"):
        V.alter_table_version(spark, p, cast={"val": "int"})
    assert V.latest_version(p) == 2  # nothing committed
    # guards: unknown column, drop+cast overlap
    with pytest.raises(ValueError, match="no such columns"):
        V.alter_table_version(spark, p, cast={"nope": "int"})
    with pytest.raises(ValueError, match="dropped and renamed/cast"):
        V.alter_table_version(spark, p, drop=["val"], cast={"val": "int"})
    # NULL-preserving cast of a nullable column is fine (NULL stays
    # NULL, not counted as loss)
    p2 = str(tmp_path / "t2")
    V.write_table_version(
        spark.createDataFrame([(1, 1, None), (2, 1, "7")],
                              ["k", "ds", "val"]),
        p2, "ds",
    )
    V.alter_table_version(spark, p2, cast={"val": "int"})
    got = {(r.k, r.val) for r in V.read_table_version(spark, p2).collect()}
    assert got == {(1, None), (2, 7)}


def test_check_constraints_enforced_on_every_staging_op(spark, tmp_path):
    """CHECK constraints (r10, Delta ADD CONSTRAINT parity): adding
    validates the whole head; snapshot/upsert/update all reject
    violating rows with counts BEFORE committing; NULL passes (SQL
    CHECK); drop lifts enforcement; constraints ride the version chain
    (time travel + restore see their own), and an alter renaming a
    referenced column is rejected with the drop-first remediation."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, None)]), p, "ds"
    )
    v2 = V.add_table_constraint(spark, p, "k_pos", "k > 0")
    assert v2 == 2
    assert V.table_constraints(p) == {"k_pos": "k > 0"}
    assert V.history(p)[0]["op"] == "add_constraint(k_pos)"
    # adding one the data violates: rejected with the row count
    with pytest.raises(ValueError, match="violat.*'k_small': 1"):
        V.add_table_constraint(spark, p, "k_small", "k < 2")
    assert V.table_constraints(p) == {"k_pos": "k > 0"}  # not half-added
    # upsert of a violating row rejected before commit
    with pytest.raises(ValueError, match="upsert.*k_pos"):
        V.upsert_table_version(
            spark, p, _t(spark, [(-5, 1, "bad")]), keys=["k"],
            partition_by="ds",
        )
    assert V.latest_version(p) == 2
    # NULL in the checked expression passes (SQL CHECK semantics)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(None, 1, "n")], "k bigint, ds bigint, val string"),
        keys=["k"], partition_by="ds",
    )
    # snapshot and update enforcement (CoW and MoR forms)
    with pytest.raises(ValueError, match="snapshot.*k_pos"):
        V.write_table_version(_t(spark, [(0, 1, "z")]), p, "ds")
    with pytest.raises(ValueError, match="update.*k_pos"):
        V.update_table_version(spark, p, "k = 1", {"k": "-1"})
    with pytest.raises(ValueError, match="update.*k_pos"):
        V.update_table_version(spark, p, "k = 1", {"k": "-1"}, mode="mor")
    # alter renaming the referenced column: loud, drop-first remediation
    with pytest.raises(ValueError, match="no longer resolves"):
        V.alter_table_version(spark, p, rename={"k": "key"})
    # drop lifts enforcement; unknown drop raises
    V.drop_table_constraint(p, "k_pos")
    with pytest.raises(ValueError, match="no constraint"):
        V.drop_table_constraint(p, "k_pos")
    V.upsert_table_version(
        spark, p, _t(spark, [(-5, 1, "ok now")]), keys=["k"],
        partition_by="ds",
    )
    # time travel: the constraint is versioned metadata
    assert V.table_constraints(p, version=2) == {"k_pos": "k > 0"}
    assert V.table_constraints(p) == {}


def test_model_based_random_op_sequence_v2(spark, tmp_path):
    """Stateful fuzz over the FULL r9 operation set — snapshot / upsert
    / DELETE / compact / ZORDER-compact / expire — against a pure-
    Python model; head equality after every op, exact time travel for
    every surviving version at the end."""
    import random

    rng = random.Random(0xB10)
    p = str(tmp_path / "t")
    model: dict[int, dict[int, str]] = {}
    counter = 0

    def frame(rows):
        return spark.createDataFrame(
            [(k, k % 3, k * 7 % 5, v) for k, v in rows],
            ["k", "ds", "y", "val"],
        )

    V.write_table_version(
        frame([(1, "s0"), (2, "s1")]), p, "ds", stats_cols=["k", "y"],
    )
    state = {1: "s0", 2: "s1"}
    model[1] = dict(state)
    for step in range(16):
        op = rng.choice(
            ["upsert", "upsert", "delete", "mor_delete", "update",
             "mor_update", "merge", "compact", "zorder", "expire",
             "restore"]
        )
        if op == "upsert":
            counter += 1
            rows = list({
                rng.randint(1, 12): f"u{counter}.{j}"
                for j in range(rng.randint(1, 3))
            }.items())
            v = V.upsert_table_version(
                spark, p, frame(rows), keys=["k"], partition_by="ds"
            )
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
                assert v == head_before  # no-op, no new version
        elif op in ("update", "mor_update"):
            kup = rng.randint(1, 12)
            head_before = V.latest_version(p)
            v = V.update_table_version(
                spark, p, f"k = {kup}", {"val": "concat(val, '!')"},
                mode="mor" if op == "mor_update" else "cow",
            )
            if kup in state:
                assert v == head_before + 1
                state[kup] = state[kup] + "!"
                model[v] = dict(state)
            else:
                assert v == head_before  # no-op
        elif op == "merge":
            counter += 1
            feed = {
                rng.randint(1, 12): rng.choice(["U", "D", "I"])
                for _ in range(rng.randint(1, 3))
            }
            src = spark.createDataFrame(
                [(k, k % 3, k * 7 % 5, f"m{counter}.{k}", o)
                 for k, o in feed.items()],
                ["k", "ds", "y", "val", "op"],
            )
            head_before = V.latest_version(p)
            v = V.merge_table_version(
                spark, p, src, keys=["k"],
                when_matched_update="*",
                when_matched_delete="s.op = 'D'",
                when_not_matched_insert="s.op = 'I'",
                update_condition="s.op = 'U'",
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
            v = V.compact_table_version(spark, p)
            model[v] = dict(state)
        elif op == "zorder":
            v = V.compact_table_version(spark, p, 2, zorder_by=["k", "y"])
            model[v] = dict(state)
        elif op == "restore":
            tgt = rng.choice(sorted(model))   # any still-live version
            v = V.restore_table_version(p, tgt)
            state = dict(model[tgt])
            model[v] = dict(state)
        else:
            keep = rng.randint(1, 3)
            V.expire_versions(p, keep_last=keep)
            live = sorted(model)[-keep:]
            model = {v: c for v, c in model.items() if v in live}
        if state:
            head = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
            assert head == state, f"step {step} ({op})"
    for v, want in model.items():
        got = {r.k: r.val for r in V.read_table_version(spark, p, v).collect()}
        assert got == want, f"time travel to v{v}"


def test_publish_table_changes_to_queue_transport(spark, tmp_path):
    """The CDC feed publishes through the ETL queue machinery with a
    durable cursor: inserts/updates/deletes arrive as JSON records
    tagged with _commit_version; a second run publishes nothing new;
    re-running after a cursor rollback re-delivers (at-least-once)."""
    from etl_rust_spark.etl.sinks import DirQueueClient
    from etl_rust_spark.streaming.tables import publish_table_changes

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    qroot = str(tmp_path / "q")
    cursor = str(tmp_path / "cur")

    def factory():
        return DirQueueClient(qroot)

    # cold start: cursor lands at head, nothing published
    assert publish_table_changes(
        spark, p, ["k"], factory, cursor
    ) == 0
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "B"), (3, 1, "c")]),
        keys=["k"], partition_by="ds",
    )
    V.delete_table_version(spark, p, "k = 1")
    assert publish_table_changes(spark, p, ["k"], factory, cursor) == 2
    recs = []
    for f in sorted((tmp_path / "q").rglob("*")):
        if f.is_file():
            for line in f.read_text().splitlines():
                recs.append(json.loads(line))
    got = {(r["k"], r["_change_type"], r["_commit_version"]) for r in recs}
    assert got == {
        (2, "update_postimage", 2),
        (3, "insert", 2),
        (1, "delete", 3),
    }
    # caught up: idempotent no-op
    assert publish_table_changes(spark, p, ["k"], factory, cursor) == 0
    # crash-redelivery shape: roll the cursor back one version
    (tmp_path / "cur").write_text("2")
    assert publish_table_changes(spark, p, ["k"], factory, cursor) == 1


def test_delete_point_bloom_narrows_candidates(spark, tmp_path):
    """A single-key takedown on an unordered id: the bloom point hint
    leaves untouched files' stats entries carried verbatim (they were
    never candidates), and only the hit file rewrites."""
    p = str(tmp_path / "t")
    df = _uuid_table(spark).repartition(6, "ds")
    V.write_table_version(df, p, "ds", bloom_cols=["doc_id"])
    import hashlib

    key = hashlib.md5(b"13").hexdigest()
    m1 = V._load_manifest(p, 1)
    V.delete_table_version(
        spark, p, f"doc_id = '{key}'", point=[("doc_id", key)]
    )
    m2 = V._load_manifest(p, 2)
    rewritten = set(m1["files"]) - set(m2["files"])
    assert 1 <= len(rewritten) <= 2  # bloom FP slack
    got = V.read_table_version(spark, p)
    assert got.filter(F.col("doc_id") == key).count() == 0
    assert got.count() == 59


def test_compact_zorder_empty_table_noop(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p)
    V.delete_table_version(spark, p, "k = 1")  # empty version 2
    assert V.compact_table_version(spark, p, zorder_by=["k", "ds"]) == 2


def test_cdc_feed_across_delete_all_and_reseed(spark, tmp_path):
    """The change feed stays well-typed across an EMPTY version: the
    delete-all step emits deletes (schema from the manifest), and the
    re-seed step emits inserts."""
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.delete_table_version(spark, p, "k >= 0")          # v2: empty
    V.upsert_table_version(                              # v3: re-seed
        spark, p, _t(spark, [(9, 1, "z")]), keys=["k"], partition_by="ds"
    )
    ch = V.read_table_changes(spark, p, keys=["k"], from_version=1).collect()
    got = {(r.k, r._change_type, r._commit_version) for r in ch}
    assert got == {
        (1, "delete", 2), (2, "delete", 2), (9, "insert", 3),
    }


def test_concurrent_upserts_and_deletes_serialize_cleanly(spark, tmp_path):
    """Deletes race upserts through the same CommitConflict re-merge
    loop: the chain stays linear, every surviving key has its last
    write, and deleted keys whose delete landed LAST stay gone."""
    import threading

    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(k, k % 3, f"s{k}") for k in range(1, 7)]), p, "ds"
    )
    errs = []

    def upserter(w):
        try:
            for m in range(2):
                key = 10 + w
                V.upsert_table_version(
                    spark, p, _t(spark, [(key, key % 3, f"w{w}m{m}")]),
                    keys=["k"], partition_by="ds",
                )
        except Exception as e:  # surfaced below
            errs.append(e)

    def deleter(kdel):
        try:
            V.delete_table_version(spark, p, f"k = {kdel}")
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=upserter, args=(w,)) for w in range(3)]
    threads += [threading.Thread(target=deleter, args=(k,)) for k in (2, 4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    head = V.latest_version(p)
    # linear chain
    for v in range(2, head + 1):
        raw = json.loads(
            (Path(p) / "_manifests" / f"m{v:08d}.json").read_text()
        )
        assert raw["parent"] == v - 1
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert 2 not in got and 4 not in got          # deletes landed
    for w in range(3):
        assert got[10 + w] == f"w{w}m1"           # last upsert won
    assert {1, 3, 5, 6} <= set(got)               # untouched keys intact
    # sweep finds no leaked staged files
    V.expire_versions(p, keep_last=head, grace_seconds=0)
    data = Path(p) / "data"
    live = set()
    for v in V.list_versions(p):
        live.update(V._load_manifest(p, v)["files"])
    on_disk = {str(f.relative_to(data)) for f in data.rglob("*.parquet")}
    assert on_disk == live


# ------------------------------------------------------------ tags


def test_tags_name_versions_and_survive_expiry(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "b")]), keys=["k"], partition_by="ds"
    )
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 1, "c")]), keys=["k"], partition_by="ds"
    )
    assert V.tag_version(p, "prod", 1) == 1
    assert V.tag_version(p, "nightly") == 3     # default: head
    assert V.list_tags(p) == {"nightly": 3, "prod": 1}
    got = {r.k for r in V.read_table_version(spark, p, "prod").collect()}
    assert got == {1}
    rep = V.expire_versions(p, keep_last=1)
    assert set(rep["kept_versions"]) == {1, 3}  # tag retained v1
    assert V.read_table_version(spark, p, "prod").count() == 1
    with pytest.raises(FileNotFoundError):
        V._load_manifest(p, 2)                  # untagged middle dropped
    # re-point, then delete the tag: v1 becomes expirable
    V.tag_version(p, "prod", 3)
    V.delete_tag(p, "prod")
    rep = V.expire_versions(p, keep_last=1)
    assert rep["kept_versions"] == [3]
    with pytest.raises(FileNotFoundError):
        V.read_table_version(spark, p, "prod")
    with pytest.raises(ValueError, match="bad tag name"):
        V.tag_version(p, "../evil")
    with pytest.raises(ValueError, match="not committed"):
        V.tag_version(p, "future", 99)


def test_cli_table_tag_and_tagged_read(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "b")]), keys=["k"], partition_by="ds"
    )
    assert main(["table", p, "--tag", "prod=1"]) == 0
    capsys.readouterr()
    out_dir = str(tmp_path / "o")
    assert main(["table", p, "--read", "prod", "--out", out_dir]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["read_rows"] == 1


# ------------------------------------------------------------- update


def test_update_rewrites_only_hit_files(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]).repartition("ds"),
        p, "ds",
    )
    m1 = V._load_manifest(p, 1)
    v2 = V.update_table_version(spark, p, "k = 2", {"val": "upper(val)"})
    assert v2 == 2
    m2 = V._load_manifest(p, 2)
    clean = {f for f in m1["files"] if f.startswith("ds=2/")}
    assert clean and clean <= set(m2["files"])   # untouched file carried
    assert m2["count"] == 3                      # UPDATE never changes count
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    old = {r.k: r.val for r in V.read_table_version(spark, p, 1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}       # time travel intact
    # no-op when nothing matches
    assert V.update_table_version(spark, p, "k = 99", {"val": "'x'"}) == 2


def test_update_guards_and_type_preservation(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(1, 1, 10), (2, 2, 20)], ["k", "ds", "n"]),
        p, "ds",
    )
    with pytest.raises(ValueError, match="unknown columns"):
        V.update_table_version(spark, p, "k = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="partition column"):
        V.update_table_version(spark, p, "k = 1", {"ds": "9"})
    V.update_table_version(spark, p, "k = 1", {"n": "n * 2 + 0.7"})
    row = V.read_table_version(spark, p).filter("k = 1").first()
    assert row.n == 20  # cast back to the column's long type
    assert dict(V.read_table_version(spark, p).dtypes)["n"] == "bigint"


def test_update_shows_in_cdc(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.update_table_version(spark, p, "k = 1", {"val": "'A'"})
    ch = V.read_table_changes(spark, p, keys=["k"], from_version=1).collect()
    assert {(r.k, r._change_type, r.val) for r in ch} == {
        (1, "update_postimage", "A")
    }


def test_update_set_expressions_see_old_row(spark, tmp_path):
    """SQL UPDATE semantics: all SET expressions evaluate against the
    pre-update row — SET a = b, b = a swaps."""
    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(1, 10, 20), (2, 30, 40)], ["k", "a", "b"]), p
    )
    V.update_table_version(spark, p, "k = 1", {"a": "b", "b": "a"})
    rows = {r.k: (r.a, r.b) for r in V.read_table_version(spark, p).collect()}
    assert rows == {1: (20, 10), 2: (30, 40)}  # swapped, not b=b


def test_cli_table_update_where(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    assert main(
        ["table", p, "--update-where", "k = 2",
         "--set", "val=concat(upper(val), val)"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 2
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "a", 2: "Bb"}


# -------------------------------------------------- restore + history


def test_restore_rolls_back_bad_write_without_data_movement(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.tag_version(p, "good")
    V.delete_table_version(spark, p, "k >= 0")        # the "bad write"
    assert V.read_table_version(spark, p).count() == 0
    v3 = V.restore_table_version(p, "good")
    assert v3 == 3
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "a", 2: "b"}
    # pure metadata: v3 references v1's files verbatim
    assert V._load_manifest(p, 3)["files"] == V._load_manifest(p, 1)["files"]
    # history shows the whole story, newest first
    h = V.history(p)
    assert [(e["version"], e["op"]) for e in h] == [
        (3, "restore(1)"), (2, "delete"), (1, "snapshot"),
    ]
    assert h[0]["count"] == 2 and h[1]["count"] == 0
    # the bad version is still time-travelable until expired
    assert V.read_table_version(spark, p, 2).count() == 0
    with pytest.raises(ValueError, match="not committed"):
        V.restore_table_version(p, 99)


def test_history_records_ops_across_dml(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 1, "c")]), keys=["k"], partition_by="ds"
    )
    V.update_table_version(spark, p, "k = 1", {"val": "'A'"})
    V.delete_table_version(spark, p, "k = 2")
    ops = [e["op"] for e in V.history(p)]
    assert ops == ["delete", "update", "upsert", "snapshot"]


def test_cli_table_restore_and_history(spark, tmp_path, capsys):
    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.delete_table_version(spark, p, "k = 1")
    assert main(["table", p, "--restore", "1", "--history"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["version"] == 3
    assert [e["version"] for e in rep["history"]] == [3, 2, 1]
    assert V.read_table_version(spark, p).count() == 1


def test_expire_dry_run_reports_without_touching_disk(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 1, "c")]), keys=["k"], partition_by="ds"
    )
    V.delete_table_version(spark, p, "k = 2")
    before = sorted(str(f) for f in Path(p).rglob("*") if f.is_file())
    rep = V.expire_versions(p, keep_last=1, dry_run=True)
    assert rep["dry_run"] is True
    assert rep["kept_versions"] == [3]
    assert rep["dropped_manifests"] == 2 and rep["dropped_files"] >= 1
    after = sorted(str(f) for f in Path(p).rglob("*") if f.is_file())
    assert after == before                     # nothing touched
    assert V.read_table_version(spark, p, 1).count() == 2  # history intact
    # the real run then matches the dry report's drop counts
    real = V.expire_versions(p, keep_last=1)
    assert real["dropped_manifests"] == rep["dropped_manifests"]
    assert real["dropped_files"] == rep["dropped_files"]
    assert real["dry_run"] is False


def test_table_metrics_exposed_via_metrics_server(spark, tmp_path):
    """O-01 parity for the table layer: commit/conflict/expiry counters
    flow through the same Prometheus surface the ETL uses."""
    import urllib.request

    from etl_rust_spark.observability import MetricsServer

    p = str(tmp_path / "t")
    base = dict(V.table_metrics())
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 2, "b")]), keys=["k"], partition_by="ds"
    )
    V.delete_table_version(spark, p, "k = 1")
    V.expire_versions(p, keep_last=1, grace_seconds=0)
    m = V.table_metrics()

    def delta(name):
        return m.get(name, 0) - base.get(name, 0)

    assert delta("commits_total") == 3
    assert delta("commits_snapshot") == 1
    assert delta("commits_upsert") == 1
    assert delta("commits_delete") == 1
    assert delta("expired_manifests_total") >= 2
    srv = MetricsServer(port=0).start()
    try:
        srv.register("table", V.table_metrics)
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics"
        ).read().decode()
        # presence, not absolute values — the counters are process-
        # global and other tests bump them
        assert "\ncommits_total" in body and "\ncommits_delete" in body
    finally:
        srv.stop()


def test_bloom_false_positive_rate_within_band():
    """Statistical contract of the bloom parameters: with n keys in m
    bits and k hashes, absent-key FP rate ≈ (1 - e^(-kn/m))^k.  No
    false negatives, ever (exhaustive over the inserted set)."""
    import numpy as np

    bits, k, n = 8192, 4, 700  # ~ (1-e^-0.342)^4 ≈ 0.7%
    arr = np.zeros(bits, dtype=bool)
    keys = [f"key-{i}" for i in range(n)]
    for v in keys:
        for pos in V._bloom_positions(v, bits, k):
            arr[pos] = True
    entry = None
    import base64

    entry = {"m": bits, "k": k,
             "b": base64.b64encode(np.packbits(arr).tobytes()).decode()}
    assert all(V._bloom_might_contain(entry, v) for v in keys)  # no FN
    trials = 20000
    fp = sum(
        V._bloom_might_contain(entry, f"absent-{i}") for i in range(trials)
    )
    rate = fp / trials
    expected = (1 - np.exp(-k * n / bits)) ** k
    assert rate < 3 * expected  # generous band; catches broken hashing
    assert rate > 0  # a bloom with zero FPs at this load is broken too


def test_retry_budget_outlasts_heavy_contention():
    """r9s2 find: an 8-writer x 5-commit stress exhausted the old
    10-attempt CAS budget (clean error, but an availability ceiling).
    The default budget now absorbs a loss streak far beyond that
    (driven standalone: 8x5 completes with ~150 retries), pinned here
    cheaply: 20 straight losses then success must land."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 20:
            raise V.CommitConflict("lost the race")
        return 42

    assert V._retry_conflicts(flaky, "test") == 42
    assert calls["n"] == 21
    # explicit budgets still cap cleanly
    calls["n"] = -1000
    import pytest as _pytest

    with _pytest.raises(V.CommitConflict, match="gave up after 3"):
        V._retry_conflicts(
            lambda: (_ for _ in ()).throw(V.CommitConflict("x")),
            "test", attempts=3,
        )


# --- MERGE INTO (Delta-parity conditional merge, r10) ----------------


def test_merge_cdc_apply_update_delete_insert_one_commit(spark, tmp_path):
    """The CDC-apply shape: one MERGE lands updates, deletes and
    inserts from a single change feed in ONE commit."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]), p, "ds"
    )
    feed = spark.createDataFrame(
        [(1, 1, "A", "U"), (2, 1, None, "D"), (4, 2, "d", "I")],
        ["k", "ds", "val", "op"],
    )
    v = V.merge_table_version(
        spark, p, feed, keys=["k"],
        when_matched_update="*",
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert="s.op <> 'D'",
        update_condition="s.op = 'U'",
    )
    assert v == 2
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "A", 3: "c", 4: "d"}
    assert V._load_manifest(p, 2)["count"] == 3
    assert V.history(p)[0]["op"] == "merge"
    # v1 still reads byte-identically
    assert {r.k for r in V.read_table_version(spark, p, 1).collect()} \
        == {1, 2, 3}


def test_merge_matches_upsert_when_unconditional(spark, tmp_path):
    """update='*' + insert=True with no conditions ≡ upsert."""
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [(1, 1, "a"), (2, 2, "b")]
    delta = [(2, 2, "B"), (3, 1, "c")]
    for p in (pa_, pb):
        V.write_table_version(_t(spark, rows), p, "ds")
    V.merge_table_version(
        spark, pa_, _t(spark, delta), keys=["k"],
        when_matched_update="*", when_not_matched_insert=True,
    )
    V.upsert_table_version(spark, pb, _t(spark, delta), keys=["k"],
                           partition_by="ds")
    a = {(r.k, r.ds, r.val)
         for r in V.read_table_version(spark, pa_).collect()}
    b = {(r.k, r.ds, r.val)
         for r in V.read_table_version(spark, pb).collect()}
    assert a == b == {(1, 1, "a"), (2, 2, "B"), (3, 1, "c")}


def test_merge_rewrites_only_hit_files_insert_only_rewrites_none(
    spark, tmp_path
):
    """File-level narrowing: only files holding matched keys rewrite;
    an insert-only merge carries EVERY file and appends."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b"), (3, 3, "c")]), p, "ds"
    )
    m1 = V._load_manifest(p, 1)
    # update key 1 only: ds=2 and ds=3 files must carry verbatim
    V.merge_table_version(
        spark, p, _t(spark, [(1, 1, "A")]), keys=["k"],
        when_matched_update="*",
    )
    m2 = V._load_manifest(p, 2)
    clean = {f for f in m1["files"] if not f.startswith("ds=1/")}
    assert clean <= set(m2["files"])
    assert not any(f in m2["files"]
                   for f in m1["files"] if f.startswith("ds=1/"))
    # insert-only merge: zero rewrites, all files carried
    V.merge_table_version(
        spark, p, _t(spark, [(9, 9, "z")]), keys=["k"],
        when_not_matched_insert=True,
    )
    m3 = V._load_manifest(p, 3)
    assert set(m2["files"]) <= set(m3["files"])
    assert m3["count"] == 4


def test_merge_clause_semantics(spark, tmp_path):
    """Delete evaluates before update; NULL conditions leave rows;
    unmatched-by-any-clause rows carry unchanged; expressions see t and
    s qualified."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 1, "c"), (4, 1, "d")]),
        p, "ds",
    )
    src = spark.createDataFrame(
        [(1, "x", True), (2, "y", False), (3, "z", None)],
        ["k", "sval", "kill"],
    )
    V.merge_table_version(
        spark, p, src, keys=["k"],
        when_matched_delete="s.kill",
        when_matched_update={"val": "concat(t.val, '+', s.sval)"},
        update_condition="s.sval = 'y'",
    )
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    # k=1 deleted; k=2 updated via t/s expression; k=3 matched but its
    # kill is NULL and sval != 'y' → carried; k=4 unmatched → carried
    assert got == {2: "b+y", 3: "c", 4: "d"}


def test_merge_multi_source_match_raises(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    dup = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "y")], ["k", "ds", "val"]
    )
    with pytest.raises(ValueError, match="more than one source row"):
        V.merge_table_version(
            spark, p, dup, keys=["k"], when_matched_update="*",
        )
    # insert-only dup keys are legal (both insert — Delta semantics)
    dup2 = spark.createDataFrame(
        [(7, 1, "x"), (7, 1, "y")], ["k", "ds", "val"]
    )
    V.merge_table_version(spark, p, dup2, keys=["k"],
                          when_not_matched_insert=True)
    assert V.read_table_version(spark, p).filter("k = 7").count() == 2


def test_merge_guards_and_edges(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    with pytest.raises(ValueError, match="WHEN clause"):
        V.merge_table_version(spark, p, _t(spark, [(1, 1, "x")]), ["k"])
    with pytest.raises(ValueError, match="key columns"):
        V.merge_table_version(
            spark, p, spark.createDataFrame([("a",)], ["val"]), ["k"],
            when_matched_update="*",
        )
    with pytest.raises(ValueError, match="missing table columns"):
        V.merge_table_version(
            spark, p, spark.createDataFrame([(1,)], ["k"]), ["k"],
            when_not_matched_insert=True,
        )
    with pytest.raises(ValueError, match="unknown columns"):
        V.merge_table_version(
            spark, p, _t(spark, [(1, 1, "x")]), ["k"],
            when_matched_update={"nope": "'x'"},
        )
    with pytest.raises(ValueError, match="partition column"):
        V.merge_table_version(
            spark, p, _t(spark, [(1, 1, "x")]), ["k"],
            when_matched_update={"ds": "9"},
        )
    # nothing matched, nothing to insert → head unchanged, no commit
    head = V.latest_version(p)
    assert V.merge_table_version(
        spark, p, _t(spark, [(9, 9, "z")]), ["k"],
        when_matched_update="*",
    ) == head
    # NULL source key: neither updates nor inserts ON-clause-style
    src = spark.createDataFrame([(None, 1, "n")], "k long, ds long, val string")
    assert V.merge_table_version(
        spark, p, src, ["k"], when_matched_update="*",
    ) == head


def test_merge_into_emptied_table_reseeds(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    V.delete_table_version(spark, p, "k = 1")
    v = V.merge_table_version(
        spark, p, _t(spark, [(5, 1, "e")]), keys=["k"],
        when_matched_update="*", when_not_matched_insert=True,
    )
    assert {r.k for r in V.read_table_version(spark, p, v).collect()} == {5}


def test_merge_composes_with_cdc_constraints_and_mor(spark, tmp_path):
    """MERGE respects CHECK constraints, masks MoR-deleted rows (they
    neither match nor resurrect), and its changes surface in the CDC
    feed."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")]), p, "ds"
    )
    V.add_table_constraint(spark, p, "k_pos", "k > 0")
    V.delete_table_version(spark, p, "k = 2", mode="mor")  # v3
    with pytest.raises(ValueError, match="k_pos"):
        V.merge_table_version(
            spark, p,
            spark.createDataFrame([(-9, 1, "bad")], ["k", "ds", "val"]),
            ["k"], when_not_matched_insert=True,
        )
    head0 = V.latest_version(p)
    # a MoR-masked key is NOT matched — merging it back INSERTS
    v = V.merge_table_version(
        spark, p, _t(spark, [(2, 1, "b2"), (1, 1, "A")]), keys=["k"],
        when_matched_update="*", when_not_matched_insert=True,
    )
    got = {r.k: r.val for r in V.read_table_version(spark, p, v).collect()}
    assert got == {1: "A", 2: "b2", 3: "c"}
    ch = V.read_table_changes(spark, p, ["k"], from_version=head0)
    by = {(r.k, r._change_type) for r in ch.collect()}
    assert by == {(1, "update_postimage"), (2, "insert")}


def test_cli_table_merge_verb(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    f1, f2 = str(tmp_path / "f1"), str(tmp_path / "f2")
    _t(spark, [(1, 1, "a"), (2, 1, "b")]).write.parquet(f1)
    spark.createDataFrame(
        [(1, 1, "A", "U"), (2, 1, None, "D"), (3, 1, "c", "I")],
        ["k", "ds", "val", "op"],
    ).write.parquet(f2)
    table = str(tmp_path / "vt")
    assert main(["table", table, "--snapshot", f1, "--partition-by", "ds"]) == 0
    capsys.readouterr()
    assert main([
        "table", table, "--merge", f2, "--keys", "k",
        "--matched-update", "*",
        "--matched-delete", "s.op = 'D'",
        "--not-matched-insert", "s.op <> 'D'",
        "--update-condition", "s.op = 'U'",
    ]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["version"] == 2
    got = {r.k: r.val for r in V.read_table_version(spark, table).collect()}
    assert got == {1: "A", 3: "c"}


# --- CLONE + DESCRIBE DETAIL (r10) -----------------------------------


def test_clone_table_zero_copy_and_independent_retention(spark, tmp_path):
    """Hardlink shallow clone: zero bytes copied (same inodes), reads
    equal the cloned version, writes diverge copy-on-write, and
    retention on either side never breaks the other (each table owns
    its own directory entries)."""
    import os

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), src, "ds",
        stats_cols=["k"],
    )
    V.add_table_constraint(spark, src, "k_pos", "k > 0")
    V.upsert_table_version(spark, src, _t(spark, [(3, 1, "c")]),
                           keys=["k"], partition_by="ds")
    v = V.clone_table(src, dst)
    assert v == 1
    assert {(r.k, r.val) for r in V.read_table_version(spark, dst).collect()} \
        == {(1, "a"), (2, "b"), (3, "c")}
    # zero-copy: every clone file shares its inode with the source
    m = V._load_manifest(dst, 1)
    for f in m["files"]:
        s_ino = os.stat(Path(src) / "data" / f).st_ino
        d_ino = os.stat(Path(dst) / "data" / f).st_ino
        assert s_ino == d_ino
    # constraints inherited and enforced on the clone
    with pytest.raises(ValueError, match="k_pos"):
        V.upsert_table_version(
            spark, dst, _t(spark, [(-1, 1, "bad")]), keys=["k"],
            partition_by="ds",
        )
    # divergence: writes to the clone never show in the source
    V.upsert_table_version(spark, dst, _t(spark, [(9, 9, "z")]),
                           keys=["k"], partition_by="ds")
    assert V.read_table_version(spark, src).count() == 3
    # retention independence: expire + physically rewrite the source's
    # view; the clone still reads its inodes
    V.delete_table_version(spark, src, "k = 1")
    V.expire_versions(src, keep_last=1)
    assert {r.k for r in V.read_table_version(spark, dst, 1).collect()} \
        == {1, 2, 3}
    # and the other direction
    V.expire_versions(dst, keep_last=1)
    assert V.read_table_version(spark, src).count() == 2
    # double-clone refused; tag-addressed clone works
    with pytest.raises(FileExistsError):
        V.clone_table(src, dst)
    V.tag_version(src, "pinned")
    d2 = str(tmp_path / "d2")
    V.clone_table(src, d2, "pinned")
    assert V.history(d2)[0]["op"].startswith("clone(")


def test_clone_carries_mor_sidecars(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 1, "b")]), src, "ds")
    V.delete_table_version(spark, src, "k = 1", mode="mor")
    V.clone_table(src, dst)
    assert {r.k for r in V.read_table_version(spark, dst).collect()} == {2}
    assert V.table_detail(dst)["n_delete_sidecars"] == 1


def test_table_detail_and_cli(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds",
        stats_cols=["k"], bloom_cols=["val"],
    )
    V.add_table_constraint(spark, p, "k_pos", "k > 0")
    V.tag_version(p, "rel")
    d = V.table_detail(p)
    assert d["version"] == 2 and d["count"] == 2
    assert d["num_files"] >= 1 and d["size_bytes"] > 0
    assert d["partition_by"] == "ds" and d["stats_cols"] == ["k"]
    assert d["bloom_cols"] == ["val"]
    assert d["constraints"] == {"k_pos": "k > 0"}
    assert d["tags"] == {"rel": 2}
    capsys.readouterr()
    dst = str(tmp_path / "c")
    assert main(["table", p, "--detail", "--clone", dst,
                 "--clone-version", "1"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["detail"]["version"] == 2
    assert rep["cloned_version"] == 1
    assert V.table_detail(dst)["constraints"] == {}  # v1 pre-constraint


def test_table_properties_lifecycle_and_format_gate(spark, tmp_path, capsys):
    """TBLPROPERTIES ride the manifests like constraints: inherited by
    every commit, versioned (time travel sees its own), carried by
    clones, surfaced in DESCRIBE DETAIL; unknown unsets raise.  The
    manifest format gate refuses future-format manifests loudly."""
    import json as _json

    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a")]), p, "ds")
    assert V.table_properties(p) == {}
    v = V.set_table_properties(p, {"owner": "pipeline-a", "tier": "gold"})
    assert v == 2
    # inherited through a data commit
    V.upsert_table_version(spark, p, _t(spark, [(2, 2, "b")]),
                           keys=["k"], partition_by="ds")
    assert V.table_properties(p) == {"owner": "pipeline-a", "tier": "gold"}
    # merge semantics + versioned history
    V.set_table_properties(p, {"tier": "silver"})
    assert V.table_properties(p)["tier"] == "silver"
    assert V._load_manifest(p, 3).get("properties")["tier"] == "gold"
    V.unset_table_properties(p, ["owner"])
    assert V.table_properties(p) == {"tier": "silver"}
    with pytest.raises(ValueError, match="no properties"):
        V.unset_table_properties(p, ["nope"])
    with pytest.raises(ValueError, match="str"):
        V.set_table_properties(p, {"n": 3})
    # clone carries properties; detail surfaces them
    dst = str(tmp_path / "c")
    V.clone_table(p, dst)
    assert V.table_detail(dst)["properties"] == {"tier": "silver"}
    # CLI verbs
    capsys.readouterr()
    assert main(["table", p, "--set-property", "a=1",
                 "--set-property", "b=2"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["version"] == V.latest_version(p)
    assert V.table_properties(p)["a"] == "1"
    assert main(["table", p, "--unset-property", "a"]) == 0
    assert "a" not in V.table_properties(p)
    # format gate: a manifest stamped with a future format refuses
    head = V.latest_version(p)
    mp = Path(p) / "_manifests" / f"m{head:08d}.json"
    raw = _json.loads(mp.read_text())
    assert raw["format"] == 1  # stamped on every commit now
    raw["format"] = 99
    mp.write_text(_json.dumps(raw))
    with pytest.raises(ValueError, match="format 99.*upgrade"):
        V.read_table_version(spark, p)


# --- metadata-only column rename / column mapping (r10 s2) ------------


def test_rename_columns_metadata_only_zero_rewrite(spark, tmp_path):
    """rename_columns commits a column_map instead of rewriting data:
    files/stats/blooms carried VERBATIM, reads surface the new names
    with identical values, old versions keep their own names, format
    stamps 2, chain/swap renames compose."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds",
        stats_cols=["k"], bloom_cols=["val"],
    )
    m1 = V._load_manifest(p, 1)
    v = V.rename_columns(spark, p, {"k": "key", "val": "payload"})
    assert v == 2
    m2 = V._load_manifest(p, 2)
    assert m2["files"] == m1["files"]          # zero data movement
    assert m2["stats"] == m1["stats"]          # stats keys physical
    assert m2["column_map"] == {"key": "k", "payload": "val"}
    assert json.loads(
        (Path(p) / "_manifests" / "m00000002.json").read_text()
    )["format"] == 2
    got = {(r.key, r.ds, r.payload)
           for r in V.read_table_version(spark, p).collect()}
    assert got == {(1, 1, "a"), (2, 2, "b")}
    # time travel: v1 still surfaces the OLD names
    assert set(V.read_table_version(spark, p, 1).columns) == {"k", "ds", "val"}
    # prune/point in LOGICAL names still skip (stats keys physical)
    pointed = V.read_table_version(spark, p, point=[("payload", "a")])
    assert {r.key for r in pointed.collect()} == {1}
    pruned = V.read_table_version(spark, p, prune=[("key", 2, 2)])
    assert len(set(pruned.inputFiles())) == 1
    # chain + swap renames compose metadata-only
    V.rename_columns(spark, p, {"key": "id"})
    assert V._load_manifest(p, 3)["column_map"]["id"] == "k"
    V.rename_columns(spark, p, {"id": "payload", "payload": "id"})
    got = {(r.payload, r.id) for r in V.read_table_version(spark, p).collect()}
    assert got == {(1, "a"), (2, "b")}
    # guards
    with pytest.raises(ValueError, match="no such columns"):
        V.rename_columns(spark, p, {"nope": "x"})
    with pytest.raises(ValueError, match="duplicate"):
        V.rename_columns(spark, p, {"id": "ds"})


def test_mapped_table_dml_and_lifecycle(spark, tmp_path):
    """Every DML composes with a column map: upsert/delete/update/merge
    take LOGICAL names, staged files stay PHYSICAL (footer names never
    change), MoR masks written before AND after the rename apply, CDC
    works post-rename, clone carries the map, compaction keeps it, and
    a full re-snapshot (alter) re-baselines it away."""
    import pyarrow.parquet as pq

    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b"), (3, 3, "c")]), p, "ds",
        stats_cols=["k"],
    )
    V.delete_table_version(spark, p, "k = 3", mode="mor")  # pre-rename mask
    V.rename_columns(spark, p, {"k": "key", "val": "payload"})
    m = V._load_manifest(p, V.latest_version(p))

    def physical_names():
        names = set()
        for f in m["files"]:
            names.update(pq.read_schema(str(Path(p) / "data" / f)).names)
        return names

    assert physical_names() == {"k", "val"}  # ds lives in the dirs
    # pre-rename MoR mask still applies through the mapped read
    assert {r.key for r in V.read_table_version(spark, p).collect()} == {1, 2}
    # upsert in logical names; staged files keep PHYSICAL names
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(2, 2, "B"), (4, 1, "d")],
                              ["key", "ds", "payload"]),
        keys=["key"], partition_by="ds",
    )
    m = V._load_manifest(p, V.latest_version(p))
    assert physical_names() == {"k", "val"}
    got = {r.key: r.payload for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    # MoR delete POST-rename (logical predicate), then CoW update
    V.delete_table_version(spark, p, "payload = 'd'", mode="mor")
    assert {r.key for r in V.read_table_version(spark, p).collect()} == {1, 2}
    V.update_table_version(spark, p, "key = 1",
                           {"payload": "upper(payload)"})
    assert V.read_table_version(spark, p).filter(
        "key = 1").collect()[0].payload == "A"
    with pytest.raises(ValueError, match="partition column 'ds'"):
        V.update_table_version(spark, p, "key = 1", {"ds": "9"})
    # merge with t/s expressions in logical names
    V.merge_table_version(
        spark, p,
        spark.createDataFrame([(2, 2, "x"), (7, 1, "g")],
                              ["key", "ds", "payload"]),
        ["key"], when_matched_update={"payload": "concat(t.payload, s.payload)"},
        when_not_matched_insert=True,
    )
    got = {r.key: r.payload for r in V.read_table_version(spark, p).collect()}
    assert got == {1: "A", 2: "Bx", 7: "g"}
    # CDC post-rename surfaces logical names
    hv = V.latest_version(p)
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(8, 2, "h")], ["key", "ds", "payload"]),
        keys=["key"], partition_by="ds",
    )
    ch = V.read_table_changes(spark, p, ["key"], from_version=hv)
    assert {(r.key, r._change_type) for r in ch.collect()} == {(8, "insert")}
    # clone carries the map; compact keeps it and stays physical
    dst = str(tmp_path / "c")
    V.clone_table(p, dst)
    assert V.table_detail(dst)["column_map"] == {"key": "k", "payload": "val"}
    assert {r.key for r in V.read_table_version(spark, dst).collect()} \
        == {1, 2, 7, 8}
    V.compact_table_version(spark, p)
    m = V._load_manifest(p, V.latest_version(p))
    assert m.get("column_map") == {"key": "k", "payload": "val"}
    assert physical_names() == {"k", "val"}
    assert {r.key: r.payload
            for r in V.read_table_version(spark, p).collect()} \
        == {1: "A", 2: "Bx", 7: "g", 8: "h"}
    # full re-snapshot re-baselines: physical = logical, map gone
    V.alter_table_version(spark, p, drop=[])
    m = V._load_manifest(p, V.latest_version(p))
    assert not m.get("column_map")
    assert physical_names() == {"key", "payload"}
    assert {r.key for r in V.read_table_version(spark, p).collect()} \
        == {1, 2, 7, 8}


def test_mapped_table_through_datasource_and_sink(spark, tmp_path):
    """The DataSource supports column-mapped tables: batch reads
    surface LOGICAL names, sink appends stage PHYSICAL (footer names
    never change), constraints in logical names validate sparkless
    over the alias view, and a stream crossing a rename boundary keeps
    flowing (per-version physical column resolution on the slices)."""
    import pyarrow.parquet as pq

    from etl_rust_spark.sources.table_source import VersionedTableDataSource

    spark.dataSource.register(VersionedTableDataSource)
    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(1, "a")], "k long, val string"), p
    )
    V.rename_columns(spark, p, {"k": "key"})
    df = spark.read.format("versioned_table").option("path", p).load()
    assert dict(df.dtypes) == {"key": "bigint", "val": "string"}
    assert {(r.key, r.val) for r in df.collect()} == {(1, "a")}
    # sink append in LOGICAL names; staged file keeps PHYSICAL names
    spark.createDataFrame([(2, "b")], "key long, val string") \
        .write.format("versioned_table").option("path", p) \
        .mode("append").save()
    m = V._load_manifest(p, V.latest_version(p))
    names = set()
    for f in m["files"]:
        names.update(pq.read_schema(str(Path(p) / "data" / f)).names)
    assert names == {"k", "val"}
    assert {r.key for r in V.read_table_version(spark, p).collect()} == {1, 2}
    # a constraint in the NEW logical name validates sparkless over
    # the alias view at sink-commit time and still fails loudly
    V.add_table_constraint(spark, p, "key_pos2", "key > 0")
    with pytest.raises(Exception, match="key_pos2"):
        spark.createDataFrame([(-5, "x")], "key long, val string") \
            .write.format("versioned_table").option("path", p) \
            .mode("append").save()
    # streaming ACROSS the rename boundary: version-scoped physical
    # columns on each slice
    p2 = str(tmp_path / "t2")
    V.write_table_version(
        spark.createDataFrame([(1, "a")], "k long, val string"), p2
    )
    spark.createDataFrame([(2, "b")], "k long, val string") \
        .write.format("versioned_table").option("path", p2).mode("append").save()
    V.rename_columns(spark, p2, {"k": "key"})
    spark.createDataFrame([(3, "c")], "key long, val string") \
        .write.format("versioned_table").option("path", p2).mode("append").save()
    out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (spark.readStream.format("versioned_table").option("path", p2)
         .option("startingVersion", "earliest")
         .option("skipChangeCommits", "true")  # the rename adds no files
         .load().writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.key, r.val) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_rename_partition_column_and_constraints(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.add_table_constraint(spark, p, "k_pos", "k > 0")
    # a rename breaking a constraint aborts with the remediation
    with pytest.raises(ValueError, match="drop the|constraint"):
        V.rename_columns(spark, p, {"k": "key"})
    V.drop_table_constraint(p, "k_pos")
    # partition column renames metadata-only (dirs keep physical name)
    capsys.readouterr()
    assert main(["table", p, "--rename-column", "ds=day",
                 "--rename-column", "k=key"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["version"] == V.latest_version(p)
    df = V.read_table_version(spark, p)
    assert {r.day for r in df.collect()} == {1, 2}
    m = V._load_manifest(p, V.latest_version(p))
    assert m["partition_by"] == "ds"  # physical dirs unchanged
    assert all(f.startswith("ds=") for f in m["files"])
    # upsert with the NEW logical partition name
    V.upsert_table_version(
        spark, p,
        spark.createDataFrame([(9, 3, "z")], ["key", "day", "val"]),
        keys=["key"], partition_by="day",
    )
    assert V.read_table_version(spark, p).count() == 3
    # restoring to the pre-rename version restores the old names
    V.restore_table_version(p, 1)
    assert set(V.read_table_version(spark, p).columns) == {"k", "ds", "val"}


def test_mor_auto_mode_routes_by_match_size(spark, tmp_path):
    """mode='auto' (r12) executes the MoR cost model instead of
    refusing: a small match takes the sidecar path (zero data files
    rewritten), a broad match routes to CoW (rewrite once, clean reads
    after) — parity either way, and staged CoW files never leak the
    MoR position annotations."""
    import pyarrow.parquet as pq

    p = _mor_table(spark, tmp_path)
    files_v1 = set(V._load_manifest(p, 1)["files"])
    # small match -> sidecar: every data file carries over verbatim
    v2 = V.delete_table_version(spark, p, "k = 17", mode="auto",
                                mor_max_rows=3)
    m2 = V._load_manifest(p, v2)
    assert set(m2["files"]) == files_v1
    assert m2["deletes"] and m2["op"] == "delete(mor)"
    # broad match -> CoW: no new sidecar, hit files rewritten
    v3 = V.delete_table_version(spark, p, "k < 10", mode="auto",
                                mor_max_rows=3)
    m3 = V._load_manifest(p, v3)
    assert m3["op"] == "delete"
    assert set(m3["files"]) != set(m2["files"])
    got = sorted(r.k for r in V.read_table_version(spark, p).collect())
    assert got == sorted(k for k in range(64) if k >= 10 and k != 17)
    # the CoW rewrite staged clean payload files (no __pos_* columns)
    new_files = set(m3["files"]) - set(m2["files"])
    for f in new_files:
        names = pq.read_schema(str(Path(p) / "data" / f)).names
        assert not any(c.startswith("__pos") for c in names), names
    # auto UPDATE: broad -> CoW, small -> sidecar
    v4 = V.update_table_version(spark, p, "k >= 10", {"val": "'B'"},
                                mode="auto", mor_max_rows=3)
    assert V._load_manifest(p, v4)["op"] == "update"
    v5 = V.update_table_version(spark, p, "k = 20", {"val": "'C'"},
                                mode="auto", mor_max_rows=3)
    m5 = V._load_manifest(p, v5)
    assert m5["op"] == "update(mor)" and m5["deletes"]
    rows = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert rows[20] == "C" and rows[21] == "B"


def test_merge_mor_masks_without_rewrites(spark, tmp_path):
    """MERGE mode='mor' (r12): touched matched rows (updated old
    images + deletes) mask via a positional sidecar, updated images
    and inserts append, and NOT ONE data file rewrites.  Parity pinned
    against the same merge run CoW on a clone."""
    p = _mor_table(spark, tmp_path)
    clone = str(tmp_path / "clone")
    V.clone_table(p, clone)
    src = spark.createDataFrame(
        [(5, "U"), (17, "D"), (100, "I")], ["k", "op"]
    ).selectExpr("k", "k % 8 as ds", "concat('n', k) as val", "op")
    kwargs = dict(
        keys=["k"],
        when_matched_update="*",
        when_matched_delete="s.op = 'D'",
        when_not_matched_insert="s.op = 'I'",
        update_condition="s.op = 'U'",
    )
    files_before = set(V._load_manifest(p, 1)["files"])
    v = V.merge_table_version(
        spark, p, src, mode="mor", **kwargs)
    m = V._load_manifest(p, v)
    assert m["op"] == "merge(mor)"
    assert m["deletes"], "touched rows must mask via sidecar"
    assert files_before <= set(m["files"])  # zero rewrites
    V.merge_table_version(
        spark, clone, src, **kwargs)
    a = sorted(map(tuple, V.read_table_version(spark, p).collect()))
    b = sorted(map(tuple, V.read_table_version(spark, clone).collect()))
    assert a == b
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[5] == "n5" and 17 not in got and got[100] == "n100"
    # the CDC feed sees through the sidecar: one update postimage, one
    # delete (NULL payload), one insert for the merge(mor) step
    ch = {(r.k, r._change_type): r.val
          for r in V.read_table_changes(spark, p, ["k"], v - 1, v)
          .collect()}
    assert ch[(5, "update_postimage")] == "n5"
    assert ch[(17, "delete")] is None
    assert ch[(100, "insert")] == "n100"
    # compaction folds the debt; content unchanged
    V.compact_table_version(spark, p)
    assert not V._load_manifest(
        p, V.latest_version(p)).get("deletes")
    assert sorted(map(tuple,
                      V.read_table_version(spark, p).collect())) == a


def test_merge_mor_guard_and_auto(spark, tmp_path):
    """Explicit mor refuses broad matches with the CoW remediation;
    auto routes them to CoW instead — parity either way."""
    p = _mor_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(k, k % 8, "X") for k in range(40)], ["k", "ds", "val"])
    with pytest.raises(ValueError, match="mode='cow'"):
        V.merge_table_version(
            spark, p, src, keys=["k"], when_matched_update="*",
            mode="mor", mor_max_rows=3)
    v = V.merge_table_version(
        spark, p, src, keys=["k"], when_matched_update="*",
        mode="auto", mor_max_rows=3)
    m = V._load_manifest(p, v)
    assert m["op"] == "merge" and not m.get("deletes")
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[0] == "X" and got[63] == "v63"
    # small match in auto -> sidecar
    src2 = spark.createDataFrame([(1, 1, "Y")], ["k", "ds", "val"])
    v2 = V.merge_table_version(
        spark, p, src2, keys=["k"], when_matched_update="*",
        mode="auto", mor_max_rows=3)
    m2 = V._load_manifest(p, v2)
    assert m2["op"] == "merge(mor)" and m2["deletes"]
    assert {r.val for r in V.read_table_version(spark, p)
            .filter("k = 1").collect()} == {"Y"}


def test_upsert_mor_masks_without_rewrites(spark, tmp_path):
    """upsert mode='mor' (r12): routes through the merge MoR path —
    matched old images mask via sidecar, the delta appends, zero data
    files rewrite.  Parity pinned vs the CoW upsert on a clone."""
    p = _mor_table(spark, tmp_path)
    clone = str(tmp_path / "clone")
    V.clone_table(p, clone)
    delta = spark.createDataFrame(
        [(5, 5, "U5"), (200, 0, "I200")], ["k", "ds", "val"])
    files_before = set(V._load_manifest(p, 1)["files"])
    v = V.upsert_table_version(spark, p, delta, keys=["k"], mode="mor")
    m = V._load_manifest(p, v)
    assert m["op"] == "merge(mor)" and m["deletes"]
    assert files_before <= set(m["files"])  # zero rewrites
    V.upsert_table_version(spark, clone, delta, keys=["k"],
                           partition_by="ds")
    a = sorted(map(tuple, V.read_table_version(spark, p).collect()))
    b = sorted(map(tuple, V.read_table_version(spark, clone).collect()))
    assert a == b
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[5] == "U5" and got[200] == "I200" and got[6] == "v6"


def test_upsert_mor_evolution_and_auto(spark, tmp_path):
    """Schema evolution cannot mask: explicit mor refuses, auto falls
    back to the CoW re-baseline; broad auto deltas route to CoW."""
    p = _mor_table(spark, tmp_path)
    wide = spark.createDataFrame(
        [(5, 5, "U5", "x")], ["k", "ds", "val", "extra"])
    with pytest.raises(ValueError, match="cannot add columns"):
        V.upsert_table_version(spark, p, wide, keys=["k"], mode="mor")
    v = V.upsert_table_version(spark, p, wide, keys=["k"],
                               partition_by="ds", mode="auto")
    m = V._load_manifest(p, v)
    assert m["op"] == "upsert-evolve" and not m.get("deletes")
    assert "extra" in V.read_table_version(spark, p).columns
    # broad delta in auto -> merge CoW, small -> sidecar
    broad = spark.createDataFrame(
        [(k, k % 8, f"B{k}", None) for k in range(40)],
        "k: bigint, ds: bigint, val: string, extra: string")
    v2 = V.upsert_table_version(
        spark, p, broad, keys=["k"], mode="auto", mor_max_rows=3)
    m2 = V._load_manifest(p, v2)
    assert m2["op"] == "merge" and not m2.get("deletes")
    small = spark.createDataFrame(
        [(1, 1, "S1", None)],
        "k: bigint, ds: bigint, val: string, extra: string")
    v3 = V.upsert_table_version(
        spark, p, small, keys=["k"], mode="auto", mor_max_rows=3)
    m3 = V._load_manifest(p, v3)
    assert m3["op"] == "merge(mor)" and m3["deletes"]
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[1] == "S1" and got[2] == "B2" and got[63] == "v63"
