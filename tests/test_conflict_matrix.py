"""Concurrent-writer conflict matrix (r10 s3): the op pairs the
single-op stress tests don't cross — MoR delete racing compaction,
MERGE racing MERGE, and size-targeted compaction racing an upsert.
Every pair must serialize through the CommitConflict re-merge loop:
linear parent chain, each op's effect visible at the final head, no
staged-file leaks.  (The single-op races live in test_versions.py —
this file is the cross-op coverage VERDICTs keep asking table formats
to prove.)"""

from __future__ import annotations

import json
import threading
from pathlib import Path

from etl_rust_spark import versions as V


def _t(spark, rows):
    return spark.createDataFrame(rows, ["k", "ds", "val"])


def _assert_linear_no_leaks(p):
    head = V.latest_version(p)
    for v in range(2, head + 1):
        raw = json.loads(
            (Path(p) / "_manifests" / f"m{v:08d}.json").read_text()
        )
        assert raw["parent"] == v - 1
    V.expire_versions(p, keep_last=head, grace_seconds=0)
    data = Path(p) / "data"
    live = set()
    for v in V.list_versions(p):
        m = V._load_manifest(p, v)
        live.update(m["files"])
        live.update(d["path"] for d in m.get("deletes") or [])
    on_disk = {str(f.relative_to(data)) for f in data.rglob("*.parquet")}
    assert on_disk == live
    return head


def test_mor_delete_races_compaction(spark, tmp_path):
    """Whichever lands second re-runs against the other's head: the
    delete's mask must survive a concurrent fold, and the fold must
    never resurrect masked rows."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(k, k % 2, f"s{k}") for k in range(8)]), p, "ds"
    )
    # fragment ds=0 so the compactor has real work
    for i in (10, 12):
        V.upsert_table_version(
            spark, p, _t(spark, [(i, 0, f"s{i}")]), keys=["k"],
            partition_by="ds",
        )
    errs = []

    def deleter():
        try:
            V.delete_table_version(spark, p, "k = 2", mode="mor")
        except Exception as e:
            errs.append(e)

    def compactor():
        try:
            V.compact_table_version(spark, p, target_file_bytes=1 << 30)
        except Exception as e:
            errs.append(e)

    ts = [threading.Thread(target=deleter), threading.Thread(target=compactor)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = sorted(r.k for r in V.read_table_version(spark, p).collect())
    assert 2 not in got and {0, 1, 3, 10, 12} <= set(got)
    _assert_linear_no_leaks(p)
    # fold the mask if the delete landed last, then re-check
    V.compact_table_version(spark, p, target_file_bytes=1 << 30)
    got2 = sorted(r.k for r in V.read_table_version(spark, p).collect())
    assert got2 == got
    assert not V._load_manifest(p, V.latest_version(p)).get("deletes")


def test_merge_races_merge_disjoint_sources(spark, tmp_path):
    """Two MERGE INTO writers with disjoint key sets: the CAS loser
    re-merges and BOTH effects land."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(k, k % 2, f"s{k}") for k in range(6)]), p, "ds"
    )
    errs = []

    def merger(lo):
        try:
            src = _t(spark, [(lo, lo % 2, f"m{lo}"), (lo + 100, 0, f"i{lo}")])
            V.merge_table_version(
                spark, p, src, ["k"],
                when_matched_update="*", when_not_matched_insert=True,
            )
        except Exception as e:
            errs.append(e)

    ts = [threading.Thread(target=merger, args=(w,)) for w in (1, 2, 3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    for w in (1, 2, 3):
        assert got[w] == f"m{w}"          # every update landed
        assert got[w + 100] == f"i{w}"    # every insert landed
    assert got[0] == "s0" and got[4] == "s4" and got[5] == "s5"
    _assert_linear_no_leaks(p)


def test_binpack_compaction_races_upsert(spark, tmp_path):
    """Size-targeted compaction re-merges against a concurrent upsert:
    the upsert's rows are never lost to a compactor that planned the
    old head."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(k, 0, f"s{k}") for k in range(4)]), p, "ds"
    )
    for i in (20, 21):
        V.upsert_table_version(
            spark, p, _t(spark, [(i, 0, f"s{i}")]), keys=["k"],
            partition_by="ds",
        )
    errs = []

    def upserter():
        try:
            V.upsert_table_version(
                spark, p, _t(spark, [(30, 0, "fresh")]), keys=["k"],
                partition_by="ds",
            )
        except Exception as e:
            errs.append(e)

    def compactor():
        try:
            V.compact_table_version(spark, p, target_file_bytes=1 << 30)
        except Exception as e:
            errs.append(e)

    ts = [threading.Thread(target=upserter), threading.Thread(target=compactor)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[30] == "fresh" and {0, 1, 2, 3, 20, 21} <= set(got)
    _assert_linear_no_leaks(p)


def test_mor_merge_races_compaction(spark, tmp_path):
    """MERGE mode='mor' (r12) under the same race: whichever lands
    second re-runs against the other's head — the merge's sidecar
    mask and appended images must survive a concurrent fold."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(k, k % 2, f"s{k}") for k in range(8)]), p, "ds"
    )
    for i in (10, 12):
        V.upsert_table_version(
            spark, p, _t(spark, [(i, 0, f"s{i}")]), keys=["k"],
            partition_by="ds",
        )
    errs = []

    def merger():
        try:
            V.merge_table_version(
                spark, p, _t(spark, [(2, 0, "M2"), (99, 1, "I99")]),
                keys=["k"], when_matched_update="*",
                when_not_matched_insert=True, mode="mor",
            )
        except Exception as e:
            errs.append(e)

    def compactor():
        try:
            V.compact_table_version(spark, p, target_file_bytes=1 << 30)
        except Exception as e:
            errs.append(e)

    ts = [threading.Thread(target=merger),
          threading.Thread(target=compactor)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got[2] == "M2" and got[99] == "I99" and got[3] == "s3"
    _assert_linear_no_leaks(p)
    V.compact_table_version(spark, p, target_file_bytes=1 << 30)
    got2 = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert got2 == got
    assert not V._load_manifest(p, V.latest_version(p)).get("deletes")
