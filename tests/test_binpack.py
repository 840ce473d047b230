"""Size-targeted compaction (``compact_table_version(target_file_bytes=
...)``, r10 s3) — Delta OPTIMIZE bin-packing semantics over the
manifest log: only partitions where merging reduces the file count
rewrite, over-target files are never split, content identity is
pinned, and the pass composes with MoR sidecar folding."""

from __future__ import annotations

import pytest

from etl_rust_spark import versions as V


def _t(spark, rows):
    return spark.createDataFrame(rows, ["k", "ds", "val"])


def _frag(spark, p, n=5):
    """A table whose ds=1 partition holds n files (1 snapshot + n-1
    APPEND epochs — appends fragment; CoW upserts rewrite the dirty
    partition whole) and ds=2 holds one."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    V.write_table_version(_t(spark, [(0, 1, "s0"), (1000, 2, "x")]), p, "ds")
    stage = Path(p) / "_stage-frag"
    stage.mkdir()
    for i in range(1, n):
        f = stage / f"e{i}.parquet"
        # partitioned appends stage the PAYLOAD only (the partition
        # value lives in the directory, as Spark writes it)
        pq.write_table(
            pa.table({
                "k": pa.array([i], pa.int64()),
                "val": pa.array([f"s{i}"]),
            }),
            str(f),
        )
        V.commit_appended_files(spark, p, [(str(f), "ds=1")], 1)


def test_binpack_merges_fragmented_partition_only(spark, tmp_path):
    p = str(tmp_path / "t")
    _frag(spark, p, n=5)
    before = V.read_table_version(spark, p)
    rows_before = sorted((r.k, r.ds, r.val) for r in before.collect())
    m0 = V._load_manifest(p, V.latest_version(p))
    assert sum(1 for f in m0["files"] if f.startswith("ds=1/")) == 5
    clean = {f for f in m0["files"] if f.startswith("ds=2/")}
    # a huge target: every partition packs to 1 file
    v = V.compact_table_version(spark, p, target_file_bytes=1 << 30)
    m1 = V._load_manifest(p, v)
    assert sum(1 for f in m1["files"] if f.startswith("ds=1/")) == 1
    # the already-compact partition's file carries over VERBATIM
    assert clean <= set(m1["files"])
    after = sorted(
        (r.k, r.ds, r.val)
        for r in V.read_table_version(spark, p).collect()
    )
    assert after == rows_before and m1["count"] == m0["count"]
    # fresh files carry rows: footer counts
    new = set(m1["files"]) - set(m0["files"])
    assert all(V._ROWS_KEY in m1["stats"][f] for f in new)


def test_binpack_never_splits_an_over_target_file(spark, tmp_path):
    p = str(tmp_path / "t")
    _frag(spark, p, n=3)
    head = V.latest_version(p)
    # a 1-byte target: every file is over target, n_out >= n_files
    # everywhere, merging reduces nothing — the pass is a no-op commit
    assert V.compact_table_version(spark, p, target_file_bytes=1) == head


def test_binpack_unpartitioned_and_guards(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        spark.createDataFrame([(i, f"v{i}") for i in range(4)], ["k", "v"]),
        p,
    )
    for i in range(4, 8):
        V.upsert_table_version(
            spark, p,
            spark.createDataFrame([(i, f"v{i}")], ["k", "v"]), keys=["k"],
        )
    m0 = V._load_manifest(p, V.latest_version(p))
    n0 = len(m0["files"])
    v = V.compact_table_version(spark, p, target_file_bytes=1 << 30)
    m1 = V._load_manifest(p, v)
    assert len(m1["files"]) < n0
    got = sorted(
        (r.k, r.v) for r in V.read_table_version(spark, p).collect()
    )
    assert got == [(i, f"v{i}") for i in range(8)]
    with pytest.raises(ValueError, match="zorder"):
        V.compact_table_version(
            spark, p, target_file_bytes=100, zorder_by=["k"]
        )
    with pytest.raises(ValueError, match="positive"):
        V.compact_table_version(spark, p, target_file_bytes=0)


def test_binpack_folds_mor_sidecar(spark, tmp_path):
    p = str(tmp_path / "t")
    _frag(spark, p, n=3)
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    m0 = V._load_manifest(p, V.latest_version(p))
    assert m0.get("deletes")
    v = V.compact_table_version(spark, p, target_file_bytes=1 << 30)
    m1 = V._load_manifest(p, v)
    assert not m1.get("deletes")  # debt folded
    ks = sorted(r.k for r in V.read_table_version(spark, p).collect())
    assert 1 not in ks and m1["count"] == m0["count"]
    # metadata-only count works again once the sidecar is folded
    assert (
        V.aggregate_table_metadata(p, ["count(*)"])["count(*)"]
        == m1["count"]
    )
