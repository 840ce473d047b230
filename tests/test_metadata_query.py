"""Metadata-only queries over versioned tables (r10 s3): exact
COUNT/MIN/MAX answered from the manifest log alone
(``aggregate_table_metadata``), SHOW PARTITIONS with per-partition row
counts (``table_partitions``), per-file ``rows:`` footer counts, and
Iceberg-style truncation of wide string stats with SOUND widened
bounds.  Reference shape: Delta's metadata-only query optimization and
Iceberg's ``truncate(w)`` bound transforms — re-expressed over this
repo's manifest format (no reference-repo counterpart: etl-rust has no
table format at all)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark import versions as V


def _t(spark, rows):
    return spark.createDataFrame(rows, ["k", "ds", "val"])


# --------------------------------------------------- per-file row counts


def test_new_commits_record_per_file_row_counts(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]), p, "ds")
    m = V._load_manifest(p, 1)
    rows = {f: (m["stats"].get(f) or {}).get(V._ROWS_KEY) for f in m["files"]}
    assert all(n is not None for n in rows.values())
    assert sum(rows.values()) == m["count"] == 3


def test_row_counts_survive_upsert_and_compaction(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(3, 2, "c")]), keys=["k"], partition_by="ds"
    )
    V.compact_table_version(spark, p, max_files_per_partition=1)
    m = V._load_manifest(p, V.latest_version(p))
    total = sum((m["stats"].get(f) or {}).get(V._ROWS_KEY, 0) for f in m["files"])
    assert total == m["count"] == 3


# ------------------------------------------------- metadata aggregates


def test_count_star_from_metadata_matches_scan(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(_t(spark, [(1, 1, "a"), (2, 1, "b")]), p, "ds")
    V.upsert_table_version(
        spark, p, _t(spark, [(2, 1, "B"), (3, 2, "c")]), keys=["k"],
        partition_by="ds",
    )
    for v in (1, 2):
        got = V.aggregate_table_metadata(p, ["count(*)"], version=v)
        assert got["count(*)"] == V.read_table_version(spark, p, v).count()


def test_min_max_from_metadata_matches_scan(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(7, 1, "mango"), (2, 1, "apple"), (9, 2, "zebra")]),
        p, "ds", stats_cols=["k", "val"],
    )
    V.upsert_table_version(
        spark, p, _t(spark, [(1, 2, "kiwi")]), keys=["k"],
        partition_by="ds", stats_cols=["k", "val"],
    )
    got = V.aggregate_table_metadata(
        p, ["min(k)", "max(k)", "min(val)", "max(val)", "count(*)"]
    )
    row = (
        V.read_table_version(spark, p)
        .agg(
            F.min("k"), F.max("k"), F.min("val"), F.max("val"), F.count("*")
        )
        .collect()[0]
    )
    assert list(got.values()) == list(row)


def test_metadata_agg_insufficiency_cases(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 2, "b")]), p, "ds", stats_cols=["k"]
    )
    # no stats recorded for this column
    with pytest.raises(V.MetadataInsufficient, match="no \\[min,max\\]"):
        V.aggregate_table_metadata(p, ["min(val)"])
    # partition column values live in directory names, not footer stats
    with pytest.raises(V.MetadataInsufficient, match="partition column"):
        V.aggregate_table_metadata(p, ["max(ds)"])
    # count(col) needs null counts the log does not record
    with pytest.raises(V.MetadataInsufficient, match="null counts"):
        V.aggregate_table_metadata(p, ["count(k)"])
    # not a supported aggregate shape at all
    with pytest.raises(ValueError, match="unsupported"):
        V.aggregate_table_metadata(p, ["sum(k)"])


def test_metadata_agg_refuses_float_and_mor_masked(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b")], ["k", "x", "val"]
    )
    V.write_table_version(df, p, stats_cols=["k", "x"])
    with pytest.raises(V.MetadataInsufficient, match="floating-point"):
        V.aggregate_table_metadata(p, ["min(x)"])
    # a MoR delete masks rows the stats still describe — every
    # metadata answer is unsound until compaction folds the sidecar
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    with pytest.raises(V.MetadataInsufficient, match="sidecars"):
        V.aggregate_table_metadata(p, ["count(*)"])
    V.compact_table_version(spark, p, max_files_per_partition=1)
    assert V.aggregate_table_metadata(p, ["count(*)"])["count(*)"] == 1


def test_metadata_agg_all_null_file_refuses(spark, tmp_path):
    """An all-NULL file records no parquet bounds — indistinguishable
    from no-stats, so min/max must refuse rather than silently ignore
    the file (it contributes nothing, but proving that needs null
    counts the log lacks)."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(None, "a"), (None, "b")], "k int, val string")
    V.write_table_version(df, p, stats_cols=["k"])
    with pytest.raises(V.MetadataInsufficient, match="all-NULL"):
        V.aggregate_table_metadata(p, ["min(k)"])


def test_metadata_agg_empty_table_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(5, 1, "x"), (6, 1, "y")]), p, stats_cols=["k"]
    )
    V.delete_table_version(spark, p, "k >= 0")  # CoW delete-all
    got = V.aggregate_table_metadata(p, ["count(*)", "min(k)"])
    assert got == {"count(*)": 0, "min(k)": None}
    # and the OLD version still answers through time travel
    old = V.aggregate_table_metadata(p, ["count(*)", "min(k)"], version=1)
    assert old == {"count(*)": 2, "min(k)": 5}


def test_metadata_agg_resolves_logical_names_across_rename(spark, tmp_path):
    """Column mapping: stats keys are PHYSICAL; the aggregate arrives
    in LOGICAL names and must resolve through the map."""
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(3, 1, "a"), (8, 1, "b")]), p, stats_cols=["k"]
    )
    V.rename_columns(spark, p, {"k": "key_id"})
    got = V.aggregate_table_metadata(p, ["min(key_id)", "max(key_id)"])
    assert (got["min(key_id)"], got["max(key_id)"]) == (3, 8)
    with pytest.raises(ValueError, match="PHYSICAL column name"):
        # the OLD name is now physical-only — must not silently answer
        V.aggregate_table_metadata(p, ["min(k)"])


# ------------------------------------------------- string-stat truncation


def test_wide_string_stats_are_truncated_and_marked(spark, tmp_path):
    p = str(tmp_path / "t")
    wide_lo = "b" * 500
    wide_hi = "y" * 500
    df = spark.createDataFrame([(1, wide_lo), (2, wide_hi)], ["k", "txt"])
    V.write_table_version(df, p, stats_cols=["k", "txt"])
    m = V._load_manifest(p, 1)
    seen = 0
    glo, ghi = None, None
    for f in m["files"]:
        fs = m["stats"][f]
        if "txt" not in fs:
            continue
        seen += 1
        lo, hi = fs["txt"]
        assert len(lo) <= V._STATS_TRUNCATE
        assert len(hi) <= V._STATS_TRUNCATE
        assert fs.get(V._TRUNC_KEY + "txt") is True
        # narrow column untouched, unmarked
        assert V._TRUNC_KEY + "k" not in fs
        glo = lo if glo is None else min(glo, lo)
        ghi = hi if ghi is None else max(ghi, hi)
    assert seen >= 1
    # the widened GLOBAL bounds still bracket the true values
    assert glo <= wide_lo and ghi > wide_hi
    with pytest.raises(V.MetadataInsufficient, match="truncated"):
        V.aggregate_table_metadata(p, ["max(txt)"])


def test_truncated_bounds_prune_soundly(spark, tmp_path):
    """Widened bounds may KEEP extra files but must never DROP a file
    holding a match — including values that share the full 64-char
    truncation prefix."""
    p = str(tmp_path / "t")
    prefix = "p" * V._STATS_TRUNCATE
    inside = prefix + "zzz"   # sorts above the truncated min, below upper
    rows = [(1, 1, prefix + "aaa"), (2, 1, inside), (3, 2, "m" * 10)]
    V.write_table_version(
        _t(spark, [(k, ds, t) for k, ds, t in rows]), p, "ds",
        stats_cols=["val"],
    )
    got = V.read_table_version(
        spark, p, prune=[("val", inside, inside)]
    ).filter(F.col("val") == inside)
    assert [r.k for r in got.collect()] == [2]
    # and a range safely outside the widened bounds still prunes
    pruned = V.read_table_version(spark, p, prune=[("val", "zz", None)])
    assert pruned.count() == 0


def test_trunc_upper_edges():
    assert V._trunc_upper("a" * 100, 4) == "aaab"
    # carries over a max code point
    s = "a" + chr(0x10FFFF) * 3 + "tail"
    assert V._trunc_upper(s, 4) == "b"
    # surrogate gap is skipped, order-preserving in UTF-8
    s2 = "x" + chr(0xD7FF) + "yyyy"
    up = V._trunc_upper(s2, 2)
    assert up == "x" + chr(0xE000) and up > s2[:2]
    # entirely max code points: no sound bound exists
    assert V._trunc_upper(chr(0x10FFFF) * 8, 4) is None


# ---------------------------------------------------- SHOW PARTITIONS


def test_table_partitions_counts_and_bytes(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]), p, "ds"
    )
    got = V.table_partitions(p)
    assert got["column"] == "ds"
    by_val = {x["value"]: x for x in got["partitions"]}
    assert by_val["1"]["rows"] == 2 and by_val["2"]["rows"] == 1
    assert all(x["bytes"] > 0 and x["files"] >= 1 for x in by_val.values())


def test_table_partitions_null_partition_and_unpartitioned(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, "a"), (2, "d2", "b")], "k int, ds string, val string"
    )
    V.write_table_version(df, p, "ds")
    vals = [x["value"] for x in V.table_partitions(p)["partitions"]]
    assert vals == [None, "d2"]  # NULL sorts first, surfaced as None
    p2 = str(tmp_path / "u")
    V.write_table_version(df, p2)
    with pytest.raises(ValueError, match="not partitioned"):
        V.table_partitions(p2)


def test_table_partitions_mor_masked_rows_go_none(spark, tmp_path):
    p = str(tmp_path / "t")
    V.write_table_version(
        _t(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")]), p, "ds"
    )
    V.delete_table_version(spark, p, "k = 1", mode="mor")
    by_val = {
        x["value"]: x for x in V.table_partitions(p)["partitions"]
    }
    assert by_val["1"]["rows"] is None  # masked: the log can't say
    assert by_val["2"]["rows"] == 1     # untouched partition stays exact
    # renames surface the LOGICAL partition column name
    V.rename_columns(spark, p, {"ds": "day"})
    assert V.table_partitions(p)["column"] == "day"
