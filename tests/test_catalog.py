"""catalog.autotune_shuffle_partitions: the input-sized shuffle rule."""

from __future__ import annotations

from etl_rust_spark.catalog import autotune_shuffle_partitions, load_table

_MARKER = "etl_rust_spark.autotuned_sf_dir"


def _reset(spark):
    spark.conf.set(_MARKER, "")
    spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_floor_applies_to_tiny_inputs(spark):
    _reset(spark)
    autotune_shuffle_partitions(spark, "/root/testdata/sf0.001")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    assert spark.conf.get(_MARKER) == "/root/testdata/sf0.001"


def test_sized_from_bytes_and_capped(spark, tmp_path):
    _reset(spark)
    big = tmp_path / "big.parquet"
    big.write_bytes(b"\0" * (3 * 64 * 1024 * 1024))  # 3 advisory units
    autotune_shuffle_partitions(spark, str(tmp_path), floor=2, cap=4096)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    _reset(spark)
    autotune_shuffle_partitions(spark, str(tmp_path), floor=2, cap=2)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "2"


def test_marker_prevents_retuning_same_dir(spark):
    _reset(spark)
    autotune_shuffle_partitions(spark, "/root/testdata/sf0.001")
    spark.conf.set("spark.sql.shuffle.partitions", "17")  # user override
    autotune_shuffle_partitions(spark, "/root/testdata/sf0.001")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "17"  # kept


def test_unreadable_or_empty_dir_is_noop(spark, tmp_path):
    _reset(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    autotune_shuffle_partitions(spark, str(tmp_path / "missing"))
    autotune_shuffle_partitions(spark, str(tmp_path))  # exists, no parquet
    assert spark.conf.get("spark.sql.shuffle.partitions") == "13"
    assert spark.conf.get(_MARKER) == ""  # not marked: will retune later


def test_load_table_triggers_autotune(spark):
    _reset(spark)
    spark.conf.set(_MARKER, "other")
    load_table(spark, "/root/testdata/sf0.001", "region")
    assert spark.conf.get(_MARKER) == "/root/testdata/sf0.001"
