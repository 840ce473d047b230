"""Tests for sources/: range & list scans, checkpoint resume, synthetic chain.

Mirrors the reference behaviors (S-01/S-02/S-08 and the example-config
extraction contract) re-expressed Spark-first — see module docstrings in
etl_rust_spark/sources/ for the file:line citations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.sources.chain import SyntheticChain, TABLE_NAMES
from etl_rust_spark.sources.checkpoint import (
    pick_up_from_previous_range,
    sink_high_watermark,
)
from etl_rust_spark.sources.ranges import block_list_csv, block_range


# -- S-01 range scan ---------------------------------------------------------


def test_block_range_basic(spark):
    df = block_range(spark, 10, 15)
    assert [r.block_index for r in df.orderBy("block_index").collect()] == [10, 11, 12, 13, 14]


def test_block_range_reverse_order(spark):
    df = block_range(spark, 0, 5, reverse=True)
    assert [r.block_index for r in df.collect()] == [4, 3, 2, 1, 0]


def test_block_range_guards(spark):
    with pytest.raises(ValueError):
        block_range(spark, -1, 5)
    with pytest.raises(ValueError):
        block_range(spark, 5, 2)
    with pytest.raises(ValueError):
        block_range(spark, 0, 0, reverse=True)


def test_block_range_partitioned(spark):
    # A backfill range must fan out across partitions (no single-task scan).
    df = block_range(spark, 0, 1000, num_partitions=8)
    assert df.rdd.getNumPartitions() == 8


# -- S-02 list scan (CSV header sniff + flatten) -----------------------------


def test_block_list_csv_no_header(spark, tmp_path):
    p = tmp_path / "blocks.csv"
    p.write_text("1,2,3\n4,5,6\n")
    got = sorted(r.block_index for r in block_list_csv(spark, str(p)).collect())
    assert got == [1, 2, 3, 4, 5, 6]


def test_block_list_csv_with_header(spark, tmp_path):
    # First line has no integer-parsing field → treated as a header row.
    p = tmp_path / "blocks.csv"
    p.write_text("block,extra\n7,8\n9,x\n")
    got = sorted(r.block_index for r in block_list_csv(spark, str(p)).collect())
    assert got == [7, 8, 9]


# -- S-08 checkpoint resume --------------------------------------------------


def _write_blocks(spark, path: str, indices: list[int]) -> None:
    spark.createDataFrame([(i,) for i in indices], "block_index long").write.mode(
        "overwrite"
    ).parquet(path)


def test_high_watermark_absent(spark, tmp_path):
    assert sink_high_watermark(spark, str(tmp_path / "nope")) is None


def test_resume_forward(spark, tmp_path):
    path = str(tmp_path / "blocks")
    _write_blocks(spark, path, [0, 1, 2, 7])
    assert pick_up_from_previous_range(spark, path, 0, 100) == (8, 100)
    # Fresh sink → range unchanged.
    assert pick_up_from_previous_range(spark, str(tmp_path / "other"), 0, 100) == (0, 100)


def test_resume_forward_done(spark, tmp_path):
    path = str(tmp_path / "blocks")
    _write_blocks(spark, path, [50, 60])
    with pytest.raises(RuntimeError):
        pick_up_from_previous_range(spark, path, 0, 51)  # fully covered


def test_resume_reverse_contiguous_top(spark, tmp_path):
    # A reverse run completes from the top down: the resume point is the
    # MIN of the contiguous top segment (reference main.rs:186-238), not
    # max(block_index) — ADVICE r1.
    path = str(tmp_path / "blocks")
    # Top bucket [90, 100) done; a stray earlier FORWARD run left
    # [0, 10) in the sink — it must not clamp the reverse range.
    _write_blocks(spark, path, list(range(90, 100)) + list(range(0, 10)))
    assert pick_up_from_previous_range(spark, path, 50, 100, reverse=True) == (50, 90)
    # end-1 not committed → the reverse run completed nothing → unchanged.
    _write_blocks(spark, path, [95, 96, 98])
    assert pick_up_from_previous_range(spark, path, 50, 100, reverse=True) == (50, 100)
    # Gap below a contiguous [97, 100) top: resume at 97, 95 is ignored.
    _write_blocks(spark, path, [99, 98, 97, 95])
    assert pick_up_from_previous_range(spark, path, 50, 100, reverse=True) == (50, 97)
    # Fully indexed → hard error, like the reference's panic.
    _write_blocks(spark, path, list(range(50, 100)))
    with pytest.raises(RuntimeError):
        pick_up_from_previous_range(spark, path, 50, 100, reverse=True)


# -- Synthetic chain (extraction + transform fan-out) ------------------------


@pytest.fixture(scope="module")
def chain_tables(spark):
    chain = SyntheticChain()
    raw = chain.fetch(block_range(spark, 0, 40, num_partitions=4))
    tables = chain.transform(raw)
    return {k: v.cache() for k, v in tables.items()}


def test_chain_fetch_deterministic(spark):
    chain = SyntheticChain()
    a = chain.fetch(block_range(spark, 5, 8)).orderBy("block_index").collect()
    b = chain.fetch(block_range(spark, 5, 8)).orderBy("block_index").collect()
    assert a == b
    assert all(r.response_json for r in a)


def test_chain_transform_all_tables(chain_tables):
    assert set(chain_tables) == set(TABLE_NAMES)
    for name, df in chain_tables.items():
        assert df.count() > 0, name


def test_chain_blocks_consistency(chain_tables):
    blocks = chain_tables["blocks"]
    assert blocks.count() == 40
    # tx_count on blocks equals the actual exploded transaction rows.
    tx_per_block = (
        chain_tables["transactions"].groupBy("block_index").count().withColumnRenamed("count", "n")
    )
    bad = (
        blocks.join(tx_per_block, "block_index", "left")
        .filter(F.col("tx_count") != F.coalesce(F.col("n"), F.lit(0)))
        .count()
    )
    assert bad == 0


def test_chain_parent_hash_links(chain_tables):
    blocks = chain_tables["blocks"]
    a = blocks.alias("a")
    b = blocks.alias("b")
    broken = (
        a.join(b, F.col("a.block_index") == F.col("b.block_index") + 1)
        .filter(F.col("a.previous_hash") != F.col("b.block_hash"))
        .count()
    )
    assert broken == 0


def test_chain_hot_key_skew(chain_tables):
    # FIXTURES §4: ~30% of instructions hit prog_hot → skew-join test bed.
    ins = chain_tables["instructions"]
    frac = ins.filter(F.col("program") == "prog_hot").count() / ins.count()
    assert 0.15 < frac < 0.45


def test_chain_entity_tables_distinct(chain_tables):
    acc = chain_tables["accounts"]
    assert acc.count() == acc.select("pubkey").distinct().count()
    tok = chain_tables["tokens"]
    assert tok.count() == tok.select("mint").distinct().count()
