"""Tests for the queue publishing layer (K-04…K-07 / X-07 / X-08 parity).

The fake queue transports write to a shared directory — Spark python
workers are separate processes, so module state won't do; the filesystem
is the cross-process queue."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest
from pyspark import cloudpickle

from etl_rust_spark.etl.sinks import (
    DirQueueClient,
    PublishStats,
    encode_json,
    publish_table,
    publish_tables,
)
from etl_rust_spark.sources.chain import SyntheticChain
from etl_rust_spark.sources.ranges import block_range

# Classes below live in the (worker-unimportable) test module — ship them
# by value inside the pickled closure instead of by reference.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class NoBulkClient(DirQueueClient):
    """Rejects every bulk publish → exercises the per-message ladder."""

    def publish_batch(self, table: str, payloads) -> None:
        raise RuntimeError("bulk rejected")


def _factory(root):
    def make():
        return DirQueueClient(root)

    return make


def _nobulk_factory(root):
    def make():
        return NoBulkClient(root)

    return make


def _read_all(root, table):
    out = []
    for f in sorted((Path(root) / table).glob("*.jsonl")):
        out += [json.loads(l) for l in f.read_text().splitlines() if l.strip()]
    return out


def test_publish_table_bulk(spark, tmp_path):
    root = str(tmp_path / "q")
    df = spark.range(0, 250).withColumnRenamed("id", "block_index")
    stats = PublishStats(spark)
    publish_table(
        df, "blocks", _factory(root), chunk_size=100, stats=stats
    )
    msgs = _read_all(root, "blocks")
    assert {m["block_index"] for m in msgs} == set(range(250))
    snap = stats.snapshot()
    assert snap["published"] == 250
    assert snap["bulk_failures"] == 0 and snap["message_retries"] == 0
    # chunking respected: no batch file exceeds chunk_size records
    for f in (Path(root) / "blocks").glob("batch-*.jsonl"):
        assert len(f.read_text().splitlines()) <= 100


def test_publish_bulk_failure_falls_back_per_message(spark, tmp_path):
    root = str(tmp_path / "q")
    df = spark.range(0, 30).withColumnRenamed("id", "block_index").coalesce(1)
    stats = PublishStats(spark)
    publish_table(
        df,
        "blocks",
        _nobulk_factory(root),
        chunk_size=10,
        backoff_step_s=0.0,
        stats=stats,
    )
    msgs = _read_all(root, "blocks")
    assert {m["block_index"] for m in msgs} == set(range(30))
    snap = stats.snapshot()
    assert snap["bulk_failures"] == 3  # 30 rows / chunk 10
    assert snap["published"] == 30
    # every record arrived via the single-message path
    assert not list((Path(root) / "blocks").glob("batch-*.jsonl"))


def test_publish_tables_fanout(spark, tmp_path):
    root = str(tmp_path / "q")
    chain = SyntheticChain()
    tables = chain.transform(chain.fetch(block_range(spark, 0, 5)))
    publish_tables(tables, _factory(root), chunk_size=50)
    for name, df in tables.items():
        assert len(_read_all(root, name)) == df.count(), name


def test_encode_json_payload_shape(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = encode_json(df).collect()
    assert json.loads(out[0]["payload"]) == {"a": 1, "b": "x"}


def test_encode_json_stamps_publish_ts(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    rec = json.loads(encode_json(df, stamp_ts=True).collect()[0]["payload"])
    assert set(rec) == {"a", "publish_ts"} and rec["publish_ts"]
