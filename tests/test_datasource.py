"""Tests for the custom chain DataSource (batch + streaming offsets)."""

from __future__ import annotations

import json

import pytest

from etl_rust_spark.sources.datasource import ChainDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(ChainDataSource)


def test_batch_read_partitioned(spark):
    df = (
        spark.read.format("chainstream")
        .option("start", 5)
        .option("end", 105)
        .option("partitionSize", 30)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 100
    idx = sorted(r["block_index"] for r in rows)
    assert idx == list(range(5, 105))
    blk = json.loads(rows[0]["response_json"])
    assert "blockhash" in blk
    assert df.rdd.getNumPartitions() == 4  # 100 blocks / 30 per partition


def test_batch_read_defaults_to_tip(spark):
    df = spark.read.format("chainstream").option("tip", 12).load()
    assert df.count() == 12


def test_stream_reads_to_tip_and_resumes(spark, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run(tip):
        q = (
            spark.readStream.format("chainstream")
            .option("tip", tip)
            .option("partitionSize", 8)
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

    run(tip=25)
    got = spark.read.parquet(out)
    assert got.count() == 25
    assert got.select("block_index").distinct().count() == 25

    # Tip advances; restart from checkpoint → only new blocks, no dupes.
    run(tip=40)
    got = spark.read.parquet(out)
    assert got.count() == 40
    assert got.select("block_index").distinct().count() == 40
    lo, hi = got.agg({"block_index": "min"}).first()[0], got.agg({"block_index": "max"}).first()[0]
    assert (lo, hi) == (0, 39)


def test_stream_rpc_endpoint(spark, tmp_path):
    # Reuse the HTTP node stub from the RPC tests as a live endpoint.
    import threading
    from http.server import ThreadingHTTPServer

    from tests.test_rpc import _Node

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Node)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = (
            spark.read.format("chainstream")
            .option("start", 0)
            .option("end", 20)
            .option("endpoint", f"http://127.0.0.1:{srv.server_port}/ok")
            .option("chunk", 8)
            .load()
        )
        rows = {r["block_index"]: json.loads(r["response_json"]) for r in df.collect()}
        assert set(rows) == set(range(20))
        assert rows[3]["blockhash"] == "h3"
    finally:
        srv.shutdown()
