"""Tests for the JSON-RPC fetch path (S-04/05/06/07, X-08, O-01 parity).

A stdlib HTTP server in the test process stands in for the chain node;
Spark python workers reach it over localhost TCP, so the distributed
``mapInPandas`` fetch path is exercised for real.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_rust_spark.sources.ranges import block_range
from etl_rust_spark.sources.rpc import (
    RpcClient,
    RpcMetrics,
    RpcTransportError,
    fetch_multiple_accounts,
    get_block_height,
    rpc_fetch_blocks,
)


class _Node(BaseHTTPRequestHandler):
    """Fake chain node. Paths select behavior:
    /ok — always answers; /dead — always 500; /flaky — 500 on the first
    hit of each distinct payload, then answers; /nobatch — 500 for batch
    (list) payloads, answers single calls."""

    seen: set[str] = set()
    lock = threading.Lock()

    def log_message(self, *a):  # silence
        pass

    def _result(self, req: dict):
        m, p = req.get("method"), req.get("params") or []
        if m == "getBlock":
            i = p[0]
            return {"blockhash": f"h{i}", "previousBlockhash": f"h{i-1}", "index": i}
        if m == "getBlockHeight":
            return 123_456
        if m == "getMultipleAccounts":
            return [{"pubkey": k, "lamports": len(k)} for k in p[0]]
        return None

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        payload = json.loads(body)
        if self.path == "/dead":
            return self.send_error(500)
        if self.path == "/flaky":
            key = body.decode()
            with _Node.lock:
                first = key not in _Node.seen
                _Node.seen.add(key)
            if first:
                return self.send_error(500)
        if self.path == "/nobatch" and isinstance(payload, list):
            return self.send_error(500)
        if isinstance(payload, list):
            resp = [
                {"jsonrpc": "2.0", "id": r["id"], "result": self._result(r)}
                for r in payload
            ]
        else:
            resp = {"jsonrpc": "2.0", "id": payload["id"], "result": self._result(payload)}
        data = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture(scope="module")
def node():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Node)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_rpc_fetch_blocks_distributed(spark, node):
    metrics = RpcMetrics.create(spark)
    raw = rpc_fetch_blocks(
        block_range(spark, 0, 40, num_partitions=4),
        f"{node}/ok",
        chunk_size=16,
        metrics=metrics,
    )
    rows = {r["block_index"]: json.loads(r["response_json"]) for r in raw.collect()}
    assert set(rows) == set(range(40))
    assert rows[7]["blockhash"] == "h7"
    snap = metrics.snapshot()
    assert snap["request_count"] >= 3  # ceil(40/16) batch POSTs at minimum
    assert snap["failed_request_count"] == 0


def test_rpc_retry_with_backoff():
    _Node.seen.clear()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Node)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = RpcClient(
            f"http://127.0.0.1:{srv.server_port}/flaky",
            max_attempts=3,
            backoff_step_s=0.01,
        )
        assert c.call("getBlockHeight") == 123_456
        assert c.failed_request_count == 1 and c.request_count == 2
    finally:
        srv.shutdown()


def test_rpc_fallback_endpoint(node):
    c = RpcClient(f"{node}/dead", fallback=f"{node}/ok", max_attempts=2)
    assert c.call("getBlockHeight") == 123_456
    assert c.failed_request_count == 1  # primary failed, fallback answered


def test_rpc_exhausted_raises(node):
    c = RpcClient(f"{node}/dead", max_attempts=2, backoff_step_s=0.0)
    with pytest.raises(RpcTransportError):
        c.call("getBlockHeight")
    assert c.failed_request_count == 2


def test_rpc_batch_falls_back_per_item(node):
    c = RpcClient(f"{node}/nobatch", max_attempts=1)
    res = c.call_batch("getBlock", [[1], [2], [3]])
    assert [r["index"] for r in res] == [1, 2, 3]


def test_get_block_height(node):
    assert get_block_height(f"{node}/ok") == 123_456


def test_estimate_throughput(node):
    from etl_rust_spark.sources.rpc import estimate_throughput

    est = estimate_throughput(f"{node}/ok", period_s=0.01, probe_blocks=2)
    assert est["block_height"] == 123_456
    assert est["avg_block_bytes"] > 0
    # static fake tip → no new blocks in the period
    assert est["blocks_per_s"] == 0 and est["bytes_per_s"] == 0


def test_fetch_multiple_accounts(spark, node):
    keys = spark.createDataFrame(
        [("aa",), ("bb",), ("aa",), (None,), ("cccc",)], ["pubkey"]
    )
    out = fetch_multiple_accounts(keys, f"{node}/ok", chunk_size=2)
    rows = {r["pubkey"]: json.loads(r["account_json"]) for r in out.collect()}
    assert set(rows) == {"aa", "bb", "cccc"}  # deduped, null dropped
    assert rows["cccc"]["lamports"] == 4
