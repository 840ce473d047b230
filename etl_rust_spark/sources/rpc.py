"""JSON-RPC chain-node fetch path (reference S-04/S-05/S-06/S-07).

Reference behavior re-expressed:

- ``call_getBlock(index)`` per block with retry + linear backoff and an
  optional fallback endpoint (/root/reference/docs/extraction.md:3-5,
  ``.env.example:2``; backoff policy mirrored from the queue sinks,
  src/output/google_pubsub.rs:137-155 — sleep grows +1s per consecutive
  failure).
- ``call_getBlockHeight()`` as the range upper bound / throughput probe
  (docs/extraction.md:7, src/benchmark.rs:29-32).
- ``call_getMultipleAccounts(pubkeys)`` — a dependent lookup join driven
  by keys discovered in block data (docs/extraction.md:9).
- One reused HTTP client per worker with connect/method timeouts
  (src/main.rs:256-272; env ``RPC_METHOD_TIMEOUT``).
- Prometheus counters ``request_count`` / ``failed_request_count``
  (src/metrics/mod.rs:1-10) → Spark accumulators with the same names.

Spark-first design:

- The fetch is ``mapInPandas`` over the block-index DataFrame: each
  input partition is one worker (the reference's
  ``NUM_EXTRACTOR_THREADS`` becomes partition count), requests go out
  in JSON-RPC 2.0 *batch* POSTs of ``chunk_size`` (the reference's
  Pub/Sub 900-chunk idea applied to the ingest side), and a failed
  batch falls back to per-item calls with backoff — the exact bulk→
  per-message fallback ladder of X-08.
- The HTTP client is **executor-local**: created once per partition
  inside the generator (the classic ``foreachPartition`` connection
  idiom; the reference's thread-local producer/channel, K-09).
- Results stream back as Arrow batches — no driver collect anywhere.

At 100 TB / a real chain: partition = contiguous sub-range → each
worker's batch POST hits the node's block cache locality; per-partition
clients bound open connections to executor count, not task count.
"""

from __future__ import annotations

import json
import time
import urllib.request
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "RpcClient",
    "RpcMetrics",
    "rpc_fetch_blocks",
    "get_block_height",
    "fetch_multiple_accounts",
    "estimate_throughput",
    "RAW_SCHEMA",
    "ACCOUNTS_SCHEMA",
]

# Raw fetch output — same shape SyntheticChain.fetch produces, so the
# downstream transform/write path is shared (sources/chain.py boundary).
RAW_SCHEMA = T.StructType(
    [
        T.StructField("block_index", T.LongType()),
        T.StructField("response_json", T.StringType()),
    ]
)

ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("pubkey", T.StringType()),
        T.StructField("account_json", T.StringType()),
    ]
)


class RpcTransportError(RuntimeError):
    """A request failed after exhausting retries on every endpoint."""


class RpcClient:
    """Minimal JSON-RPC 2.0 client: reused opener, linear backoff,
    fallback endpoint, batch POST with per-item fallback.

    stdlib-only (urllib) so the engine has zero ingest dependencies;
    swap ``_post`` for an async/pooled implementation behind the same
    interface if a deployment needs it.
    """

    def __init__(
        self,
        endpoint: str,
        fallback: str | None = None,
        timeout_s: float = 30.0,
        max_attempts: int = 5,
        backoff_step_s: float = 1.0,
    ) -> None:
        self.endpoints = [endpoint] + ([fallback] if fallback else [])
        self.timeout_s = timeout_s
        self.max_attempts = max_attempts
        self.backoff_step_s = backoff_step_s
        self.request_count = 0
        self.failed_request_count = 0

    def _post(self, url: str, payload: Any) -> Any:
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read())

    def call_raw(self, payload: Any) -> Any:
        """POST ``payload`` with retry/backoff across endpoints.

        Linear backoff: sleep 0, 1·step, 2·step, … between consecutive
        failures (the reference's publish-retry policy, X-08).
        """
        delay = 0.0
        last_err: Exception | None = None
        for attempt in range(self.max_attempts):
            if delay:
                time.sleep(delay)
            for url in self.endpoints:
                self.request_count += 1
                try:
                    return self._post(url, payload)
                except Exception as e:  # noqa: BLE001 — any transport error retries
                    self.failed_request_count += 1
                    last_err = e
            delay += self.backoff_step_s
        raise RpcTransportError(
            f"request failed after {self.max_attempts} attempts: {last_err}"
        )

    def call(self, method: str, params: list | None = None, req_id: int = 1) -> Any:
        resp = self.call_raw(
            {"jsonrpc": "2.0", "id": req_id, "method": method, "params": params or []}
        )
        if isinstance(resp, dict) and resp.get("error"):
            raise RpcTransportError(f"rpc error: {resp['error']}")
        return resp["result"] if isinstance(resp, dict) else resp

    def call_batch(self, method: str, params_list: list[list]) -> list[Any]:
        """JSON-RPC batch POST; falls back to per-item calls if the batch
        fails or the node rejects batching (bulk→per-message, X-08)."""
        payload = [
            {"jsonrpc": "2.0", "id": i, "method": method, "params": p}
            for i, p in enumerate(params_list)
        ]
        try:
            resp = self.call_raw(payload)
            if isinstance(resp, list) and len(resp) == len(payload):
                by_id = {r.get("id"): r for r in resp}
                if all(
                    i in by_id and not by_id[i].get("error")
                    for i in range(len(payload))
                ):
                    return [by_id[i]["result"] for i in range(len(payload))]
        except RpcTransportError:
            pass
        return [self.call(method, p, req_id=i) for i, p in enumerate(params_list)]


@dataclass
class RpcMetrics:
    """O-01 parity: the reference's two Prometheus IntCounters as Spark
    accumulators (aggregated across all workers by the driver)."""

    request_count: Any
    failed_request_count: Any

    @classmethod
    def create(cls, spark: SparkSession) -> "RpcMetrics":
        sc = spark.sparkContext
        return cls(sc.accumulator(0), sc.accumulator(0))

    def snapshot(self) -> dict[str, int]:
        return {
            "request_count": self.request_count.value,
            "failed_request_count": self.failed_request_count.value,
        }


def _client_factory(
    endpoint: str, fallback: str | None, timeout_s: float, max_attempts: int
) -> Callable[[], RpcClient]:
    def make() -> RpcClient:
        return RpcClient(
            endpoint, fallback=fallback, timeout_s=timeout_s, max_attempts=max_attempts
        )

    return make


def rpc_fetch_blocks(
    blocks: DataFrame,
    endpoint: str,
    method: str = "getBlock",
    fallback: str | None = None,
    timeout_s: float = 30.0,
    max_attempts: int = 5,
    chunk_size: int = 64,
    metrics: RpcMetrics | None = None,
) -> DataFrame:
    """``block_index`` DataFrame → raw ``(block_index, response_json)``.

    Distributed: one HTTP client per partition, ``chunk_size`` blocks per
    batch POST.  Task retry (Spark) plus in-task backoff (client) layer
    exactly like the reference's worker retry over RPC backoff.
    """
    make_client = _client_factory(endpoint, fallback, timeout_s, max_attempts)
    req_acc = metrics.request_count if metrics else None
    fail_acc = metrics.failed_request_count if metrics else None

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        client = make_client()  # executor-local, reused across Arrow batches
        try:
            for pdf in batches:
                idxs = [int(x) for x in pdf["block_index"]]
                out: list[str] = []
                for lo in range(0, len(idxs), chunk_size):
                    chunk = idxs[lo : lo + chunk_size]
                    results = client.call_batch(method, [[i] for i in chunk])
                    out.extend(json.dumps(r, separators=(",", ":")) for r in results)
                yield pd.DataFrame({"block_index": idxs, "response_json": out})
        finally:
            if req_acc is not None:
                req_acc.add(client.request_count)
            if fail_acc is not None:
                fail_acc.add(client.failed_request_count)

    return blocks.select("block_index").mapInPandas(gen, RAW_SCHEMA)


def get_block_height(
    endpoint: str, method: str = "getBlockHeight", timeout_s: float = 30.0
) -> int:
    """Driver-side chain-tip probe (S-05) — one call, used to close an
    open-ended range or as a streaming ``latestOffset``."""
    return int(RpcClient(endpoint, timeout_s=timeout_s).call(method))


def fetch_multiple_accounts(
    keys: DataFrame,
    endpoint: str,
    key_col: str = "pubkey",
    method: str = "getMultipleAccounts",
    chunk_size: int = 100,
    timeout_s: float = 30.0,
    max_attempts: int = 5,
    metrics: RpcMetrics | None = None,
) -> DataFrame:
    """Dependent account lookup (S-06): distinct keys → batched RPC →
    ``(pubkey, account_json)`` to join back onto block data.

    The distinct() is the one shuffle; lookups then run partition-local
    in ``chunk_size`` batches (the node API's native batching), never on
    the driver.
    """
    make_client = _client_factory(endpoint, None, timeout_s, max_attempts)
    req_acc = metrics.request_count if metrics else None
    fail_acc = metrics.failed_request_count if metrics else None

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        client = make_client()
        try:
            for pdf in batches:
                ks = [str(k) for k in pdf[key_col]]
                out: list[str] = []
                for lo in range(0, len(ks), chunk_size):
                    chunk = ks[lo : lo + chunk_size]
                    result = client.call(method, [chunk])
                    vals = result if isinstance(result, list) else [None] * len(chunk)
                    out.extend(json.dumps(v, separators=(",", ":")) for v in vals)
                yield pd.DataFrame({"pubkey": ks, "account_json": out})
        finally:
            if req_acc is not None:
                req_acc.add(client.request_count)
            if fail_acc is not None:
                fail_acc.add(client.failed_request_count)

    return (
        keys.select(key_col).where(f"{key_col} IS NOT NULL").distinct()
        .withColumnRenamed(key_col, "pubkey")
        .mapInPandas(gen, ACCOUNTS_SCHEMA)
    )


def estimate_throughput(
    endpoint: str,
    height_method: str = "getBlockHeight",
    block_method: str = "getBlock",
    period_s: float = 60.0,
    probe_blocks: int = 1,
    timeout_s: float = 30.0,
) -> dict[str, float]:
    """Chain-throughput probe (reference O-03, src/benchmark.rs:18-64).

    Reference formula re-expressed: bytes/sec ≈ size of a recent valid
    block's serialized JSON × blocks produced in ``period_s`` ÷
    ``period_s``.  Samples the tip twice ``period_s`` apart to count
    blocks (the reference counts slots in a measurement period the same
    way); ``probe_blocks`` > 1 averages several block sizes to reduce
    variance.  Driver-side only — a capacity-planning probe, not part of
    any data path.
    """
    client = RpcClient(endpoint, timeout_s=timeout_s)
    h0 = int(client.call(height_method))
    sizes = []
    for i in range(probe_blocks):
        blk = client.call(block_method, [h0 - i])
        sizes.append(len(json.dumps(blk, separators=(",", ":")).encode()))
    time.sleep(period_s)
    h1 = int(client.call(height_method))
    blocks_per_s = max(0, h1 - h0) / period_s
    avg_block_bytes = sum(sizes) / len(sizes)
    return {
        "block_height": float(h1),
        "blocks_per_s": blocks_per_s,
        "avg_block_bytes": avg_block_bytes,
        "bytes_per_s": blocks_per_s * avg_block_bytes,
    }
