"""K-04: Pub/Sub REST transport vs an in-process HTTP stub (emulator
wire surface), driven through the real executor-side publisher."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_rust_spark.etl.sinks import PublishStats, publish_tables
from etl_rust_spark.etl.transports import (
    PubSubPublishError,
    PubSubRestClient,
    pubsub_client_factory,
)


class _Broker(BaseHTTPRequestHandler):
    """Fake Pub/Sub REST endpoint.  /flaky-…: first bulk (>1 msg) POST
    per topic 503s, singles succeed — exercises the bulk→per-message
    ladder exactly like the reference's fallback path."""

    received: list[tuple[str, list[str]]] = []
    failed_once: set[str] = set()
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        msgs = [base64.b64decode(m["data"]).decode() for m in body["messages"]]
        with _Broker.lock:
            if (
                "flaky" in self.path
                and len(msgs) > 1
                and self.path not in _Broker.failed_once
            ):
                _Broker.failed_once.add(self.path)
                return self.send_error(503)
            _Broker.received.append((self.path, msgs))
        out = json.dumps({"messageIds": [str(i) for i in range(len(msgs))]}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture()
def broker():
    _Broker.received = []
    _Broker.failed_once = set()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Broker)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Broker
    srv.shutdown()
    srv.server_close()


def test_publish_paths_and_payloads(broker):
    url, B = broker
    c = PubSubRestClient(url, "proj", topic_for={"blocks": "blocks-topic"})
    c.publish("blocks", '{"a":1}')
    c.publish_batch("blocks", ["x", "y"])
    assert B.received[0] == ("/v1/projects/proj/topics/blocks-topic:publish", ['{"a":1}'])
    assert B.received[1][1] == ["x", "y"]
    c.disconnect()
    assert not c.connected


def test_http_error_raises_publish_error(broker):
    url, _ = broker
    c = PubSubRestClient(url + "/flaky", "proj")
    with pytest.raises(PubSubPublishError):
        c.publish_batch("t", ["a", "b"])


def test_unreachable_endpoint_raises():
    c = PubSubRestClient("http://127.0.0.1:1", "proj", timeout_s=0.5)
    with pytest.raises(PubSubPublishError):
        c.publish("t", "x")


class _Gcs(BaseHTTPRequestHandler):
    """Fake GCS JSON-API endpoint; /flaky bucket 503s the first upload
    of each object body to exercise the retry-forever loop."""

    objects: dict[str, bytes] = {}
    failed_once: set[bytes] = set()
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_POST(self):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        q = parse_qs(u.query)
        data = self.rfile.read(int(self.headers["Content-Length"]))
        bucket = u.path.split("/b/")[1].split("/")[0]
        with _Gcs.lock:
            if bucket == "flaky" and data not in _Gcs.failed_once:
                _Gcs.failed_once.add(data)
                return self.send_error(503)
            _Gcs.objects[f"{bucket}/{q['name'][0]}"] = data
        self.send_response(200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"{}")


@pytest.fixture()
def gcs():
    _Gcs.objects = {}
    _Gcs.failed_once = set()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Gcs)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Gcs
    srv.shutdown()
    srv.server_close()


def test_gcs_upload_and_retry_forever(gcs):
    from etl_rust_spark.etl.transports import GcsRestClient, GcsUploadError

    url, G = gcs
    GcsRestClient(url).upload_object("b1", "2024-01-01/3/30/t.jsonl", b"x")
    assert G.objects["b1/2024-01-01/3/30/t.jsonl"] == b"x"
    # flaky bucket: first attempt 503s, the unbounded loop succeeds second try
    GcsRestClient(url).upload_object("flaky", "o", b"retry-me")
    assert G.objects["flaky/o"] == b"retry-me"
    # bounded attempts surface the error
    with pytest.raises(GcsUploadError):
        GcsRestClient(url, max_attempts=1).upload_object("flaky", "p", b"fails")


def test_gcs_time_bucketed_publish(spark, gcs):
    """End to end: records land under date/hour/{0|30}/ keys
    (gcs.rs:105-115 rule), newline-joined JSON per object."""
    from etl_rust_spark.etl.transports import GcsRestClient, publish_gcs_time_bucketed

    url, G = gcs
    df = spark.createDataFrame(
        [(1, "2024-03-05 10:14:00"), (2, "2024-03-05 10:44:00"),
         (3, "2024-03-05 11:05:00")],
        ["event_id", "ts_s"],
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    publish_gcs_time_bucketed(
        df, "ts", "chain", "events", lambda: GcsRestClient(url)
    )
    keys = sorted(k.rsplit("/", 1)[0] for k in G.objects)
    assert keys == ["chain/2024-03-05/10/0", "chain/2024-03-05/10/30",
                    "chain/2024-03-05/11/0"]
    all_recs = sorted(
        json.loads(line)["event_id"]
        for data in G.objects.values()
        for line in data.decode().splitlines()
    )
    assert all_recs == [1, 2, 3]


def test_publish_tables_end_to_end_with_bulk_fallback(spark, broker):
    """Executors publish through the REST client; the flaky first bulk
    triggers the per-message ladder; every record still arrives once."""
    url, B = broker
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"]).coalesce(1)
    stats = PublishStats(spark)
    publish_tables(
        {"flaky_events": df},
        pubsub_client_factory(url, "proj"),
        stats=stats,
        backoff_step_s=0.01,
    )
    got = [m for path, msgs in B.received for m in msgs if "flaky_events" in path]
    assert sorted(json.loads(m)["v"] for m in got) == list(range(10))
    # bulk failed once, then 10 per-message publishes
    assert stats.snapshot()["published"] == 10
    assert stats.snapshot()["bulk_failures"] == 1
