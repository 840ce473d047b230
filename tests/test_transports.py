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


# ---------------------------------------------------------------------------
# S-03: subscriber surface — pull/acknowledge + the consume loop
# ---------------------------------------------------------------------------


class _SubBroker(BaseHTTPRequestHandler):
    """Fake Pub/Sub subscription endpoint: pull redelivers every unacked
    message (at-least-once), acknowledge removes by ackId — the emulator
    wire surface of /v1/projects/{p}/subscriptions/{s}:pull|:acknowledge."""

    queue: list[tuple[str, str]] = []  # (ack_id, b64 data)
    acked: list[str] = []
    pulls: int = 0
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        with _SubBroker.lock:
            if self.path.endswith(":pull"):
                _SubBroker.pulls += 1
                n = int(body.get("maxMessages", 100))
                out = {
                    "receivedMessages": [
                        {"ackId": aid, "message": {"data": data, "messageId": aid}}
                        for aid, data in _SubBroker.queue[:n]
                    ]
                }
            elif self.path.endswith(":acknowledge"):
                ids = set(body["ackIds"])
                _SubBroker.queue = [q for q in _SubBroker.queue if q[0] not in ids]
                _SubBroker.acked.extend(sorted(ids))
                out = {}
            else:
                return self.send_error(404)
        raw = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)


def _seed(items) -> None:
    _SubBroker.queue = [
        (f"ack-{i}", base64.b64encode(json.dumps(it).encode()).decode())
        for i, it in enumerate(items)
    ]
    _SubBroker.acked = []
    _SubBroker.pulls = 0


@pytest.fixture()
def sub_broker():
    _seed([])
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SubBroker)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _SubBroker
    srv.shutdown()
    srv.server_close()


def test_pull_and_acknowledge_roundtrip(sub_broker):
    url, B = sub_broker
    _seed([{"start": 0, "end": 5}, {"start": 5, "end": 9}])
    c = PubSubRestClient(url, "proj")
    msgs = c.pull("work", max_messages=10)
    assert [json.loads(m.data) for m in msgs] == [
        {"start": 0, "end": 5},
        {"start": 5, "end": 9},
    ]
    c.acknowledge("work", [msgs[0].ack_id])
    again = c.pull("work", max_messages=10)  # unacked msg redelivered
    assert [m.ack_id for m in again] == [msgs[1].ack_id]
    assert B.acked == ["ack-0"]


def test_consume_work_items_acks_after_process(sub_broker):
    from etl_rust_spark.streaming.subscription import consume_work_items

    url, B = sub_broker
    _seed(
        [
            {"start": 0, "end": 5},
            {"bad": "payload"},  # poison: acked + skipped
            {"start": 5, "end": 7},
            {"start": 7, "end": 7},  # empty range: acked, not processed
        ]
    )
    c = PubSubRestClient(url, "proj")
    seen: list[tuple[int, int]] = []
    done = consume_work_items(
        c, "work", lambda s, e: seen.append((s, e)), max_empty_pulls=1, sleep_s=0
    )
    assert done == 2 and seen == [(0, 5), (5, 7)]
    assert B.queue == [] and len(B.acked) == 4


def test_consume_failure_leaves_message_unacked_then_converges(sub_broker):
    """A crash mid-item must not ack — the broker redelivers and a
    rerun converges (at-least-once x idempotent process)."""
    from etl_rust_spark.streaming.subscription import consume_work_items

    url, B = sub_broker
    _seed([{"start": 0, "end": 5}, {"start": 5, "end": 9}])
    c = PubSubRestClient(url, "proj")
    calls: list[tuple[int, int]] = []

    def flaky(s, e):
        if e == 9 and not any(x == (5, 9) for x in calls):
            calls.append((s, e))
            raise RuntimeError("executor lost")
        calls.append((s, e))

    with pytest.raises(RuntimeError):
        consume_work_items(c, "work", flaky, max_empty_pulls=1, sleep_s=0)
    assert B.acked == ["ack-0"]  # first item acked, failed one not
    done = consume_work_items(c, "work", flaky, max_empty_pulls=1, sleep_s=0)
    assert done == 1 and B.queue == []  # redelivered item processed + acked


def test_run_pubsub_subscription_end_to_end(spark, sub_broker, tmp_path):
    """index-subscription parity: Pub/Sub work items drive run_range;
    blocks land exactly once per height (src/main.rs:357-389)."""
    from etl_rust_spark.sources.chain import SyntheticChain
    from etl_rust_spark.streaming.subscription import run_pubsub_subscription

    url, B = sub_broker
    _seed([{"start": 0, "end": 10}, {"start": 10, "end": 25}])
    c = PubSubRestClient(url, "proj")
    out = str(tmp_path / "sink")
    done = run_pubsub_subscription(
        spark, SyntheticChain(), c, "work", out, bucket_size=5, max_empty_pulls=1
    )
    assert done == 2 and B.queue == []
    blocks = spark.read.parquet(f"{out}/blocks")
    assert blocks.count() == 25
    assert blocks.select("block_index").distinct().count() == 25


def test_cli_index_subscription_pubsub(spark, sub_broker, tmp_path):
    """CLI parity with the reference's IndexSubscription verb: the
    Pub/Sub transport drives the full pipeline from the command line."""
    from etl_rust_spark.__main__ import main

    url, B = sub_broker
    _seed([{"start": 0, "end": 8}])
    out = str(tmp_path / "sink")
    rc = main(
        [
            "index-subscription",
            "--subscription", "work",
            "--pubsub-endpoint", url,
            "--pubsub-project", "proj",
            "--out", out,
            "--max-empty-pulls", "1",
        ]
    )
    assert rc == 0 and B.queue == []
    assert spark.read.parquet(f"{out}/blocks").count() == 8


def test_cli_index_subscription_arg_validation(sub_broker, tmp_path):
    from etl_rust_spark.__main__ import main
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["index-subscription", "--subscription", "work", "--out", str(tmp_path)])
    with _pytest.raises(SystemExit):
        main(["index-subscription", "--out", str(tmp_path)])
