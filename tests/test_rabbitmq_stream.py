"""K-07 RabbitMQ Stream native protocol publisher: frame golden bytes +
full handshake/publish-confirm against an in-process stub broker +
executor-side publish through the shared ladder."""

from __future__ import annotations

import json
import socket
import struct
import threading

import pytest

from etl_rust_spark.etl.rabbitmq_stream import (
    AMQP_DATA_DESCRIPTOR,
    K_CLOSE,
    K_CREATE_STREAM,
    K_DECLARE_PUBLISHER,
    K_DELETE_PUBLISHER,
    K_OPEN,
    K_PEER_PROPERTIES,
    K_PUBLISH,
    K_PUBLISH_CONFIRM,
    K_SASL_AUTHENTICATE,
    K_SASL_HANDSHAKE,
    K_TUNE,
    OK,
    RESPONSE_FLAG,
    STREAM_DOES_NOT_EXIST,
    RabbitMqStreamClient,
    StreamError,
    amqp_data_section,
    parse_amqp_data_section,
    stream_client_factory,
)


def test_amqp_data_section_roundtrip():
    """vbin8 for short bodies, vbin32 past 255 bytes — both parse back."""
    short = amqp_data_section(b"hi")
    assert short == AMQP_DATA_DESCRIPTOR + b"\xa0\x02hi"
    assert parse_amqp_data_section(short) == b"hi"
    big = b"x" * 300
    wrapped = amqp_data_section(big)
    assert wrapped[:4] == AMQP_DATA_DESCRIPTOR + b"\xb0"
    assert struct.unpack(">I", wrapped[4:8]) == (300,)
    assert parse_amqp_data_section(wrapped) == big


class _StubStreamBroker:
    """Server side of the publisher's protocol slice.  Handles any number
    of connections (Spark executors each open one); state is shared under
    a lock."""

    def __init__(
        self,
        streams: tuple[str, ...] = (),
        tls: tuple[str, str] | None = None,
    ):
        self.streams: set[str] = set(streams)
        self.messages: list[tuple[str, bytes]] = []  # (stream, raw message)
        self.auth_seen: list[bytes] = []
        self.lock = threading.Lock()
        self._tls_ctx = None
        if tls is not None:
            import ssl

            self._tls_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            self._tls_ctx.load_cert_chain(*tls)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self):
        while True:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    @staticmethod
    def _read_frame(conn):
        hdr = b""
        while len(hdr) < 4:
            chunk = conn.recv(4 - len(hdr))
            if not chunk:
                return None
            hdr += chunk
        (size,) = struct.unpack(">i", hdr)
        payload = b""
        while len(payload) < size:
            chunk = conn.recv(size - len(payload))
            if not chunk:
                return None
            payload += chunk
        key, version = struct.unpack(">HH", payload[:4])
        return key, version, payload[4:]

    @staticmethod
    def _send(conn, key, body):
        payload = struct.pack(">HH", key, 1) + body
        conn.sendall(struct.pack(">i", len(payload)) + payload)

    def _respond(self, conn, key, cid, code, extra=b""):
        self._send(
            conn, key | RESPONSE_FLAG, struct.pack(">iH", cid, code) + extra
        )

    def _serve(self, conn):
        if self._tls_ctx is not None:
            try:
                conn = self._tls_ctx.wrap_socket(conn, server_side=True)
            except OSError:
                conn.close()
                return
        publishers: dict[int, str] = {}  # per-connection
        while True:
            frame = self._read_frame(conn)
            if frame is None:
                return
            key, _, body = frame
            if key == K_PUBLISH:
                pub_id = body[0]
                (n,) = struct.unpack(">i", body[1:5])
                off, ids = 5, []
                with self.lock:
                    for _ in range(n):
                        (pid,) = struct.unpack(">q", body[off : off + 8])
                        (blen,) = struct.unpack(">i", body[off + 8 : off + 12])
                        msg = body[off + 12 : off + 12 + blen]
                        self.messages.append((publishers[pub_id], msg))
                        ids.append(pid)
                        off += 12 + blen
                confirm = (
                    bytes([pub_id])
                    + struct.pack(">i", len(ids))
                    + b"".join(struct.pack(">q", i) for i in ids)
                )
                self._send(conn, K_PUBLISH_CONFIRM, confirm)
                continue
            if key == K_TUNE:
                continue  # client's echo of our tune
            (cid,) = struct.unpack(">i", body[:4])
            rest = body[4:]
            if key == K_PEER_PROPERTIES:
                self._respond(conn, key, cid, OK, struct.pack(">i", 0))
            elif key == K_SASL_HANDSHAKE:
                mech = b"PLAIN"
                self._respond(
                    conn, key, cid, OK,
                    struct.pack(">i", 1) + struct.pack(">h", len(mech)) + mech,
                )
            elif key == K_SASL_AUTHENTICATE:
                (mlen,) = struct.unpack(">h", rest[:2])
                (dlen,) = struct.unpack(">i", rest[2 + mlen : 6 + mlen])
                with self.lock:
                    self.auth_seen.append(rest[6 + mlen : 6 + mlen + dlen])
                self._respond(conn, key, cid, OK)
                self._send(conn, K_TUNE, struct.pack(">ii", 1048576, 60))
            elif key == K_OPEN:
                self._respond(conn, key, cid, OK, struct.pack(">i", 0))
            elif key == K_DECLARE_PUBLISHER:
                stream_off = 1
                (slen,) = struct.unpack(">h", rest[stream_off : stream_off + 2])
                stream_off += 2 + slen  # skip publisherRef
                (slen2,) = struct.unpack(">h", rest[stream_off : stream_off + 2])
                stream = rest[stream_off + 2 : stream_off + 2 + slen2].decode()
                with self.lock:
                    if stream in self.streams:
                        publishers[rest[0]] = stream
                        self._respond(conn, key, cid, OK)
                    else:
                        self._respond(conn, key, cid, STREAM_DOES_NOT_EXIST)
            elif key == K_CREATE_STREAM:
                (slen,) = struct.unpack(">h", rest[:2])
                with self.lock:
                    self.streams.add(rest[2 : 2 + slen].decode())
                self._respond(conn, key, cid, OK)
            elif key == K_DELETE_PUBLISHER:
                publishers.pop(rest[0], None)
                self._respond(conn, key, cid, OK)
            elif key == K_CLOSE:
                self._respond(conn, key, cid, OK)
                conn.close()
                return

    def stop(self):
        self.srv.close()


@pytest.fixture()
def broker():
    b = _StubStreamBroker(streams=("blocks",))
    yield b
    b.stop()


def test_handshake_publish_confirm_disconnect(broker):
    c = RabbitMqStreamClient("127.0.0.1", broker.port, user="u", password="p")
    c.publish("blocks", "r1")
    c.publish_batch("blocks", [b"r2", "r3"])
    c.disconnect()
    assert not c.connected
    assert broker.auth_seen == [b"\0u\0p"]
    got = [(s, parse_amqp_data_section(m)) for s, m in broker.messages]
    assert got == [("blocks", b"r1"), ("blocks", b"r2"), ("blocks", b"r3")]


def test_stream_tls_publish_and_bad_ca(tls_certs):
    """RabbitMQ Stream over TLS (VERDICT r9 #2): PLAIN credentials and
    payload cross an encrypted channel; a wrong CA fails before the
    first protocol frame."""
    import ssl

    b = _StubStreamBroker(streams=("blocks",),
                          tls=(tls_certs["cert"], tls_certs["key"]))
    try:
        c = RabbitMqStreamClient(
            "127.0.0.1", b.port, user="u", password="p",
            use_tls=True, ssl_cafile=tls_certs["cert"],
        )
        c.publish("blocks", b"enc")
        c.disconnect()
        assert [(s, parse_amqp_data_section(m))
                for s, m in b.messages] == [("blocks", b"enc")]
        bad = RabbitMqStreamClient(
            "127.0.0.1", b.port, user="u", password="p",
            use_tls=True, ssl_cafile=tls_certs["wrong_ca"],
        )
        with pytest.raises(ssl.SSLCertVerificationError):
            bad.publish("blocks", b"x")
    finally:
        b.stop()


def test_create_fallback_only_on_stream_does_not_exist():
    """ADVICE r5: create_if_missing must only mask responseCode 0x06 —
    an auth/precondition failure on declare_publisher re-raises instead
    of spuriously issuing CreateStream."""
    c = RabbitMqStreamClient("127.0.0.1", 1, create_if_missing=True)
    calls = []

    def fake_expect_ok(key, body_fn, what):
        calls.append(what)
        raise StreamError("access refused", code=0x10)

    c._expect_ok = fake_expect_ok
    with pytest.raises(StreamError) as ei:
        c._ensure_publisher("s")
    assert ei.value.code == 0x10
    assert calls == ["declare_publisher(s)"]  # no create_stream attempt


def test_missing_stream_is_fatal_by_default(broker):
    """Reference parity (rabbitmq_stream.rs:74-76): producer.build on a
    nonexistent stream is fatal unless create_if_missing opts in."""
    c = RabbitMqStreamClient("127.0.0.1", broker.port)
    with pytest.raises(StreamError):
        c.publish("nope", "x")
    c2 = RabbitMqStreamClient("127.0.0.1", broker.port, create_if_missing=True)
    c2.publish("nope", "x")
    c2.disconnect()
    assert "nope" in broker.streams
    assert ("nope", amqp_data_section(b"x")) in broker.messages


def test_stream_for_mapping_and_connect_failure(broker):
    c = RabbitMqStreamClient(
        "127.0.0.1", broker.port, stream_for={"events": "blocks"}
    )
    c.publish("events", "mapped")
    c.disconnect()
    assert ("blocks", amqp_data_section(b"mapped")) in broker.messages
    dead = RabbitMqStreamClient("127.0.0.1", 1, timeout_s=0.5)
    with pytest.raises(OSError):
        dead.publish("blocks", "x")


def test_executor_publish_through_ladder(spark, broker):
    """Executors each open a native-protocol connection; every record
    arrives exactly once with a confirm (the shared publish ladder +
    K-09 per-partition lifecycle)."""
    from etl_rust_spark.etl.sinks import PublishStats, publish_tables

    df = spark.createDataFrame([(i,) for i in range(10)], ["v"]).repartition(2)
    stats = PublishStats(spark)
    publish_tables(
        {"blocks": df},
        stream_client_factory("127.0.0.1", broker.port),
        stats=stats,
        backoff_step_s=0.01,
    )
    vals = sorted(
        json.loads(parse_amqp_data_section(m))["v"]
        for s, m in broker.messages
        if s == "blocks"
    )
    assert vals == list(range(10))
    assert stats.snapshot()["published"] == 10
