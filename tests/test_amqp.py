"""K-06 AMQP 0-9-1 publisher: golden-byte framing per the public spec +
handshake/publish against an in-process stub broker + executor-side
publish through the shared ladder."""

from __future__ import annotations

import json
import socket
import struct
import threading

import pytest

from etl_rust_spark.etl.amqp import (
    AmqpClassicClient,
    AmqpError,
    amqp_client_factory,
    declare_frames,
    method_frame,
    publish_frames,
    shortstr,
)
from etl_rust_spark.etl.amqp import (
    CONN_CLOSE,
    CONN_CLOSE_OK,
    CONN_OPEN,
    CONN_OPEN_OK,
    CONN_START,
    CONN_START_OK,
    CONN_TUNE,
    CONN_TUNE_OK,
    CH_OPEN,
    CH_OPEN_OK,
    FRAME_END,
    PROTOCOL_HEADER,
    Q_DECLARE,
    Q_DECLARE_OK,
)


def test_publish_frames_golden_bytes():
    """Hand-checked against AMQP 0-9-1 §4.2.6 framing + §2.3.5.2
    property flags: method(60,40) + header(class 60, body size,
    delivery-mode flag + value 2) + one body frame, all 0xCE-terminated."""
    buf = publish_frames(1, "blocks", b"hi")
    m_args = struct.pack(">H", 0) + shortstr("") + shortstr("blocks") + b"\x00"
    m_payload = struct.pack(">HH", 60, 40) + m_args
    expected = (
        struct.pack(">BHI", 1, 1, len(m_payload)) + m_payload + bytes([0xCE])
    )
    h_payload = struct.pack(">HHQH", 60, 0, 2, 1 << 12) + b"\x02"
    expected += struct.pack(">BHI", 2, 1, len(h_payload)) + h_payload + bytes([0xCE])
    expected += struct.pack(">BHI", 3, 1, 2) + b"hi" + bytes([0xCE])
    assert buf == expected


def test_declare_frames_durable_bit():
    buf = declare_frames(1, "q")
    payload = buf[7:-1]
    assert payload[:4] == struct.pack(">HH", 50, 10)
    # reserved short, shortstr "q", flags octet with durable bit only
    assert payload[4:6] == b"\x00\x00"
    assert payload[6:8] == b"\x01q"
    assert payload[8] == 0b00000010
    assert buf[-1] == FRAME_END


class _StubBroker:
    """Speaks just enough server-side AMQP 0-9-1 for the client slice."""

    def __init__(self, tls: tuple[str, str] | None = None):
        self.messages: list[tuple[str, bytes]] = []
        self.declared: list[str] = []
        self._tls_ctx = None
        if tls is not None:
            import ssl

            self._tls_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            self._tls_ctx.load_cert_chain(*tls)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        while True:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket):
        if self._tls_ctx is not None:
            try:
                conn = self._tls_ctx.wrap_socket(conn, server_side=True)
            except OSError:
                conn.close()
                return

        def read_exactly(n):
            buf = b""
            while len(buf) < n:
                c = conn.recv(n - len(buf))
                if not c:
                    raise ConnectionError
                buf += c
            return buf

        def read_frame():
            t, ch, size = struct.unpack(">BHI", read_exactly(7))
            payload = read_exactly(size)
            assert read_exactly(1)[0] == FRAME_END
            return t, ch, payload

        try:
            assert read_exactly(8) == PROTOCOL_HEADER
            conn.sendall(
                method_frame(
                    0, CONN_START,
                    b"\x00\x09" + struct.pack(">I", 0)
                    + struct.pack(">I", 5) + b"PLAIN"
                    + struct.pack(">I", 5) + b"en_US",
                )
            )
            t, _, p = read_frame()
            assert struct.unpack(">HH", p[:4]) == CONN_START_OK
            conn.sendall(method_frame(0, CONN_TUNE, struct.pack(">HIH", 0, 4096, 0)))
            pending_pub = None
            body_left = 0
            while True:
                t, ch, p = read_frame()
                if t == 1:
                    cm = struct.unpack(">HH", p[:4])
                    if cm == CONN_TUNE_OK:
                        pass
                    elif cm == CONN_OPEN:
                        conn.sendall(method_frame(0, CONN_OPEN_OK, shortstr("")))
                    elif cm == CH_OPEN:
                        conn.sendall(
                            method_frame(ch, CH_OPEN_OK, struct.pack(">I", 0))
                        )
                    elif cm == Q_DECLARE:
                        qlen = p[6]
                        q = p[7 : 7 + qlen].decode()
                        self.declared.append(q)
                        conn.sendall(
                            method_frame(
                                ch, Q_DECLARE_OK,
                                shortstr(q) + struct.pack(">II", 0, 0),
                            )
                        )
                    elif cm == (60, 40):  # basic.publish
                        off = 6
                        elen = p[off]
                        off += 1 + elen
                        rlen = p[off]
                        rkey = p[off + 1 : off + 1 + rlen].decode()
                        pending_pub = rkey
                    elif cm == CONN_CLOSE:
                        conn.sendall(method_frame(0, CONN_CLOSE_OK))
                        conn.close()
                        return
                elif t == 2:
                    body_left = struct.unpack(">Q", p[4:12])[0]
                    if body_left == 0 and pending_pub is not None:
                        self.messages.append((pending_pub, b""))
                        pending_pub = None
                elif t == 3:
                    body_left -= len(p)
                    if body_left <= 0 and pending_pub is not None:
                        self.messages.append((pending_pub, p))
                        pending_pub = None
        except (ConnectionError, AssertionError, OSError):
            conn.close()

    def close(self):
        self.srv.close()


@pytest.fixture()
def broker():
    b = _StubBroker()
    yield b
    b.close()


def test_handshake_declare_publish_disconnect(broker):
    c = AmqpClassicClient("127.0.0.1", broker.port)
    c.publish("blocks", '{"i":1}')
    c.publish("blocks", b"\x01\x02")
    c.publish("txs", "t")
    c.disconnect()
    assert broker.declared == ["blocks", "txs"]  # declared once per queue
    assert ("blocks", b'{"i":1}') in broker.messages
    assert ("blocks", b"\x01\x02") in broker.messages
    assert ("txs", b"t") in broker.messages
    assert not c.connected


def test_amqps_tls_publish_and_bad_ca(tls_certs):
    """amqps (VERDICT r9 #2): the classic client publishes over a TLS
    listener; a wrong CA fails the handshake before the AMQP header."""
    b = _StubBroker(tls=(tls_certs["cert"], tls_certs["key"]))
    try:
        c = AmqpClassicClient(
            "127.0.0.1", b.port, use_tls=True,
            ssl_cafile=tls_certs["cert"],
        )
        c.publish("blocks", b"enc-payload")
        c.disconnect()
        assert ("blocks", b"enc-payload") in b.messages
        bad = AmqpClassicClient(
            "127.0.0.1", b.port, use_tls=True,
            ssl_cafile=tls_certs["wrong_ca"],
        )
        # the client wraps connect-time OSErrors (ssl errors included)
        # in AmqpError; the cause stays visible in the message
        from etl_rust_spark.etl.amqp import AmqpError

        with pytest.raises(AmqpError, match="CERTIFICATE_VERIFY_FAILED"):
            bad.publish("blocks", b"x")
        # plaintext client against the TLS listener fails loudly too
        plain = AmqpClassicClient("127.0.0.1", b.port)
        with pytest.raises(Exception):
            plain.publish("blocks", b"x")
    finally:
        b.close()


def test_stream_queue_type_argument_table():
    """K-07 via the public AMQP surface: x-queue-type=stream rides the
    declare's argument table as a longstr ('S') entry."""
    buf = declare_frames(1, "s1", queue_type="stream")
    payload = buf[7:-1]
    entry = shortstr("x-queue-type") + b"S" + struct.pack(">I", 6) + b"stream"
    assert payload.endswith(struct.pack(">I", len(entry)) + entry)


def test_stream_client_declares_with_type(broker):
    c = AmqpClassicClient("127.0.0.1", broker.port, queue_type="stream")
    c.publish("events_stream", "x")
    c.disconnect()
    assert broker.declared == ["events_stream"]
    assert ("events_stream", b"x") in broker.messages


def test_connect_failure_raises_amqp_error():
    c = AmqpClassicClient("127.0.0.1", 1, timeout_s=0.5)
    with pytest.raises(AmqpError):
        c.publish("q", "x")


def test_executor_publish_through_ladder(spark, broker):
    from etl_rust_spark.etl.sinks import PublishStats, publish_tables

    df = spark.createDataFrame([(i,) for i in range(6)], ["v"]).coalesce(2)
    stats = PublishStats(spark)
    publish_tables(
        {"amqp_events": df},
        amqp_client_factory("127.0.0.1", broker.port),
        stats=stats,
    )
    got = sorted(
        json.loads(m.decode())["v"] for q, m in broker.messages if q == "amqp_events"
    )
    assert got == list(range(6))
    assert stats.snapshot()["published"] == 6
