"""TLS for the jar-free wire clients (VERDICT r9 #2): stdlib ``ssl``
over the existing socket layer, shared by the Kafka wire client
(``security.protocol`` SSL / SASL_SSL parity — real brokers run
SASL_SSL, and SCRAM only protects the password, not the payload), the
AMQP 0-9-1 client (amqps) and the RabbitMQ Stream client.

One context builder, the same knobs the jar'd connectors expose:

- ``cafile`` — PEM bundle the broker's cert must chain to (the
  ``ssl.ca.location`` / ``cacertfile`` option).  Default: the system
  trust store.
- ``certfile``/``keyfile`` — client cert for mutual TLS.
- ``check_hostname`` — verify the cert's SAN matches the host we
  dialed (default ON; turn off only for private CAs whose certs lack
  the broker's address — chain verification STAYS on, this never
  degrades to an unverified connection).

Failure posture is LOUD by construction: a plaintext client dialing a
TLS listener dies on a closed/garbled connection, a TLS client dialing
a plaintext listener dies in the handshake, and an unknown CA raises
``ssl.SSLCertVerificationError`` before any application byte is sent —
exercised against the stub brokers in tests/test_kafka_wire.py.
"""

from __future__ import annotations

import socket
import ssl

__all__ = ["client_tls_context", "wrap_client_socket"]


def client_tls_context(
    cafile: str | None = None,
    certfile: str | None = None,
    keyfile: str | None = None,
    check_hostname: bool = True,
) -> ssl.SSLContext:
    """A verifying client-side TLS context (PROTOCOL_TLS_CLIENT: chain
    verification is always on; ``check_hostname`` only governs the SAN
    match, never the chain)."""
    ctx = ssl.create_default_context(cafile=cafile)
    ctx.check_hostname = check_hostname
    if certfile:
        ctx.load_cert_chain(certfile, keyfile)
    return ctx


def wrap_client_socket(
    sock: socket.socket,
    host: str,
    cafile: str | None = None,
    certfile: str | None = None,
    keyfile: str | None = None,
    check_hostname: bool = True,
) -> ssl.SSLSocket:
    """Wrap a freshly connected socket; the TLS handshake runs here, so
    certificate problems surface at connect time, before any protocol
    byte.  ``host`` is sent as SNI and (when ``check_hostname``)
    matched against the certificate."""
    ctx = client_tls_context(cafile, certfile, keyfile, check_hostname)
    return ctx.wrap_socket(sock, server_hostname=host)
