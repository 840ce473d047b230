"""Real queue transports behind the :class:`QueueClient` protocol.

The reference ships four broker clients (K-04…K-07): Google Pub/Sub
(src/output/google_pubsub.rs:30-201), Apache Kafka
(src/output/apache_kafka.rs:31-115), RabbitMQ classic/stream
(src/output/rabbitmq_classic.rs:20-122, rabbitmq_stream.rs:17-93).
In this engine:

- **Kafka** → Spark's built-in connector (``etl.sinks.kafka_batch_writer``
  / ``kafka_stream_writer``) — the idiomatic Spark path.
- **Pub/Sub** → :class:`PubSubRestClient` below: the public Pub/Sub REST
  API (``POST {endpoint}/v1/{topic}:publish`` with base64 message data —
  the same wire surface the official emulator serves), stdlib urllib,
  no SDK dependency.  Plugs into ``publish_tables``'s executor-local
  lifecycle + 900-chunk + bulk→per-message retry ladder, which already
  mirrors the reference's backoff behavior (google_pubsub.rs:122-171).
- **AMQP (RabbitMQ)** → no broker or client library in this container
  and AMQP 0-9-1 framing is out of scope for stdlib; the QueueClient
  seam is the integration point (a ``pika``-backed client is a ~20-line
  adapter where an environment provides it).

Auth note: a real deployment sets ``token`` (OAuth bearer) or fronts
the endpoint with a metadata-server proxy; the emulator needs none.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from typing import Any, Callable

__all__ = ["PubSubRestClient", "PubSubPublishError", "pubsub_client_factory"]


class PubSubPublishError(RuntimeError):
    """Non-2xx publish response — raised so the publisher's bulk→
    per-message ladder (etl.sinks._publish_partition) takes over."""


class PubSubRestClient:
    """Pub/Sub over its public REST surface (K-04).

    Reference parity (google_pubsub.rs):
    - one topic per table via ``topic_for`` (the reference maps
      table→topic through env, .env.example:7-13);
    - bulk publish is ONE request per chunk (``:122`` bulk size 900 is
      enforced upstream by ``publish_tables``'s chunking);
    - errors raise — retry policy lives in the publisher, not here
      (``:137-171``), so every transport shares one ladder.
    """

    def __init__(
        self,
        endpoint: str,
        project: str,
        topic_for: Callable[[str], str] | dict[str, str] | None = None,
        token: str | None = None,
        timeout_s: float = 30.0,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.project = project
        self._topic_for = topic_for
        self.token = token
        self.timeout_s = timeout_s
        self.connected = True

    def _topic_path(self, table: str) -> str:
        if callable(self._topic_for):
            topic = self._topic_for(table)
        elif isinstance(self._topic_for, dict):
            topic = self._topic_for[table]
        else:
            topic = table
        return f"projects/{self.project}/topics/{topic}"

    @staticmethod
    def _message(payload: Any) -> dict:
        if isinstance(payload, (bytes, bytearray)):
            raw = bytes(payload)
        else:
            raw = str(payload).encode("utf-8")
        return {"data": base64.b64encode(raw).decode("ascii")}

    def _post(self, table: str, messages: list[dict]) -> None:
        url = f"{self.endpoint}/v1/{self._topic_path(table)}:publish"
        body = json.dumps({"messages": messages}).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                if resp.status // 100 != 2:
                    raise PubSubPublishError(f"publish {resp.status}")
                resp.read()
        except (urllib.error.URLError, OSError) as exc:
            raise PubSubPublishError(str(exc)) from exc

    # QueueClient protocol -------------------------------------------------
    def publish(self, table: str, payload: Any) -> None:
        self._post(table, [self._message(payload)])

    def publish_batch(self, table: str, payloads: list[Any]) -> None:
        self._post(table, [self._message(p) for p in payloads])

    def disconnect(self) -> None:
        self.connected = False  # REST is connectionless; K-09 parity flag


def pubsub_client_factory(
    endpoint: str,
    project: str,
    topic_for: dict[str, str] | None = None,
    token: str | None = None,
) -> Callable[[], PubSubRestClient]:
    """Picklable factory for ``publish_tables`` (built executor-side,
    one client per partition — K-09)."""

    def make() -> PubSubRestClient:
        return PubSubRestClient(endpoint, project, topic_for=topic_for, token=token)

    return make
