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
  The subscriber half (``pull``/``acknowledge``, S-03) feeds
  ``streaming.subscription.consume_work_items`` — the reference's
  orchestrated ``index-subscription`` verb (src/main.rs:357-389).
- **RabbitMQ** → both wire surfaces are implemented stdlib-only:
  AMQP 0-9-1 (``etl.amqp.AmqpClassicClient`` — classic queues and
  ``x-queue-type=stream``) and the native stream binary protocol
  (``etl.rabbitmq_stream.RabbitMqStreamClient`` — confirmed publisher,
  K-07).  Both test against in-process socket stubs and run against a
  real broker unchanged.

Auth note: a real deployment sets ``token`` (OAuth bearer) or fronts
the endpoint with a metadata-server proxy; the emulator needs none.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from typing import Any, Callable

__all__ = [
    "PubSubRestClient",
    "PubSubPublishError",
    "PubSubPullError",
    "ReceivedMessage",
    "pubsub_client_factory",
    "GcsRestClient",
    "GcsUploadError",
    "publish_gcs_time_bucketed",
]


class PubSubPublishError(RuntimeError):
    """Non-2xx publish response — raised so the publisher's bulk→
    per-message ladder (etl.sinks._publish_partition) takes over."""


class PubSubPullError(RuntimeError):
    """Non-2xx / transport failure on a subscription pull or ack."""


class ReceivedMessage:
    """One pulled Pub/Sub message: ack handle + decoded payload.

    ``ack_id`` is the opaque server handle :meth:`PubSubRestClient.
    acknowledge` takes; an unacked message is redelivered after the
    ack deadline — the at-least-once contract the consume loop
    (streaming.subscription.consume_work_items) builds on.
    """

    __slots__ = ("ack_id", "data", "message_id", "attributes")

    def __init__(
        self,
        ack_id: str,
        data: bytes,
        message_id: str = "",
        attributes: dict[str, str] | None = None,
    ) -> None:
        self.ack_id = ack_id
        self.data = data
        self.message_id = message_id
        self.attributes = attributes or {}

    def __repr__(self) -> str:  # debugging aid only
        return f"ReceivedMessage(ack_id={self.ack_id!r}, message_id={self.message_id!r})"


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

    # Subscriber surface (S-03) --------------------------------------------
    # The reference's orchestrated mode consumes work items from a
    # subscription (src/main.rs:357-389: gcp_client.subscription(...) →
    # subscribe_and_extract; ack marks progress).  Same public REST
    # surface the emulator serves:
    #   POST /v1/projects/{p}/subscriptions/{s}:pull        {maxMessages}
    #   POST /v1/projects/{p}/subscriptions/{s}:acknowledge {ackIds}

    def _sub_post(self, subscription: str, verb: str, body: dict) -> dict:
        url = (
            f"{self.endpoint}/v1/projects/{self.project}"
            f"/subscriptions/{subscription}:{verb}"
        )
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                if resp.status // 100 != 2:
                    raise PubSubPullError(f"{verb} {resp.status}")
                raw = resp.read()
        except (urllib.error.URLError, OSError) as exc:
            raise PubSubPullError(str(exc)) from exc
        return json.loads(raw) if raw else {}

    def pull(self, subscription: str, max_messages: int = 100) -> list[ReceivedMessage]:
        """Synchronous pull; an empty list means no messages available."""
        out = self._sub_post(subscription, "pull", {"maxMessages": max_messages})
        received = []
        for rm in out.get("receivedMessages", []):
            msg = rm.get("message", {})
            received.append(
                ReceivedMessage(
                    ack_id=rm["ackId"],
                    data=base64.b64decode(msg.get("data", "")),
                    message_id=msg.get("messageId", ""),
                    attributes=msg.get("attributes") or {},
                )
            )
        return received

    def acknowledge(self, subscription: str, ack_ids: list[str]) -> None:
        if ack_ids:
            self._sub_post(subscription, "acknowledge", {"ackIds": list(ack_ids)})


class GcsUploadError(RuntimeError):
    """Non-2xx / transport failure on an object upload."""


class GcsRestClient:
    """GCS object upload over the public JSON API (K-03 transport).

    ``POST {endpoint}/upload/storage/v1/b/{bucket}/o?uploadType=media&
    name={object}`` — the simple-media upload the reference performs
    (``UploadType::Simple(Media::new(path))``, gcs.rs:124-156), and the
    wire surface fake-gcs-server emulators speak.  Retry-forever
    semantics (gcs.rs:148-155: log, retry, no backoff) are the default
    (``max_attempts=None``); deployments that prefer failing the Spark
    task (which then retries with task attempt accounting) pass a bound.
    """

    def __init__(
        self,
        endpoint: str,
        token: str | None = None,
        timeout_s: float = 30.0,
        max_attempts: int | None = None,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.token = token
        self.timeout_s = timeout_s
        self.max_attempts = max_attempts
        self.connected = True

    def _try_upload(self, bucket: str, name: str, data: bytes) -> None:
        from urllib.parse import quote

        url = (
            f"{self.endpoint}/upload/storage/v1/b/{quote(bucket, safe='')}/o"
            f"?uploadType=media&name={quote(name, safe='')}"
        )
        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/octet-stream"}
        )
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                if resp.status // 100 != 2:
                    raise GcsUploadError(f"upload {resp.status}")
                resp.read()
        except (urllib.error.URLError, OSError) as exc:
            raise GcsUploadError(str(exc)) from exc

    def upload_object(self, bucket: str, name: str, data: bytes) -> None:
        attempt = 0
        while True:
            attempt += 1
            try:
                return self._try_upload(bucket, name, data)
            except GcsUploadError:
                if self.max_attempts is not None and attempt >= self.max_attempts:
                    raise

    def disconnect(self) -> None:
        self.connected = False


def publish_gcs_time_bucketed(
    df,
    ts_col: str,
    bucket: str,
    table: str,
    client_factory: Callable[[], GcsRestClient],
) -> None:
    """Publish a table as newline-joined JSON objects under the
    reference's ``date/hour/{0|30}/`` keys (gcs.rs:91-162).

    Spark-first: the 30-minute grouping is a JVM-side projection
    (``time_bucket_cols`` — identical rule to DQ-44), records shuffle
    once on the directory key so each bucket's records are co-located,
    and each partition uploads one object per key it holds (pid+uuid
    object names — concurrent attempts never collide; duplicate objects
    from task retries are benign for downstream loaders that read whole
    prefixes, matching the reference's at-least-once upload loop).
    """
    from pyspark.sql import functions as F

    from etl_rust_spark.etl.writer import time_bucket_cols

    keyed = time_bucket_cols(df, ts_col)
    payload = keyed.select(
        F.concat_ws(
            "/", F.col("d"), F.col("h").cast("string"), F.col("half").cast("string")
        ).alias("key"),
        F.to_json(F.struct(*df.columns)).alias("payload"),
    ).repartition("key")

    def up(rows) -> None:
        import os
        import uuid
        from collections import defaultdict

        groups: dict[str, list[str]] = defaultdict(list)
        for r in rows:
            groups[r["key"]].append(r["payload"])
        if not groups:
            return
        client = client_factory()
        try:
            for key, recs in groups.items():
                name = f"{key}/{table}-{os.getpid()}-{uuid.uuid4().hex}.jsonl"
                client.upload_object(bucket, name, "\n".join(recs).encode())
        finally:
            client.disconnect()

    payload.foreachPartition(up)


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
