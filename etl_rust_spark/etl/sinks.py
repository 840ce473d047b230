"""Queue-sink publishing layer (reference K-04…K-07 / X-03…X-05 / X-07 / X-08).

The reference publishes each table's records to exactly one queue sink
chosen at compile time — Google Pub/Sub, Kafka, RabbitMQ classic/stream —
through one shape: ``connect(env_key) → connection``, ``publish(msg)`` /
``publish_batch(msgs)``, ``disconnect()`` (src/output/publish.rs:30-47,
src/features.rs:9-18).  Its delivery ladder: chunked bulk publish
(900 msgs Pub/Sub, 1024 Kafka), failed bulk → per-message publish, each
message retried with linear backoff forever
(src/output/google_pubsub.rs:122-171; src/output/apache_kafka.rs:72-113).
Thread-local connections are re-created in-thread because ``Clone``
drops them (K-09, src/output/publish.rs:63-89).

Spark-first re-expression:

- **Encode JVM-side** (X-03/04/05): records become bytes/strings inside
  codegen via ``to_json`` (default; the reference's default sink is
  JSONL, Cargo.toml:99-107), ``to_avro`` or ``to_protobuf`` when the
  spark-avro / spark-protobuf packages are on the classpath (gated —
  this container ships neither), so the Python boundary only ever sees
  the final payload column, never rows.
- **Publish via ``foreachPartition``**: one client per partition
  (executor-local, the K-09 idiom), ``chunk_size`` bulk publishes,
  failed bulk → per-message with linear backoff (X-08) — but bounded
  attempts + Spark task retry instead of the reference's retry-forever
  (a hung queue should fail the task and surface, not wedge a worker).
- **Exactly-once** is the transport's problem at the queue edge (the
  reference is at-least-once too); idempotent re-publish is achieved by
  publishing deterministic payloads per (table, block range) so
  downstream dedup keys exist.

The client factory must be a picklable callable (module-level class or
function) — it is shipped to executors.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "QueueClient",
    "DirQueueClient",
    "JsonPerRecordClient",
    "encode_json",
    "encode_avro",
    "encode_protobuf",
    "kafka_batch_writer",
    "kafka_stream_writer",
    "publish_table",
    "publish_tables",
    "PublishStats",
]

DEFAULT_CHUNK_SIZE = 900  # the reference's Pub/Sub bulk size


class QueueClient(Protocol):
    """What a queue transport must provide (reference connection shape).

    ``publish_batch`` may raise to signal bulk failure — the publisher
    then falls back to per-message ``publish`` with backoff.
    """

    def publish(self, table: str, payload: Any) -> None: ...

    def publish_batch(self, table: str, payloads: list[Any]) -> None: ...

    def disconnect(self) -> None: ...


class DirQueueClient:
    """Directory-backed queue transport — the in-repo reference
    implementation of :class:`QueueClient` (the reference's own default
    sink is file-backed JSONL, K-01).  One file per publish/batch,
    pid+uuid names so concurrent partitions never collide; doubles as
    the test transport because files are the one cross-process channel
    local workers share."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.connected = True

    def _write(self, table: str, payloads: list[Any], kind: str) -> None:
        import os
        import uuid
        from pathlib import Path

        d = Path(self.root) / table
        d.mkdir(parents=True, exist_ok=True)
        f = d / f"{kind}-{os.getpid()}-{uuid.uuid4().hex}.jsonl"
        f.write_text("".join(str(p) + "\n" for p in payloads))

    def publish(self, table: str, payload: Any) -> None:
        self._write(table, [payload], "single")

    def publish_batch(self, table: str, payloads: list[Any]) -> None:
        self._write(table, payloads, "batch")

    def disconnect(self) -> None:
        self.connected = False


class JsonPerRecordClient:
    """K-02 exact shape: ONE ``{name}.json`` file per record in a
    per-table directory (reference JSON sink, src/output/json.rs:44-63 —
    name comes from the record, e.g. the block number).

    ``name_field`` extracts the name from the JSON payload; records
    without it (or non-JSON payloads) fall back to a collision-free
    pid+uuid name.  Duplicate names get a numeric suffix rather than the
    reference's busy-wait-while-exists loop."""

    def __init__(self, root: str, name_field: str | None = None) -> None:
        self.root = root
        self.name_field = name_field
        self.connected = True

    def _name(self, payload: Any) -> str:
        import json as _json
        import os
        import uuid

        if self.name_field:
            try:
                v = _json.loads(
                    payload.decode() if isinstance(payload, bytes) else str(payload)
                )[self.name_field]
                return str(v)
            except Exception:
                pass
        return f"{os.getpid()}-{uuid.uuid4().hex}"

    def publish(self, table: str, payload: Any) -> None:
        from pathlib import Path

        d = Path(self.root) / table
        d.mkdir(parents=True, exist_ok=True)
        base = self._name(payload)
        f = d / f"{base}.json"
        n = 0
        while f.exists():
            n += 1
            f = d / f"{base}-{n}.json"
        data = payload if isinstance(payload, str) else (
            payload.decode() if isinstance(payload, bytes) else str(payload)
        )
        f.write_text(data)

    def publish_batch(self, table: str, payloads: list[Any]) -> None:
        for p in payloads:
            self.publish(table, p)

    def disconnect(self) -> None:
        self.connected = False


# ---------------------------------------------------------------------------
# Encoders (X-03/X-04/X-05) — all JVM-side column expressions
# ---------------------------------------------------------------------------

def encode_json(df: DataFrame, stamp_ts: bool = False) -> DataFrame:
    """All columns → one JSON string column ``payload`` (X-05).

    ``stamp_ts=True`` adds ``publish_ts = current_timestamp()`` to every
    record before encoding — the reference's Kafka publish-time stamping
    (X-09, src/output/apache_kafka.rs:58-68)."""
    if stamp_ts:
        df = df.withColumn("publish_ts", F.current_timestamp())
    return df.select(F.to_json(F.struct(*df.columns)).alias("payload"))


def encode_avro(df: DataFrame, schema_json: str | None = None) -> DataFrame:
    """All columns → Avro bytes ``payload`` (X-04).

    Requires the spark-avro package on the session classpath; raises a
    clear error otherwise (the engine's analog of the reference's
    compile-time sink feature gate, O-04).
    """
    from pyspark.sql.avro.functions import to_avro

    struct = F.struct(*df.columns)
    col = to_avro(struct, schema_json) if schema_json else to_avro(struct)
    return df.select(col.alias("payload"))


def encode_protobuf(df: DataFrame, message_name: str, desc_file_path: str) -> DataFrame:
    """All columns → proto bytes ``payload`` (X-03); needs spark-protobuf."""
    from pyspark.sql.protobuf.functions import to_protobuf

    return df.select(
        to_protobuf(F.struct(*df.columns), message_name, desc_file_path).alias(
            "payload"
        )
    )


_ENCODERS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "json": encode_json,
}


# ---------------------------------------------------------------------------
# Kafka via Spark's built-in connector (K-05)
# ---------------------------------------------------------------------------

def _kafka_frame(df: DataFrame, encoder, stamp_ts: bool) -> DataFrame:
    enc = _ENCODERS[encoder] if isinstance(encoder, str) else encoder
    payload = enc(df, stamp_ts=stamp_ts) if enc is encode_json else enc(df)
    # Spark's kafka sink contract: a binary/string `value` column
    # (optional `key`/`topic`).  The reference producer publishes
    # unkeyed records (partition 0, apache_kafka.rs:31-115); we leave
    # `key` absent and let the topic come from the writer option.
    return payload.select(F.col("payload").cast("binary").alias("value"))


def kafka_batch_writer(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    encoder: str | Callable[[DataFrame], DataFrame] = "json",
    stamp_ts: bool = True,
):
    """Batch Kafka publish via Spark's built-in ``kafka`` sink (K-05,
    reference src/output/apache_kafka.rs:31-115).

    Returns the configured ``DataFrameWriter`` — call ``.save()`` to
    publish.  Record batching/linger (the reference's
    ``RecordAggregator(1024)``, linger 0) maps to producer options:
    pass ``.option("kafka.batch.size", ...)`` / ``kafka.linger.ms`` on
    the returned writer.  Publish-time stamping (X-09) is on by default.
    Requires the spark-sql-kafka package on the classpath (absent in
    this container — the writer still constructs and plan-checks; only
    ``.save()`` needs the jar).  Where the jar is unavailable, the
    jar-free wire-protocol producer (etl/kafka_wire.py —
    ``kafka_wire_client_factory`` + ``publish_tables``) covers the
    produce path with RecordBatch-v2 fidelity, tested in-container
    against a socket stub broker.
    """
    return (
        _kafka_frame(df, encoder, stamp_ts)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )


def kafka_stream_writer(
    sdf: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
    encoder: str | Callable[[DataFrame], DataFrame] = "json",
    stamp_ts: bool = True,
):
    """Streaming Kafka publish (``writeStream.format("kafka")``) with
    checkpoint-based exactly-once to the topic; returns the configured
    ``DataStreamWriter`` — call ``.start()``."""
    return (
        _kafka_frame(sdf, encoder, stamp_ts)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


# ---------------------------------------------------------------------------
# Publisher
# ---------------------------------------------------------------------------

class PublishStats:
    """Accumulator-backed publish metrics (O-01 surface for the sink side)."""

    def __init__(self, spark: SparkSession) -> None:
        sc = spark.sparkContext
        self.published = sc.accumulator(0)
        self.bulk_failures = sc.accumulator(0)
        self.message_retries = sc.accumulator(0)

    def snapshot(self) -> dict[str, int]:
        return {
            "published": self.published.value,
            "bulk_failures": self.bulk_failures.value,
            "message_retries": self.message_retries.value,
        }


def _publish_partition(
    rows: Iterable,
    table: str,
    client_factory: Callable[[], QueueClient],
    chunk_size: int,
    max_attempts: int,
    backoff_step_s: float,
    stats: PublishStats | None,
) -> None:
    import time as _time

    client = client_factory()  # executor-local (K-09)
    try:
        chunk: list[Any] = []

        def flush() -> None:
            if not chunk:
                return
            try:
                client.publish_batch(table, list(chunk))
            except Exception:
                # bulk → per-message ladder with linear backoff (X-08)
                if stats:
                    stats.bulk_failures.add(1)
                for payload in chunk:
                    delay = 0.0
                    for attempt in range(max_attempts):
                        if delay:
                            _time.sleep(delay)
                        try:
                            client.publish(table, payload)
                            break
                        except Exception:
                            if stats:
                                stats.message_retries.add(1)
                            delay += backoff_step_s
                            if attempt == max_attempts - 1:
                                raise  # fail the task → Spark retries it
            if stats:
                stats.published.add(len(chunk))
            chunk.clear()

        for row in rows:
            chunk.append(row["payload"])
            if len(chunk) >= chunk_size:
                flush()
        flush()
    finally:
        client.disconnect()  # REQUIRES_DISCONNECT parity, always


def publish_table(
    df: DataFrame,
    table: str,
    client_factory: Callable[[], QueueClient],
    encoder: str | Callable[[DataFrame], DataFrame] = "json",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    max_attempts: int = 5,
    backoff_step_s: float = 1.0,
    stats: PublishStats | None = None,
) -> None:
    """Encode ``df`` and publish every record to ``table``'s queue."""
    enc = _ENCODERS[encoder] if isinstance(encoder, str) else encoder
    payloads = enc(df)
    payloads.foreachPartition(
        lambda rows: _publish_partition(
            rows, table, client_factory, chunk_size, max_attempts, backoff_step_s, stats
        )
    )


def publish_tables(
    tables: dict[str, DataFrame],
    client_factory: Callable[[], QueueClient],
    encoder: str | Callable[[DataFrame], DataFrame] = "json",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    max_attempts: int = 5,
    backoff_step_s: float = 1.0,
    stats: PublishStats | None = None,
) -> None:
    """Fan a transform output out to per-table queues (K-08 for queues)."""
    for name, df in tables.items():
        publish_table(
            df,
            name,
            client_factory,
            encoder=encoder,
            chunk_size=chunk_size,
            max_attempts=max_attempts,
            backoff_step_s=backoff_step_s,
            stats=stats,
        )
