"""Streaming work-queue ingestion — the reference's ``index-subscription``.

Reference behavior (S-03, /root/reference/src/main.rs:357-389 and
src/example_config/mod.rs:7-13): an orchestrator publishes work items to
a Google Pub/Sub subscription; the extractor loops pulling items, each
naming blocks to index, and runs the extract→transform→publish pipeline
per item; message ack is the progress marker.

Spark-first re-expression: the work queue is a Structured Streaming
source (a file directory here — the transport is pluggable; Kafka swaps
in with one line on a real deployment), and ``foreachBatch`` runs the
batch ``run_range`` pipeline for each micro-batch of work items.
Exactly-once composition:

- the streaming **checkpoint** replaces message-ack (a processed file is
  never replayed after commit),
- ``run_range``'s idempotent bucket-overwrite sinks make the replay of
  an *uncommitted* batch after a crash converge to the same output —
  at-least-once delivery x idempotent writes = exactly-once tables,
  the design the reference approximates with its ``indexed_blocks``
  marker files (S-08, src/main.rs:186-238).

Work items are tiny control messages (a few per batch), so collecting
them on the driver mirrors the reference's subscriber loop; the heavy
lifting inside ``run_range`` stays fully distributed.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from etl_rust_spark.etl.pipeline import run_range
from etl_rust_spark.etl.writer import DEFAULT_BUCKET_SIZE
from etl_rust_spark.sources.chain import ChainConfig

__all__ = [
    "WORK_ITEM_SCHEMA",
    "work_stream",
    "run_subscription",
    "consume_work_items",
    "run_pubsub_subscription",
]

# One work item = one block range, the reference's unit of subscribed
# work ("message containing the transaction versions to index").
WORK_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
    ]
)


def work_stream(spark: SparkSession, work_dir: str) -> DataFrame:
    """Stream of work items from JSONL files dropped into ``work_dir``."""
    return (
        spark.readStream.schema(WORK_ITEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one work file per micro-batch
        .json(work_dir)
    )


def run_subscription(
    spark: SparkSession,
    chain: ChainConfig,
    work_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
) -> StreamingQuery:
    """Start the subscription pipeline; caller owns the query lifecycle.

    Stop with ``q.stop()`` (graceful — the reference's ``REQUIRES_DISCONNECT``
    teardown); restart with the same ``checkpoint_dir`` to resume without
    re-processing committed work items.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        # Control-plane collect: rows are WORK ITEMS (start, end ranges
        # — two ints each), not data.  A micro-batch carries at most the
        # ranges enqueued since the last trigger (ops-bounded, typically
        # a handful); the block data itself moves executor-side inside
        # run_range.  If a deployment ever enqueues millions of ranges
        # per trigger, chunk the queue upstream — do not stream payloads
        # through this driver loop.
        items = sorted(
            (int(r["start"]), int(r["end"]))
            for r in batch.dropna(subset=["start", "end"]).collect()
        )
        for start, end in items:
            if end > start:
                run_range(spark, chain, start, end, out_dir, bucket_size=bucket_size)

    return (
        work_stream(spark, work_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def consume_work_items(
    client,
    subscription: str,
    process: Callable[[int, int], None],
    max_messages: int = 100,
    max_empty_pulls: int | None = None,
    sleep_s: float = 1.0,
) -> int:
    """Pull→process→ack loop over a Pub/Sub subscription (S-03 proper).

    The reference's orchestrated mode (``index-subscription``,
    src/main.rs:357-389): an orchestrator publishes work items, the
    extractor subscribes and runs the pipeline per item, message ack
    marks progress.  Delivery semantics reproduced exactly:

    - ack happens ONLY after ``process`` returns — a crash mid-item
      leaves the message unacked, so the broker redelivers it
      (at-least-once); ``run_range``'s idempotent bucket-overwrite
      sinks make the replay converge (exactly-once tables);
    - a ``process`` exception acks nothing from the failed item onward
      and re-raises — the orchestrator's retry policy owns what happens
      next, same as the reference surfacing the subscriber error;
    - malformed payloads are acked and skipped (a poison message must
      not wedge the queue).

    ``client`` needs ``pull``/``acknowledge``
    (:class:`etl_rust_spark.etl.transports.PubSubRestClient`).
    ``max_empty_pulls`` bounds the loop for tests and drain-then-exit
    deployments; ``None`` loops forever (the reference's daemon mode).
    Returns the number of work items processed.

    Work items are tiny control messages, so this loop lives on the
    driver — the heavy lifting inside ``process`` stays distributed.
    """
    import time

    done = 0
    empty = 0
    while True:
        received = client.pull(subscription, max_messages=max_messages)
        if not received:
            empty += 1
            if max_empty_pulls is not None and empty >= max_empty_pulls:
                return done
            time.sleep(sleep_s)
            continue
        empty = 0
        for msg in received:
            try:
                item = json.loads(msg.data.decode("utf-8"))
                start, end = int(item["start"]), int(item["end"])
            except (ValueError, KeyError, UnicodeDecodeError):
                client.acknowledge(subscription, [msg.ack_id])  # poison
                continue
            if end > start:
                process(start, end)
                done += 1
            client.acknowledge(subscription, [msg.ack_id])


def run_pubsub_subscription(
    spark: SparkSession,
    chain: ChainConfig,
    client,
    subscription: str,
    out_dir: str,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    max_empty_pulls: int | None = None,
) -> int:
    """``index-subscription`` end to end: Pub/Sub work items drive
    ``run_range`` (the file-queue variant is :func:`run_subscription`).
    """
    return consume_work_items(
        client,
        subscription,
        lambda start, end: run_range(
            spark, chain, start, end, out_dir, bucket_size=bucket_size
        ),
        max_empty_pulls=max_empty_pulls,
    )
