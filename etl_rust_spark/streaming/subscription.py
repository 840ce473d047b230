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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from etl_rust_spark.etl.pipeline import run_range
from etl_rust_spark.etl.writer import DEFAULT_BUCKET_SIZE
from etl_rust_spark.sources.chain import ChainConfig

__all__ = ["WORK_ITEM_SCHEMA", "work_stream", "run_subscription"]

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
