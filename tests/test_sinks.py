"""Tests for the queue publishing layer (K-04…K-07 / X-07 / X-08 parity).

The fake queue transports write to a shared directory — Spark python
workers are separate processes, so module state won't do; the filesystem
is the cross-process queue."""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pytest
from pyspark import cloudpickle

from etl_rust_spark.etl.sinks import (
    DirQueueClient,
    PublishStats,
    encode_json,
    publish_table,
    publish_tables,
)
from etl_rust_spark.sources.chain import SyntheticChain
from etl_rust_spark.sources.ranges import block_range

# Classes below live in the (worker-unimportable) test module — ship them
# by value inside the pickled closure instead of by reference.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class NoBulkClient(DirQueueClient):
    """Rejects every bulk publish → exercises the per-message ladder."""

    def publish_batch(self, table: str, payloads) -> None:
        raise RuntimeError("bulk rejected")


def _factory(root):
    def make():
        return DirQueueClient(root)

    return make


def _nobulk_factory(root):
    def make():
        return NoBulkClient(root)

    return make


def _read_all(root, table):
    out = []
    for f in sorted((Path(root) / table).glob("*.jsonl")):
        out += [json.loads(l) for l in f.read_text().splitlines() if l.strip()]
    return out


def test_publish_table_bulk(spark, tmp_path):
    root = str(tmp_path / "q")
    df = spark.range(0, 250).withColumnRenamed("id", "block_index")
    stats = PublishStats(spark)
    publish_table(
        df, "blocks", _factory(root), chunk_size=100, stats=stats
    )
    msgs = _read_all(root, "blocks")
    assert {m["block_index"] for m in msgs} == set(range(250))
    snap = stats.snapshot()
    assert snap["published"] == 250
    assert snap["bulk_failures"] == 0 and snap["message_retries"] == 0
    # chunking respected: no batch file exceeds chunk_size records
    for f in (Path(root) / "blocks").glob("batch-*.jsonl"):
        assert len(f.read_text().splitlines()) <= 100


def test_publish_bulk_failure_falls_back_per_message(spark, tmp_path):
    root = str(tmp_path / "q")
    df = spark.range(0, 30).withColumnRenamed("id", "block_index").coalesce(1)
    stats = PublishStats(spark)
    publish_table(
        df,
        "blocks",
        _nobulk_factory(root),
        chunk_size=10,
        backoff_step_s=0.0,
        stats=stats,
    )
    msgs = _read_all(root, "blocks")
    assert {m["block_index"] for m in msgs} == set(range(30))
    snap = stats.snapshot()
    assert snap["bulk_failures"] == 3  # 30 rows / chunk 10
    assert snap["published"] == 30
    # every record arrived via the single-message path
    assert not list((Path(root) / "blocks").glob("batch-*.jsonl"))


def test_publish_tables_fanout(spark, tmp_path):
    root = str(tmp_path / "q")
    chain = SyntheticChain()
    tables = chain.transform(chain.fetch(block_range(spark, 0, 5)))
    publish_tables(tables, _factory(root), chunk_size=50)
    for name, df in tables.items():
        assert len(_read_all(root, name)) == df.count(), name


def test_encode_json_payload_shape(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = encode_json(df).collect()
    assert json.loads(out[0]["payload"]) == {"a": 1, "b": "x"}


def test_encode_json_stamps_publish_ts(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    rec = json.loads(encode_json(df, stamp_ts=True).collect()[0]["payload"])
    assert set(rec) == {"a", "publish_ts"} and rec["publish_ts"]


def test_json_per_record_client(spark, tmp_path):
    """K-02 exact shape: one {name}.json per record, named from the
    record's key field (reference json.rs:44-63), through the real
    executor publisher."""
    from etl_rust_spark.etl.sinks import JsonPerRecordClient, publish_table

    df = spark.createDataFrame([(7, "a"), (9, "b")], ["block_index", "x"]).coalesce(1)
    publish_table(
        df, "blocks", lambda: JsonPerRecordClient(str(tmp_path), "block_index")
    )
    files = sorted(f.name for f in (tmp_path / "blocks").glob("*.json"))
    assert files == ["7.json", "9.json"]
    assert json.loads((tmp_path / "blocks" / "7.json").read_text())["x"] == "a"
    # name collisions get suffixed, never clobbered or spun on
    c = JsonPerRecordClient(str(tmp_path), "block_index")
    c.publish("blocks", '{"block_index": 7, "x": "dup"}')
    assert (tmp_path / "blocks" / "7-1.json").exists()
    # no name field -> uuid fallback
    c.publish("blocks", "not-json")
    assert len(list((tmp_path / "blocks").glob("*.json"))) == 4


# ---------------------------------------------------------------------------
# K-05 Kafka wiring: plan-level for the built-in format("kafka") writer
# (no jar in this container) — the produce path itself IS exercised
# in-container via the jar-free wire client vs a socket stub broker
# (tests/test_kafka_wire.py, r7).  X-03/X-04 encoder golden bytes stay
# skip-marked until jars appear.
# ---------------------------------------------------------------------------

def test_kafka_batch_writer_plan_shape(spark):
    from etl_rust_spark.etl.sinks import kafka_batch_writer, _kafka_frame

    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    kdf = _kafka_frame(df, "json", stamp_ts=False)
    # Spark's kafka sink contract: exactly a binary `value` column.
    assert [(f.name, f.dataType.simpleString()) for f in kdf.schema.fields] == [
        ("value", "binary")
    ]
    assert json.loads(bytes(kdf.collect()[0]["value"]).decode()) == {"a": 1, "b": "x"}
    writer = kafka_batch_writer(df, "blocks", "broker:9092")
    # The writer is fully constructed; only .save() needs the kafka jar.
    # In this container the jar is absent → resolution must fail loudly,
    # proving the format string actually reaches Spark's source registry.
    with pytest.raises(Exception):
        writer.save()


def test_kafka_stream_writer_constructs(spark, tmp_path):
    from etl_rust_spark.etl.sinks import kafka_stream_writer
    from etl_rust_spark.streaming import events_stream

    src = tmp_path / "kafka_src"
    src.mkdir()
    sdf = events_stream(spark, str(src))
    writer = kafka_stream_writer(
        sdf, "events", "broker:9092", str(tmp_path / "ckpt")
    )
    assert writer is not None  # constructed; .start() needs the jar


def _kafka_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="K-05 runtime round-trip needs a reachable broker: set "
    "KAFKA_BOOTSTRAP=host:port (and launch Spark with the "
    "spark-sql-kafka-0-10 package on the classpath)",
)
def test_kafka_runtime_roundtrip(spark, tmp_path):
    """K-05 runtime validation (VERDICT r3 #6): publish through
    kafka_batch_writer against a real broker and read the topic back —
    payload fidelity + publish-time stamping, the behavior
    src/output/apache_kafka.rs:31-115 ships.  Skips (with the setup
    recipe in the reason) wherever no broker/jar is available."""
    import uuid

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    if not _kafka_jar_present(spark):
        pytest.skip("spark-sql-kafka jar not on the session classpath")
    from etl_rust_spark.etl.sinks import kafka_batch_writer

    topic = f"etl-test-{uuid.uuid4().hex[:8]}"
    df = spark.createDataFrame([(i, f"r{i}") for i in range(10)], ["a", "b"])
    kafka_batch_writer(df, topic, bootstrap).save()
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    payloads = [json.loads(bytes(r["value"]).decode()) for r in back.collect()]
    assert sorted(p["a"] for p in payloads) == list(range(10))
    assert all("_published_at" in p for p in payloads)  # X-09 stamp


def test_encode_avro_golden_bytes(spark):
    from pyspark.sql import types as T

    from etl_rust_spark.etl.sinks import encode_avro

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("s", T.StringType(), nullable=False),
        ]
    )
    df = spark.createDataFrame([(1, "a")], schema)
    try:
        out = encode_avro(df).collect()
    except Exception as exc:  # spark-avro jar absent in this container
        pytest.skip(f"spark-avro not on classpath: {exc}")
    # Avro binary for record {id: long 1, s: string "a"}:
    # long 1 -> zigzag varint 0x02; string "a" -> len varint 0x02 + 0x61.
    assert bytes(out[0]["payload"]) == b"\x02\x02a"


def _tiny_descriptor_set() -> bytes:
    """Hand-encoded FileDescriptorSet for:
        syntax = "proto3"; message Rec { int64 id = 1; string s = 2; }
    (built by hand so the golden test needs no protoc in the container).
    """

    def ld(tag: int, payload: bytes) -> bytes:  # length-delimited field
        return bytes([tag << 3 | 2, len(payload)]) + payload

    def vi(tag: int, v: int) -> bytes:  # varint field
        return bytes([tag << 3, v])

    f_id = ld(1, b"id") + vi(3, 1) + vi(4, 1) + vi(5, 3)  # TYPE_INT64
    f_s = ld(1, b"s") + vi(3, 2) + vi(4, 1) + vi(5, 9)  # TYPE_STRING
    msg = ld(1, b"Rec") + ld(2, f_id) + ld(2, f_s)
    fdp = ld(1, b"golden.proto") + ld(4, msg) + ld(12, b"proto3")
    return ld(1, fdp)


def test_encode_protobuf_golden_bytes(spark, tmp_path):
    from pyspark.sql import types as T

    from etl_rust_spark.etl.sinks import encode_protobuf

    desc = tmp_path / "golden.desc"
    desc.write_bytes(_tiny_descriptor_set())
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("s", T.StringType(), nullable=False),
        ]
    )
    df = spark.createDataFrame([(1, "a")], schema)
    try:
        out = encode_protobuf(df, "Rec", str(desc)).collect()
    except Exception as exc:  # spark-protobuf jar absent in this container
        pytest.skip(f"spark-protobuf not on classpath: {exc}")
    # proto3 wire bytes: field 1 varint 1 -> 08 01; field 2 "a" -> 12 01 61.
    assert bytes(out[0]["payload"]) == b"\x08\x01\x12\x01a"
