"""The jar-free Kafka DataSource (sources/kafka_source.py): batch read,
streaming offsets, checkpoint resume, and the full in-container loop —
wire producer → stub broker → `format("kafka_wire")` consumer.

Closes the read side of K-05 (reference src/output/apache_kafka.rs is
publish-only; the produce path was closed in r7 via the socket stub)."""

from __future__ import annotations

import pytest

from etl_rust_spark.etl.kafka_wire import KafkaWireClient
from etl_rust_spark.sources.kafka_source import KafkaWireDataSource
from tests.test_kafka_wire import KafkaStubBroker


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(KafkaWireDataSource)


@pytest.fixture()
def broker():
    b = KafkaStubBroker()
    yield b
    b.close()


def _produce(broker, topic, values, compression=None):
    c = KafkaWireClient("127.0.0.1", broker.port, compression=compression)
    c.publish_batch(topic, values)
    c.disconnect()


def test_batch_read_round_trip(spark, broker):
    _produce(broker, "blocks", [b"b0", b"b1", b"b2"])
    _produce(broker, "blocks", [b"b3", b"b4"], compression="zstd")
    df = (
        spark.read.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "blocks")
        .load()
    )
    rows = sorted((r.offset, bytes(r.value)) for r in df.collect())
    assert rows == [(i, f"b{i}".encode()) for i in range(5)]
    assert {r.partition for r in df.collect()} == {0}
    assert df.columns == ["offset", "key", "value", "topic", "partition"]


def test_batch_read_requires_topic(spark, broker):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException, PythonException

    with pytest.raises((AnalysisException, PythonException, Py4JJavaError)):
        spark.read.format("kafka_wire").option("port", broker.port).load().collect()


def test_stream_consumes_and_resumes_exactly_once(spark, broker, tmp_path):
    """Micro-batch N covers [committed, latest): producing between runs
    and restarting from the checkpoint yields every record exactly once
    — the offset-log discipline, driven through a REAL produce/fetch
    socket loop."""
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("kafka_wire")
            .option("host", "127.0.0.1")
            .option("port", broker.port)
            .option("topic", "events")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _produce(broker, "events", [b"e0", b"e1", b"e2"])
    run()
    got = spark.read.parquet(out)
    assert sorted(bytes(r.value) for r in got.collect()) == [b"e0", b"e1", b"e2"]

    # new records land while the stream is DOWN; resume picks up only them
    _produce(broker, "events", [b"e3"])
    _produce(broker, "events", [b"e4", b"e5"], compression="lz4")
    run()
    got = spark.read.parquet(out)
    vals = sorted(bytes(r.value) for r in got.collect())
    assert vals == [f"e{i}".encode() for i in range(6)]  # no dupes, no gaps
    offs = sorted(r.offset for r in got.collect())
    assert offs == list(range(6))


def test_stream_starting_offsets_latest(spark, broker, tmp_path):
    """startingOffsets=latest skips the backlog: only records produced
    after the first batch's planning are consumed."""
    _produce(broker, "logs", [b"old0", b"old1"])
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "logs")
        .option("startingOffsets", "latest")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # first batch: nothing (log end = start)
        _produce(broker, "logs", [b"new0"])
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert [bytes(r.value) for r in got.collect()] == [b"new0"]
    assert [r.offset for r in got.collect()] == [2]  # absolute log offset


def test_produce_from_executors_consume_as_dataframe(spark, broker):
    """The full in-container Kafka loop: publish_tables fans a DataFrame
    out through executor-side wire clients, and the DataSource reads the
    topic back into a DataFrame — byte-identical payload set."""
    from etl_rust_spark.etl.kafka_wire import kafka_wire_client_factory
    from etl_rust_spark.etl.sinks import publish_tables

    src = spark.range(0, 20).selectExpr(
        "CAST(id AS STRING) AS block_index", "concat('payload-', id) AS body"
    )
    publish_tables(
        {"loop": src},
        kafka_wire_client_factory("127.0.0.1", broker.port),
    )
    back = (
        spark.read.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "loop")
        .load()
    )
    vals = {bytes(r.value) for r in back.collect()}
    assert len(vals) == 20  # every row arrived exactly once
    assert all(b"payload-" in v for v in vals)  # JSON-encoded bodies


def test_batch_write_then_read_round_trip(spark, broker):
    """df.write.format('kafka_wire') produces through executor-side wire
    clients (zstd-compressed batches here); the source reads the topic
    back byte-identically."""
    src = spark.range(0, 30).selectExpr("concat('row-', id) AS value")
    (
        src.write.format("kafka_wire")
        .mode("append")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "written")
        .option("compression", "zstd")
        .option("batchSize", 7)
        .save()
    )
    back = (
        spark.read.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "written")
        .load()
    )
    assert sorted(bytes(r.value) for r in back.collect()) == sorted(
        f"row-{i}".encode() for i in range(30)
    )


def test_write_rejects_key_column_and_overwrite(spark, broker):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException, PythonException

    df = spark.range(3).selectExpr(
        "CAST(NULL AS BINARY) AS key", "CAST(id AS STRING) AS value"
    )
    with pytest.raises((AnalysisException, PythonException, Py4JJavaError)):
        (
            df.write.format("kafka_wire").mode("append")
            .option("port", broker.port).option("topic", "t").save()
        )
    vdf = spark.range(3).selectExpr("CAST(id AS STRING) AS value")
    with pytest.raises((AnalysisException, PythonException, Py4JJavaError)):
        (
            vdf.write.format("kafka_wire").mode("overwrite")
            .option("port", broker.port).option("topic", "t").save()
        )


def test_streaming_relay_topic_to_topic(spark, broker, tmp_path):
    """A full wire relay: readStream from topic 'in', writeStream to
    topic 'out' — both over the socket stub — then batch-read 'out'.
    Producers feed 'in' between micro-batches; the relay carries every
    record across exactly once (reader-side offsets in the checkpoint)."""
    _produce(broker, "in", [b"m0", b"m1"])
    q = (
        spark.readStream.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "in")
        .load()
        .selectExpr("value")
        .writeStream.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _produce(broker, "in", [b"m2"], compression="gzip")
        q.processAllAvailable()
    finally:
        q.stop()
    back = (
        spark.read.format("kafka_wire")
        .option("host", "127.0.0.1")
        .option("port", broker.port)
        .option("topic", "out")
        .load()
    )
    assert sorted(bytes(r.value) for r in back.collect()) == [b"m0", b"m1", b"m2"]


def _produce_at(broker, topic, values, ts):
    """Produce one batch with a CONTROLLED base timestamp (the wire
    encoder writes delta-0 record timestamps, so every record in the
    batch carries exactly ``ts``)."""
    from etl_rust_spark.etl.kafka_wire import encode_record_batch

    c = KafkaWireClient("127.0.0.1", broker.port)
    c.connect()
    c._produce(topic, encode_record_batch(values, base_timestamp=ts))
    c.disconnect()


def test_batch_explicit_and_ending_offsets(spark, broker):
    """startingOffsets / endingOffsets as per-partition JSON — the
    jar'd connector's surface (VERDICT r7 #6)."""
    _produce(broker, "t", [b"r0", b"r1", b"r2", b"r3", b"r4"])

    def read(**opts):
        r = (
            spark.read.format("kafka_wire")
            .option("host", "127.0.0.1")
            .option("port", broker.port)
            .option("topic", "t")
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return sorted(r.load().select("offset").toPandas()["offset"])

    assert read(startingOffsets='{"t": {"0": 1}}',
                endingOffsets='{"t": {"0": 4}}') == [1, 2, 3]
    # -2/-1 specials inside the JSON resolve through ListOffsets
    assert read(startingOffsets='{"t": {"0": -2}}') == [0, 1, 2, 3, 4]
    assert read(startingOffsets='{"t": {"0": -1}}') == []
    # real-connector parity (ADVICE r8): a partition absent from an
    # explicit map fails loudly instead of silently replaying from
    # earliest; negative literals other than the -1/-2 specials are
    # rejected rather than yielding silently empty slices
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException, PythonException

    spark_errs = (AnalysisException, PythonException, Py4JJavaError)
    with pytest.raises(spark_errs):
        read(startingOffsets='{"t": {}}')
    with pytest.raises(spark_errs):
        read(startingOffsets='{"t": {"0": -3}}')
    with pytest.raises(spark_errs):
        read(startingOffsets='{"t": {"0": 0}}', endingOffsets='{"t": {"0": -2}}')


def test_batch_starting_offsets_by_timestamp(spark, broker):
    """Timestamp seek: each partition starts at the first offset whose
    record timestamp is >= the requested epoch-ms (ListOffsets v1
    carries the timestamp through client AND stub broker)."""
    _produce_at(broker, "ts", [b"a0", b"a1"], 1000)   # offsets 0-1
    _produce_at(broker, "ts", [b"b0"], 2000)          # offset 2
    _produce_at(broker, "ts", [b"c0"], 3000)          # offset 3

    def read(**opts):
        r = (
            spark.read.format("kafka_wire")
            .option("host", "127.0.0.1")
            .option("port", broker.port)
            .option("topic", "ts")
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return sorted(r.load().select("offset").toPandas()["offset"])

    assert read(startingOffsetsByTimestamp='{"ts": {"0": 1500}}') == [2, 3]
    assert read(startingOffsetsByTimestamp='{"ts": {"0": 2000}}') == [2, 3]  # boundary inclusive
    assert read(startingOffsetsByTimestamp='{"ts": {"0": 500}}') == [0, 1, 2, 3]
    # beyond the log: the default strategy errors, 'latest' starts empty
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException, PythonException

    with pytest.raises((AnalysisException, PythonException, Py4JJavaError)):
        read(startingOffsetsByTimestamp='{"ts": {"0": 9999}}')
    assert read(
        startingOffsetsByTimestamp='{"ts": {"0": 9999}}',
        startingOffsetsByTimestampStrategy="latest",
    ) == []


def test_stream_initial_offset_honors_timestamp_and_json(broker):
    """The streaming reader's initialOffset resolves the same option
    surface (unit-level — the checkpoint resume mechanics are covered
    by test_stream_consumes_and_resumes_exactly_once)."""
    from etl_rust_spark.sources.kafka_source import (
        _KafkaStreamReader,
        _Opts,
    )

    _produce_at(broker, "s", [b"x0", b"x1"], 1000)
    _produce_at(broker, "s", [b"x2"], 2000)
    base = {"host": "127.0.0.1", "port": str(broker.port), "topic": "s"}
    r = _KafkaStreamReader(_Opts({**base,
        "startingoffsetsbytimestamp": '{"s": {"0": 1500}}'}))
    assert r.initialOffset() == {"0": 2}
    r2 = _KafkaStreamReader(_Opts({**base,
        "startingoffsets": '{"s": {"0": 1}}'}))
    assert r2.initialOffset() == {"0": 1}


def test_sasl_source_and_sink_end_to_end(spark):
    """r9: sasl.* options flow through BOTH DataSource directions —
    executor-side write clients authenticate (SCRAM here), the read
    side authenticates for metadata/offsets AND record fetch, and
    wrong credentials fail the job instead of silently reading empty."""
    from tests.test_kafka_wire import KafkaStubBroker

    b = KafkaStubBroker(users={"svc": "pw"})
    try:
        opts = {
            "host": "127.0.0.1", "port": b.port, "topic": "auth",
            "sasl.mechanism": "SCRAM-SHA-256",
            "sasl.username": "svc", "sasl.password": "pw",
        }
        w = spark.range(0, 5).selectExpr("concat('r', id) AS value").write
        w = w.format("kafka_wire").mode("append")
        for k, v in opts.items():
            w = w.option(k, v)
        w.save()
        r = spark.read.format("kafka_wire")
        for k, v in opts.items():
            r = r.option(k, v)
        got = sorted(bytes(x.value) for x in r.load().collect())
        assert got == [f"r{i}".encode() for i in range(5)]
        # wrong password: loud failure on read
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import AnalysisException, PythonException

        bad = spark.read.format("kafka_wire")
        for k, v in {**opts, "sasl.password": "nope"}.items():
            bad = bad.option(k, v)
        with pytest.raises((AnalysisException, PythonException, Py4JJavaError)):
            bad.load().collect()
    finally:
        b.close()
