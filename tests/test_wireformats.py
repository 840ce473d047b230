"""X-03/X-04 jar-free encoders: golden bytes hand-checked against the
public proto3 and Avro binary specs (protobuf.dev encoding guide;
Avro 1.11 spec).  These run in this container — the spark-protobuf /
spark-avro jar paths in etl.sinks stay skip-marked until jars appear."""

from __future__ import annotations

import json

import pytest

from etl_rust_spark.functions.wireformats import (
    avro_encode_bytes,
    encode_avro_py,
    encode_protobuf_py,
    proto_encode_bytes,
)

BLOCK_SPEC = [
    (1, "block_index", "int64"),
    (2, "blockhash", "string"),
    (3, "ok", "bool"),
    (4, "fees", ("repeated", "uint64")),
    (5, "delta", "sint64"),
    (6, "meta", ("message", [(1, "slot", "int64")])),
]


def test_proto_golden_bytes():
    rec = {
        "block_index": 150,
        "blockhash": "ab",
        "ok": True,
        "fees": [1, 300],
        "delta": -2,
        "meta": {"slot": 7},
    }
    enc = proto_encode_bytes(rec, BLOCK_SPEC)
    assert enc == (
        b"\x08\x96\x01"          # field 1 varint 150 (the protobuf.dev example)
        b"\x12\x02ab"            # field 2 LEN 2 "ab"
        b"\x18\x01"              # field 3 bool true
        b"\x22\x03\x01\xac\x02"  # field 4 packed [1, 300]
        b"\x28\x03"              # field 5 sint64 -2 -> zigzag 3
        b"\x32\x02\x08\x07"      # field 6 nested {slot: 7}
    )


def test_proto_negative_int64_is_10_bytes():
    enc = proto_encode_bytes({"v": -1}, [(1, "v", "int64")])
    assert enc == b"\x08" + b"\xff" * 9 + b"\x01"


def test_proto_none_and_empty_skipped():
    assert proto_encode_bytes({"v": None, "fees": []},
                              [(1, "v", "int64"), (2, "fees", ("repeated", "int64"))]) == b""


AVRO_SCHEMA = {
    "type": "record",
    "name": "Rec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "int"}},
    ],
}


def test_avro_golden_bytes():
    # long 1 -> 0x02; "a" -> 0x02 0x61; union branch 1 + "b";
    # array: count 2, items 3,4 (zigzag 6,8), terminator 0.
    enc = avro_encode_bytes({"id": 1, "s": "a", "tag": "b", "xs": [3, 4]}, AVRO_SCHEMA)
    assert enc == b"\x02\x02a\x02\x02b\x04\x06\x08\x00"


def test_avro_null_branch_and_negative_long():
    enc = avro_encode_bytes({"id": -1, "s": "", "tag": None, "xs": []}, AVRO_SCHEMA)
    assert enc == b"\x01\x00\x00\x00"  # zigzag(-1)=1, len 0, branch 0, empty array


def test_encode_protobuf_py_dataframe(spark):
    df = spark.createDataFrame([(150, "ab"), (7, "x")], ["block_index", "blockhash"])
    spec = BLOCK_SPEC[:2]
    rows = sorted(
        bytes(r["payload"]) for r in encode_protobuf_py(df, spec).collect()
    )
    assert b"\x08\x96\x01\x12\x02ab" in rows
    assert b"\x08\x07\x12\x01x" in rows


def test_encode_avro_py_dataframe(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    schema = {
        "type": "record", "name": "R",
        "fields": [{"name": "id", "type": "long"}, {"name": "s", "type": "string"}],
    }
    out = encode_avro_py(df, schema).collect()
    assert bytes(out[0]["payload"]) == b"\x02\x02a"


def test_proto_py_publishes_through_queue(spark, tmp_path):
    """Encoder output rides the publisher unchanged (payload convention)."""
    from etl_rust_spark.etl.sinks import DirQueueClient, publish_table

    df = spark.createDataFrame([(1,), (2,)], ["block_index"]).coalesce(1)
    publish_table(
        df,
        "blocks",
        lambda: DirQueueClient(str(tmp_path)),
        encoder=lambda d: encode_protobuf_py(d, [(1, "block_index", "int64")]),
    )
    files = list((tmp_path / "blocks").glob("*.jsonl"))
    assert files, "publisher wrote nothing"


def test_avro_decode_inverts_encode_edge_values():
    from etl_rust_spark.functions.wireformats import (
        avro_decode_bytes,
        avro_encode_bytes,
    )

    schema = {
        "type": "record",
        "name": "edge",
        "fields": [
            {"name": "big", "type": "long"},
            {"name": "neg", "type": "long"},
            {"name": "b", "type": "boolean"},
            {"name": "f", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "raw", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "opt", "type": ["null", "string"]},
        ],
    }
    rec = {
        "big": 2**62,
        "neg": -(2**62),
        "b": True,
        "f": -0.0,
        "s": "ünïcødé — text",
        "raw": b"\x00\xff\x80",
        "arr": [0, -1, 1, 2**40],
        "opt": None,
    }
    buf = avro_encode_bytes(rec, schema)
    out, pos = avro_decode_bytes(buf, 0, schema)
    assert pos == len(buf)
    assert out == rec


def test_avro_container_rejects_corruption(tmp_path):
    from etl_rust_spark.functions.wireformats import (
        read_avro_container,
        write_avro_container,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    p = str(tmp_path / "c.avro")
    write_avro_container(p, [{"x": i} for i in range(5)], schema)
    data = bytearray(open(p, "rb").read())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="magic"):
        read_avro_container(b"NOPE" + bytes(data[4:]))
    data[-3] ^= 0xFF  # flip a byte inside the trailing sync marker
    with _pytest.raises(ValueError, match="sync"):
        read_avro_container(bytes(data))


def test_avro_container_multi_block_deflate(tmp_path):
    from etl_rust_spark.functions.wireformats import (
        read_avro_container,
        write_avro_container,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    recs = [{"x": i} for i in range(2500)]
    p = str(tmp_path / "mb.avro")
    write_avro_container(p, recs, schema, codec="deflate", block_size=1000)
    got_schema, got = read_avro_container(open(p, "rb").read())
    assert got == recs and got_schema["name"] == "r"
