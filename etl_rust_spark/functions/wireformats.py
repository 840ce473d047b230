"""Pure-Python proto3 + Avro binary encoders (X-03 / X-04 without jars).

The reference's core output format is per-table Protocol-Buffers records
(README.md:3-5; per-table .proto compiled by build_proto.rs), with Avro
as the Pub/Sub alternative (src/example_config/avro_helpers.rs:1-23,
google_pubsub.rs:175-190).  Spark's `to_protobuf`/`to_avro` need the
spark-protobuf / spark-avro jars, absent in this container — these
encoders implement the two PUBLIC wire formats directly
(https://protobuf.dev/programming-guides/encoding/,
https://avro.apache.org/docs/1.11.1/specification/) so the encode path
is real, testable, and usable from any Python-only deployment.  The
jar-backed encoders in `etl.sinks` remain the preferred JVM path when
available; these are the portable fallback, exposed through the same
`payload`-column convention.

Specs are plain literals (no classes, picklable into executors):

proto3:  [(field_number, name, TYPE), ...] where TYPE is
         "int32"|"int64"|"uint32"|"uint64"|"sint32"|"sint64"|"bool"
         |"double"|"float"|"string"|"bytes"
         |("repeated", TYPE)                    packed for numeric,
                                                per-element for str/bytes
         |("message", SUBSPEC)                  nested message
Avro:    standard Avro schema dict (records, primitives,
         union ["null", T], arrays) — the JSON schema IS the spec.

Both encode None as "absent" (proto3 default-skip semantics; Avro
requires a ["null", T] union).
"""

from __future__ import annotations

import struct as _struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "proto_encode_bytes",
    "avro_encode_bytes",
    "avro_decode_bytes",
    "write_avro_container",
    "read_avro_container",
    "encode_protobuf_py",
    "encode_avro_py",
]


# ---------------------------------------------------------------------------
# proto3 wire format
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    if v < 0:  # int32/int64 negatives: two's-complement 64-bit, 10 bytes
        v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


_PROTO_SCALAR = {
    # type -> (wire_type, encoder)
    "int32": (0, _varint),
    "int64": (0, _varint),
    "uint32": (0, _varint),
    "uint64": (0, _varint),
    "sint32": (0, lambda v: _varint(_zigzag(v))),
    "sint64": (0, lambda v: _varint(_zigzag(v))),
    "bool": (0, lambda v: b"\x01" if v else b"\x00"),
    "double": (1, lambda v: _struct.pack("<d", v)),
    "float": (5, lambda v: _struct.pack("<f", v)),
    "string": (2, lambda v: _len_prefixed(str(v).encode("utf-8"))),
    "bytes": (2, lambda v: _len_prefixed(bytes(v))),
}


def _len_prefixed(raw: bytes) -> bytes:
    return _varint(len(raw)) + raw


def _tag(field_number: int, wire_type: int) -> bytes:
    return _varint(field_number << 3 | wire_type)


def proto_encode_bytes(record: dict, spec: list) -> bytes:
    """Encode ``record`` per ``spec`` into proto3 wire bytes.

    proto3 semantics: None fields are omitted (absent == default);
    repeated numeric fields are packed (one length-delimited run, the
    proto3 default); repeated string/bytes/message emit one tagged
    element each.
    """
    out = bytearray()
    for field_number, name, ftype in spec:
        v = record.get(name)
        if v is None:
            continue
        if isinstance(ftype, tuple) and ftype[0] == "repeated":
            inner = ftype[1]
            if not v:
                continue
            if isinstance(inner, tuple):  # repeated message
                for item in v:
                    out += _tag(field_number, 2)
                    out += _len_prefixed(proto_encode_bytes(item, inner[1]))
            elif inner in ("string", "bytes"):
                _, enc = _PROTO_SCALAR[inner]
                for item in v:
                    out += _tag(field_number, 2) + enc(item)
            else:  # packed numerics
                _, enc = _PROTO_SCALAR[inner]
                payload = b"".join(enc(item) for item in v)
                out += _tag(field_number, 2) + _len_prefixed(payload)
        elif isinstance(ftype, tuple) and ftype[0] == "message":
            out += _tag(field_number, 2)
            out += _len_prefixed(proto_encode_bytes(v, ftype[1]))
        else:
            wt, enc = _PROTO_SCALAR[ftype]
            out += _tag(field_number, wt) + enc(v)
    return bytes(out)


# ---------------------------------------------------------------------------
# Avro binary
# ---------------------------------------------------------------------------

def _avro_long(v: int) -> bytes:  # zigzag varint
    v = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avro_encode_bytes(value: Any, schema: Any) -> bytes:
    """Encode per the Avro 1.11 binary spec (no container file, just the
    datum — the shape the reference publishes per message,
    avro_helpers.rs:14-22)."""
    if isinstance(schema, str):
        s = schema
    elif isinstance(schema, dict):
        s = schema["type"]
    else:  # union
        assert isinstance(schema, list)
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _avro_long(i)
            if value is not None and bt != "null":
                return _avro_long(i) + avro_encode_bytes(value, branch)
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if s == "null":
        return b""
    if s == "boolean":
        return b"\x01" if value else b"\x00"
    if s in ("int", "long"):
        return _avro_long(int(value))
    if s == "float":
        return _struct.pack("<f", value)
    if s == "double":
        return _struct.pack("<d", value)
    if s == "string":
        raw = str(value).encode("utf-8")
        return _avro_long(len(raw)) + raw
    if s == "bytes":
        raw = bytes(value)
        return _avro_long(len(raw)) + raw
    if s == "array":
        items = schema["items"]
        if not value:
            return _avro_long(0)
        body = b"".join(avro_encode_bytes(v, items) for v in value)
        return _avro_long(len(value)) + body + _avro_long(0)
    if s == "record":
        return b"".join(
            avro_encode_bytes(value.get(f["name"]), f["type"])
            for f in schema["fields"]
        )
    if s == "map":
        if not value:
            return _avro_long(0)
        body = b"".join(
            avro_encode_bytes(k, "string") + avro_encode_bytes(v, schema["values"])
            for k, v in value.items()
        )
        return _avro_long(len(value)) + body + _avro_long(0)
    if s == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(raw)} != {schema['size']}")
        return raw
    if s == "enum":
        return _avro_long(schema["symbols"].index(value))
    raise ValueError(f"unsupported avro schema: {schema!r}")


def _read_avro_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # unzigzag


def avro_decode_bytes(buf: bytes, pos: int, schema: Any) -> tuple[Any, int]:
    """Inverse of :func:`avro_encode_bytes` (same supported subset);
    returns (value, next_pos)."""
    if isinstance(schema, list):  # union
        idx, pos = _read_avro_long(buf, pos)
        return avro_decode_bytes(buf, pos, schema[idx])
    s = schema if isinstance(schema, str) else schema["type"]
    if s == "null":
        return None, pos
    if s == "boolean":
        return buf[pos] == 1, pos + 1
    if s in ("int", "long"):
        return _read_avro_long(buf, pos)
    if s == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if s == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if s in ("string", "bytes"):
        n, pos = _read_avro_long(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if s == "string" else bytes(raw)), pos + n
    if s == "array":
        items = schema["items"]
        out = []
        while True:
            n, pos = _read_avro_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix (spec-permitted)
                _, pos = _read_avro_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = avro_decode_bytes(buf, pos, items)
                out.append(v)
        return out, pos
    if s == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = avro_decode_bytes(buf, pos, f["type"])
        return rec, pos
    if s == "map":  # block-encoded like array; keys are always strings
        values = schema["values"]
        out = {}
        while True:
            n, pos = _read_avro_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_avro_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = avro_decode_bytes(buf, pos, "string")
                out[k], pos = avro_decode_bytes(buf, pos, values)
        return out, pos
    if s == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if s == "enum":
        idx, pos = _read_avro_long(buf, pos)
        return schema["symbols"][idx], pos
    raise ValueError(f"unsupported avro schema: {schema!r}")


# ---------------------------------------------------------------------------
# Avro Object Container Files (the on-disk interchange format; spec §
# "Object Container Files").  Jar-free like the datum codecs above —
# the honest fallback when spark-avro's jar is absent; at real scale
# the jar reader (sync-marker split parallelism) is the tool.
# ---------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"


def write_avro_container(
    path: str, records: list, schema: dict, codec: str = "null",
    block_size: int = 1000,
) -> None:
    """Driver-side OCF writer (fixtures, goldens, small exports): header
    with avro.schema/avro.codec metadata, deterministic sync marker
    (md5 of the schema JSON — byte-stable runs), ``block_size`` records
    per block, ``null`` or ``deflate`` (raw RFC1951) codec."""
    import hashlib
    import json
    import zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sjson = json.dumps(schema, sort_keys=True).encode()
    sync = hashlib.md5(sjson).digest()
    meta = {"avro.schema": sjson, "avro.codec": codec.encode()}
    out = bytearray(_OCF_MAGIC)
    out += _avro_long(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _avro_long(len(kb)) + kb + _avro_long(len(v)) + v
    out += _avro_long(0)
    out += sync
    for i in range(0, len(records), block_size):
        chunk = records[i : i + block_size]
        body = b"".join(avro_encode_bytes(r, schema) for r in chunk)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            body = c.compress(body) + c.flush()
        out += _avro_long(len(chunk)) + _avro_long(len(body)) + body + sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_avro_container(data: bytes) -> tuple[dict, list]:
    """Parse one OCF byte string → (schema, records).  Validates magic
    and every block's sync marker; supports null/deflate codecs."""
    import json
    import zlib

    if data[:4] != _OCF_MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    n_meta, pos = _read_avro_long(data, pos)
    meta: dict[str, bytes] = {}
    while n_meta != 0:
        if n_meta < 0:  # block form
            _, pos = _read_avro_long(data, pos)
            n_meta = -n_meta
        for _ in range(n_meta):
            kl, pos = _read_avro_long(data, pos)
            k = data[pos : pos + kl].decode()
            pos += kl
            vl, pos = _read_avro_long(data, pos)
            meta[k] = bytes(data[pos : pos + vl])
            pos += vl
        n_meta, pos = _read_avro_long(data, pos)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = data[pos : pos + 16]
    pos += 16
    records = []
    while pos < len(data):
        n, pos = _read_avro_long(data, pos)
        size, pos = _read_avro_long(data, pos)
        body = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bp = 0
        for _ in range(n):
            rec, bp = avro_decode_bytes(body, bp, schema)
            records.append(rec)
    return schema, records


# ---------------------------------------------------------------------------
# DataFrame encoders (same `payload` convention as etl.sinks encoders)
# ---------------------------------------------------------------------------

def _mapper(encode_one):
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {"payload": [encode_one(rec) for rec in pdf.to_dict("records")]}
            )

    return gen


def encode_protobuf_py(df: DataFrame, spec: list) -> DataFrame:
    """All columns → proto3 wire bytes ``payload`` (X-03, jar-free).

    Arrow-batched mapInPandas; ``spec`` field names must exist in ``df``
    (extra df columns are ignored — proto schema is the contract).
    """
    out_schema = T.StructType([T.StructField("payload", T.BinaryType())])
    return df.mapInPandas(
        _mapper(lambda rec: proto_encode_bytes(rec, spec)), out_schema
    )


def encode_avro_py(df: DataFrame, schema: dict) -> DataFrame:
    """All columns → Avro binary ``payload`` (X-04, jar-free)."""
    out_schema = T.StructType([T.StructField("payload", T.BinaryType())])
    return df.mapInPandas(
        _mapper(lambda rec: avro_encode_bytes(rec, schema)), out_schema
    )
