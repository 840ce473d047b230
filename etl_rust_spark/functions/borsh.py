"""Borsh (de)serialization for binary payload columns.

The reference declares ``borsh = "0.10.3"`` (/root/reference/
Cargo.toml:31-33) for chain-config account/instruction payload decoding
(no in-tree call sites — the chain configs that use it live out of
repo).  SURVEY §2 maps it to "pandas UDF only if ever needed"; this is
that seam, made real: a schema-driven decoder/encoder for the public
Borsh spec (https://borsh.io — little-endian fixed-width ints,
u32-length-prefixed strings/vecs, option tag byte, structs as field
concatenation, no padding).

Spark-first shape: the decode runs as an Arrow-batched ``mapInPandas``
over the binary column — pure-Python per row, but only on the decoded
struct's rows; the payload bytes never enter a shuffle (decode projects
the struct out, then you drop the binary column before any wide op),
mirroring the multimodal convention (operators/multimodal.py).

Schema spec mini-language (python literals, no classes to construct):

    ("u8"|"u16"|"u32"|"u64"|"u128"|"i8"|..."i128"|"f32"|"f64"|"bool"
     |"string"|"bytes")                      scalar
    {"option": SPEC}                         Option<T>  (1-byte tag)
    {"vec": SPEC}                            Vec<T>     (u32 count)
    {"array": (SPEC, N)}                     [T; N]     (no prefix)
    {"struct": [(name, SPEC), ...]}          struct     (field order)

``bytes`` is Vec<u8> fast-pathed; 16-byte u128/i128 decode to Python int
→ Spark DecimalType(38,0).
"""

from __future__ import annotations

import struct as _struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["borsh_decode", "borsh_decode_bytes", "borsh_encode_bytes", "spark_type"]

_FIXED = {
    "u8": ("<B", 1), "u16": ("<H", 2), "u32": ("<I", 4), "u64": ("<Q", 8),
    "i8": ("<b", 1), "i16": ("<h", 2), "i32": ("<i", 4), "i64": ("<q", 8),
    "f32": ("<f", 4), "f64": ("<d", 8),
}

_SPARK = {
    "u8": T.IntegerType(), "u16": T.IntegerType(), "u32": T.LongType(),
    "u64": T.DecimalType(20, 0), "u128": T.DecimalType(38, 0),
    "i8": T.IntegerType(), "i16": T.IntegerType(), "i32": T.IntegerType(),
    "i64": T.LongType(), "i128": T.DecimalType(38, 0),
    "f32": T.FloatType(), "f64": T.DoubleType(),
    "bool": T.BooleanType(), "string": T.StringType(), "bytes": T.BinaryType(),
}


def spark_type(spec: Any) -> T.DataType:
    """Spark type for a borsh spec (u64/u128 widen to Decimal — unsigned)."""
    if isinstance(spec, str):
        return _SPARK[spec]
    if "option" in spec:
        return spark_type(spec["option"])
    if "vec" in spec:
        return T.ArrayType(spark_type(spec["vec"]))
    if "array" in spec:
        inner, _n = spec["array"]
        return T.ArrayType(spark_type(inner))
    if "struct" in spec:
        return T.StructType(
            [T.StructField(n, spark_type(s)) for n, s in spec["struct"]]
        )
    raise ValueError(f"bad borsh spec: {spec!r}")


def _decode(buf: memoryview, off: int, spec: Any) -> tuple[Any, int]:
    if isinstance(spec, str):
        if spec in _FIXED:
            fmt, n = _FIXED[spec]
            return _struct.unpack_from(fmt, buf, off)[0], off + n
        if spec == "u128":
            return int.from_bytes(buf[off : off + 16], "little"), off + 16
        if spec == "i128":
            return (
                int.from_bytes(buf[off : off + 16], "little", signed=True),
                off + 16,
            )
        if spec == "bool":
            return buf[off] != 0, off + 1
        if spec == "string":
            n = _struct.unpack_from("<I", buf, off)[0]
            off += 4
            return bytes(buf[off : off + n]).decode("utf-8"), off + n
        if spec == "bytes":
            n = _struct.unpack_from("<I", buf, off)[0]
            off += 4
            return bytes(buf[off : off + n]), off + n
        raise ValueError(f"bad borsh spec: {spec!r}")
    if "option" in spec:
        tag = buf[off]
        off += 1
        if tag == 0:
            return None, off
        return _decode(buf, off, spec["option"])
    if "vec" in spec:
        n = _struct.unpack_from("<I", buf, off)[0]
        off += 4
        out = []
        for _ in range(n):
            v, off = _decode(buf, off, spec["vec"])
            out.append(v)
        return out, off
    if "array" in spec:
        inner, n = spec["array"]
        out = []
        for _ in range(n):
            v, off = _decode(buf, off, inner)
            out.append(v)
        return out, off
    if "struct" in spec:
        rec = {}
        for name, s in spec["struct"]:
            rec[name], off = _decode(buf, off, s)
        return rec, off
    raise ValueError(f"bad borsh spec: {spec!r}")


def borsh_decode_bytes(data: bytes, spec: Any) -> Any:
    """Decode one borsh buffer; raises on trailing bytes (strict spec)."""
    v, off = _decode(memoryview(data), 0, spec)
    if off != len(data):
        raise ValueError(f"trailing bytes: consumed {off} of {len(data)}")
    return v


def borsh_encode_bytes(value: Any, spec: Any) -> bytes:
    """Mirror encoder (tests + producing fixtures)."""
    if isinstance(spec, str):
        if spec in _FIXED:
            return _struct.pack(_FIXED[spec][0], value)
        if spec == "u128":
            return int(value).to_bytes(16, "little")
        if spec == "i128":
            return int(value).to_bytes(16, "little", signed=True)
        if spec == "bool":
            return b"\x01" if value else b"\x00"
        if spec == "string":
            raw = value.encode("utf-8")
            return _struct.pack("<I", len(raw)) + raw
        if spec == "bytes":
            return _struct.pack("<I", len(value)) + bytes(value)
        raise ValueError(f"bad borsh spec: {spec!r}")
    if "option" in spec:
        if value is None:
            return b"\x00"
        return b"\x01" + borsh_encode_bytes(value, spec["option"])
    if "vec" in spec:
        return _struct.pack("<I", len(value)) + b"".join(
            borsh_encode_bytes(v, spec["vec"]) for v in value
        )
    if "array" in spec:
        inner, n = spec["array"]
        assert len(value) == n, f"array len {len(value)} != {n}"
        return b"".join(borsh_encode_bytes(v, inner) for v in value)
    if "struct" in spec:
        return b"".join(borsh_encode_bytes(value[k], s) for k, s in spec["struct"])
    raise ValueError(f"bad borsh spec: {spec!r}")


def _to_row(v: Any, spec: Any) -> Any:
    """Python value → Spark row value (dict structs → tuples, ints →
    Decimal handled by Arrow; u64/u128 pass as int)."""
    if v is None:
        return None
    if isinstance(spec, str):
        return v
    if "option" in spec:
        return _to_row(v, spec["option"])
    if "vec" in spec:
        return [_to_row(x, spec["vec"]) for x in v]
    if "array" in spec:
        return [_to_row(x, spec["array"][0]) for x in v]
    if "struct" in spec:
        return {k: _to_row(v[k], s) for k, s in spec["struct"]}
    raise ValueError(f"bad borsh spec: {spec!r}")


def borsh_decode(
    df: DataFrame,
    col: str,
    spec: Any,
    out_col: str = "decoded",
    strict: bool = True,
) -> DataFrame:
    """Decode a binary borsh column into a typed struct column.

    Arrow-batched ``mapInPandas``; rows that fail to decode get NULL
    when ``strict=False`` (else the task fails loudly).  Drop ``col``
    afterwards before any shuffle — payload bytes should never ride a
    wide operator (multimodal convention).
    """
    import pandas as pd

    out_field = T.StructField(out_col, spark_type(spec))
    schema = T.StructType(list(df.schema.fields) + [out_field])
    names = [f.name for f in df.schema.fields]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = []
            for raw in pdf[col]:
                if raw is None:
                    decoded.append(None)
                    continue
                try:
                    decoded.append(_to_row(borsh_decode_bytes(bytes(raw), spec), spec))
                except Exception:
                    if strict:
                        raise
                    decoded.append(None)
            out = pdf[names].copy()
            out[out_col] = decoded
            yield out

    return df.mapInPandas(mapper, schema)


def decoded_field(out_col: str, path: str):  # convenience projector
    return F.col(f"{out_col}.{path}")
