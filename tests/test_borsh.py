"""Borsh decode/encode (reference dependency borsh 0.10.3,
Cargo.toml:31-33; public spec at borsh.io)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from etl_rust_spark.functions.borsh import (
    borsh_decode,
    borsh_decode_bytes,
    borsh_encode_bytes,
    spark_type,
)

ACCOUNT = {
    "struct": [
        ("lamports", "u64"),
        ("owner", {"array": ("u8", 4)}),  # 32 in Solana; 4 keeps goldens short
        ("executable", "bool"),
        ("label", {"option": "string"}),
        ("data", "bytes"),
    ]
}


def test_golden_bytes_hand_checked():
    """Byte-for-byte against the spec (LE ints, u32 prefixes, option tag)."""
    val = {
        "lamports": 5,
        "owner": [1, 2, 3, 4],
        "executable": True,
        "label": "ab",
        "data": b"\xff",
    }
    enc = borsh_encode_bytes(val, ACCOUNT)
    assert enc == (
        b"\x05\x00\x00\x00\x00\x00\x00\x00"  # u64 5
        b"\x01\x02\x03\x04"                  # [u8;4]
        b"\x01"                              # bool true
        b"\x01\x02\x00\x00\x00ab"            # Some + len 2 + "ab"
        b"\x01\x00\x00\x00\xff"              # len 1 + 0xff
    )
    assert borsh_decode_bytes(enc, ACCOUNT) == val


def test_none_option_and_roundtrip_nested():
    spec = {"struct": [("xs", {"vec": {"struct": [("a", "i32"), ("b", "f64")]}}),
                       ("tag", {"option": "u128"})]}
    val = {"xs": [{"a": -7, "b": 1.5}, {"a": 0, "b": -2.25}], "tag": None}
    assert borsh_decode_bytes(borsh_encode_bytes(val, spec), spec) == val
    val2 = {"xs": [], "tag": (1 << 100) + 3}
    assert borsh_decode_bytes(borsh_encode_bytes(val2, spec), spec) == val2


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError, match="trailing"):
        borsh_decode_bytes(b"\x01\x00", "u8")


def test_spark_types():
    t = spark_type(ACCOUNT)
    assert t["lamports"].dataType.simpleString() == "decimal(20,0)"
    assert t["owner"].dataType.simpleString() == "array<int>"
    assert t["label"].dataType.simpleString() == "string"


def test_borsh_decode_dataframe(spark):
    rows = [
        (i, borsh_encode_bytes(
            {"lamports": i * 10, "owner": [i, 0, 0, 1], "executable": i % 2 == 0,
             "label": None if i == 1 else f"acct{i}", "data": bytes([i] * i)},
            ACCOUNT,
        ))
        for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows, ["id", "payload"])
    out = borsh_decode(df, "payload", ACCOUNT, out_col="acct")
    got = {r["id"]: r for r in out.select("id", "acct.*").collect()}
    assert got[2]["lamports"] == Decimal(20)
    assert got[2]["executable"] is True and got[2]["label"] == "acct2"
    assert got[1]["label"] is None
    assert bytes(got[3]["data"]) == b"\x03\x03\x03"


def test_borsh_decode_null_and_corrupt(spark):
    good = borsh_encode_bytes(
        {"lamports": 1, "owner": [0, 0, 0, 0], "executable": False,
         "label": None, "data": b""},
        ACCOUNT,
    )
    df = spark.createDataFrame(
        [(1, good), (2, None), (3, b"\x00")], ["id", "payload"]
    )
    out = borsh_decode(df, "payload", ACCOUNT, out_col="acct", strict=False)
    got = {r["id"]: r["acct"] for r in out.collect()}
    assert got[1] is not None and got[2] is None and got[3] is None
