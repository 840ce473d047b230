"""Portable deterministic hashing shared by the LLM-data operators.

Both engines must compute bit-identical hashes for the oracle gate, so
everything derives from md5 (identical in Spark and DuckDB) reduced to a
60-bit positive integer:

- Spark : ``CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)``
- DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``

(15 hex digits = 60 bits, always positive, verified equal across engines.)

Scale note: md5 here is the *portability* hash for oracle-gated queries;
the operator library's fast path uses ``xxhash64`` (JVM intrinsic) where
cross-engine equality is not required — see ``dedup.py``.
"""

from __future__ import annotations

__all__ = [
    "SPARK_H",
    "DUCK_H",
    "MINHASH_P",
    "MINHASH_PERMS",
    "spark_h",
    "duck_h",
]

# 60-bit portable hash of an arbitrary string expression.
SPARK_H = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
DUCK_H = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

# MinHash universe: h'(s) = H(s) % P, permutation j: (a_j * h' + b_j) % P.
# a_j < 2^21 and h' < 2^30 keep every product < 2^51 — exact in BIGINT
# arithmetic in both engines (and even in doubles, though neither uses them).
MINHASH_P = 1_000_000_007
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (1299721, 7),
    (1299827, 13),
    (1300021, 31),
    (1300163, 127),
    (1300187, 8191),
    (1300201, 524287),
    (1300369, 2147483),
    (1300391, 97),
)


def spark_h(x: str) -> str:
    return SPARK_H.format(x=x)


def duck_h(x: str) -> str:
    return DUCK_H.format(x=x)
