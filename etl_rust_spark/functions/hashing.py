"""Canonical result hashing for oracle differential testing.

Convention (SURVEY.md §5.3, validated against DuckDB 1.0.0):
- columns sorted by name (the driver's compare does the same),
- float/Decimal → ``repr(round(v, 6))`` (queries already ROUND in SQL),
- timestamp → ``"%Y-%m-%d %H:%M:%S.%f"`` in UTC, date → ISO,
- bool → lowercase, None → ``"<NULL>"``, else ``str(v)``,
- rows sorted lexicographically (order-insensitive), then sha256 over
  the joined tuples.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from decimal import Decimal
from typing import Any, Iterable, Sequence

__all__ = ["canonical_value", "canonical_rows", "canonical_hash"]


def canonical_value(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        # Type-aware, like the driver's gate: a DECIMAL result is NOT the
        # same wire type as a DOUBLE even when values are equal (r2 dq04:
        # Spark DECIMAL(24,2) '52771.00' vs DuckDB DOUBLE 52771.0 hashed
        # differently on the driver while this function folded both to
        # float and passed locally).  Keep decimals textual and prefixed
        # so Decimal-vs-float always discriminates.
        return "dec:" + str(v)
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canonical_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(rows: Iterable[Sequence[Any]], columns: Sequence[str]) -> list[tuple[str, ...]]:
    """Canonicalize rows with columns re-ordered by sorted column name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canonical_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def canonical_hash(rows: Iterable[Sequence[Any]], columns: Sequence[str]) -> str:
    h = hashlib.sha256()
    for row in canonical_rows(rows, columns):
        h.update("\x1f".join(row).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()
