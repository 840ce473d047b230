#!/usr/bin/env python
"""50-entry oracle hash sweep — the local mirror of the driver's
CORRECTNESS gate (verify skill: "loop e.queries() vs e.oracle_sql()
with tests/oracle.run_duck + functions.hashing.canonical_hash").

Usage: python tools/hash_sweep.py [sf_dir] [name ...]

Runs every declared entry (or just the named ones) through BOTH the
engine and the DuckDB oracle at ``sf_dir`` (default sf0.01), compares
canonical hashes, and prints one status line per entry plus a summary.
Exit code 1 on any mismatch.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, str(Path(REPO) / "tests"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from oracle import duck_connect, run_duck

    from etl_rust_spark import get_spark
    from etl_rust_spark.functions.hashing import canonical_hash

    spark = get_spark(app_name="hash-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    runners = e.queries()
    oracles = e.oracle_sql()
    con = duck_connect(sf_dir)

    bad = []
    names = sorted(only or runners)
    for name in names:
        try:
            df = runners[name](spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            s_cols = list(df.columns)
            d_rows, d_cols = run_duck(con, oracles[name])
            sh = canonical_hash(s_rows, s_cols)
            dh = canonical_hash(d_rows, d_cols)
            ok = sh == dh and len(s_rows) == len(d_rows)
            status = "ok  " if ok else "FAIL"
            print(f"{status} {name}  spark_rows={len(s_rows)} duck_rows={len(d_rows)}"
                  + ("" if ok else f"  spark={sh[:12]} duck={dh[:12]}"))
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            print(f"ERR  {name}  {type(ex).__name__}: {ex}")
            bad.append(name)
    print(f"== {len(names) - len(bad)}/{len(names)} ok at {sf_dir}"
          + (f"  FAILED: {sorted(bad)}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
