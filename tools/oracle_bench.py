#!/usr/bin/env python
"""Time the DuckDB oracle for every gated entry — the baseline bench.py
is compared against (BASELINE.md).

Runs each oracle_sql() statement sequentially in one DuckDB process over
$SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line mirroring
bench.py's shape.  DuckDB parallelizes internally per query; that is its
honest sequential-total posture (bench.py docstring).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, str(Path(REPO) / "tests"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from oracle import duck_connect

    con = duck_connect(sf_dir)
    times: dict[str, float] = {}
    for name, sql in sorted(e.oracle_sql().items()):
        t = time.perf_counter()
        con.execute(sql).fetch_arrow_table()
        times[name] = round(time.perf_counter() - t, 4)
    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_sequential_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
                "n_queries": len(times),
                "dq_sec": round(
                    sum(v for k, v in times.items() if k.startswith("dq")), 3
                ),
                "ops_sec": round(
                    sum(v for k, v in times.items() if k.startswith("op")), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
