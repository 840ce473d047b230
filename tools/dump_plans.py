#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for every gated entry to a directory.

Usage: python tools/dump_plans.py <out_dir> [suffix] [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` (suffix default "before") for
each declared entry at $SPARK_GRAFT_SF_DIR (default sf0.1).  The plan is
captured WITHOUT executing the query (explain is plan-only), so these
are the shapes the optimizer commits to before AQE reshaping.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    out_dir = Path(args[0]) if args else Path(REPO) / "plans" / "r12"
    suffix = args[1] if len(args) > 1 else "before"
    only = set(args[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as e

    from etl_rust_spark import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    runners = e.queries()
    for name in sorted(only or runners):
        try:
            df = runners[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR {type(ex).__name__}: {ex}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
