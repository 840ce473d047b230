#!/usr/bin/env python
"""Scaling curve: declared-suite cost vs data size, Spark AND DuckDB.

Answers the round-1 verdict's question directly: is the bench gap a
per-query constant (which amortizes at scale) or a data-path deficit?
Method: run the 40 declared queries in both engines at sf0.001, sf0.01,
sf0.1 and a synthesized sf1 (10x sf0.1, key-shifted copies so joins and
group cardinalities scale honestly), then compare per-engine totals and
the MARGINAL cost of the last 10x data step.

The sf1 tables are derived on demand under .bench_scale/ (gitignored):
each copy k of a table shifts its entity keys (orderkey/custkey/...) by
k * 10^9 so copies never collide; region/nation are shared dimensions
and stay single (their keys are referenced unchanged).  Every query's
semantics scale the natural way: scans/aggs see 10x rows, joins see 10x
matches, per-key windows see the same per-key row counts at 10x keys.

Usage: python tools/bench_curve.py [--skip-sf1]
Writes SCALE_CURVE.json at the repo root and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

KEY_SHIFT = 10**9
# Per-table key columns shifted per copy; (col, shift_multiplier) pairs.
SCALED_TABLES: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_TABLES = ("region", "nation")


def synthesize_sf1(spark, base_dir: str, out_dir: str, copies: int = 10) -> None:
    from pyspark.sql import functions as F

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name in SHARED_TABLES:
        df = spark.read.parquet(f"{base_dir}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, keys in SCALED_TABLES.items():
        df = spark.read.parquet(f"{base_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanosAsLong reads the source's TIMESTAMP(NANOS) as raw
            # nanos; write sf1 with a real micros timestamp so BOTH
            # engines read it natively (DuckDB has no nanosAsLong).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        parts = []
        for k in range(copies):
            part = df
            for col in keys:
                dt = dict(df.dtypes)[col]
                part = part.withColumn(
                    col, (F.col(col) + F.lit(k * KEY_SHIFT)).cast(dt)
                )
            parts.append(part)
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        allp.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def run_spark_suite(spark, sf_dir: str, queries) -> dict[str, float]:
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir, force=True)
    times = {}
    for name, q in queries.items():
        t0 = time.perf_counter()
        df = spark.sql(q.spark_sql)
        try:
            df.toArrow()
        except Exception:
            df.collect()
        times[name] = round(time.perf_counter() - t0, 4)
    return times


def run_duck_suite(sf_dir: str, queries) -> dict[str, float]:
    import duckdb

    from etl_rust_spark.catalog import TABLES

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        # Spark writes directories of part files; the driver's testdata
        # is single files — glob accordingly.
        pattern = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
        )
    times = {}
    for name, q in queries.items():
        t0 = time.perf_counter()
        con.execute(q.oracle_sql).fetch_arrow_table()
        times[name] = round(time.perf_counter() - t0, 4)
    con.close()
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sf1", action="store_true")
    args = ap.parse_args()

    from etl_rust_spark import get_spark
    from etl_rust_spark.catalog import register_views
    from etl_rust_spark.queries import DECLARED

    spark = get_spark(app_name="bench-curve")
    spark.sparkContext.setLogLevel("ERROR")

    scales = [
        ("sf0.001", "/root/testdata/sf0.001"),
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
    ]
    if not args.skip_sf1:
        sf1_dir = str(REPO / ".bench_scale" / "sf1")
        if not Path(sf1_dir, "lineitem.parquet").exists():
            print("synthesizing sf1 (10x sf0.1) ...", file=sys.stderr)
            synthesize_sf1(spark, "/root/testdata/sf0.1", sf1_dir)
        scales.append(("sf1", sf1_dir))

    # Warm both engines' fixed costs once (collation, codegen, workers)
    register_views(spark, scales[0][1], force=True)
    spark.sql("SELECT count(*), max(upper(l_returnflag)) FROM lineitem").collect()
    run_spark_suite(spark, scales[0][1], DECLARED)

    result = {"queries": len(DECLARED), "scales": {}}
    for label, sf_dir in scales:
        sp = run_spark_suite(spark, sf_dir, DECLARED)
        du = run_duck_suite(sf_dir, DECLARED)
        rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        result["scales"][label] = {
            "lineitem_rows": rows,
            "spark_total": round(sum(sp.values()), 3),
            "duck_total": round(sum(du.values()), 3),
            "spark": sp,
            "duck": du,
        }
        print(
            f"{label}: spark {result['scales'][label]['spark_total']}s  "
            f"duck {result['scales'][label]['duck_total']}s  "
            f"(lineitem {rows} rows)",
            file=sys.stderr,
        )

    (REPO / "SCALE_CURVE.json").write_text(json.dumps(result, indent=1))

    # Markdown summary
    print("\n| scale | lineitem rows | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|---|")
    labels = list(result["scales"])
    for label in labels:
        s = result["scales"][label]
        print(
            f"| {label} | {s['lineitem_rows']:,} | {s['spark_total']} | "
            f"{s['duck_total']} | {round(s['spark_total']/max(s['duck_total'],1e-9),1)}x |"
        )
    if len(labels) >= 2:
        a, b = result["scales"][labels[-2]], result["scales"][labels[-1]]
        drows = b["lineitem_rows"] - a["lineitem_rows"]
        ds, dd = b["spark_total"] - a["spark_total"], b["duck_total"] - a["duck_total"]
        print(
            f"\nMarginal cost of the last 10x step ({labels[-2]}->{labels[-1]}, "
            f"+{drows:,} lineitem rows):\n"
            f"  spark  {ds:+.2f} s  ({ds/drows*1e6:.2f} us/row)\n"
            f"  duckdb {dd:+.2f} s  ({dd/drows*1e6:.2f} us/row)\n"
            f"  marginal ratio {ds/max(dd,1e-9):.2f}x"
        )


if __name__ == "__main__":
    main()
