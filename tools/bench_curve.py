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
    """10× each scaled table as key-shifted copies — with the copies made
    MUTUALLY DISSIMILAR where the operator semantics demand it (r6):

    - **events**: each copy's timestamps shift by k × (span + 1 h).  Real
      event data grows in TIME, not density; identical-overlapping copies
      made every unkeyed temporal join's output grow 100× per 10× input
      (result-cardinality explosion, not engine cost) and flagged
      op_temporal_join as spuriously super-linear.
    - **documents**: each copy maps vowels through a per-copy character
      block (``translate``) — a per-copy bijection, so WITHIN-copy
      dedup/near-dup structure is preserved exactly while no shingle
      matches across copies.  Identical copies gave every doc 9 exact
      twins: LSH bucket membership, candidate pairs, and verified output
      all exploded quadratically — again data, not engine.
    - **embeddings**: each copy circularly rotates the vector by 6k
      dims — norm- and distribution-preserving, within-copy geometry
      identical, cross-copy cosines decorrelated.
    """
    from pyspark.sql import functions as F

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name in SHARED_TABLES:
        df = spark.read.parquet(f"{base_dir}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, keys in SCALED_TABLES.items():
        df = spark.read.parquet(f"{base_dir}/{name}.parquet")
        span_us = None
        if name == "events":
            if dict(df.dtypes).get("ts") == "bigint":
                # nanosAsLong reads the source's TIMESTAMP(NANOS) as raw
                # nanos; write sf1 with a real micros timestamp so BOTH
                # engines read it natively (DuckDB has no nanosAsLong).
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            # cast: the raw column may read as TIMESTAMP_NTZ; the session
            # is UTC so the cast is an identity reinterpretation.
            ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
            lo, hi = df.agg(F.min(ts_us), F.max(ts_us)).collect()[0]
            span_us = (hi - lo) + 3_600_000_000  # +1 h gap between copies
        parts = []
        for k in range(copies):
            part = df
            for col in keys:
                dt = dict(df.dtypes)[col]
                part = part.withColumn(
                    col, (F.col(col) + F.lit(k * KEY_SHIFT)).cast(dt)
                )
            if name == "events" and k > 0:
                part = part.withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.unix_micros(F.col("ts").cast("timestamp")) + k * span_us
                    ),
                )
            if name == "documents" and k > 0:
                # per-copy vowel substitution into a disjoint Greek block
                targets = "".join(chr(0x3B1 + 5 * k + j) for j in range(5))
                part = part.withColumn("text", F.translate("text", "aeiou", targets))
            if name == "embeddings" and k > 0:
                shift = (6 * k) % 64
                part = part.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {shift + 1}, {64 - shift}), "
                        f"slice(embedding, 1, {shift}))"
                    ),
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


# Which table's row count drives each operator entry's data-dependent
# cost (for the marginal-µs/row normalization).  Entries with a doc-id
# cap (text_profile's 100-doc scoring slice, cosine_topk's 20 queries)
# still have full-corpus stages (LM training, corpus side of the join),
# so the driving table is the full one.
OP_DRIVER_TABLE = {
    "op_dedup_exact": "documents",
    "op_text_profile": "documents",
    "op_near_dup_pairs": "documents",
    "op_curate": "documents",
    "op_multimodal_features": "documents",
    "op_cosine_topk": "embeddings",
    "op_ann_topk": "embeddings",
    "op_temporal_join": "events",
    "op_rollup": "events",
    "op_time_windows": "events",
}


def run_op_suite(spark, sf_dir: str, entries) -> dict[str, float]:
    """Time the 10 operator entries (Spark side).  The DuckDB oracle
    forms are correctness mirrors (deliberately naive spec shapes, e.g.
    the correlated as-of subquery), not performance baselines — so the
    op curve is Spark-only by design (VERDICT r5 #1 asks how OUR
    entries scale)."""
    from etl_rust_spark.catalog import register_views
    from etl_rust_spark.operators.dedup import release_caches

    register_views(spark, sf_dir, force=True)
    times = {}
    for name, fn in sorted(entries.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)
        release_caches()
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sf1", action="store_true")
    ap.add_argument("--ops-only", action="store_true")
    ap.add_argument(
        "--sf3",
        action="store_true",
        help="add a 30x tier for the dispatch-floor entries (VERDICT r6 "
        "#8): op_dedup_exact / op_multimodal_features / op_text_profile "
        "show flat-or-negative marginals into sf1 because their sf1 "
        "cells are still dominated by fixed costs — one more 3x step "
        "makes the flat-marginal claim load-bearing",
    )
    ap.add_argument(
        "--sf9",
        action="store_true",
        help="add a 90x tier for the same floor entries: once sf3 has "
        "surfaced the real per-row cost, the sf3->sf9 marginal vs the "
        "sf1->sf3 one decides flat vs super-linear AT that cost",
    )
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

    from etl_rust_spark.operators import entry_queries as _op_queries
    from etl_rust_spark.streaming import entry_queries as _stream_queries

    op_entries = {**_op_queries(), **_stream_queries()}

    # Warm both engines' fixed costs once (collation, codegen, workers)
    register_views(spark, scales[0][1], force=True)
    spark.sql("SELECT count(*), max(upper(l_returnflag)) FROM lineitem").collect()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").count()
    run_spark_suite(spark, scales[0][1], DECLARED)
    run_op_suite(spark, scales[0][1], op_entries)

    prior = {}
    curve_path = REPO / "SCALE_CURVE.json"
    if args.ops_only and curve_path.exists():
        prior = json.loads(curve_path.read_text())

    result = {"queries": len(DECLARED), "op_entries": len(op_entries), "scales": {}}
    for label, sf_dir in scales:
        if args.ops_only and label in prior.get("scales", {}):
            result["scales"][label] = prior["scales"][label]
        else:
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
        ops = run_op_suite(spark, sf_dir, op_entries)
        drivers = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            for t in sorted(set(OP_DRIVER_TABLE.values()))
        }
        result["scales"][label]["ops"] = ops
        result["scales"][label]["ops_total"] = round(sum(ops.values()), 3)
        result["scales"][label]["driver_rows"] = drivers
        print(
            f"{label}: spark-dq {result['scales'][label]['spark_total']}s  "
            f"duck-dq {result['scales'][label]['duck_total']}s  "
            f"ops {result['scales'][label]['ops_total']}s  "
            f"(docs {drivers['documents']}, emb {drivers['embeddings']}, "
            f"events {drivers['events']})",
            file=sys.stderr,
        )

    floor_tiers = [("sf3", 30)] * args.sf3 + [("sf9", 90)] * args.sf9
    for tier_label, copies in floor_tiers:
        tier_dir = str(REPO / ".bench_scale" / tier_label)
        if not Path(tier_dir, "documents.parquet").exists():
            print(f"synthesizing {tier_label} ({copies}x sf0.1) ...", file=sys.stderr)
            synthesize_sf1(spark, "/root/testdata/sf0.1", tier_dir, copies=copies)
        floor_entries = {
            k: op_entries[k]
            for k in (
                "op_dedup_exact",
                "op_multimodal_features",
                "op_text_profile",
            )
        }
        opsN = run_op_suite(spark, tier_dir, floor_entries)
        driversN = {
            t: spark.read.parquet(f"{tier_dir}/{t}.parquet").count()
            for t in sorted(set(OP_DRIVER_TABLE.values()))
        }
        result["scales"][tier_label] = {
            "lineitem_rows": spark.read.parquet(
                f"{tier_dir}/lineitem.parquet"
            ).count(),
            "ops": opsN,
            "ops_total": round(sum(opsN.values()), 3),
            "driver_rows": driversN,
            "ops_note": "dispatch-floor entries only (VERDICT r6 #8): "
            "the 3 entries whose sf1 marginals were still fixed-cost-"
            f"dominated, re-measured at {copies}x sf0.1 documents",
        }
        print(
            f"{tier_label}: ops {result['scales'][tier_label]['ops_total']}s "
            f"(docs {driversN['documents']})",
            file=sys.stderr,
        )

    (REPO / "SCALE_CURVE.json").write_text(json.dumps(result, indent=1))

    # Markdown summary
    print("\n| scale | lineitem rows | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|---|")
    # dq table covers only scales where the dq suites ran (sf3 is ops-only)
    labels = [l for l in result["scales"] if "spark_total" in result["scales"][l]]
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

    # Per-op-entry marginal table: µs per driving-table row over each
    # 10× step, plus a super-linearity flag (marginal µs/row on the last
    # step vs the previous step — linear scaling keeps it ~flat).
    op_labels = [l for l in result["scales"] if "ops" in result["scales"][l]]
    if len(op_labels) >= 3:
        print(
            "\n| entry | driver |"
            + "".join(f" {l} (s) |" for l in op_labels)
            + " µs/row step-2 | µs/row last | verdict |"
        )
        print("|---|---|" + "---|" * (len(op_labels) + 3))
        for name in sorted(OP_DRIVER_TABLE):
            tbl = OP_DRIVER_TABLE[name]
            # per-entry: only the scales where this entry was measured
            # (the sf3 tier runs just the dispatch-floor entries)
            mine = [l for l in op_labels if name in result["scales"][l]["ops"]]
            ts = [result["scales"][l]["ops"][name] for l in mine]
            rows = [result["scales"][l]["driver_rows"][tbl] for l in mine]
            margs = []
            for i in (len(mine) - 2, len(mine) - 1):
                dt = ts[i] - ts[i - 1]
                dr = rows[i] - rows[i - 1]
                margs.append(dt / dr * 1e6 if dr else float("nan"))
            # Floor-aware verdict: a marginal under NOISE_FLOOR µs/row
            # means that step was still fixed-cost-dominated (the whole
            # reason the sf3/sf9 tiers exist) — the first real marginal
            # after a floor step is the per-row cost EMERGING, not
            # super-linearity.  Only a real-to-real rise flags.
            NOISE_FLOOR = 1.5
            if margs[0] <= NOISE_FLOOR < margs[1]:
                verdict = "real cost emerges (floor step before)"
            elif margs[0] > NOISE_FLOOR and margs[1] > 2.5 * margs[0]:
                verdict = "SUPER-LINEAR"
            else:
                verdict = "ok"
            cells = {l: result["scales"][l]["ops"].get(name) for l in op_labels}
            print(
                f"| {name} | {tbl} |"
                + "".join(
                    f" {cells[l] if cells[l] is not None else '—'} |"
                    for l in op_labels
                )
                + f" {margs[0]:.1f} | {margs[1]:.1f} | {verdict} |"
            )


if __name__ == "__main__":
    main()
