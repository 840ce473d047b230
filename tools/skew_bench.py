#!/usr/bin/env python
"""Measured skew artifact (SCALE.md): salted vs plain aggregation/join on
the planted hot key at >= 10^7 instruction rows.

Data: an instructions-shaped frame with the synthetic chain's planted
power-law (~30% of rows on one hot program, remainder uniform over
n_programs), generated expression-side (no Python in the data path) —
same distribution the chain fixture plants (FIXTURES §4), scaled past
what the JSON pipeline can produce quickly.

What is measured (each timed twice, second run reported — steady state):
  agg_plain      groupBy(program).agg(count, sum)        (map-side combine)
  agg_salted     salted_agg same                          (2-stage)
  join_plain     instructions join dim(program) shuffle   (broadcast OFF,
                                                           AQE skew OFF)
  join_salted    salted_join same                         (same confs)
  join_aqe       plain join, AQE skew-join ON
Expectation worth writing down either way: algebraic aggregates are
already skew-immune (partial aggregation collapses the hot key per map
task BEFORE the shuffle), so salting should NOT win there — it exists
for the join case and for non-combinable aggregates.  The numbers decide.

Usage: python tools/skew_bench.py [rows]   (default 10_000_000)
Writes SKEW_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_programs = 5000

    from pyspark.sql import functions as F

    from etl_rust_spark import get_spark
    from etl_rust_spark.operators.skew import salted_agg, salted_join

    spark = get_spark(app_name="skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Planted ~30% hot key, like the chain fixture's instructions.program.
    ins = (
        spark.range(0, rows, 1, 32)
        .select(
            F.when(F.pmod(F.xxhash64("id"), 100) < 30, F.lit("prog_hot"))
            .otherwise(
                F.concat(F.lit("prog"), F.pmod(F.xxhash64("id", F.lit(1)), n_programs))
            )
            .alias("program"),
            F.pmod(F.xxhash64("id", F.lit(2)), 100_000).alias("lamports"),
            F.col("id").alias("instr_id"),
        )
        .persist()
    )
    ins.count()  # materialize once so generation cost is excluded
    dim = (
        ins.select("program")
        .distinct()
        .withColumn("program_tag", F.upper(F.col("program")))
        .persist()
    )
    dim.count()

    def timed(fn, n=2):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt  # keep the LAST run (steady state)
        return round(best, 3)

    results: dict[str, float] = {}

    results["agg_plain"] = timed(
        lambda: ins.groupBy("program")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("lamports").alias("s"))
        .count()
    )
    results["agg_salted"] = timed(
        lambda: salted_agg(
            ins, ["program"], {"n": ("count", "*"), "s": ("sum", "lamports")}
        ).count()
    )

    # Join case: force a shuffle join (no broadcast) to expose the skew.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["join_plain_noaqe_skew"] = timed(
        lambda: ins.join(dim, "program").count()
    )
    results["join_salted"] = timed(
        lambda: salted_join(ins, dim, "program", n_salts=16).count()
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["join_plain_aqe_skew"] = timed(lambda: ins.join(dim, "program").count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    results["join_broadcast"] = timed(lambda: ins.join(dim, "program").count())

    out = {"rows": rows, "n_programs": n_programs, "hot_share": 0.3, **results}
    (REPO / "SKEW_BENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
