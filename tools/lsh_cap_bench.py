#!/usr/bin/env python
"""Hot-bucket cap micro-bench: old (slice AFTER collect_list) vs new
(row_number ≤ cap ⇒ map-side WindowGroupLimit BEFORE the exchange) —
isolated to the banding stage of ``minhash_lsh_pairs`` (r12 wave 4).

Plants a degenerate bucket: N_HOT docs share one text (all band keys
collide), N_COLD docs are distinct.  Both arms read the SAME persisted
hashed-shingle frame, so the Python kernel cost is excluded; the timed
region is melt → cap → bucket → pair-candidates.  The candidate SETS are
asserted identical first (the cap keeps the max_bucket smallest ids per
(band, key) either way), so the arms differ only in WHERE the cap
executes: the old form materializes the whole hot bucket in one
reducer's aggregation state (unbounded — the guide §2.5 hazard); the
new form caps per map task, bounding both shuffle skew and state.

Usage: python tools/lsh_cap_bench.py [n_hot]   (default 200_000)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_rust_spark import get_spark
    from etl_rust_spark.operators import dedup
    from etl_rust_spark.operators.dedup import _melted_bands

    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cold = 50_000
    cap = 256

    spark = get_spark(app_name="lsh-cap-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(0, n_hot + n_cold, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit("empty boilerplate page nothing here"))
        .otherwise(
            F.concat(F.lit("unique document body token "), F.col("id").cast("string"))
        )
        .alias("text"),
    )
    hs_all = (
        dedup.with_shingles(docs.select("doc_id", "text"), "text", 3)
        .select(F.col("doc_id"), dedup._hashed_shingles().alias("hs"))
        .persist()
    )
    hs_all.count()  # materialize the kernel once, outside the timed region

    def cand_of(buckets):
        return (
            buckets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(sequence(1, size(ids) - 1), i -> "
                        "transform(slice(ids, i + 1, size(ids) - i), x -> "
                        "struct(element_at(ids, i) AS qid, x AS cid))))"
                    )
                ).alias("p")
            )
            .select("p.qid", "p.cid")
            .distinct()
        )

    def old_arm():
        melted = _melted_bands(hs_all, "doc_id", 4)
        buckets = (
            melted.groupBy("band", "key")
            .agg(
                F.slice(
                    F.sort_array(F.collect_list(F.col("doc_id"))), 1, cap
                ).alias("ids")
            )
            .filter(F.size("ids") > 1)
        )
        return cand_of(buckets)

    def new_arm():
        melted = _melted_bands(hs_all, "doc_id", 4)
        w_cap = Window.partitionBy("band", "key").orderBy(F.col("doc_id"))
        capped = (
            melted.withColumn("__rn", F.row_number().over(w_cap))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
        buckets = (
            capped.groupBy("band", "key")
            .agg(F.sort_array(F.collect_list(F.col("doc_id"))).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        return cand_of(buckets)

    def run(df) -> float:
        t = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t

    a = old_arm().orderBy("qid", "cid").collect()
    b = new_arm().orderBy("qid", "cid").collect()
    assert a == b, (len(a), len(b))
    print(f"candidate sets identical: {len(a)} pairs")

    run(old_arm())
    run(new_arm())
    old = [run(old_arm()) for _ in range(3)]
    new = [run(new_arm()) for _ in range(3)]
    print("old", [round(x, 2) for x in old], "best", round(min(old), 2))
    print("new", [round(x, 2) for x in new], "best", round(min(new), 2))


if __name__ == "__main__":
    main()
