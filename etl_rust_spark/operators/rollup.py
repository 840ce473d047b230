"""Hypertable-style time rollups: continuous aggregates with mergeable state.

The reference's one time-grouping is the GCS 30-minute bucket
(/root/reference/src/output/gcs.rs:105-115 → DQ-44); it maintains no
aggregates.  This module adds the time-series-database staple the brief
names (hypertable rollup): bucket raw events into a compact per-bucket
aggregate table, re-aggregate coarser levels FROM the rollup (never
rescanning raw), and maintain the rollup incrementally as new data
lands.

Mergeability is the design center.  A rollup row carries only state
that re-associates exactly under union:

- ``n`` (count) and ``v_c`` (integer-cents sum) — algebraic, merge by
  SUM;
- ``user_sketch`` — a DataSketches HLL binary (Spark's built-in
  ``hll_sketch_agg``), merge by ``hll_union_agg``; distinct-user counts
  at any coarser granularity come from ``hll_sketch_estimate`` without
  touching raw data.  (Exact COUNT DISTINCT is NOT mergeable — the
  one-shot ``time_rollup`` can attach it for gate-able exactness, but
  the persisted/incremental path lives on sketches, the standard
  tradeoff at 100 TB.)

Scale notes: the rollup is one map-side-combined shuffle on
(bucket, dims) — partial aggregation collapses each executor's rows to
its local bucket set before the exchange, so shuffle volume is bounded
by buckets × dims, not raw rows.  ``merge_rollup`` shuffles only rollup
rows (orders of magnitude smaller).  ``update_rollup`` rewrites ONLY
the date partitions the delta touches (dynamic partition overwrite —
the same idempotent-bucket pattern as etl/writer.py), so a late or
replayed batch re-lands byte-identically instead of double-counting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "time_bucket",
    "time_rollup",
    "merge_rollup",
    "write_rollup",
    "update_rollup",
    "read_rollup",
    "rollup_duck_sql",
]


def time_bucket(ts: str | Column, bucket_sec: int) -> Column:
    """Epoch-aligned bucket start (timestamp), floor-aligned so it is
    stable for pre-1970 timestamps too."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / bucket_sec).cast("long") * bucket_sec
    )


def time_rollup(
    df: DataFrame,
    ts: str = "ts",
    bucket_sec: int = 3600,
    dims: tuple[str, ...] = ("event_type",),
    value: str = "value",
    user: str = "user_id",
    exact_ndv: bool = False,
    sketch: bool = True,
) -> DataFrame:
    """One-shot rollup of raw events → (bs, dims..., n, v_c[, n_users][, user_sketch]).

    ``exact_ndv`` attaches an exact ``n_users`` (NOT mergeable — for
    gates and one-shot reports); ``sketch`` attaches the mergeable HLL
    binary the incremental path relies on.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col(value) * 100, 0).cast("long")).alias("v_c"),
    ]
    if exact_ndv:
        aggs.append(F.countDistinct(user).alias("n_users"))
    if sketch:
        aggs.append(F.hll_sketch_agg(user).alias("user_sketch"))
    return df.groupBy(time_bucket(ts, bucket_sec).alias("bs"), *dims).agg(*aggs)


def merge_rollup(
    rollup: DataFrame,
    bucket_sec: int,
    dims: tuple[str, ...] = ("event_type",),
    estimate: bool = True,
) -> DataFrame:
    """Re-aggregate a (finer) rollup to ``bucket_sec`` buckets — counters
    by SUM, sketches by ``hll_union_agg`` — without touching raw data.
    The target bucket must be a multiple of the source bucket (callers
    align, e.g. hour → day); misaligned merges would split source rows.

    ``estimate`` additionally materializes ``n_users_est`` from the
    merged sketch (the sketch column is kept either way, so further
    coarsening keeps merging).
    """
    has_sketch = "user_sketch" in rollup.columns
    aggs = [F.sum("n").alias("n"), F.sum("v_c").alias("v_c")]
    if has_sketch:
        aggs.append(F.hll_union_agg("user_sketch").alias("user_sketch"))
    out = rollup.groupBy(time_bucket("bs", bucket_sec).alias("bs"), *dims).agg(*aggs)
    if has_sketch and estimate:
        out = out.withColumn("n_users_est", F.hll_sketch_estimate("user_sketch"))
    return out


def _partitioned(rollup: DataFrame) -> DataFrame:
    return rollup.withColumn("b_date", F.to_date("bs"))


def write_rollup(rollup: DataFrame, path: str) -> None:
    """Initial materialization, partitioned by bucket date so incremental
    updates can overwrite only dirty partitions."""
    _partitioned(rollup).write.partitionBy("b_date").mode("overwrite").parquet(path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("b_date")


def update_rollup(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    ts: str = "ts",
    bucket_sec: int = 3600,
    dims: tuple[str, ...] = ("event_type",),
    value: str = "value",
    user: str = "user_id",
) -> None:
    """Incrementally fold a raw delta into a persisted rollup.

    Rolls up the delta, unions it with the EXISTING rollup rows of the
    touched date partitions only, re-merges state (SUM counters,
    ``hll_union_agg`` sketches), and dynamic-partition-overwrites just
    those dates.  Cost scales with the delta + its dirty partitions,
    never with rollup history.  Replaying the same delta twice is NOT
    idempotent (counters re-sum) — exactly-once delivery is the
    pipeline layer's job (S-08 checkpoints); rerunning a FAILED write
    is safe because the overwrite is atomic per partition.
    """
    d_roll = _partitioned(
        time_rollup(
            delta, ts=ts, bucket_sec=bucket_sec, dims=dims, value=value,
            user=user, exact_ndv=False, sketch=True,
        )
    )
    dirty = [r["b_date"] for r in d_roll.select("b_date").distinct().collect()]
    # localCheckpoint breaks lineage to the files about to be overwritten
    # (Spark refuses to overwrite a path it is still reading from).  The
    # materialized slice is dirty-partition ROLLUP rows — tiny by design.
    existing = (
        spark.read.parquet(path)
        .filter(F.col("b_date").isin(dirty))
        .localCheckpoint(eager=True)
    )
    merged = (
        existing.unionByName(d_roll)
        .groupBy("bs", *dims)
        .agg(
            F.sum("n").alias("n"),
            F.sum("v_c").alias("v_c"),
            F.hll_union_agg("user_sketch").alias("user_sketch"),
        )
    )
    writer = _partitioned(merged).write.partitionBy("b_date")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer.mode("overwrite").parquet(path)


def rollup_duck_sql() -> str:
    """DuckDB oracle for the gated ``op_rollup`` entry.  Both levels are
    derived from RAW events here, while the engine derives the daily
    level by MERGING the hourly rollup (counters re-summed) — the hash
    gate therefore checks the mergeability claim, not a mirror of the
    engine's plan.  Exact ``n_users`` is hourly-only (not mergeable);
    the daily level carries NULL, and the sketch-based estimate path is
    covered by tests instead (approximate ≠ hash-gateable)."""
    tmpl = """
 SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/{w}) AS BIGINT)*{w}) AS TIMESTAMP) AS bs,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS v_c,
        {ndv} AS n_users
 FROM events GROUP BY 1,2"""
    h = tmpl.format(w=3600, ndv="COUNT(DISTINCT user_id)")
    d = tmpl.format(w=86400, ndv="CAST(NULL AS BIGINT)")
    return (
        f"WITH h AS ({h}),\nd AS ({d})\n"
        "SELECT 'h' AS lvl, bs, event_type, n, v_c, n_users FROM h\n"
        "UNION ALL SELECT 'd' AS lvl, bs, event_type, n, v_c, n_users FROM d\n"
        "ORDER BY lvl, bs, event_type"
    )
