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
- ``hist`` — a fixed-bin value histogram (array<long> of bin counts),
  merge by element-wise SUM (exactly re-associative, unlike rank-based
  quantile sketches): any percentile at any coarser granularity comes
  from :func:`hist_quantile`'s inverse CDF over the merged counts, with
  deterministic bin-edge values — so the quantile path IS hash-gateable,
  where approximate KLL/t-digest merges would not be.  Resolution is the
  bin width; at 100 TB that is the standard histogram trade
  (percentile_approx is per-query and its state never persists).
- ``v_kll`` (opt-in) — a DataSketches KLL binary (Spark's built-in
  ``kll_sketch_agg_double``), merge by ``kll_merge_agg_double``: the
  UNBOUNDED-domain quantile state for when no fixed [lo, hi) can be
  declared up front (the fixed-bin histogram's blind spot).  Rank error
  is the sketch's ε (~1.65 % at the default k=200), so it lives in
  pytest tolerance tests, not hash gates — both quantile states can
  ride the same rollup row.
- ``user_theta`` (opt-in) — a DataSketches Theta binary (Spark's
  built-in ``theta_sketch_agg``), merge by ``theta_union_agg``.  Theta
  supports the SET ALGEBRA HLL cannot: ``theta_intersection`` /
  ``theta_difference`` answer "users active in bucket A AND/BUT-NOT
  bucket B" from persisted state alone — the retention/churn question
  (:func:`retention_matrix`) that would otherwise need a raw self-join
  over 100 TB of events.  Exact below the sketch's nominal-entries
  threshold, estimate beyond it.

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
    "hist_quantile",
    "kll_quantile",
    "theta_estimate",
    "retention_matrix",
    "write_rollup",
    "update_rollup",
    "drop_chunks",
    "read_rollup",
    "rollup_duck_sql",
]

# Default histogram domain for the synthetic events.value column
# ([0.01, ~500] across scales): 32 bins of width 16.  Out-of-range
# values clamp into the edge bins — deterministic on both engines.
HIST_BINS = 32
HIST_LO = 0.0
HIST_HI = 512.0

# Column-expression memo: the histogram builders assemble ~32 per-bin
# Columns each, costing ~0.5 s of Py4J round trips PER QUERY
# CONSTRUCTION (measured on op_rollup at sf0.1 — construction, not
# execution, was a third of the entry's wall time).  Unresolved Column
# trees are immutable and session-independent within one JVM, so the
# same object is reusable across plans; memoizing EXPRESSIONS is safe
# where memoizing DataFrames is not (no RDD instance → no shuffle-file
# reuse across bench laps).  Keys only form for string column names —
# Column-typed inputs skip the memo.
_COL_MEMO: dict[tuple, Column] = {}


def _memo(key: tuple | None, build):
    if key is None:
        return build()
    col = _COL_MEMO.get(key)
    if col is None:
        col = _COL_MEMO[key] = build()
    return col


def _hist_bin(value: str | Column, lo: float, hi: float, bins: int) -> Column:
    """Clamped bin index for one raw value.  The bin width is computed
    in PYTHON and embedded as a double literal so both engines divide
    by bit-identical constants (SQL-text numeric literals are DECIMAL
    in Spark — the dq lesson in NEXT.md)."""
    w = (hi - lo) / bins
    c = F.col(value) if isinstance(value, str) else value
    b = F.floor((c - F.lit(float(lo))) / F.lit(w)).cast("int")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), b))


def _hist_agg(bin_col: Column, bins: int) -> Column:
    """Aggregate expression building the per-group histogram: one
    conditional SUM per bin, arrayed.  Algebraic, so partial (map-side)
    aggregation collapses executor-local rows before the shuffle —
    shuffle volume stays buckets × dims × bins longs, never raw rows.
    The bin count rides the column metadata so mergers can rebuild the
    element-wise SUM without peeking at data."""
    arr = F.array(
        *[
            F.sum(F.when(bin_col == i, F.lit(1)).otherwise(F.lit(0))).cast("long")
            for i in range(bins)
        ]
    )
    return arr.alias("hist", metadata={"bins": bins})


def _hist_width(df: DataFrame) -> int:
    """Bin count of ``df``'s ``hist`` column, from the metadata stamped
    by :func:`_hist_agg` (plan-only — no action)."""
    meta = df.schema["hist"].metadata
    bins = meta.get("bins") if meta else None
    if not bins:
        raise ValueError(
            "hist column carries no 'bins' metadata; rebuild it via "
            "time_rollup(hist_bins=...) or re-stamp the metadata after "
            "an external round-trip"
        )
    return int(bins)


def hist_quantile(
    hist: str | Column,
    q: float,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
) -> Column:
    """Quantile from histogram state: the LOWER EDGE of the smallest bin
    whose cumulative count reaches ``ceil(q·total)``, in integer cents
    (BIGINT) — deterministic, hence hash-gateable, unlike interpolated
    percentiles.  NULL when the histogram is empty.  Scan-side HOF fold
    over a ``bins``-element array; no shuffle, no Python."""
    key = (
        ("hist_q", hist, q, lo, hi, bins) if isinstance(hist, str) else None
    )
    return _memo(key, lambda: _hist_quantile_col(hist, q, lo, hi, bins))


def _hist_quantile_col(
    hist: str | Column, q: float, lo: float, hi: float, bins: int
) -> Column:
    c = F.col(hist) if isinstance(hist, str) else hist
    zero = F.lit(0).cast("long")
    total = F.aggregate(c, zero, lambda a, x: a + x)
    w = (hi - lo) / bins

    # HOFs evaluate interpreted (no codegen, no subexpression reuse), so
    # an expression tree that references `total` inside the threshold
    # fold's lambda re-runs the bins-element total fold PER ELEMENT —
    # O(bins²) per row.  Binding `total` ONCE as the accumulator of an
    # empty-input aggregate (merge never runs; finish sees it as a plain
    # lambda variable) makes the whole quantile O(bins): one total fold +
    # one threshold fold.  At sf0.1's 3.7k rollup rows both forms are
    # plan-cost-dominated (A/B'd indistinguishable); the win is per-row,
    # i.e. at hypertable scale where rollup rows are billions.  Same
    # integer math — bit-identical, gate-safe (re-gated sf0.001/sf0.01).
    def _finish(t: Column) -> Column:
        thr = F.ceil(F.lit(float(q)) * t).cast("long")
        acc0 = F.struct(
            zero.alias("cum"), F.lit(0).alias("i"), F.lit(-1).alias("bin")
        )
        qbin = F.aggregate(
            c,
            acc0,
            lambda a, x: F.struct(
                (a.cum + x).alias("cum"),
                (a.i + F.lit(1)).alias("i"),
                F.when(a.bin >= 0, a.bin)
                .otherwise(F.when(a.cum + x >= thr, a.i).otherwise(F.lit(-1)))
                .alias("bin"),
            ),
            lambda a: a.bin,
        )
        edge_c = F.round(
            (F.lit(float(lo)) + qbin.cast("double") * F.lit(w)) * 100, 0
        )
        # t > 0 guard: an all-zero histogram has thr = 0, which the fold
        # would otherwise satisfy at bin 0 instead of yielding NULL.
        return F.when((t > 0) & (qbin >= 0), edge_c.cast("long"))

    return F.aggregate(F.slice(c, 1, 0), total, lambda a, x: a, _finish)


def kll_quantile(sketch: str | Column, q: float) -> Column:
    """Quantile read off KLL sketch state (``time_rollup(kll=True)``) —
    the unbounded-domain counterpart of :func:`hist_quantile`: no bin
    edges to declare, answers are actual observed values, error is the
    sketch's rank ε instead of a bin width.  Works identically on an
    hourly row's own sketch and on a ``merge_rollup``-merged one."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.kll_sketch_get_quantile_double(c, F.lit(float(q)))


def theta_estimate(sketch: str | Column) -> Column:
    """Distinct-count estimate off Theta state — exact below the
    sketch's nominal-entries threshold, within ~2 % beyond it."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.round(F.theta_sketch_estimate(c)).cast("long")


def retention_matrix(
    rollup: DataFrame,
    bucket_sec: int,
    dims: tuple[str, ...] = (),
    periods: int = 1,
) -> DataFrame:
    """Bucket-over-bucket user retention/churn from persisted Theta
    state (``time_rollup(theta=True)``) — the question HLL state cannot
    answer, because retention is a set INTERSECTION.

    For each bucket pair (bs, bs + ``periods``·``bucket_sec``) sharing
    ``dims``, emits distinct-user estimates: ``users_a``/``users_b``
    (each side), ``retained`` (A ∩ B), ``churned`` (A \\ B), ``new_users``
    (B \\ A), and ``retention_bp`` (retained / users_a in basis points).
    ``periods`` is the classic product lag: 1 = day-over-day on a daily
    rollup, 7 = D7 retention, 30 = D30 — all from the same state.

    100 TB posture: the inputs are ROLLUP rows (buckets × dims — orders
    of magnitude below raw), joined 1:1 on (bucket, dims); the raw-event
    alternative is a self-join of the events table on user_id.  All set
    arithmetic runs on the sketch binaries scan-side.  Estimates are
    exact while every bucket's user set is under the sketch's nominal
    entries (4096 default); beyond that the intersection inherits both
    sketches' ~2 % error."""
    lag_sec = int(bucket_sec) * int(periods)
    a = rollup.select(
        F.col("bs"),
        *dims,
        F.col("user_theta").alias("_ta"),
    )
    b = rollup.select(
        (F.col("bs") - F.expr(f"INTERVAL {lag_sec} SECOND")).alias("bs"),
        *dims,
        F.col("user_theta").alias("_tb"),
    )
    ua = theta_estimate("_ta")
    ret = theta_estimate(F.theta_intersection("_ta", "_tb"))
    return (
        a.join(b, ["bs", *dims])
        .select(
            F.col("bs"),
            (F.col("bs") + F.expr(f"INTERVAL {lag_sec} SECOND")).alias(
                "bs_next"
            ),
            *dims,
            ua.alias("users_a"),
            theta_estimate("_tb").alias("users_b"),
            ret.alias("retained"),
            theta_estimate(F.theta_difference("_ta", "_tb")).alias("churned"),
            theta_estimate(F.theta_difference("_tb", "_ta")).alias("new_users"),
            F.when(ua > 0, F.round(ret * 10000.0 / ua).cast("long")).alias(
                "retention_bp"
            ),
        )
    )


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
    hist_bins: int | None = None,
    hist_lo: float = HIST_LO,
    hist_hi: float = HIST_HI,
    kll: bool = False,
    theta: bool = False,
) -> DataFrame:
    """One-shot rollup of raw events → (bs, dims..., n, v_c[, n_users]
    [, user_sketch][, hist][, v_kll][, user_theta]).

    ``exact_ndv`` attaches an exact ``n_users`` (NOT mergeable — for
    gates and one-shot reports); ``sketch`` attaches the mergeable HLL
    binary the incremental path relies on; ``hist_bins`` attaches the
    mergeable value histogram :func:`hist_quantile` reads percentiles
    from; ``kll`` attaches the unbounded-domain KLL quantile sketch
    :func:`kll_quantile` reads; ``theta`` attaches the Theta user
    sketch :func:`retention_matrix` intersects.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col(value) * 100, 0).cast("long")).alias("v_c"),
    ]
    if exact_ndv:
        aggs.append(F.countDistinct(user).alias("n_users"))
    if sketch:
        aggs.append(F.hll_sketch_agg(user).alias("user_sketch"))
    if hist_bins:
        key = (
            ("hist_agg", value, hist_lo, hist_hi, hist_bins)
            if isinstance(value, str)
            else None
        )
        aggs.append(
            _memo(
                key,
                lambda: _hist_agg(
                    _hist_bin(value, hist_lo, hist_hi, hist_bins), hist_bins
                ),
            )
        )
    if kll:
        aggs.append(
            F.kll_sketch_agg_double(F.col(value).cast("double")).alias("v_kll")
        )
    if theta:
        aggs.append(F.theta_sketch_agg(user).alias("user_theta"))
    return df.groupBy(time_bucket(ts, bucket_sec).alias("bs"), *dims).agg(*aggs)


def merge_rollup(
    rollup: DataFrame,
    bucket_sec: int,
    dims: tuple[str, ...] = ("event_type",),
    estimate: bool = True,
) -> DataFrame:
    """Re-aggregate a (finer) rollup to ``bucket_sec`` buckets — counters
    by SUM, sketches by their union aggs (HLL / KLL / Theta, presence-
    based) — without touching raw data.
    The target bucket must be a multiple of the source bucket (callers
    align, e.g. hour → day); misaligned merges would split source rows.

    ``estimate`` additionally materializes ``n_users_est`` from the
    merged sketch (the sketch column is kept either way, so further
    coarsening keeps merging).  A ``hist`` column merges by
    element-wise SUM (the bin count is read from the input's array
    type at plan time — exact, so quantiles over the merged histogram
    equal quantiles computed from raw).
    """
    has_sketch = "user_sketch" in rollup.columns
    aggs = [F.sum("n").alias("n"), F.sum("v_c").alias("v_c")]
    if has_sketch:
        aggs.append(F.hll_union_agg("user_sketch").alias("user_sketch"))
    if "v_kll" in rollup.columns:
        aggs.append(F.kll_merge_agg_double("v_kll").alias("v_kll"))
    if "user_theta" in rollup.columns:
        aggs.append(F.theta_union_agg("user_theta").alias("user_theta"))
    if "hist" in rollup.columns:
        nb = _hist_width(rollup)
        aggs.append(
            _memo(
                ("hist_merge", nb),
                lambda: F.array(
                    *[F.sum(F.col("hist")[i]).cast("long") for i in range(nb)]
                ).alias("hist", metadata={"bins": nb}),
            )
        )
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
    hist_lo: float = HIST_LO,
    hist_hi: float = HIST_HI,
) -> None:
    """Incrementally fold a raw delta into a persisted rollup.

    Rolls up the delta, unions it with the EXISTING rollup rows of the
    touched date partitions only, re-merges state (SUM counters,
    ``hll_union_agg`` sketches, element-wise-summed ``hist`` when the
    persisted rollup carries one — bin count read from its column
    metadata; ``hist_lo``/``hist_hi`` must match the producer's
    domain), and dynamic-partition-overwrites just
    those dates.  Cost scales with the delta + its dirty partitions,
    never with rollup history.  Replaying the same delta twice is NOT
    idempotent (counters re-sum) — exactly-once delivery is the
    pipeline layer's job (S-08 checkpoints); rerunning a FAILED write
    is safe because the overwrite is atomic per partition.
    """
    persisted = spark.read.parquet(path)
    has_hist = "hist" in persisted.columns
    has_kll = "v_kll" in persisted.columns
    has_theta = "user_theta" in persisted.columns
    hb = _hist_width(persisted) if has_hist else None
    d_roll = _partitioned(
        time_rollup(
            delta, ts=ts, bucket_sec=bucket_sec, dims=dims, value=value,
            user=user, exact_ndv=False, sketch=True, hist_bins=hb,
            hist_lo=hist_lo, hist_hi=hist_hi, kll=has_kll, theta=has_theta,
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
    maggs = [
        F.sum("n").alias("n"),
        F.sum("v_c").alias("v_c"),
        F.hll_union_agg("user_sketch").alias("user_sketch"),
    ]
    if has_kll:
        maggs.append(F.kll_merge_agg_double("v_kll").alias("v_kll"))
    if has_theta:
        maggs.append(F.theta_union_agg("user_theta").alias("user_theta"))
    if has_hist:
        maggs.append(
            F.array(
                *[F.sum(F.col("hist")[i]).cast("long") for i in range(hb)]
            ).alias("hist", metadata={"bins": hb})
        )
    merged = existing.unionByName(d_roll).groupBy("bs", *dims).agg(*maggs)
    writer = _partitioned(merged).write.partitionBy("b_date").option(
        "partitionOverwriteMode", "dynamic"  # per-write: no session-conf leak
    )
    writer.mode("overwrite").parquet(path)


def drop_chunks(path: str, before: str, partition_col: str = "b_date") -> int:
    """Retention enforcement, the other hypertable staple (TimescaleDB
    ``drop_chunks``): delete every ``<partition_col>=<date>`` partition
    directory strictly OLDER than ``before`` (ISO date string) and
    return the number dropped.

    Partition-directory removal is metadata-cheap and exact — no data
    rewrite, no tombstones; readers see a partition either fully
    present or fully gone (directory deletion is atomic per partition
    on a real FS).  Values that don't parse as a partition dir are left
    untouched."""
    import shutil
    from pathlib import Path

    root = Path(path)
    if not root.exists():
        raise FileNotFoundError(path)
    dropped = 0
    prefix = f"{partition_col}="
    for p in sorted(root.iterdir()):
        if not (p.is_dir() and p.name.startswith(prefix)):
            continue
        if p.name[len(prefix):] < before:
            shutil.rmtree(p)
            dropped += 1
    return dropped


def rollup_duck_sql() -> str:
    """DuckDB oracle for the gated ``op_rollup`` entry.  Both levels are
    derived from RAW events here, while the engine derives the daily
    level by MERGING the hourly rollup (counters re-summed, histograms
    element-wise-summed) — the hash gate therefore checks the
    mergeability claim, not a mirror of the engine's plan.  Exact
    ``n_users`` is hourly-only (not mergeable); the daily level carries
    NULL, and the sketch-based estimate path is covered by tests
    instead (approximate ≠ hash-gateable).  ``p50_c`` (since r6) is the
    histogram median — lower edge of the smallest bin whose cumulative
    count reaches ceil(n/2), in cents: the oracle computes it from raw
    bins with a window cumsum, the engine reads it off rollup state
    (hourly: own histogram; daily: hourly histograms merged), so the
    hash pins the quantiles-from-merged-state claim exactly."""
    w_bin = (HIST_HI - HIST_LO) / HIST_BINS
    bin_expr = (
        f"LEAST({HIST_BINS - 1}, GREATEST(0, "
        f"CAST(FLOOR((value - {HIST_LO!r}) / {w_bin!r}) AS INT)))"
    )
    p50 = f"CAST(ROUND(({HIST_LO!r} + qbin * {w_bin!r}) * 100, 0) AS BIGINT)"
    tmpl = """
 SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/{w}) AS BIGINT)*{w}) AS TIMESTAMP) AS bs,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS v_c,
        {ndv} AS n_users
 FROM events GROUP BY 1,2"""
    qtmpl = """
 SELECT bs, event_type, MIN(bin) AS qbin FROM (
   SELECT bs, event_type, bin,
          SUM(c) OVER (PARTITION BY bs, event_type ORDER BY bin) AS cum,
          SUM(c) OVER (PARTITION BY bs, event_type) AS tot
   FROM (SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/{w}) AS BIGINT)*{w}) AS TIMESTAMP) AS bs,
                event_type, {bin} AS bin, COUNT(*) AS c
         FROM events GROUP BY 1,2,3))
 WHERE cum >= CAST(CEIL(0.5 * tot) AS BIGINT) GROUP BY 1,2"""
    h = tmpl.format(w=3600, ndv="COUNT(DISTINCT user_id)")
    d = tmpl.format(w=86400, ndv="CAST(NULL AS BIGINT)")
    qh = qtmpl.format(w=3600, bin=bin_expr)
    qd = qtmpl.format(w=86400, bin=bin_expr)
    # lvl='r' (r7): exact day-over-day retention per event_type from a
    # raw COUNT-DISTINCT self-join — the independent derivation of what
    # the engine reads off merged Theta state (exact below nominal
    # entries at every gate scale).  n=retained, v_c=retention_bp,
    # n_users=users_a, p50_c=new_users.
    ret = """
 du AS (
  SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/86400) AS BIGINT)*86400) AS TIMESTAMP) AS bs,
         event_type, user_id
  FROM events GROUP BY 1, 2, 3),
 dc AS (SELECT bs, event_type, CAST(COUNT(*) AS BIGINT) AS nu FROM du GROUP BY 1, 2),
 ic AS (SELECT a.bs, a.event_type, CAST(COUNT(*) AS BIGINT) AS nri
        FROM du a JOIN du b ON b.bs = a.bs + INTERVAL 1 DAY
             AND b.event_type = a.event_type AND b.user_id = a.user_id
        GROUP BY 1, 2),
 r AS (
  SELECT a.bs, a.event_type,
         COALESCE(ic.nri, 0) AS n,
         CAST(ROUND(COALESCE(ic.nri, 0) * 10000.0 / a.nu) AS BIGINT) AS v_c,
         a.nu AS n_users,
         b.nu - COALESCE(ic.nri, 0) AS p50_c
  FROM dc a JOIN dc b ON b.bs = a.bs + INTERVAL 1 DAY AND b.event_type = a.event_type
  LEFT JOIN ic ON ic.bs = a.bs AND ic.event_type = a.event_type)"""
    return (
        f"WITH h AS ({h}),\nd AS ({d}),\nqh AS ({qh}),\nqd AS ({qd}),\n{ret}\n"
        f"SELECT 'h' AS lvl, bs, event_type, n, v_c, n_users, {p50} AS p50_c"
        " FROM h JOIN qh USING (bs, event_type)\n"
        f"UNION ALL SELECT 'd' AS lvl, bs, event_type, n, v_c, n_users, {p50} AS p50_c"
        " FROM d JOIN qd USING (bs, event_type)\n"
        "UNION ALL SELECT 'r' AS lvl, bs, event_type, n, v_c, n_users, p50_c FROM r\n"
        "ORDER BY lvl, bs, event_type"
    )
