"""Temporal joins Spark lacks as built-ins: as-of join and binned range join.

The reference's only temporal lookup is the dependent account fetch
(S-06) and the 30-minute GCS bucketing (gcs.rs:105-115); it has no join
layer at all (SURVEY §2.5).  An analytics engine over this data model
needs both classic time-series joins:

- **as-of join** (``asof_join``): for every left row, the single most
  recent right row at-or-before its timestamp (per key, optionally
  within a tolerance).  The naive form is a correlated
  ``ORDER BY ts DESC LIMIT 1`` subquery — quadratic per key group when
  decorrelated (the dq13 lesson: 356 s before its rewrite).  The scale
  form used here is the classic **union + last-carry**: tag right rows,
  union with the left rows, and carry the latest right payload forward
  with ``last(..., ignorenulls=True)`` over ``(key) ORDER BY (ts, side,
  seq)``.  ONE shuffle + sort on the key, linear in rows — at 100 TB
  this is a single sort-based exchange, no per-row probing.

- **binned range join** (``range_point_join``): left points against
  right intervals with NO equi key — Spark's planner can only produce
  BroadcastNestedLoopJoin / CartesianProduct for a pure range
  predicate, which is O(n·m).  The standard fix (the same need
  Databricks' range-join optimization and DuckDB's IEJoin serve) is
  **binning**: pick a bucket width ≥ the max interval length, explode
  each interval to the ≤2 buckets it covers, map each point to its one
  bucket, equi-join on the bucket, and re-check the exact predicate.
  Each qualifying pair meets exactly once (the point lives in exactly
  one bucket), so no dedup pass is needed, and the join becomes a plain
  hash/sort-merge equi-join that partitions across the cluster.

Determinism: as-of ties (two right rows sharing the match timestamp)
resolve to the max ``right_seq`` row via the sort order — pinned so a
DuckDB oracle can reproduce the choice exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_attach", "asof_join", "range_point_join", "temporal_join_duck_sql"]


def asof_attach(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    right_seq: str,
    left_seq: str,
    tolerance_sec: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of match: latest right row with ``right.on <= left.on``.

    Returns ``by + [left_seq, on] + matched right columns`` (each as
    ``prefix + name``, NULL when nothing qualifies).  ``right_seq`` /
    ``left_seq`` are unique id columns on each side (``left_seq`` keys
    the caller's join-back; ``right_seq`` breaks timestamp ties — max
    wins).  ``tolerance_sec`` nulls out matches older than
    ``left.on - tolerance``.

    Scale: one shuffle+sort on ``by`` (union is shuffle-free); the
    window frame is ROWS UNBOUNDED PRECEDING..CURRENT ROW, so
    WindowExec streams each partition once — no quadratic frame rescan.
    Known-hot keys can be pre-split with operators.skew.
    """
    fill_cols = [f"{prefix}{on}", *[f"{prefix}{c}" for c in right_cols]]
    r_tagged = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        F.col(right_seq).cast("long").alias("__seq"),
        F.col(on).alias(f"{prefix}{on}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    l_tagged = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("__side"),
        F.col(left_seq).cast("long").alias("__seq"),
        F.lit(None).cast("timestamp").alias(f"{prefix}{on}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    # At equal ts, right (__side=0) sorts before left so same-ts right
    # rows are visible to left rows (<= semantics); among right rows at
    # one ts the LAST by __seq wins → max right_seq, deterministically.
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "__side", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).select(
        *by,
        on,
        "__side",
        "__seq",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        stale = F.col(f"{prefix}{on}") < F.col(on) - F.expr(
            f"INTERVAL {int(tolerance_sec)} SECOND"
        )
        out = out.select(
            *by,
            on,
            "__seq",
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in fill_cols
            ],
        )
    return out.select(*by, F.col("__seq").alias(left_seq), on, *fill_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    right_seq: str,
    left_seq: str,
    tolerance_sec: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """``asof_attach`` + join-back of the full left row on ``left_seq``
    (all left columns preserved; adds the matched ``prefix*`` columns).
    Costs one extra equi-join on the unique left id — prefer
    ``asof_attach`` when the projection suffices."""
    matched = asof_attach(
        left, right, on, by, right_cols, right_seq, left_seq,
        tolerance_sec=tolerance_sec, prefix=prefix,
    ).select(left_seq, *[f"{prefix}{on}", *[f"{prefix}{c}" for c in right_cols]])
    return left.join(matched, left_seq, "left")


def range_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_sec: int,
    closed: str = "(]",
    how: str = "inner",
) -> DataFrame:
    """Join points to intervals with ``point ∈ interval`` and NO equi key.

    ``bucket_sec`` must be ≥ the longest interval in seconds, so every
    interval covers at most 2 buckets.  ``closed`` picks boundary
    semantics: ``"(]"`` (exclusive lo, inclusive hi — the dq12
    convention), ``"[]"``, ``"[)"`` or ``"()"``.

    Plan shape: explode intervals to ≤2 bucket rows, hash/SMJ equi-join
    on bucket, exact predicate as a post-filter.  No
    BroadcastNestedLoopJoin anywhere — tests assert the plan.
    """
    if closed not in ("(]", "[]", "[)", "()"):
        raise ValueError(f"closed must be one of (], [], [), (): {closed!r}")
    lo_ok = (
        F.col(point_ts) > F.col(lo) if closed[0] == "(" else F.col(point_ts) >= F.col(lo)
    )
    hi_ok = (
        F.col(point_ts) < F.col(hi) if closed[1] == ")" else F.col(point_ts) <= F.col(hi)
    )

    # Cheap scalar guard (one 2-column mini-action): a too-small bucket
    # silently LOSES pairs, so fail loudly instead.
    max_len = intervals.select(
        F.max(F.unix_timestamp(hi) - F.unix_timestamp(lo)).alias("m")
    ).collect()[0]["m"]
    if max_len is not None and max_len > bucket_sec:
        raise ValueError(
            f"bucket_sec={bucket_sec} < longest interval {max_len}s — "
            "pairs would be silently dropped; raise bucket_sec"
        )

    # floor(), not a long cast: double→long truncates toward zero, which
    # would misalign buckets for pre-1970 timestamps.
    b_point = F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_sec).cast("long")
    b_lo = F.floor(F.unix_timestamp(F.col(lo)) / bucket_sec).cast("long")
    b_hi = F.floor(F.unix_timestamp(F.col(hi)) / bucket_sec).cast("long")
    p = points.withColumn("__b", b_point)
    iv = intervals.withColumn("__b", F.explode(F.sequence(b_lo, b_hi)))
    return p.join(iv, on="__b", how=how).filter(lo_ok & hi_ok).drop("__b")


def temporal_join_duck_sql() -> str:
    """DuckDB oracle for the gated ``op_temporal_join`` entry: the NAIVE
    spec forms (correlated ORDER BY/LIMIT subquery for as-of; theta join
    for the range part) — an independent derivation of what the scale
    operators compute, so the hash gate checks the rewrite, not a mirror
    of it.  ``am`` not ``asof``: ASOF is a DuckDB keyword."""
    return """
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
purch AS (SELECT * FROM events WHERE event_type = 'purchase'),
am AS (
  SELECT c.event_id AS qid,
    (SELECT p.event_id FROM purch p WHERE p.user_id = c.user_id AND p.ts <= c.ts
       ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS cid
  FROM clicks c),
am_v AS (
  SELECT a.qid, a.cid, CAST(ROUND(p.value * 100, 0) AS BIGINT) AS val
  FROM am a LEFT JOIN purch p ON p.event_id = a.cid),
rng AS (
  SELECT c.event_id AS qid, p.event_id AS cid,
    CAST(floor(epoch(c.ts)) - floor(epoch(p.ts)) AS BIGINT) AS val
  FROM clicks c JOIN purch p ON c.ts > p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
SELECT 'asof' AS src, qid, cid, val FROM am_v
UNION ALL SELECT 'range' AS src, qid, cid, val FROM rng
ORDER BY src, qid, cid NULLS FIRST
""".strip()
