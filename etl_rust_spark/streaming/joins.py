"""Streaming dedup + stream-stream interval join (SURVEY §5.4 extension).

Two operators a streaming LLM-data ingest needs that the batch surface
already has analogs for:

- :func:`stream_dedupe` — the streaming form of exact dedup
  (operators/dedup.exact_dedupe): ``dropDuplicatesWithinWatermark``
  keeps the FIRST arrival of each key and evicts key-state once the
  watermark passes, so state is bounded by (arrival-rate × watermark)
  instead of the full corpus — the only viable exact-dedup shape on an
  unbounded feed.  At-least-once upstreams (the reference's publish
  retry ladder, X-08) become exactly-once downstream.
- :func:`stream_interval_join` — stream×stream equi-join with an
  event-time interval bound.  Both sides buffer watermark-bounded
  state; the time bound is what lets Spark evict — an unbounded
  stream-stream join would keep both streams forever.

Batch-equivalence contract (the module's test strategy, mirroring
windows.py): run the same logic on a bounded DataFrame and the
streaming result must match — batch IS the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_dedupe", "stream_interval_join"]


def stream_dedupe(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins dedup with watermark-bounded state.

    Duplicates arriving within ``watermark`` of the original are
    dropped; later ones are already excluded by the watermark itself
    (their event time is below it).  On a batch DataFrame this falls
    back to plain ``dropDuplicates`` (same keys, no state) so the batch
    run is the oracle for the stream run.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    watermark: str = "30 minutes",
    suffix: str = "_r",
) -> DataFrame:
    """Equi-join two event streams where the right event lands within
    ``[left_ts - lower, left_ts + upper]``.

    Right columns (except the join key) get ``suffix`` so the joined
    schema is collision-free.  Streaming inputs are watermarked on both
    sides (state eviction needs BOTH, plus the time bound).  Works
    identically on bounded frames — the batch oracle path.
    """
    rcols = [
        F.col(c).alias(c if c == on else f"{c}{suffix}") for c in right.columns
    ]
    r = right.select(rcols)
    r_ts = right_ts if right_ts == on else f"{right_ts}{suffix}"
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(r_ts, watermark)
    cond = (
        (left[on] == r[on])
        & (F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(r, cond, "inner").drop(r[on])
