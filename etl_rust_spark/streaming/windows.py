"""Windowed aggregations over event time — batch AND streaming.

The reference's only time-grouping is the GCS 30-minute bucket partitioner
(/root/reference/src/output/gcs.rs:105-115, mirrored as DQ-44); its
"streaming" is an unbounded block-index loop with no event-time
semantics.  This module is the engine's event-time surface (SURVEY §5.4 /
P4): tumbling, sliding and session windows expressed once and usable on
both a batch DataFrame and a Structured Streaming DataFrame — the same
physical aggregation (``window()`` / ``session_window()``) runs in both
modes, so batch results ARE the oracle for the streaming path.

Semantics pinned by experiment (kept as tests):
- ``session_window(ts, gap)``: two events exactly ``gap`` apart MERGE
  into one session; a new session starts iff ``ts - prev > gap`` —
  identical to DQ-35's gaps-and-islands convention.
- ``window(ts, d)`` / ``window(ts, d, s)`` boundaries are epoch-aligned,
  so a DuckDB oracle can reproduce them with integer epoch arithmetic.

Scale notes (100 TB): windowed aggregation shuffles on (group keys,
window) — the partial (map-side) aggregation halves shuffle volume
automatically; session windows additionally sort within partitions to
merge, and in streaming keep per-key state whose size is bounded by the
watermark.  Use ``withWatermark`` ahead of these in streaming so state
is evicted; without it, complete-mode state grows with key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rust_spark.catalog import SCHEMAS

__all__ = [
    "events_stream",
    "tumbling_window",
    "sliding_window",
    "session_window_agg",
]


def events_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of ``events``-shaped rows (explicit schema —
    streaming never infers, mirroring the reference's typed boundary X-01)."""
    reader = spark.readStream.schema(SCHEMAS["events"])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unknown stream format {fmt!r}")


def tumbling_window(events: DataFrame, duration: str = "10 minutes") -> DataFrame:
    """Fixed windows: count + integer-cents value sum per bucket.

    Batch analog of DQ-36; epoch-aligned starts.  Columns: ws, we, n, v_c.
    """
    return (
        events.groupBy(F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("v_c"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "n",
            "v_c",
        )
    )


def sliding_window(
    events: DataFrame, duration: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("v_c"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "n",
            "v_c",
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions with an inactivity ``gap`` (DQ-35's streaming twin).

    Columns: user_id, session_start (= min ts), session_end (= max ts +
    gap), n_events.  Exact-gap events merge (see module docstring).
    """
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
