"""Resume-from-previous-run range adjustment (reference S-08).

The reference scans ``./indexed_blocks/`` marker files and advances the
range start past the max completed index — or shrinks the end when
reversing — panicking when the range is already done
(/root/reference/src/main.rs:186-238).

Spark-first re-expression: the *sink itself* is the checkpoint.  The
high-watermark is ``max(block_index)`` over the already-written blocks
table — one aggregate over parquet footer statistics (min/max pruning
makes this a metadata-only scan), no side-channel marker files to drift
out of sync with the data.  Streaming jobs get this for free from the
Structured Streaming checkpoint dir instead (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["sink_high_watermark", "pick_up_from_previous_range"]


def sink_high_watermark(spark: SparkSession, blocks_path: str) -> int | None:
    """Max committed ``block_index`` in the sink, or None if empty/absent."""
    try:
        df = spark.read.parquet(blocks_path)
    except Exception:
        return None
    row = df.agg(F.max("block_index").alias("hw")).collect()[0]
    return row["hw"]


def pick_up_from_previous_range(
    spark: SparkSession,
    blocks_path: str,
    start: int,
    end: int | None,
    reverse: bool = False,
) -> tuple[int, int | None]:
    """Adjusted ``(start, end)`` skipping the already-indexed prefix.

    Matches the reference's semantics including the hard error when the
    requested range has already been fully indexed.
    """
    hw = sink_high_watermark(spark, blocks_path)
    if hw is None:
        return start, end
    if reverse:
        new_end = min(end, hw) if end is not None else hw
        if new_end <= start:
            raise RuntimeError(
                f"range [{start}, {end}) already fully indexed (high-watermark {hw})"
            )
        return start, new_end
    new_start = max(start, hw + 1)
    if end is not None and new_start >= end:
        raise RuntimeError(
            f"range [{start}, {end}) already fully indexed (high-watermark {hw})"
        )
    return new_start, end
