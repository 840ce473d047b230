"""Block-index range and list scans (reference S-01 / S-02).

Reference behavior being re-expressed (not ported):
- ``index-range``: drive extraction over ``[start, end)`` with optional
  ``--reverse`` toward genesis, guarded against reversing from 0
  (/root/reference/src/main.rs:75-83,391-429).
- ``index-list``: read a CSV of block numbers where the header is
  auto-sniffed — a header exists iff no first-line field parses as an
  unsigned integer — and every field of every row is flattened into one
  stream of indices (/root/reference/src/main.rs:137-182).

Scale notes:
- ``spark.range`` is the canonical distributed integer source: no data
  movement, ``numPartitions`` slices the range so a 10M-block backfill
  fans out across the cluster; each partition later becomes one batch of
  RPC fetches (see sources/chain.py).
- Reverse order is a property of downstream commit sequencing, not the
  scan: we keep a ``block_index`` ordering column instead of physically
  reversing partitions (Catalyst would just re-sort anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["block_range", "block_list_csv"]


def block_range(
    spark: SparkSession,
    start: int,
    end: int,
    reverse: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame of ``block_index`` over ``[start, end)``.

    Mirrors the reference's guards: non-negative indices (u64 semantics
    on LongType, SURVEY §1.3) and no reverse-from-genesis.
    """
    if start < 0 or end < start:
        raise ValueError(f"invalid block range [{start}, {end})")
    if reverse and end == 0:
        raise ValueError("cannot run a reverse range from block 0")
    df = spark.range(start, end, 1, num_partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumnRenamed("id", "block_index")
    if reverse:
        df = df.orderBy(F.desc("block_index"))
    return df


def block_list_csv(spark: SparkSession, path: str) -> DataFrame:
    """Flatten every field of a block-number CSV into ``block_index`` rows.

    Header sniff matches the reference: if ANY field of the first line
    parses as a non-negative integer, the file has no header.  All
    fields of all rows are melted (the reference flattens the full
    record iterator, not just one column), non-numeric cells dropped.
    """
    first = spark.read.text(path).limit(1).collect()
    has_header = True
    if first:
        fields = first[0][0].split(",")
        if any(_parses_u64(f) for f in fields):
            has_header = False
    df = spark.read.option("header", str(has_header).lower()).csv(path)
    melted = df.select(
        F.explode(F.array(*[F.col(c).cast("string") for c in df.columns])).alias("cell")
    )
    # try_cast: non-numeric cells → NULL → dropped (ANSI-safe under Spark 4).
    return (
        melted.select(F.expr("try_cast(cell AS BIGINT)").alias("block_index"))
        .filter(F.col("block_index").isNotNull() & (F.col("block_index") >= 0))
    )


def _parses_u64(s: str) -> bool:
    s = s.strip()
    return s.isdigit()
