"""End-to-end batch extraction pipeline (reference §3.1 ``index-range``).

Reference lifecycle: parse range → connect per-table sinks → worker pool
fetches blocks over JSON-RPC → deserialize → transform → publish each
table with backoff (/root/reference/src/main.rs:391-429 and
src/example_config/mod.rs:17-25).

Spark-first lifecycle (one logical plan, Catalyst-scheduled):

1. ``block_range`` — distributed index source (S-01).
2. ``chain.fetch`` — raw responses; a real config does batched RPC in
   ``mapPartitions`` here (S-04/S-07); retries are task retries.
3. **Raw staging**: the raw frame is written once to
   ``{out}/_raw`` parquet.  The reference fetches each block exactly
   once and fans records out in memory; naively re-using the fetch
   DataFrame for 7 table writes would re-fetch the node 7×.  Staging
   keeps the once-only fetch guarantee, gives a replayable audit log,
   and every table derivation becomes a columnar scan with pushdown.
4. ``chain.transform`` over the staged raw → 7 table DataFrames (X-02).
5. ``write_tables`` fan-out with idempotent block-bucket overwrite
   (K-08 + S-08 exactly-once design).

Resume (S-08): ``resume=True`` consults the blocks sink's high-watermark
and skips the already-indexed prefix — the sink is the checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_rust_spark.etl.writer import (
    DEFAULT_BUCKET_SIZE,
    merge_entity_table,
    write_tables,
)
from etl_rust_spark.sources.chain import ChainConfig
from etl_rust_spark.sources.checkpoint import pick_up_from_previous_range
from etl_rust_spark.sources.ranges import block_range

__all__ = ["RunStats", "run_range"]


@dataclass
class RunStats:
    """Per-run metrics — the engine's O-01 surface."""

    start: int
    end: int
    raw_blocks: int = 0
    records: dict[str, int] = field(default_factory=dict)

    @property
    def total_records(self) -> int:
        return sum(self.records.values())


def run_range(
    spark: SparkSession,
    chain: ChainConfig,
    start: int,
    end: int,
    out_dir: str,
    resume: bool = False,
    reverse: bool = False,
    fmt: str = "parquet",
    layout: str = "block",
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    num_partitions: int | None = None,
) -> RunStats:
    """Extract ``[start, end)`` through ``chain`` into ``out_dir``.

    ``reverse=True`` works the range from ``end - 1`` toward ``start``
    (reference ``--reverse``, /root/reference/src/main.rs:75-83): commit
    order is descending, and a resumed reverse run picks up below the
    contiguous top segment already in the sink (min-side watermark) —
    results are identical to a forward run; only ordering/resume differ.
    """
    if resume:
        start, end = pick_up_from_previous_range(
            spark, f"{out_dir}/blocks", start, end, reverse=reverse
        )
    blocks = block_range(
        spark, start, end, reverse=reverse, num_partitions=num_partitions
    )

    raw_path = f"{out_dir}/_raw"
    raw = chain.fetch(blocks).withColumn(
        "block_bucket", F.expr(f"block_index div {int(bucket_size)}")
    )
    # Dynamic bucket overwrite would drop previously staged blocks that
    # share a bucket with this range (e.g. a resume starting mid-bucket),
    # so fold those rows back into the staging write.  localCheckpoint()
    # materializes them eagerly — Spark cannot otherwise overwrite a path
    # it is still reading from.
    lo, hi = start // bucket_size, (end - 1) // bucket_size
    try:
        carried = (
            spark.read.parquet(raw_path)
            .where(f"block_bucket BETWEEN {lo} AND {hi}")
            .where(f"block_index < {start} OR block_index >= {end}")
            .localCheckpoint()
        )
        raw = raw.unionByName(carried)
    except Exception:  # first run: no staged raw yet
        pass
    # Stage aligned to the same bucket/overwrite discipline as the tables.
    raw.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("block_bucket").parquet(raw_path)

    # Derive tables from every staged block in the buckets this range
    # touches (not just [start, end)): table writes dynamically overwrite
    # whole buckets, so a resume that starts mid-bucket must re-derive the
    # bucket's earlier blocks too or they'd be dropped from the sink.
    staged = spark.read.parquet(raw_path).where(
        f"block_bucket BETWEEN {lo} AND {hi}"
    )
    stats = RunStats(start=start, end=end, raw_blocks=staged.count())
    tables = chain.transform(staged.select("block_index", "response_json"))
    # Entity (first-seen dimension) tables can't use the bucket-overwrite
    # path: their min(block_index) is computed over THIS run's staged
    # buckets, so a key first seen in an earlier run would gain a second
    # row in a later bucket (ADVICE r1).  They upsert via a keyed merge
    # with the existing sink instead.
    entity_keys = getattr(chain, "entity_keys", {})
    entities = {t: tables.pop(t) for t in list(tables) if t in entity_keys}
    # Commit-marker-last discipline (exactly-once fan-out under a
    # mid-batch kill): the blocks table doubles as the resume
    # checkpoint, so it must commit only AFTER every other sink has
    # committed its share of the range.  Written first, a crash between
    # the blocks write and a later table's write would advance the
    # watermark past records the other tables never received, and a
    # resume would skip them forever.  Written last, a crash anywhere in
    # the fan-out leaves the watermark un-advanced; the resumed run
    # re-derives the range and the idempotent bucket overwrite makes
    # partially-committed tables consistent.  Kill-tested in
    # tests/test_etl.py::test_kill_between_sinks_then_resume_is_exactly_once.
    watermark = {t: tables.pop(t) for t in ("blocks",) if t in tables}
    stats.records = write_tables(
        tables, out_dir, fmt=fmt, layout=layout, bucket_size=bucket_size
    )
    for name, df in entities.items():
        stats.records[name] = merge_entity_table(
            df, f"{out_dir}/{name}", entity_keys[name], fmt=fmt
        )
    stats.records.update(
        write_tables(
            watermark, out_dir, fmt=fmt, layout=layout, bucket_size=bucket_size
        )
    )
    return stats
