"""Streaming corpus ingestion with incremental near-dedup.

The production loop for a continuously-crawled corpus: batches of
documents arrive on a stream; each batch is near-dedup'd against BOTH
the accumulated history and itself, the survivors are appended to the
curated corpus, and their signatures extend the store — the historical
TEXT is never rescanned (``dedup.incremental_near_dup_pairs``: one
band-key equi-join per batch + candidate-only verification).

Exactly-once: every per-batch write goes to a ``batch=<epoch>``
subdirectory in ``overwrite`` mode, so a foreachBatch retry (Spark
replays the epoch after a crash) rewrites the same directories instead
of appending duplicates — the same idempotent-bucket discipline as the
ETL writer (etl/writer.py), keyed on the epoch id the checkpoint
guarantees stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators import dedup

__all__ = ["run_incremental_dedup_stream"]


def run_incremental_dedup_stream(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    width: int = 3,
    bands: int = 4,
):
    """Start the ingestion query; returns the StreamingQuery.

    Layout under ``out_dir``: ``docs/batch=<epoch>/`` (curated
    survivors), ``store_bands/batch=<epoch>/`` and
    ``store_hs/batch=<epoch>/`` (the signature store the next batches
    probe).  A document survives unless it near-dups history or a
    LOWER-id document of its own batch (the same min-id-keeps rule as
    ``curate_corpus``).
    """
    spark = docs_stream.sparkSession

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.select(id_col, text_col)
        try:
            store_bands = spark.read.parquet(f"{out_dir}/store_bands")
            store_hs = spark.read.parquet(f"{out_dir}/store_hs")
            # a retried epoch must not dedup against its own failed
            # write: drop this epoch's store slice before probing.
            store_bands = store_bands.filter(F.col("batch") != epoch_id)
            store_hs = store_hs.filter(F.col("batch") != epoch_id)
            pairs = dedup.incremental_near_dup_pairs(
                batch_df, store_bands, store_hs,
                text_col, id_col, width=width, bands=bands, threshold=threshold,
            )
            # drop: every batch doc matching history; the higher id of a
            # within-batch pair.
            drop = pairs.filter(F.col("vs") == "store").select(
                F.col("qid").alias(id_col)
            ).unionByName(
                pairs.filter(F.col("vs") == "batch").select(
                    F.col("cid").alias(id_col)
                )
            ).distinct()
        except Exception:  # first epoch: no store yet
            within = dedup.minhash_lsh_pairs(
                batch_df, text_col, id_col,
                width=width, bands=bands, threshold=threshold,
            )
            drop = within.select(F.col("cid").alias(id_col)).distinct()
        survivors = batch_df.join(drop, id_col, "left_anti").localCheckpoint()
        survivors.write.mode("overwrite").parquet(f"{out_dir}/docs/batch={epoch_id}")
        bands_df, hs_df = dedup.signature_store(
            survivors, text_col, id_col, width=width, bands=bands
        )
        bands_df.write.mode("overwrite").parquet(
            f"{out_dir}/store_bands/batch={epoch_id}"
        )
        hs_df.write.mode("overwrite").parquet(f"{out_dir}/store_hs/batch={epoch_id}")
        dedup.release_caches()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
