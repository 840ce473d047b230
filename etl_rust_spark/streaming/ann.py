"""Streaming ANN-index maintenance: embeddings arrive on a stream, the
persisted IVF index stays current.

The third streaming maintenance loop, same discipline as the dedup
stream and the continuous aggregate: ``foreachBatch`` over a
replay-idempotent per-batch operation.  Here the body IS
``similarity.update_ivf_index`` — its keyed upsert of list partitions
replays byte-identically (pinned in tests/test_operators.py), so a
crashed epoch re-applies safely without epoch-delta bookkeeping.

Scale: each micro-batch costs one stored-centroid assignment over the
batch plus a rewrite of the lists it touches; the corpus is never
rescanned.  Centroids are fixed at build time — rebuild the index
(``build_ivf_index``) when the corpus outgrows the trained
distribution, as in the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_rust_spark.operators import similarity as _sim

__all__ = ["run_ann_index_stream"]


def run_ann_index_stream(
    emb_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kind: str = "ivf",
):
    """Start the index-maintenance query; returns the StreamingQuery.
    The index must already exist (``build_ivf_index`` /
    ``build_ivfpq_index`` — training needs a corpus sample, which a
    stream cannot provide retroactively).  ``kind='ivfpq'`` maintains a
    product-quantized index instead (stored-codebook encode + assign;
    same replay-idempotent keyed list-partition upsert)."""
    if kind not in ("ivf", "ivfpq"):
        raise ValueError(f"unknown index kind {kind!r} (ivf | ivfpq)")
    update = _sim.update_ivf_index if kind == "ivf" else _sim.update_ivfpq_index

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update(batch_df, index_path, id_col, vec_col)

    return (
        emb_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
