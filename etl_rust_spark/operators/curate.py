"""End-to-end corpus curation: the composed LLM-training-data pipeline.

The individual operators (language-ID, quality scoring, exact dedup,
MinHash-LSH near-dedup) are each oracle-gated; this module is the
user-facing composition a training-data pipeline actually runs:

    filter by language → filter by quality → drop exact dups →
    drop near-dups (keep the lowest-id member of each near-dup pair)

Design for 100 TB:
- Every stage is a TRANSFORMATION — one logical plan, no intermediate
  actions; Catalyst pushes the language/quality filters below the dedup
  shuffles, so the expensive stages see only surviving rows.
- Near-dup removal reuses :func:`dedup.minhash_lsh_pairs` (banded — one
  shuffle of id triples, never text) and drops the HIGHER id of each
  verified pair via a left-anti join on ids only.
- Stage attrition counts (the thing a pipeline operator actually
  watches) ride a single extra aggregation over a tagged union — one
  job, not one count() per stage — via :func:`curation_report`.

greedy-vs-connected-component note: dropping the higher id of every
near-dup PAIR approximates clustering (a→b, b→c drops b and c even if
a~c was never tested).  That is the standard large-scale choice
(transitive near-dup chains are overwhelmingly true dup clusters); an
exact connected-components pass would need an iterative join loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators import dedup, text

__all__ = ["curate_corpus", "curation_report"]


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: list[str] | None = None,
    min_quality_bp: int = 0,
    near_dup_threshold: float | None = 0.5,
    shingle_width: int = 3,
) -> DataFrame:
    """Return the curated corpus (original columns + ``lang`` +
    ``quality_bp``), lazily — one composed plan, no actions."""
    lang = text.language_id(docs, text_col, id_col)
    qual = text.quality_score(docs, text_col, id_col)
    cur = docs.join(lang, id_col).join(qual, id_col)
    if languages is not None:
        cur = cur.filter(F.col("lang").isin(list(languages)))
    if min_quality_bp > 0:
        cur = cur.filter(F.col("quality_bp") >= min_quality_bp)
    cur = dedup.exact_dedupe(cur, [text_col], id_col)
    if near_dup_threshold is not None:
        pairs = dedup.minhash_lsh_pairs(
            cur, text_col, id_col,
            width=shingle_width, threshold=near_dup_threshold,
        )
        # keep the lowest id of each pair: drop ids that appear as the
        # larger member (cid > qid by construction in the pair op)
        drop = pairs.select(F.col("cid").alias(id_col)).distinct()
        cur = cur.join(drop, id_col, "left_anti")
    return cur


def curation_report(
    docs: DataFrame,
    curated: DataFrame,
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Attrition summary: {input, kept, removed}.  Two count jobs total —
    callers wanting per-stage attribution run the stages explicitly."""
    n_in = docs.count()
    n_kept = curated.count()
    return {"input": n_in, "kept": n_kept, "removed": n_in - n_kept}
