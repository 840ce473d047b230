"""Dataset cards: the one-page corpus summary a training-data drop
ships with (counts, token budget, language and source mix, length
distribution).

A composition layer over already-tested operators — ``token_budget``
(BPE-regex totals), ``source_stats`` (mix shares), ``percentile_approx``
— batched into THREE jobs regardless of corpus size: one whole-corpus
aggregate, one per-language aggregate, one per-source aggregate.  Each
piece is scan-side + one partial-aggregated groupBy, so the card costs
what the gated operators cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators import text, web

__all__ = ["dataset_card"]


def dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    source_col: str | None = "source",
    scripts: bool = False,
) -> dict:
    """JSON-able summary: totals, token budget, per-language and
    per-source mixes, length percentiles.  ``lang_col``/``source_col``
    = None skips that section (columns the corpus doesn't carry);
    ``scripts=True`` adds the dominant-unicode-script distribution
    (one extra aggregation over the ``text.script_profile``
    projection)."""
    toks = F.expr(
        f"size(regexp_extract_all({text_col}, '{text.BPE_TOKEN_RE}', 0))"
    )
    overall = docs.select(
        toks.alias("__nt"), F.length(text_col).alias("__nc")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        F.round(F.avg("__nt"), 2).alias("avg_tokens"),
        F.percentile_approx("__nc", [0.5, 0.95, 0.99]).alias("len_pcts"),
    ).collect()[0]
    pcts = overall["len_pcts"] or [None, None, None]  # empty corpus: NULL
    card = {
        "n_docs": overall["n_docs"],
        "n_tokens": overall["n_tokens"] or 0,
        "avg_tokens": overall["avg_tokens"],
        "chars_p50": pcts[0],
        "chars_p95": pcts[1],
        "chars_p99": pcts[2],
    }
    if lang_col and lang_col in docs.columns:
        card["languages"] = {
            r[lang_col]
            if r[lang_col] is not None
            else "unknown": {"n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
            for r in text.token_budget(docs, text_col, by=[lang_col]).collect()
        }
    if source_col and source_col in docs.columns:
        chars = docs.withColumn("__nchars", F.length(text_col))
        card["sources"] = {
            r["source"]: {"n_docs": r["n_docs"], "share_bp": r["share_bp"]}
            for r in web.source_stats(
                chars, by=source_col, chars_col="__nchars"
            ).collect()
        }
    if scripts:
        card["scripts"] = {
            r["script_pred"]: r["n"]
            for r in text.script_profile(docs, text_col)
            .groupBy("script_pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    return card
