"""Model-based quality classification (CCNet / LLaMA-style filtering).

The heuristic quality score (``text.quality_score``) is rule-based; the
standard next stage is a LEARNED filter: train a linear classifier to
separate a trusted reference corpus (wiki/books) from raw crawl, then
keep crawl documents the model scores reference-like.  This module is
that stage on Spark MLlib (public `pyspark.ml`):

- features: hashed bag of word unigrams + the rule-based quality
  signals (token count, TTR, stopword ratio) — all scan-side;
- model: L2 logistic regression (distributed L-BFGS — MLlib's
  standard solver; the model object is KBs and broadcasts);
- scoring: one ``transform`` pass → ``p_ref`` ∈ [0, 1] per document.

Determinism: HashingTF is a fixed hash, LogisticRegression with fixed
params on the same data converges to the same optimum (convex); tests
pin separability + threshold behavior rather than exact coefficients.

Scale: training input is a SAMPLE (callers pass e.g.
``pack.hash_sample`` output — deterministic), scoring is a full-corpus
map with the broadcast model; nothing here shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality", "filter_by_quality"]


def _featurize():
    from pyspark.ml.feature import HashingTF, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(
        inputCol="text", outputCol="__toks", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__tf", numFeatures=1 << 14, binary=True
    )
    asm = VectorAssembler(
        inputCols=["__tf", "__nt", "__ttr", "__swr"], outputCol="features"
    )
    return [tok, tf, asm]


def _with_signals(df: DataFrame) -> DataFrame:
    toks = "split(text, ' ')"
    return (
        df.withColumn("__nt", F.expr(f"CAST(size({toks}) AS DOUBLE)"))
        .withColumn(
            "__ttr",
            F.expr(
                f"size(array_distinct({toks})) / CAST(greatest(size({toks}), 1) AS DOUBLE)"
            ),
        )
        .withColumn(
            "__swr",
            F.expr(
                f"size(filter({toks}, x -> x IN ('the','a','of','to','and','in','is'))) "
                f"/ CAST(greatest(size({toks}), 1) AS DOUBLE)"
            ),
        )
    )


def train_quality_classifier(
    reference: DataFrame,
    crawl: DataFrame,
    text_col: str = "text",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit reference-vs-crawl; returns a fitted PipelineModel whose
    ``transform`` adds ``p_ref``.  Pass SAMPLES at scale (the model
    needs thousands of rows, not the corpus)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    train = (
        reference.select(F.col(text_col).alias("text")).withColumn("label", F.lit(1.0))
        .unionByName(
            crawl.select(F.col(text_col).alias("text")).withColumn(
                "label", F.lit(0.0)
            )
        )
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    pipe = Pipeline(stages=_featurize() + [lr])
    return pipe.fit(_with_signals(train))


def score_quality(
    model, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, p_ref): probability the document is reference-like."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        _with_signals(docs.select(F.col(id_col), F.col(text_col).alias("text")))
    )
    return scored.select(
        id_col,
        F.round(vector_to_array("probability")[1], 6).alias("p_ref"),
    )


def filter_by_quality(
    model,
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` (original columns)."""
    keep = score_quality(model, docs, text_col, id_col).filter(
        F.col("p_ref") >= threshold
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")
