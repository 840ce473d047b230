"""LLM-data-pipeline operators + their driver-contract entries.

``entry_queries()`` / ``entry_oracle_sql()`` contribute the operator
surface to ``__spark_entry__``:

Oracle-gated (hash-checked vs DuckDB): exact-dup groups, n-gram Jaccard
pairs, MinHash signatures, SimHash, language-ID, token stats, quality
score, rolling fingerprint, brute-force cosine top-k — the engine side
runs the DataFrame-API operator, the oracle runs hand-written DuckDB SQL
computing the same portable-hash math.

Rows-only (approximate / SQL-inexpressible pipelines, weaker driver
check): MinHash-LSH candidate pairs, sign-LSH ANN top-k.  Their quality
(recall vs brute force, dup detection on planted corpora) is asserted in
``tests/test_operators.py`` instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.operators import dedup, similarity, text

__all__ = [
    "dedup",
    "similarity",
    "text",
    "entry_queries",
    "entry_oracle_sql",
]


def _docs(spark: SparkSession, sf_dir: str, max_doc: int | None = None) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.filter(F.col("doc_id") <= max_doc) if max_doc else df


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _op_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(dedup.exact_dup_sql()[0])


def _op_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.shingle_jaccard_pairs(
        _docs(spark, sf_dir, 20), "text", "doc_id"
    ).withColumnRenamed("jaccard", "jac")


def _op_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(_docs(spark, sf_dir, 50), "text", "doc_id")


def _op_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir, 100), "text", "doc_id")


def _op_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(_docs(spark, sf_dir, 200), "text", "doc_id")


def _op_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(_docs(spark, sf_dir, 200), "text", "doc_id")


def _op_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_token_stats(_docs(spark, sf_dir, 200), "text", "doc_id").orderBy(
        "doc_id"
    )


def _op_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_docs(spark, sf_dir, 100), "text", "doc_id")


def _op_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_docs(spark, sf_dir, 200), "text", "doc_id")


def _op_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return similarity.cosine_topk(emb.filter(F.col("vec_id") <= 20), emb)


def _op_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-gated: the whole pipeline is deterministic md5 arithmetic, so
    # the oracle (minhash_lsh_pairs_duck_sql) reproduces it stage by
    # stage; quality is additionally asserted against planted duplicates.
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), "text", "doc_id", threshold=0.2
    ).orderBy("qid", "cid")


def _op_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rows-only: the deterministic decode stub (sha256-derived features)
    # is not SQL-expressible; plumbing is asserted in tests.  Documents
    # stand in as assets: payload = utf-8 bytes of the text.
    from etl_rust_spark.operators import multimodal

    assets = _docs(spark, sf_dir, 50).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("synthetic://documents").alias("source_uri"),
        ).alias("meta"),
    )
    feats = multimodal.extract_features(assets)
    return feats.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.round(F.element_at("feature", 1), 6).alias("f1"),
    ).orderBy("asset_id")


def _op_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_near_dup_pairs(_emb(spark, sf_dir)).orderBy("qid", "cid")


def _op_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rows-only: approximate by design; recall vs cosine_topk asserted in
    # tests (≥0.9 with 8-bit bucket prefix on the synthetic corpus).
    emb = _emb(spark, sf_dir)
    return similarity.ann_lsh_topk(emb.filter(F.col("vec_id") <= 20), emb)


def _op_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rows-only: approximate (learned quantizer); recall vs cosine_topk
    # asserted in tests.
    emb = _emb(spark, sf_dir)
    return similarity.ivf_topk(emb.filter(F.col("vec_id") <= 20), emb)


def entry_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "op_dedup_exact": _op_dedup_exact,
        "op_jaccard_pairs": _op_jaccard_pairs,
        "op_minhash": _op_minhash,
        "op_simhash": _op_simhash,
        "op_langid": _op_langid,
        "op_token_stats": _op_token_stats,
        "op_bpe_tokens": _op_bpe_tokens,
        "op_quality": _op_quality,
        "op_fingerprint": _op_fingerprint,
        "op_cosine_topk": _op_cosine_topk,
        "op_embedding_dedup": _op_embedding_dedup,
        "op_multimodal_features": _op_multimodal_features,
        "op_minhash_lsh_pairs": _op_minhash_lsh_pairs,
        "op_ann_lsh_topk": _op_ann_lsh_topk,
        "op_ivf_topk": _op_ivf_topk,
    }


def entry_oracle_sql() -> dict[str, str]:
    return {
        "op_dedup_exact": dedup.exact_dup_sql()[1],
        "op_jaccard_pairs": dedup.jaccard_pairs_sql(20)[1],
        "op_minhash": dedup.minhash_sql(50)[1],
        "op_simhash": dedup.simhash_sql(100)[1],
        "op_langid": text.langid_sql(200)[1],
        "op_token_stats": text.token_stats_sql(200)[1],
        "op_bpe_tokens": text.bpe_token_stats_sql(200)[1],
        "op_quality": text.quality_sql(100)[1],
        "op_fingerprint": text.fingerprint_sql(200)[1],
        "op_cosine_topk": similarity.cosine_topk_sql(20)[1],
        "op_embedding_dedup": similarity.near_dup_sql()[1],
        "op_minhash_lsh_pairs": dedup.minhash_lsh_pairs_duck_sql(),
        # op_ann_lsh_topk / op_multimodal_features: intentionally no
        # oracle (random-hyperplane buckets / python decode stub) →
        # driver records rows-only checks; recall & determinism are
        # asserted in tests instead.
    }
