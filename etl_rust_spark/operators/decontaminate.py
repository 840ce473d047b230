"""Benchmark decontamination: hashed token n-gram overlap vs an eval set.

Training corpora must not contain evaluation data.  The standard check
(used by every public LLM data pipeline) is token n-gram collision: a
document is contaminated to the degree its n-grams also appear in the
benchmark corpus.  The reference has no analog (it is extract→publish
only, SURVEY §2.5); this is one of the brief's "operations a large-scale
training-data pipeline would need".

Shape at 100 TB:

- The benchmark side is tiny (eval suites are MBs), so its distinct
  n-gram hash set is **broadcast** — the probe over the corpus is a
  broadcast hash join, no shuffle of document data.
- The corpus side is scan-shaped: tokenize → n-gram-hash → explode
  *hashes only* (compact longs, never text), then a partial-aggregated
  ``groupBy(doc_id)``.  Cost is linear in corpus tokens.
- Hashes use the portable 60-bit md5 reduction (`operators/hashes.py`)
  so the DuckDB mirror is bit-identical; a production pipeline would
  swap in ``xxhash64`` (same plan shape, JVM intrinsic).

False-positive control mirrors public practice: n defaults to 8-token
shingles (big enough that natural collisions are rare), and the caller
filters on ``contamination`` (fraction of a doc's distinct n-grams that
hit) rather than any single collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators.hashes import MINHASH_P, duck_h, spark_h

__all__ = ["ngram_hash_col", "contamination", "contamination_sql"]


def ngram_hash_col(toks_col: str, n: int) -> str:
    """Spark SQL expression: distinct hashed token ``n``-grams of an
    array<string> column (empty array when the doc has < n tokens).

    Guarded with CASE because Spark's ``sequence(1, 0)`` yields the
    *descending* array [1, 0], not an empty one.
    """
    h = spark_h(x=f"array_join(slice({toks_col}, i, {n}), ' ')")
    return (
        f"array_distinct(CASE WHEN size({toks_col}) >= {n} THEN"
        f" transform(sequence(1, size({toks_col}) - {n} + 1), i -> {h} % {MINHASH_P})"
        f" ELSE CAST(array() AS array<bigint>) END)"
    )


def _duck_ngram_hashes(toks_col: str, n: int) -> str:
    h = duck_h(x=f"array_to_string({toks_col}[i:i+{n - 1}], ' ')")
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks_col}) - {n} + 2, 1)),"
        f" i -> {h} % {MINHASH_P}))"
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_grams, n_hit, contamination): per-document fraction of
    distinct token ``n``-grams that also occur anywhere in ``bench``.

    ``contamination`` is 0.0 for docs with fewer than ``n`` tokens (no
    n-grams — nothing to collide).  Filter downstream, e.g.
    ``.filter("contamination < 0.05")`` to drop leaked docs.
    """
    bench_text_col = bench_text_col or text_col
    grams = F.expr(ngram_hash_col(f"split({text_col}, ' ')", n))
    doc_grams = docs.select(F.col(id_col), grams.alias("grams")).select(
        id_col, F.size("grams").alias("n_grams"), F.explode_outer("grams").alias("g")
    )
    bench_grams = (
        bench.select(
            F.explode(F.expr(ngram_hash_col(f"split({bench_text_col}, ' ')", n))).alias("g")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = doc_grams.join(F.broadcast(bench_grams), "g", "left")
    return (
        joined.groupBy(id_col, "n_grams")
        .agg(F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"))
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_hit",
            F.when(F.col("n_grams") > 0, F.round(F.col("n_hit") / F.col("n_grams"), 4))
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def contamination_sql(
    n: int = 8,
    max_doc: int = 100,
    bench_lo: int = 150,
    bench_hi: int = 200,
) -> tuple[str, str]:
    """Dual-dialect mirror: docs ``doc_id <= max_doc`` checked against a
    "benchmark" slice ``bench_lo..bench_hi`` of the same table."""
    sp_g = ngram_hash_col("split(text, ' ')", n)
    du_g = _duck_ngram_hashes("string_split(text, ' ')", n)
    spark = f"""
WITH d AS (SELECT doc_id, {sp_g} AS grams FROM documents WHERE doc_id <= {max_doc}),
b AS (SELECT DISTINCT g FROM (SELECT explode({sp_g}) AS g
      FROM documents WHERE doc_id BETWEEN {bench_lo} AND {bench_hi})),
e AS (SELECT doc_id, size(grams) AS n_grams, eg.g
      FROM d LATERAL VIEW OUTER explode(grams) eg AS g),
hit AS (SELECT e.doc_id, e.n_grams, CAST(COUNT(b.g) AS BIGINT) AS n_hit
        FROM e LEFT JOIN b ON e.g = b.g GROUP BY e.doc_id, e.n_grams)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_hit,
  CASE WHEN n_grams > 0 THEN ROUND(n_hit / n_grams, 4) ELSE 0.0 END AS contamination
FROM hit ORDER BY doc_id
"""
    duck = f"""
WITH d AS (SELECT doc_id, {du_g} AS grams FROM documents WHERE doc_id <= {max_doc}),
b AS (SELECT DISTINCT g FROM (SELECT unnest(grams) AS g FROM (SELECT {du_g} AS grams
      FROM documents WHERE doc_id BETWEEN {bench_lo} AND {bench_hi}))),
e AS (SELECT doc_id, len(grams) AS n_grams,
             unnest(CASE WHEN len(grams) = 0 THEN [NULL::BIGINT] ELSE grams END) AS g
      FROM d),
hit AS (SELECT e.doc_id, e.n_grams, CAST(COUNT(b.g) AS BIGINT) AS n_hit
        FROM e LEFT JOIN b ON e.g = b.g GROUP BY e.doc_id, e.n_grams)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_hit,
  CASE WHEN n_grams > 0 THEN ROUND(n_hit / n_grams, 4) ELSE 0.0 END AS contamination
FROM hit ORDER BY doc_id
"""
    return spark, duck
