"""Document chunking + paragraph-level dedup — the granularity stages
of a training-data pipeline.

The reference has no analog (extract→publish only, SURVEY §2.5); these
close two standard gaps between a curated corpus and a trainer:

- :func:`chunk_documents` — split each document's token stream into
  fixed-budget windows with overlap (the context-window prep step).
  Pure array expressions: ``split`` → ``explode(sequence(...))`` →
  ``slice`` → ``concat_ws`` — scan-side, codegen'd, no shuffle, no UDF;
  at 100 TB this is a free projection riding the scan.
- :func:`paragraph_dedupe` — exact dedup at PARAGRAPH granularity
  (boilerplate headers/footers repeat across documents that are not
  themselves duplicates — the classic C4/RefinedWeb cleanup).  First
  global occurrence of each distinct paragraph wins (min (doc_id,
  position) — deterministic); documents are reassembled from their
  surviving paragraphs in order.  Cost shape: one shuffle keyed on the
  64-bit paragraph hash (never full text — paragraphs travel once into
  the window), one groupBy(doc_id) to reassemble.

Both are dual-dialect mirrored (DuckDB reproduces the exact outputs)
and hashed with the portable md5 reduction where hashing is needed, so
they are oracle-gateable bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "chunk_documents",
    "chunk_documents_sql",
    "paragraph_dedupe",
    "paragraph_dedupe_sql",
]


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): fixed-budget token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; every token belongs to at least
    one chunk and consecutive chunks share ``overlap`` tokens.  A doc
    with ≤ ``max_tokens`` tokens yields exactly one chunk.  Empty/NULL
    text yields no rows (filter upstream if that matters).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    toks = f"split({text_col}, ' ')"
    # number of chunks = 1 + floor((n - max_tokens + stride - 1)/stride)
    # for n > max_tokens, else 1 — expressed as a ceil over the stride.
    n_chunks = (
        f"CASE WHEN size({toks}) <= {max_tokens} THEN 1 "
        f"ELSE CAST(ceil((size({toks}) - {max_tokens}) / CAST({stride} AS DOUBLE)) AS INT) + 1 END"
    )
    return (
        df.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
        .select(
            F.col(id_col),
            F.expr(toks).alias("__toks"),
            F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(
                f"concat_ws(' ', slice(__toks, chunk_idx * {stride} + 1, {max_tokens}))"
            ).alias("chunk_text"),
            F.expr(
                f"size(slice(__toks, chunk_idx * {stride} + 1, {max_tokens}))"
            ).cast("long").alias("n_tokens"),
        )
    )


def chunk_documents_sql(
    max_tokens: int = 64,
    overlap: int = 8,
    source: str = "documents",
    max_doc: int | None = None,
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`chunk_documents`."""
    stride = max_tokens - overlap
    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""
    spark = f"""
WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM {source}
           {where} {'AND' if where else 'WHERE'} text IS NOT NULL AND text != ''),
n AS (SELECT doc_id, toks,
        CASE WHEN size(toks) <= {max_tokens} THEN 1
             ELSE CAST(ceil((size(toks) - {max_tokens}) / CAST({stride} AS DOUBLE)) AS INT) + 1 END AS nc
      FROM t),
e AS (SELECT doc_id, toks, explode(sequence(0, nc - 1)) AS chunk_idx FROM n)
SELECT doc_id, chunk_idx,
  concat_ws(' ', slice(toks, chunk_idx * {stride} + 1, {max_tokens})) AS chunk_text,
  CAST(size(slice(toks, chunk_idx * {stride} + 1, {max_tokens})) AS BIGINT) AS n_tokens
FROM e ORDER BY doc_id, chunk_idx"""
    duck = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {source}
           {where} {'AND' if where else 'WHERE'} text IS NOT NULL AND text != ''),
n AS (SELECT doc_id, toks,
        CASE WHEN len(toks) <= {max_tokens} THEN 1
             ELSE CAST(ceil((len(toks) - {max_tokens}) / CAST({stride} AS DOUBLE)) AS INT) + 1 END AS nc
      FROM t),
e AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_idx FROM n)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
  array_to_string(toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {max_tokens}], ' ') AS chunk_text,
  CAST(len(toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {max_tokens}]) AS BIGINT) AS n_tokens
FROM e ORDER BY doc_id, chunk_idx"""
    return spark, duck


def paragraph_dedupe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = ". ",
) -> DataFrame:
    """(id, text_dedup, n_paras, n_kept): drop repeated paragraphs
    corpus-wide, keeping each distinct paragraph's FIRST occurrence
    (min (doc_id, position) — deterministic), and reassemble every
    document from its surviving paragraphs in original order.

    ``sep`` is the paragraph boundary (``"\\n\\n"`` for real corpora;
    the synthetic test corpus has no newlines, so tests use ``". "``).

    Scale shape: ``posexplode`` is scan-side; the first-occurrence
    window partitions by the PARAGRAPH STRING's hash-sized key (Spark
    hashes the partition key — full paragraphs shuffle once, ids+pos
    are carried alongside); reassembly is one groupBy(doc_id) over
    surviving (pos, para) pairs.  Dropping a doc's every paragraph
    yields an empty ``text_dedup`` with ``n_kept = 0`` (filter
    downstream).
    """
    import re

    # Spark's split() takes a REGEX — quote the separator so '. ' (or
    # any metacharacter-bearing boundary) splits literally.
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1)).alias(
            "pos", "para"
        ),
    ).filter(F.col("para") != "")
    w = Window.partitionBy("para").orderBy(F.col(id_col), F.col("pos"))
    kept = paras.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        kept.groupBy(id_col)
        .agg(
            F.expr(f"concat_ws('{sep}', transform(array_sort(collect_list(struct(pos, para))), s -> s.para))").alias("text_dedup"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(
            paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras")),
            id_col,
            "right",
        )
        .na.fill({"text_dedup": "", "n_kept": 0})
        .select(id_col, "text_dedup", "n_paras", F.col("n_kept").cast("long"))
    )


def paragraph_dedupe_sql(
    source: str = "documents",
    sep: str = ". ",
    max_doc: int | None = None,
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`paragraph_dedupe`."""
    import re

    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""
    # Spark SQL split() is regex (escape; backslashes doubled inside the
    # SQL string literal); DuckDB string_split is literal.
    sep_re = re.escape(sep).replace("\\", "\\\\")
    spark = f"""
WITH p0 AS (SELECT doc_id, posexplode(split(text, '{sep_re}', -1)) AS (pos, para)
            FROM {source} {where}),
p AS (SELECT * FROM p0 WHERE para != ''),
k AS (SELECT doc_id, pos, para,
        ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM p),
r AS (SELECT doc_id,
        concat_ws('{sep}', transform(array_sort(collect_list(struct(pos, para))), s -> s.para)) AS text_dedup,
        COUNT(1) AS n_kept
      FROM k WHERE rn = 1 GROUP BY doc_id),
t AS (SELECT doc_id, COUNT(1) AS n_paras FROM p GROUP BY doc_id)
SELECT t.doc_id, COALESCE(r.text_dedup, '') AS text_dedup, t.n_paras,
  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN r ON t.doc_id = r.doc_id ORDER BY t.doc_id"""
    duck = f"""
WITH p0 AS (SELECT doc_id, unnest(string_split(text, '{sep}')) AS para,
              generate_subscripts(string_split(text, '{sep}'), 1) AS pos
            FROM {source} {where}),
p AS (SELECT doc_id, pos - 1 AS pos, para FROM p0 WHERE para != ''),
k AS (SELECT doc_id, pos, para,
        ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM p),
r AS (SELECT doc_id, string_agg(para, '{sep}' ORDER BY pos) AS text_dedup,
        COUNT(1) AS n_kept
      FROM k WHERE rn = 1 GROUP BY doc_id),
t AS (SELECT doc_id, COUNT(1) AS n_paras FROM p GROUP BY doc_id)
SELECT t.doc_id, COALESCE(r.text_dedup, '') AS text_dedup, t.n_paras,
  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN r ON t.doc_id = r.doc_id ORDER BY t.doc_id"""
    return spark, duck
