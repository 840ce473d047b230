"""Source/domain-level corpus statistics and filtering (C4-style).

Web-scale corpora are curated per DOMAIN as much as per document:
blocklists, per-domain caps, and source-mix reporting are standard
stages.  The synthetic ``documents`` table carries a categorical
``source`` column; real corpora carry URLs — :func:`domain_of` extracts
the registrable host so the same stats/filter operators apply.

Everything is scan-side expressions + one aggregation; the blocklist
filter is a broadcast semi-join when given a DataFrame, a literal
``isin`` when given a list — both shuffle-free on the corpus side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["domain_of", "source_stats", "source_stats_sql", "filter_sources"]

# scheme://[user@]host[:port]/... → host, lowercased, leading www. dropped
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def domain_of(url_col: str | Column) -> Column:
    """Registrable-host expression: lowercase host of a URL, ``www.``
    prefix stripped; empty string when the value does not parse as a
    URL.  (Public-suffix-aware eTLD+1 reduction is a lookup-table join
    away — the host is the join key.)"""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.regexp_extract(F.lower(col), _HOST_RE, 1)
    return F.regexp_replace(host, r"^www\.", "")


def source_stats(
    df: DataFrame, by: str = "source", chars_col: str = "n_chars"
) -> DataFrame:
    """(source, n_docs, n_chars, share_bp): per-source doc counts, char
    mass, and share of the corpus in basis points — the mix report a
    curation run publishes.  One aggregation; the total rides a window
    over the (small) aggregated frame, not a second scan."""
    from pyspark.sql import Window

    agg = df.groupBy(F.col(by).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(chars_col)).cast("long").alias("n_chars"),
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "source",
        "n_docs",
        "n_chars",
        F.floor(F.col("n_docs") * 10000 / total).cast("long").alias("share_bp"),
    ).orderBy("source")


def source_stats_sql(source: str = "documents", by: str = "source") -> tuple[str, str]:
    """Dual-dialect mirror of :func:`source_stats`."""
    sql = f"""
WITH a AS (SELECT {by} AS source, COUNT(1) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
           FROM {source} GROUP BY {by})
SELECT source, n_docs, n_chars,
  CAST(FLOOR(n_docs * 10000 / (SELECT SUM(n_docs) FROM a)) AS BIGINT) AS share_bp
FROM a ORDER BY source"""
    return sql, sql


def filter_sources(
    df: DataFrame,
    blocklist: "list[str] | DataFrame | None" = None,
    allowlist: "list[str] | DataFrame | None" = None,
    col: str = "source",
) -> DataFrame:
    """Drop blocklisted / keep only allowlisted sources.

    List inputs become literal predicates (pushed to the scan);
    DataFrame inputs (a one-column frame of source values — the shape a
    maintained blocklist table has) become broadcast anti/semi joins, so
    a million-entry blocklist still never shuffles the corpus.
    """
    out = df
    if blocklist is not None:
        if isinstance(blocklist, DataFrame):
            b = blocklist.toDF(col)
            out = out.join(F.broadcast(b), col, "left_anti")
        else:
            out = out.filter(~F.col(col).isin(list(blocklist)))
    if allowlist is not None:
        if isinstance(allowlist, DataFrame):
            a = allowlist.toDF(col)
            out = out.join(F.broadcast(a), col, "left_semi")
        else:
            out = out.filter(F.col(col).isin(list(allowlist)))
    return out
