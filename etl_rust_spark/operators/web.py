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

__all__ = [
    "domain_of",
    "canonical_url",
    "url_dedupe",
    "canonical_url_sql",
    "source_stats",
    "source_stats_sql",
    "filter_sources",
    "extract_main_content",
    "extract_main_content_sql",
    "BLOCK_TAG_RE",
]

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


# Query parameters that never change page content — the standard
# tracking families a URL canonicalizer drops before URL-level dedup.
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref|ref_src)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def canonical_url(url_col: str | Column) -> Column:
    """Canonical form of a URL for URL-level dedup, NULL when the value
    does not parse as an absolute URL:

    - scheme and host lowercased, userinfo and ``www.`` dropped;
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - fragment dropped; trailing slashes stripped from the path
      (``/`` ≡ empty);
    - tracking query parameters dropped (utm_*, gclid, fbclid, …) and
      the survivors SORTED, so parameter order never splits a page into
      two "distinct" URLs.

    Path and query VALUE case is preserved (case-significant on real
    servers).  Pure regex/array expressions — scan-side, zero shuffle,
    dialect-portable (no lookaround).  Mirror: :func:`canonical_url_sql`.
    """
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    auth = F.regexp_extract(col, _AUTH_RE, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(auth, r"^(?:[^@]*@)?([^:]*)", 1)),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.regexp_extract(col, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(col, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.array_join(params, "&")
    q_part = F.when(qstr == "", F.lit("")).otherwise(F.concat(F.lit("?"), qstr))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when((scheme != "") & (host != ""), canon)


def url_dedupe(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact URL-level dedup: keep the lowest-id row per canonical URL
    (rows whose URL does not parse are kept — they have no dedup key).
    One hash-groupBy shuffle on the canonical key, the same shape as
    content-hash exact dedup."""
    keyed = df.withColumn("__cu", canonical_url(url_col))
    from pyspark.sql import Window

    w = Window.partitionBy("__cu").orderBy(id_col)
    return (
        keyed.withColumn(
            "__rn",
            F.when(F.col("__cu").isNull(), F.lit(1)).otherwise(
                F.row_number().over(w)
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__cu", "__rn")
    )


def canonical_url_sql(source: str, url_col: str = "url") -> tuple[str, str]:
    """Dual-dialect mirror of :func:`canonical_url` over
    ``source(doc_id, url)`` → (doc_id, url_canon)."""

    def q(dialect: str) -> str:
        # Spark SQL string literals process backslash escapes; DuckDB's
        # do not.
        def rx(pat: str) -> str:
            return pat.replace("\\", "\\\\") if dialect == "spark" else pat

        track = rx(_TRACKING_RE)
        if dialect == "spark":
            ext = lambda c, pat, g: f"regexp_extract({c}, '{rx(pat)}', {g})"
            rep = lambda c, pat, r: f"regexp_replace({c}, '{rx(pat)}', '{r}')"
            flt = (
                f"filter(split(__q, '&'), p -> p != '' AND NOT p RLIKE '{track}')"
            )
            srt, join = "array_sort", "array_join"
        else:
            ext = lambda c, pat, g: f"regexp_extract({c}, '{pat}', {g})"
            rep = lambda c, pat, r: f"regexp_replace({c}, '{pat}', '{r}', 'g')"
            flt = (
                "list_filter(string_split(__q, '&'), "
                f"p -> p != '' AND NOT regexp_matches(p, '{track}'))"
            )
            srt, join = "list_sort", "array_to_string"
        u = url_col
        # Hoisted out of the f-string: expression parts cannot contain
        # backslashes before Python 3.12.
        query_re = r"\?([^#]*)"
        user_host_re = r"^(?:[^@]*@)?([^:]*)"
        www_re = r"^www\."
        e_scheme = ext(u, _SCHEME_RE, 1)
        e_auth = ext(u, _AUTH_RE, 1)
        e_path = rep(ext(u, _PATH_RE, 1), "/+$", "")
        e_query = ext(u, query_re, 1)
        e_host = rep("lower(" + ext("__a", user_host_re, 1) + ")", www_re, "")
        e_port = ext("__a", ":([0-9]+)$", 1)
        return f"""
WITH p AS (SELECT doc_id,
    lower({e_scheme}) AS __s,
    {e_auth} AS __a,
    {e_path} AS __p,
    {e_query} AS __q
  FROM {source}),
h AS (SELECT *, {e_host} AS __h,
    {e_port} AS __port FROM p),
qq AS (SELECT *, coalesce({join}({srt}({flt}), '&'), '') AS __qs FROM h)
SELECT doc_id,
  CASE WHEN __s != '' AND __h != '' THEN
    __s || '://' || __h ||
    (CASE WHEN __port = '' OR (__s = 'http' AND __port = '80')
               OR (__s = 'https' AND __port = '443')
          THEN '' ELSE ':' || __port END) ||
    __p || (CASE WHEN __qs = '' THEN '' ELSE '?' || __qs END)
  END AS url_canon
FROM qq ORDER BY doc_id"""

    return q("spark"), q("duck")


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


# ---------------------------------------------------------------------------
# Main-content extraction (jusText/Readability-style block classifier)
# ---------------------------------------------------------------------------

#: Block-LEVEL tags segment the page; inline tags (a/b/i/em/span/...)
#: stay inside their block so link density is measurable per block.
BLOCK_TAG_RE = (
    "(?i)</?(?:div|p|br|td|th|tr|table|ul|ol|li|h[1-6]|section|article"
    "|aside|nav|header|footer|blockquote|pre|form|body|html|head|title|hr)"
    "[^>]*>"
)
_ANCHOR_RE = "(?i)<a[^>]*>([^<]*)</a>"
_ENTS = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
         ("&amp;", "&"))


def _block_clean(x):
    c = F.regexp_replace(x, "<[^>]*>", " ")
    for ent, ch in _ENTS:
        c = F.regexp_replace(c, ent, ch)
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def extract_main_content(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
    max_link_third: bool = True,
) -> DataFrame:
    """(id, text_main, n_blocks, n_kept, kept_bp): jusText-style
    main-content extraction — the stage :func:`text.strip_markup`
    cannot be: tag-stripping keeps nav bars, footers, and link lists
    verbatim; this SEGMENTS the page on block-level tags and keeps
    only content-shaped blocks.

    Block keep rule (per jusText's short/good heuristic, integer-only
    so both dialects agree exactly): cleaned length ≥ ``min_len`` AND
    anchor-text chars × 3 ≤ cleaned length (≤⅓ link density — a nav
    bar is mostly anchor text, a paragraph is not).  ``kept_bp`` =
    ⌊10⁴ · kept_chars / total_chars⌋ is the page's content fraction
    (the boilerplate metric corpus reports plot).

    Everything is a row-local higher-order-function chain (split →
    filter → transform → aggregate): zero shuffles, order-preserving
    reassembly WITHOUT collect_list (whose post-shuffle order is
    undefined — the trap this shape avoids), linear at 100 TB.
    Dual-dialect mirror: :func:`extract_main_content_sql`.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    blocks = F.filter(
        F.split(raw, BLOCK_TAG_RE), lambda x: x.rlike("\\S")
    )

    def link_chars(x):
        return F.aggregate(
            F.regexp_extract_all(x, F.lit(_ANCHOR_RE), F.lit(1)),
            F.lit(0),
            lambda acc, s: acc + F.length(s),
        )

    def keep(x):
        cl = _block_clean(x)
        return (F.length(cl) >= min_len) & (link_chars(x) * 3 <= F.length(cl))

    kept = F.filter(blocks, keep)
    total_c = F.aggregate(blocks, F.lit(0), lambda a, b: a + F.length(_block_clean(b)))
    kept_c = F.aggregate(kept, F.lit(0), lambda a, b: a + F.length(_block_clean(b)))
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(kept, _block_clean), " ").alias("text_main"),
        F.size(blocks).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
        F.floor(
            F.lit(10000).cast("double") * kept_c / F.greatest(total_c, F.lit(1))
        ).cast("long").alias("kept_bp"),
    )


def extract_main_content_sql(
    source: str = "documents", max_doc: int | None = None, min_len: int = 40
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`extract_main_content` over
    ``source(doc_id, text)`` — every documented cross-dialect trap
    handled: Spark SQL string literals eat one backslash level (``\\s``
    must be ``\\\\s`` in the text), DuckDB list folds/``array_to_string``
    return NULL on empty lists (coalesced), numeric literals are
    DECIMAL in Spark SQL (CAST to DOUBLE before the bp division)."""
    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""

    def q(d: str) -> str:
        g = ", 'g'" if d == "duck" else ""
        ws = "\\\\s+" if d == "spark" else "\\s+"
        nonblank = "\\\\S" if d == "spark" else "\\S"

        def clean(x: str) -> str:
            c = f"regexp_replace({x}, '<[^>]*>', ' '{g})"
            for ent, ch in _ENTS:
                rep = ch.replace("'", "''") if d == "duck" else ch.replace("'", "\\'")
                c = f"regexp_replace({c}, '{ent}', '{rep}'{g})"
            return f"trim(regexp_replace({c}, '{ws}', ' '{g}))"

        if d == "spark":
            split = f"filter(split(coalesce(text, ''), '{BLOCK_TAG_RE}'), x -> x RLIKE '{nonblank}')"
            link = (
                f"aggregate(regexp_extract_all(x, '{_ANCHOR_RE}', 1), 0, "
                f"(acc, s) -> acc + length(s))"
            )
            keep = f"x -> length({clean('x')}) >= {min_len} AND {link} * 3 <= length({clean('x')})"
            body = f"""
SELECT doc_id,
  array_join(transform(filter(b, {keep}), x -> {clean('x')}), ' ') AS text_main,
  CAST(size(b) AS BIGINT) AS n_blocks,
  CAST(size(filter(b, {keep})) AS BIGINT) AS n_kept,
  CAST(FLOOR(CAST(10000 AS DOUBLE)
       * aggregate(filter(b, {keep}), 0, (a, x) -> a + length({clean('x')}))
       / GREATEST(aggregate(b, 0, (a, x) -> a + length({clean('x')})), 1)) AS BIGINT) AS kept_bp
FROM (SELECT doc_id, {split} AS b FROM {source} {where}) t
ORDER BY doc_id"""
        else:
            split = (
                f"list_filter(regexp_split_to_array(coalesce(text, ''), '{BLOCK_TAG_RE}'), "
                f"x -> regexp_matches(x, '{nonblank}'))"
            )
            link = (
                f"COALESCE(list_sum(list_transform(regexp_extract_all(x, '{_ANCHOR_RE}', 1), "
                f"s -> len(s))), 0)"
            )
            keep = f"x -> len({clean('x')}) >= {min_len} AND {link} * 3 <= len({clean('x')})"
            body = f"""
SELECT doc_id,
  COALESCE(array_to_string(list_transform(list_filter(b, {keep}), x -> {clean('x')}), ' '), '') AS text_main,
  CAST(len(b) AS BIGINT) AS n_blocks,
  CAST(len(list_filter(b, {keep})) AS BIGINT) AS n_kept,
  CAST(FLOOR(CAST(10000 AS DOUBLE)
       * COALESCE(list_sum(list_transform(list_filter(b, {keep}), x -> len({clean('x')}))), 0)
       / GREATEST(COALESCE(list_sum(list_transform(b, x -> len({clean('x')}))), 0), 1)) AS BIGINT) AS kept_bp
FROM (SELECT doc_id, {split} AS b FROM {source} {where}) t
ORDER BY doc_id"""
        return body

    return q("spark"), q("duck")
