"""Text cleanup stages: C4 line-level cleaning and typography/unicode
normalization.

C4 (Raffel et al. 2020, §2.2):

The Gopher rules (text.gopher_quality_flags) DECIDE per document; the
C4 cleaner EDITS inside the document — drop bad lines, keep good ones,
reconstruct the page — and only then decides.  This is the other half
of the standard web-corpus cleanup the brief's text-analysis family
names, and it composes with the rest of the pipeline: run it before
language-ID / quality / dedup so downstream operators never see
navigation menus and cookie banners.

Public C4 rules implemented (each parameterizable):
- keep only lines ending in a terminal punctuation mark (``. ! ? "``);
- keep only lines with at least ``min_words`` words (paper: 5);
- drop any line containing the word "javascript" (case-insensitive);
- drop the whole page if it has fewer than ``min_sentences`` sentences
  after line filtering (paper: 3), contains "lorem ipsum", contains a
  curly brace, or (opt-in) matches a caller-supplied badword list.

Scale: a pure scan-side projection — ``split`` → ``filter`` (HOF) →
``array_join`` — zero shuffles, linear at 100 TB.  The HOF lambda does
not enter whole-stage codegen (known Spark limitation, NEXT.md gotcha)
but stays JVM-side and vectorizes per row group; there is no Python in
the path.  Dual-dialect mirror: :func:`c4_clean_sql` (Java regex ∩ RE2
only — no lookaround/backrefs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "c4_clean_lines",
    "c4_clean_sql",
    "dedup_lines",
    "dedup_lines_sql",
    "normalize_text",
    "normalize_text_sql",
]

# Terminal punctuation per the C4 paper: period, exclamation, question
# mark, or closing double quote.
_TERM_RE = '[.!?"]\\s*$'
_JS_RE = "\\bjavascript\\b"


def _line_ok(line: Column, min_words: int) -> Column:
    words = F.size(F.split(F.trim(line), "\\s+"))
    return (
        line.rlike(_TERM_RE)
        & (words >= min_words)
        & ~F.lower(line).rlike(_JS_RE)
    )


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_sentences: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """(id, text_c4, n_lines, n_lines_kept, n_sentences, c4_keep).

    ``text_c4`` is the page rebuilt from surviving lines (newline
    joined); ``c4_keep`` is the page-level verdict — callers filter on
    it and continue with ``text_c4``.  NULL text yields an empty clean
    text with ``c4_keep`` false (never a NULL verdict), so the filter
    stage downstream needs no null guard.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")
    kept = F.filter(lines, lambda l: _line_ok(l, min_words))
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit("[.!?]"))
    bad = F.lower(txt).contains("lorem ipsum") | txt.contains("{")
    if badwords:
        import re as _re

        # escape every word: a list entry with regex metachars must
        # match literally, not corrupt the alternation.
        pat = "\\b(" + "|".join(_re.escape(w.lower()) for w in badwords) + ")\\b"
        bad = bad | F.lower(txt).rlike(pat)
    out = df.select(
        F.col(id_col),
        clean.alias("text_c4"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        ((n_sent >= min_sentences) & ~bad).alias("c4_keep"),
    )
    return out


def c4_clean_sql(
    source: str = "documents",
    min_words: int = 5,
    min_sentences: int = 3,
    max_doc: int | None = None,
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`c4_clean_lines` over
    ``source(doc_id, text)``; ``c4_keep`` is cast to BIGINT 0/1 (the
    cross-engine canonical form for booleans, per the gopher_pass
    lesson)."""
    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""

    def q(dialect: str) -> str:
        # Spark SQL string literals process backslash escapes; DuckDB's
        # do not (strip_markup lesson).
        if dialect == "spark":
            term, ws, js = '[.!?\\"]\\\\s*$', "\\\\s+", "\\\\bjavascript\\\\b"
            split_l = "split(coalesce(text, ''), '\\n')"
            keep = (
                f"filter({split_l}, l -> l RLIKE '{term}' "
                f"AND size(split(trim(l), '{ws}')) >= {min_words} "
                f"AND NOT lower(l) RLIKE '{js}')"
            )
            joined = "array_join(__kept, '\\n')"
            nsent = "size(regexp_extract_all(__clean, '[.!?]', 0))"
            nlines = f"size({split_l})"
            nkept = "size(__kept)"
        else:
            term, ws, js = '[.!?"]\\s*$', "\\s+", "\\bjavascript\\b"
            split_l = "string_split(coalesce(text, ''), chr(10))"
            keep = (
                f"list_filter({split_l}, l -> regexp_matches(l, '{term}') "
                f"AND len(string_split_regex(trim(l), '{ws}')) >= {min_words} "
                f"AND NOT regexp_matches(lower(l), '{js}'))"
            )
            # array_to_string of an EMPTY list is NULL in DuckDB (Spark's
            # array_join returns '') — coalesce to keep the dialects equal.
            joined = "coalesce(array_to_string(__kept, chr(10)), '')"
            nsent = "len(regexp_extract_all(__clean, '[.!?]'))"
            nlines = f"len({split_l})"
            nkept = "len(__kept)"
        low = "lower(coalesce(text, ''))"
        bad = (
            f"({low} LIKE '%lorem ipsum%' OR coalesce(text, '') LIKE '%{{%')"
        )
        return f"""
WITH k AS (SELECT doc_id, text, {keep} AS __kept FROM {source} {where}),
c AS (SELECT doc_id, text, __kept, {joined} AS __clean FROM k)
SELECT doc_id, __clean AS text_c4, {nlines} AS n_lines, {nkept} AS n_lines_kept,
  {nsent} AS n_sentences,
  CAST(CASE WHEN {nsent} >= {min_sentences} AND NOT {bad} THEN 1 ELSE 0 END AS BIGINT) AS c4_keep
FROM c ORDER BY doc_id"""

    return q("spark"), q("duck")


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document EXACT line dedup (the RefinedWeb/MassiveWeb
    repetition-removal edit, next to the Gopher repetition SIGNALS in
    text.repetition_stats which only measure): every line keeps its
    FIRST occurrence, later byte-identical repeats drop — boilerplate
    nav rows, repeated headers, chat-log echo.  Corpus-level dedup
    (dedup.py) never sees inside one document; this is the
    within-document half.

    Returns (id, text_dd, n_lines, n_lines_kept).  NULL text yields ''
    with 0/0 counts (no NULL verdicts downstream).

    Scale: a pure scan-side projection — split → positional HOF filter
    (keep line i iff ``array_position`` finds it first at i) →
    array_join; zero shuffles, no Python.  The filter is O(lines²) per
    document in the worst case — lines-per-doc is bounded and tiny
    relative to I/O; a pathological single-document megafile belongs in
    chunking first."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")
    kept = F.filter(
        lines, lambda l, i: F.array_position(lines, l) == i + 1
    )
    n_lines = F.when(txt == "", F.lit(0)).otherwise(F.size(lines))
    n_kept = F.when(txt == "", F.lit(0)).otherwise(F.size(kept))
    return df.select(
        F.col(id_col),
        F.when(txt == "", F.lit("")).otherwise(
            F.array_join(kept, "\n")
        ).alias("text_dd"),
        n_lines.alias("n_lines"),
        n_kept.alias("n_lines_kept"),
    )


def dedup_lines_sql(
    source: str = "documents", max_doc: int | None = None
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`dedup_lines` over
    ``source(doc_id, text)``.  Index semantics differ: Spark's filter
    lambda index is 0-based, DuckDB's is 1-based; both sides keep a
    line iff its list_position/array_position (first occurrence,
    1-based in both) equals its own position."""
    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""

    def q(dialect: str) -> str:
        if dialect == "spark":
            split_l = "split(coalesce(text, ''), '\\n')"
            kept = (
                f"filter(__l, (x, i) -> array_position(__l, x) = i + 1)"
            )
            joined = "array_join(__kept, '\\n')"
            size = "size"
        else:
            split_l = "string_split(coalesce(text, ''), chr(10))"
            kept = (
                "list_filter(__l, (x, i) -> list_position(__l, x) = i)"
            )
            # empty-list joins are NULL in DuckDB, '' in Spark
            joined = "coalesce(array_to_string(__kept, chr(10)), '')"
            size = "len"
        return f"""
WITH s AS (SELECT doc_id, coalesce(text, '') AS __t, {split_l} AS __l
           FROM {source} {where}),
k AS (SELECT doc_id, __t, __l, {kept} AS __kept FROM s)
SELECT doc_id, CASE WHEN __t = '' THEN '' ELSE {joined} END AS text_dd,
  CAST(CASE WHEN __t = '' THEN 0 ELSE {size}(__l) END AS INT) AS n_lines,
  CAST(CASE WHEN __t = '' THEN 0 ELSE {size}(__kept) END AS INT) AS n_lines_kept
FROM k ORDER BY doc_id"""

    return q("spark"), q("duck")


# Single-char folds done with translate() (JVM-side, one pass):
# curly/angle quotes -> ascii, en/em dashes -> hyphen, NBSP -> space,
# zero-width characters -> deleted (the `to` string is shorter, so the
# tail of `frm` maps to deletion in BOTH Spark and DuckDB/Postgres
# translate semantics).
_TR_FROM = "‘’‚“”„«»–— ​‌‍﻿"
_TR_TO = "'''" + '"' * 5 + "--" + " "  # 11 chars: the 4 zero-width tail deletes
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def _norm_expr(col: Column) -> Column:
    c = F.translate(col, _TR_FROM, _TR_TO)
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, _CTRL_RE, "")
    # collapse horizontal whitespace runs; newlines survive (the C4
    # line cleaner needs them)
    c = F.regexp_replace(c, "[ \\t]+", " ")
    return F.trim(c)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str | None = None,
) -> DataFrame:
    """(id, text_norm): unicode/typography normalization — the stage
    that runs BEFORE hashing or shingling so that typographically-equal
    documents dedup as equal.

    The default path is pure scan-side expressions (translate + three
    regexp_replace): quote/dash/NBSP folding, zero-width and control
    character removal, horizontal-whitespace collapse — zero shuffle,
    linear at 100 TB, dual-dialect mirrored (:func:`normalize_text_sql`).

    ``form='NFKC'`` (or NFC/NFKD/NFD) additionally applies full unicode
    normalization (ligatures, fullwidth forms, compatibility digits) via
    an Arrow-batched ``unicodedata`` kernel AFTER the expression pass —
    the documented Python-unavoidable case (no JVM-side normalizer in
    the SQL function set); per-batch vectorization keeps it off the
    per-row-UDF slow path.  NULL text stays NULL on both paths.
    """
    out = df.select(F.col(id_col), _norm_expr(F.col(text_col)).alias("text_norm"))
    if form is None:
        return out
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("text_norm", T.StringType()),
        ]
    )

    def gen(batches):
        import unicodedata

        for pdf in batches:
            pdf = pdf.copy()
            pdf["text_norm"] = pdf["text_norm"].map(
                lambda t: None if t is None else unicodedata.normalize(form, t)
            )
            yield pdf

    return out.mapInPandas(gen, schema)


def normalize_text_sql(source: str = "documents", max_doc: int | None = None) -> tuple[str, str]:
    """Dual-dialect mirror of the expression path of
    :func:`normalize_text` (``form=None``)."""
    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""

    def q(dialect: str) -> str:
        if dialect == "spark":
            esc = lambda s: s.encode("unicode_escape").decode().replace("\\x", "\\u00")
            frm, to = esc(_TR_FROM), _TR_TO.replace("'", "\\'").replace('"', '\\"')
            ell, g = "\\u2026", ""
            ctrl = _CTRL_RE.replace("\\", "\\\\")
            ws = "[ \\\\t]+"
        else:
            # DuckDB string literals are verbatim: embed the actual
            # characters via chr() concatenation to stay ascii-safe.
            frm = " || ".join(f"chr({ord(ch)})" for ch in _TR_FROM)
            frm = f"({frm})"
            to = "'" + _TR_TO.replace("'", "''") + "'"
            ell, g = "chr(8230)", ", 'g'"
            ctrl = _CTRL_RE
            ws = "[ \\t]+"
        if dialect == "spark":
            c = f"translate(text, '{frm}', '{to}')"
            c = f"regexp_replace({c}, '{ell}', '...')"
            c = f"regexp_replace({c}, '{ctrl}', '')"
            c = f"trim(regexp_replace({c}, '{ws}', ' '))"
        else:
            c = f"translate(text, {frm}, {to})"
            c = f"regexp_replace({c}, {ell}, '...'{g})"
            c = f"regexp_replace({c}, '{ctrl}', ''{g})"
            c = f"trim(regexp_replace({c}, '{ws}', ' '{g}))"
        return f"SELECT doc_id, {c} AS text_norm FROM {source} {where} ORDER BY doc_id"

    return q("spark"), q("duck")
