"""PII scrubbing: redact emails / IPv4 addresses / phone numbers.

A standard pre-training curation stage (the reference has no analog —
extract→publish only, SURVEY §2.5; this is part of the LLM-data operator
set the north star adds).  Pure ``regexp_replace`` / ``regexp_extract_all``
projections — JVM-side, whole-stage codegen, no shuffle: the operator is
scan-shaped and scales linearly with corpus bytes at 100 TB.

Pattern notes:
- All patterns stay inside the common subset of Java regex (Spark) and
  RE2 (DuckDB) so the operator is oracle-gateable: no backrefs, no
  lookaround, ``\\b`` word boundaries only (supported by both).
- Replacement order matters and is fixed: EMAIL → IP → PHONE.  Emails
  contain phone-like digit runs and IPs are phone-like too; redacting
  the most specific pattern first prevents the phone rule from eating
  half an IP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii", "scrub_pii_sql"]

# (tag, pattern) in redaction order — most specific first.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    # international-ish phone: optional +, then 7+ digits allowing
    # single spaces/dashes/parens between them; anchored on digits at
    # both ends so trailing punctuation stays.
    ("PHONE", r"\+?[0-9][0-9()\- ]{5,}[0-9]\b"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_clean, n_email, n_ip, n_phone, n_pii).

    Counts are measured on the PRE-redaction text per pattern, but each
    pattern counts on the text with the previous (more specific)
    patterns already redacted — so an email's digits never also count
    as a phone.  ``text_clean`` has every match replaced by ``<TAG>``.
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    for tag, pat in PII_PATTERNS:
        cname = f"n_{tag.lower()}"
        # F.expr parses a SQL string literal (backslash-escaped); the
        # F.regexp_replace pattern goes to the JVM verbatim.
        sql_pat = pat.replace("\\", "\\\\")
        out = out.withColumn(
            cname, F.size(F.expr(f"regexp_extract_all(__t, '{sql_pat}', 0)"))
        ).withColumn("__t", F.regexp_replace("__t", pat, f"<{tag}>"))
        counts.append(cname)
    total = sum((F.col(c) for c in counts[1:]), F.col(counts[0]))
    return out.select(
        F.col(id_col),
        F.col("__t").alias("text_clean"),
        *[F.col(c) for c in counts],
        total.alias("n_pii"),
    )


def scrub_pii_sql(source: str = "documents", max_doc: int | None = None) -> tuple[str, str]:
    """Dual-dialect SQL mirror over ``source(doc_id, text)``.

    DuckDB's ``regexp_replace`` is first-match-only without the ``'g'``
    flag (Spark's is always global) — the one dialect difference."""
    where = f"WHERE doc_id <= {max_doc}" if max_doc is not None else ""

    def chain(dialect: str) -> tuple[str, list[str]]:
        t = "text"
        cols = []
        sel = []
        for tag, pat in PII_PATTERNS:
            cname = f"n_{tag.lower()}"
            lit = pat.replace("\\", "\\\\") if dialect == "spark" else pat
            if dialect == "spark":
                sel.append(f"size(regexp_extract_all({t}, '{lit}', 0)) AS {cname}")
                t = f"regexp_replace({t}, '{lit}', '<{tag}>')"
            else:
                sel.append(f"len(regexp_extract_all({t}, '{pat}')) AS {cname}")
                t = f"regexp_replace({t}, '{pat}', '<{tag}>', 'g')"
            cols.append(cname)
        return t, sel

    sp_t, sp_sel = chain("spark")
    du_t, du_sel = chain("duck")
    add = " + ".join(f"n_{tag.lower()}" for tag, _ in PII_PATTERNS)
    spark = f"""
WITH s AS (SELECT doc_id, {sp_t} AS text_clean, {', '.join(sp_sel)} FROM {source} {where})
SELECT doc_id, text_clean, n_email, n_ip, n_phone, {add} AS n_pii FROM s ORDER BY doc_id"""
    duck = f"""
WITH s AS (SELECT doc_id, {du_t} AS text_clean, {', '.join(du_sel)} FROM {source} {where})
SELECT doc_id, text_clean, n_email, n_ip, n_phone, {add} AS n_pii FROM s ORDER BY doc_id"""
    return spark, duck
