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

__all__ = ["profile_table", "profile_duck_sql"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
) -> DataFrame:
    """(col_name, dtype, n_rows, n_nonnull, n_null, n_distinct, min_s,
    max_s) — one row per profiled column, computed in a single
    aggregation job over one scan."""
    dtypes = dict(df.dtypes)
    cols = columns if columns is not None else df.columns
    cols = [c for c in cols if not isinstance(df.schema[c].dataType, MapType)]
    if not cols:
        raise ValueError("no profilable columns")
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
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn{i}").alias("n_nonnull"),
            (F.col("__n") - F.col(f"__nn{i}")).alias("n_null"),
            F.col(f"__nd{i}").alias("n_distinct"),
            F.col(f"__mn{i}").alias("min_s"),
            F.col(f"__mx{i}").alias("max_s"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


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
