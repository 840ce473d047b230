"""DuckDB oracle runner for differential testing (SURVEY.md §5.2 item 1).

Runs a Spark-dialect query in the engine and its DuckDB-dialect
counterpart in DuckDB over the same parquet directory, canonicalizes
both result sets (sorted columns, sorted rows, repr-rounded floats) and
compares hashes.
"""

from __future__ import annotations

import duckdb

from etl_rust_spark.catalog import TABLES, register_views
from etl_rust_spark.functions.hashing import canonical_hash, canonical_rows

__all__ = ["duck_connect", "run_duck", "run_spark", "compare"]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_duck(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[tuple], list[str]]:
    """Fetch via Arrow, NOT fetchall().

    fetchall() coerces DuckDB HUGEINT (the result type of SUM(BIGINT))
    to plain Python int, which made the round-1 local harness blind to
    the int128-vs-int64 type difference the driver's gate detects
    (VERDICT r1: 7 hash failures, all integer-SUM queries).  Arrow
    surfaces HUGEINT as decimal128 → Decimal, so the local gate now
    discriminates exactly like the driver's.
    """
    cur = con.execute(sql)
    tbl = cur.fetch_arrow_table()
    cols = tbl.column_names
    pylists = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = [tuple(vals) for vals in zip(*pylists)]
    return rows, cols


def run_spark(spark, sf_dir: str, sql: str) -> tuple[list[tuple], list[str]]:
    register_views(spark, sf_dir)
    df = spark.sql(sql)
    rows = [tuple(r) for r in df.collect()]
    return rows, list(df.columns)


def compare(spark, con, sf_dir: str, spark_sql: str, duck_sql: str) -> dict:
    s_rows, s_cols = run_spark(spark, sf_dir, spark_sql)
    d_rows, d_cols = run_duck(con, duck_sql)
    res = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "hash_spark": canonical_hash(s_rows, s_cols),
        "hash_duck": canonical_hash(d_rows, d_cols),
    }
    res["match"] = (
        res["rows_spark"] == res["rows_duck"]
        and res["cols_match"]
        and res["hash_spark"] == res["hash_duck"]
    )
    if not res["match"]:
        res["sample_spark"] = canonical_rows(s_rows, s_cols)[:5]
        res["sample_duck"] = canonical_rows(d_rows, d_cols)[:5]
        res["cols_spark"] = sorted(s_cols)
        res["cols_duck"] = sorted(d_cols)
    return res
