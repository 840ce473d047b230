"""Cross-engine differential SQL fuzz (r8).

The whole correctness gate rests on one assumption: a query written in
the shared ANSI subset evaluates identically on Spark and DuckDB.  The
per-entry mirrors pin that for 50 hand-written queries; this fuzz pins
it for the GRAMMAR — hypothesis composes random predicate trees,
integer-exact aggregates, groupings, and scalar projections over
``lineitem`` at sf0.001, renders ONE SQL string, runs it on both
engines, and compares canonical hashes.

The generator deliberately stays inside the cross-engine-exact subset
the repo's gotcha list defines (NEXT.md):
- integer arithmetic / COUNT / MIN / MAX / integer-valued SUMs only —
  no float accumulation (addition order differs between engines) and
  no AVG (incremental double sums);
- integer SUMs wrapped in CAST(... AS BIGINT) (DuckDB's HUGEINT);
- no bare decimal literals (Spark parses them as DECIMAL, DuckDB as
  DOUBLE — the doc-78 quality_bp lesson);
- TIMESTAMP literals in full 'YYYY-MM-DD HH:MM:SS' form.
Anything the fuzz finds beyond that subset is a REAL dialect trap the
mirrors could also step on.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_rust_spark.catalog import register_views
from etl_rust_spark.functions.hashing import canonical_hash
from tests.oracle import run_duck

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


@st.composite
def predicates(draw, depth: int = 0):
    kind = draw(st.sampled_from(
        ["int_cmp", "qty_cmp", "str_eq", "ts_cmp"]
        + (["and", "or", "not"] if depth < 2 else [])
    ))
    if kind == "int_cmp":
        col = draw(st.sampled_from(INT_COLS))
        op = draw(st.sampled_from(["<", "<=", "=", ">=", ">", "<>"]))
        lit = draw(st.integers(0, 60000))
        return f"{col} {op} {lit}"
    if kind == "qty_cmp":
        op = draw(st.sampled_from(["<", ">=", "="]))
        lit = draw(st.integers(1, 50))
        return f"l_quantity {op} {lit}"
    if kind == "str_eq":
        col = draw(st.sampled_from(sorted(STR_COLS)))
        val = draw(st.sampled_from(STR_COLS[col]))
        neg = draw(st.booleans())
        return f"{col} {'<>' if neg else '='} '{val}'"
    if kind == "ts_cmp":
        month = draw(st.integers(1, 12))
        year = draw(st.integers(1992, 1998))
        op = draw(st.sampled_from(["<", ">="]))
        return f"l_shipdate {op} TIMESTAMP '{year}-{month:02d}-01 00:00:00'"
    if kind == "not":
        return f"NOT ({draw(predicates(depth + 1))})"
    a, b = draw(predicates(depth + 1)), draw(predicates(depth + 1))
    return f"({a} {kind.upper()} {b})"


@st.composite
def int_exprs(draw):
    col = draw(st.sampled_from(INT_COLS))
    form = draw(st.sampled_from(["plain", "mod", "arith", "case"]))
    if form == "plain":
        return col
    if form == "mod":
        return f"{col} % {draw(st.integers(2, 97))}"
    if form == "arith":
        other = draw(st.sampled_from(INT_COLS))
        op = draw(st.sampled_from(["+", "-", "*"]))
        k = draw(st.integers(1, 7))
        return f"({col} {op} {other} % {k + 1})"
    return (
        f"CASE WHEN {draw(predicates(2))} THEN {col} % 11 ELSE "
        f"{draw(st.integers(0, 5))} END"
    )


@st.composite
def agg_queries(draw):
    groups = draw(st.lists(st.sampled_from(GROUP_COLS), unique=True, max_size=2))
    aggs = draw(st.lists(st.sampled_from(
        ["count", "sum_int", "min_int", "max_ts", "min_str", "sum_qty", "sum_case"]
    ), min_size=1, max_size=3, unique=True))
    sel, names = [], []
    for a in aggs:
        if a == "count":
            sel.append("CAST(COUNT(*) AS BIGINT) AS cnt")
        elif a == "sum_int":
            sel.append(f"CAST(SUM({draw(int_exprs())}) AS BIGINT) AS s_int")
        elif a == "min_int":
            sel.append(f"MIN({draw(st.sampled_from(INT_COLS))}) AS m_int")
        elif a == "max_ts":
            sel.append("MAX(l_shipdate) AS m_ts")
        elif a == "min_str":
            sel.append("MIN(l_returnflag || l_linestatus) AS m_str")
        elif a == "sum_qty":
            # quantities are integer-valued doubles ≤ 50: their sums are
            # exact in IEEE double regardless of addition order
            sel.append("CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_qty")
        else:
            sel.append(
                f"CAST(SUM(CASE WHEN {draw(predicates(1))} THEN 1 ELSE 0 END)"
                " AS BIGINT) AS s_case"
            )
        names.append(a)
    where = draw(st.one_of(st.none(), predicates()))
    sql = "SELECT " + ", ".join(list(dict.fromkeys(groups)) + sel) + " FROM lineitem"
    if where:
        sql += f" WHERE {where}"
    if groups:
        sql += " GROUP BY " + ", ".join(groups)
    return sql


@st.composite
def scalar_queries(draw):
    exprs = [
        "l_orderkey", "l_linenumber",
        f"({draw(int_exprs())}) AS e0",
        draw(st.sampled_from([
            "upper(l_returnflag) || l_linestatus AS e1",
            "length(l_returnflag || l_linestatus) AS e1",
            "substr(l_returnflag || l_linestatus, 1, 1) AS e1",
        ])),
    ]
    return (
        "SELECT " + ", ".join(exprs)
        + f" FROM lineitem WHERE {draw(predicates())}"
    )


def _both(spark, duck, sql: str) -> tuple[str, str]:
    srows = spark.sql(sql).collect()
    scols = spark.sql(sql).columns
    drows, dcols = run_duck(duck, sql)
    return (
        canonical_hash([tuple(r) for r in srows], scols),
        canonical_hash(drows, dcols),
    )


@settings(max_examples=25, deadline=None)
@given(sql=agg_queries())
def test_random_aggregates_match_duckdb(spark, duck, sf_dir, sql):
    register_views(spark, sf_dir)
    hs, hd = _both(spark, duck, sql)
    assert hs == hd, sql


@settings(max_examples=15, deadline=None)
@given(sql=scalar_queries())
def test_random_scalar_projections_match_duckdb(spark, duck, sf_dir, sql):
    register_views(spark, sf_dir)
    hs, hd = _both(spark, duck, sql)
    assert hs == hd, sql


# ---------------------------------------------------------------------------
# Join / subquery grammar (same cross-engine-exact subset): inner and
# left equi-joins with integer-exact aggregates, IN / NOT IN and
# correlated-EXISTS subqueries.  o_orderkey is never NULL, so NOT IN
# keeps its two-valued semantics in both engines.
# ---------------------------------------------------------------------------

ORD_STR = {
    "o_orderstatus": ["P", "O", "F"],
    "o_orderpriority": ["1-URGENT", "3-MEDIUM", "5-LOW"],
}


@st.composite
def order_predicates(draw):
    kind = draw(st.sampled_from(["str_eq", "int_cmp", "ts_cmp"]))
    if kind == "str_eq":
        col = draw(st.sampled_from(sorted(ORD_STR)))
        return f"{col} = '{draw(st.sampled_from(ORD_STR[col]))}'"
    if kind == "int_cmp":
        op = draw(st.sampled_from(["<", ">=", "%"]))
        if op == "%":
            return f"o_custkey % {draw(st.integers(2, 9))} = 0"
        return f"o_orderkey {op} {draw(st.integers(0, 60000))}"
    month = draw(st.integers(1, 12))
    year = draw(st.integers(1992, 1998))
    return f"o_orderdate < TIMESTAMP '{year}-{month:02d}-01 00:00:00'"


@st.composite
def join_queries(draw):
    form = draw(st.sampled_from(["inner", "left", "in", "not_in", "exists"]))
    lp = draw(predicates(1))
    op = draw(order_predicates())
    if form == "inner":
        group = draw(st.sampled_from(["o_orderpriority", "o_orderstatus",
                                      "l_returnflag"]))
        return (
            f"SELECT {group}, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_qty "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {lp} AND {op} GROUP BY {group}"
        )
    if form == "left":
        # COUNT(col) counts non-null matches — identical semantics
        return (
            "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(COUNT(l_linenumber) AS BIGINT) AS matched "
            "FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey "
            f"AND {lp} WHERE {op} GROUP BY o_orderstatus"
        )
    if form in ("in", "not_in"):
        neg = "NOT " if form == "not_in" else ""
        return (
            "SELECT CAST(COUNT(*) AS BIGINT) AS cnt, "
            "MIN(o_orderkey) AS m FROM orders "
            f"WHERE {op} AND o_orderkey {neg}IN "
            f"(SELECT l_orderkey FROM lineitem WHERE {lp})"
        )
    return (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM orders WHERE {op} AND EXISTS "
        "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        f"AND {lp}) GROUP BY o_orderpriority"
    )


@settings(max_examples=20, deadline=None)
@given(sql=join_queries())
def test_random_joins_and_subqueries_match_duckdb(spark, duck, sf_dir, sql):
    register_views(spark, sf_dir)
    hs, hd = _both(spark, duck, sql)
    assert hs == hd, sql
