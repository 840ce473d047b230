"""profile_table: one-pass semantics, single-job plan shape, and the
three-way mirror (engine single-agg form == Spark SQL == DuckDB) on
atomic columns of the corpus tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.catalog import register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import profile


def test_profile_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)],
        ["k", "s", "v"],
    )
    out = {r.col_name: r for r in profile.profile_table(df, exact_ndv=True).collect()}
    assert set(out) == {"k", "s", "v"}
    assert out["k"].n_rows == 4 and out["k"].n_null == 0
    assert out["k"].n_distinct == 3
    assert out["k"].min_s == "1" and out["k"].max_s == "3"
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2
    assert out["s"].min_s == "a" and out["s"].max_s == "b"
    assert out["v"].n_nonnull == 3 and out["v"].n_distinct == 2
    assert out["v"].dtype == "double"


def test_profile_skips_map_columns(spark):
    df = spark.createDataFrame([(1, {"a": 1})], ["k", "m"])
    out = profile.profile_table(df)
    assert [r.col_name for r in out.collect()] == ["k"]
    with pytest.raises(ValueError):
        profile.profile_table(df, columns=["m"])


def test_profile_is_single_job_single_scan(spark, sf_dir):
    """The whole profile must be ONE aggregation over ONE scan of the
    table — the plan contains exactly one parquet scan and no join."""
    register_views(spark, sf_dir)
    df = profile.profile_table(spark.table("orders"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_profile_three_way_mirror(spark, duck, sf_dir):
    from tests.oracle import run_duck

    register_views(spark, sf_dir)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
    api = (
        profile.profile_table(spark.table("orders"), cols, exact_ndv=True)
        .drop("dtype")
        .orderBy("col_name")
    )
    sp_sql, du_sql = profile.profile_duck_sql("orders", cols)
    sql_df = spark.sql(sp_sql)
    cc = sorted(api.columns)
    assert sorted(sql_df.columns) == cc

    def h(rows):
        return canonical_hash([tuple(r[c] for c in cc) for r in rows], cc)

    d_rows, d_cols = run_duck(duck, du_sql)
    idx = [d_cols.index(c) for c in cc]
    h_duck = canonical_hash([tuple(r[i] for i in idx) for r in d_rows], cc)
    assert h(api.collect()) == h(sql_df.collect()) == h_duck


def test_profile_approx_ndv_close(spark, sf_dir):
    register_views(spark, sf_dir)
    approx = {
        r.col_name: r.n_distinct
        for r in profile.profile_table(
            spark.table("orders"), ["o_orderkey", "o_custkey"]
        ).collect()
    }
    exact = {
        r.col_name: r.n_distinct
        for r in profile.profile_table(
            spark.table("orders"), ["o_orderkey", "o_custkey"], exact_ndv=True
        ).collect()
    }
    for c in approx:
        # default rsd is 5%; allow 2 sigma
        assert abs(approx[c] - exact[c]) <= max(2, exact[c] * 0.10)


def _diff_fixtures(spark):
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, None, 40)],
        ["k", "s", "v"],
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "Y", 20), (4, None, 40), (5, "w", 50)],
        ["k", "s", "v"],
    )
    return a, b


def test_table_diff_semantics(spark):
    from etl_rust_spark.operators.profile import diff_summary, table_diff

    a, b = _diff_fixtures(spark)
    d = {r.k: r.diff for r in table_diff(a, b, ["k"]).collect()}
    # 1 unchanged (omitted), 2 changed, 3 removed, 4 unchanged (null-safe), 5 added
    assert d == {2: "changed", 3: "removed", 5: "added"}
    assert diff_summary(table_diff(a, b, ["k"])) == {
        "added": 1, "removed": 1, "changed": 1,
    }
    # column subset: only v compared -> 2 becomes unchanged
    d2 = {r.k: r.diff for r in table_diff(a, b, ["k"], columns=["v"]).collect()}
    assert d2 == {3: "removed", 5: "added"}
    with pytest.raises(ValueError):
        table_diff(a, b.drop("v"), ["k"])


def test_table_diff_null_vs_empty_string(spark):
    """The null sentinel discriminates NULL from '' and from sentinel-
    adjacent concatenations."""
    from etl_rust_spark.operators.profile import table_diff

    a = spark.createDataFrame([(1, None, "b"), (2, "a", "b")], ["k", "x", "y"])
    b = spark.createDataFrame([(1, "", "b"), (2, "ab", "")], ["k", "x", "y"])
    d = {r.k: r.diff for r in table_diff(a, b, ["k"]).collect()}
    assert d == {1: "changed", 2: "changed"}


def test_table_diff_three_way_mirror(spark, duck):
    from tests.oracle import run_duck
    from etl_rust_spark.operators.profile import table_diff, table_diff_sql

    a, b = _diff_fixtures(spark)
    a.createOrReplaceTempView("diff_a")
    b.createOrReplaceTempView("diff_b")
    for name, rows in (
        ("diff_a", [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, None, 40)]),
        ("diff_b", [(1, "x", 10), (2, "Y", 20), (4, None, 40), (5, "w", 50)]),
    ):
        vals = ", ".join(
            f"({k}, {'NULL' if s is None else repr(s)}, {v})" for k, s, v in rows
        )
        duck.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM (VALUES {vals}) AS t(k, s, v)"
        )
    sp_sql, du_sql = table_diff_sql("diff_a", "diff_b", ["k"], ["s", "v"])
    api = table_diff(a, b, ["k"]).orderBy("k")
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols
    from etl_rust_spark.functions.hashing import canonical_hash

    d_rows, d_cols = run_duck(duck, du_sql)
    idx = [d_cols.index(c) for c in cols]
    h = lambda rows: canonical_hash(rows, cols)
    assert (
        h([tuple(r[c] for c in cols) for r in api.collect()])
        == h([tuple(r[c] for c in cols) for r in sql_df.collect()])
        == h([tuple(r[i] for i in idx) for r in d_rows])
    )


def test_table_diff_prunes_payload_from_shuffle(spark, sf_dir):
    """The join must shuffle (keys, fingerprint) only — the scan-side
    projection collapses before the exchange, so no payload column
    appears above a scan in the exchanged subtrees."""
    from etl_rust_spark.operators.profile import table_diff

    register_views(spark, sf_dir)
    o = spark.table("orders")
    d = table_diff(o, o.limit(10), ["o_orderkey"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    # both exchanges carry exactly the key and the md5 fingerprint
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exchanges, plan
    for ex in exchanges:
        assert "o_totalprice" not in ex and "o_comment" not in ex


def test_profile_percentiles(spark, sf_dir):
    """percentiles=: numeric columns get approx quantiles (still one
    job), non-numeric get NULL; still a single scan."""
    register_views(spark, sf_dir)
    out = profile.profile_table(
        spark.table("orders"),
        ["o_totalprice", "o_orderstatus"],
        percentiles=[0.5, 0.95],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    rows = {r.col_name: r for r in out.collect()}
    tp = rows["o_totalprice"]
    assert tp.p50 is not None and tp.p95 is not None and tp.p50 <= tp.p95
    # sanity vs exact median
    exact = spark.table("orders").selectExpr(
        "percentile(o_totalprice, 0.5) AS m"
    ).collect()[0].m
    assert abs(tp.p50 - exact) / exact < 0.05
    assert rows["o_orderstatus"].p50 is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile.profile_table(spark.table("orders"), percentiles=[1.5])
