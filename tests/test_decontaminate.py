from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import decontaminate as dc


def test_contamination_flags_planted_leak(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        ["bench_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # verbatim leak: every 4-gram hits
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # partial leak: shares a 4-gram window
            (2, "intro words then the quick brown fox jumps and more trailing text"),
            # clean
            (3, "completely unrelated sentence about spark shuffle partitions"),
            # too short for any 4-gram
            (4, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in dc.contamination(docs, bench, n=4, id_col="doc_id").collect()
    }
    assert got[1]["contamination"] == 1.0
    assert 0.0 < got[2]["contamination"] < 1.0
    assert got[3]["contamination"] == 0.0 and got[3]["n_hit"] == 0
    assert got[4]["n_grams"] == 0 and got[4]["contamination"] == 0.0


def test_contamination_three_way_oracle(spark, duck, sf_dir):
    """Operator DataFrame == Spark SQL mirror == DuckDB mirror."""
    from tests.oracle import run_duck

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    api = (
        dc.contamination(
            docs.filter(F.col("doc_id") <= 100),
            docs.filter(F.col("doc_id").between(150, 200)),
            n=8,
        )
        .orderBy("doc_id")
    )
    sp_sql, du_sql = dc.contamination_sql(n=8, max_doc=100, bench_lo=150, bench_hi=200)
    sql = spark.sql(sp_sql)
    h_api = canonical_hash([tuple(r) for r in api.collect()], api.columns)
    h_sql = canonical_hash([tuple(r) for r in sql.collect()], sql.columns)
    drows, dcols = run_duck(duck, du_sql)
    assert h_api == h_sql == canonical_hash(drows, dcols)
    # the synthetic corpus plants near/exact duplicates across the id
    # space — the check must find at least one contaminated doc
    assert api.filter("contamination > 0").count() > 0


def test_contamination_plan_broadcasts_bench(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        dc.contamination(
            docs.filter(F.col("doc_id") <= 100),
            docs.filter(F.col("doc_id").between(150, 200)),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
