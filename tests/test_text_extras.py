"""strip_markup + token_budget: the web-corpus cleanup and
token-accounting utilities (three-way mirrors)."""

from __future__ import annotations

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import text
from tests.oracle import run_duck



def test_strip_markup_three_way(spark, duck):
    """DataFrame op == Spark SQL form == DuckDB form on planted HTML."""
    rows = [
        (1, "<p>Hello <b>world</b></p>"),
        (2, "plain text no tags"),
        (3, "<script type=x>var a = 1;</script>keep <i>this</i>"),
        (4, "a &lt;tag&gt; &amp; &quot;quotes&quot; &apos;here&apos;"),
        (5, "<style>.c{color:red}</style><div class=x>body   text</div>"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    docs.createOrReplaceTempView("strip_src")
    duck.execute("CREATE OR REPLACE TABLE strip_src AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, '{t}')".replace("\\", "\\\\")
                             for i, t in [(i, t.replace("'", "''")) for i, t in rows])
                 + ") AS v(doc_id, text)")
    api = {r["doc_id"]: (r["text_clean"], r["n_tags"])
           for r in text.strip_markup(docs).collect()}
    sp_sql, du_sql = text.strip_markup_sql("strip_src")
    sq = {r["doc_id"]: (r["text_clean"], r["n_tags"])
          for r in spark.sql(sp_sql).collect()}
    du = {r[0]: (r[1], r[2]) for r in duck.execute(du_sql).fetchall()}
    assert api == sq == du, (api, sq, du)
    assert api[1] == ("Hello world", 4)
    assert api[2] == ("plain text no tags", 0)
    assert api[3][0] == "keep this"
    assert api[4][0] == "a <tag> & \"quotes\" 'here'"
    assert "body text" in api[5][0] and "color" not in api[5][0]


def test_token_budget_matches_duck(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    sp_sql, du_sql = text.token_budget_sql("lang")
    api = text.token_budget(
        load_table(spark, sf_dir, "documents"), by=["lang"]
    ).orderBy("lang")
    h_api = canonical_hash([tuple(r) for r in api.collect()], list(api.columns))
    sq = spark.sql(sp_sql)
    h_sq = canonical_hash([tuple(r) for r in sq.collect()], list(sq.columns))
    du_rows, du_cols = run_duck(duck, du_sql)
    h_du = canonical_hash(du_rows, du_cols)
    assert h_api == h_sq == h_du
    # whole-corpus single-row mode
    total = text.token_budget(load_table(spark, sf_dir, "documents")).collect()
    assert len(total) == 1 and total[0]["n_docs"] > 0
