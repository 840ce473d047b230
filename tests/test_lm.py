"""Bigram-LM perplexity scoring (operators/lm.py).

Three-way mirror (VERDICT r3 #1): the DataFrame operator
(train_bigram_lm + score_perplexity), the Spark-SQL form, and the DuckDB
form of ``perplexity_sql`` must all hash-match on the same corpus — plus
a planted gibberish-vs-clean fixture asserting the signal actually
orders corpus quality (high perplexity = garbage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import lm
from tests.oracle import run_duck


def _df_op_rows(spark, sf_dir, max_doc=100):
    docs = load_table(spark, sf_dir, "documents")
    bg, ctx, vocab = lm.train_bigram_lm(docs, "text")
    out = lm.score_perplexity(
        docs.filter(F.col("doc_id") <= max_doc), bg, ctx, vocab
    ).orderBy("doc_id")
    return [tuple(r) for r in out.collect()], list(out.columns)


def test_perplexity_three_way_mirror(spark, duck, sf_dir):
    """DataFrame op == Spark SQL form == DuckDB form, bit-for-bit."""
    op_rows, op_cols = _df_op_rows(spark, sf_dir)
    sp_sql, du_sql = lm.perplexity_sql(100)
    register_views(spark, sf_dir)
    sq = spark.sql(sp_sql)
    sq_rows = [tuple(r) for r in sq.collect()]
    du_rows, du_cols = run_duck(duck, du_sql)

    h_op = canonical_hash(op_rows, op_cols)
    h_sq = canonical_hash(sq_rows, list(sq.columns))
    h_du = canonical_hash(du_rows, du_cols)
    assert h_op == h_sq, "DataFrame op != Spark SQL form"
    assert h_sq == h_du, "Spark SQL form != DuckDB form"


def test_perplexity_orders_gibberish_above_clean(spark):
    """Planted fixture: docs drawn from the training distribution score
    far lower perplexity than shuffled-alphabet gibberish."""
    clean = [
        "the cat sat on the mat and the dog sat on the rug",
        "the dog ran to the cat and the cat ran to the mat",
        "a cat and a dog sat on the mat in the sun",
        "the sun shone on the mat where the cat and dog sat",
        "the cat and the dog ran in the sun on the rug",
    ]
    gibberish = [
        "qz xv jkw pl mn zzx vrb qq wt plk",
        "brr zx qwv lmn ppo duz kfj xx yy zz",
    ]
    rows = [(i, t) for i, t in enumerate(clean + gibberish)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # train on the CLEAN half only — the trusted-corpus LM
    bg, ctx, vocab = lm.train_bigram_lm(docs.filter(F.col("doc_id") < len(clean)))
    scored = {
        r["doc_id"]: r["ppl"]
        for r in lm.score_perplexity(docs, bg, ctx, vocab).collect()
    }
    worst_clean = max(scored[i] for i in range(len(clean)))
    best_gibberish = min(scored[len(clean) + j] for j in range(len(gibberish)))
    assert best_gibberish > worst_clean * 2, (
        f"gibberish ppl {best_gibberish} not >> clean ppl {worst_clean}"
    )


def test_short_doc_has_no_bigrams(spark):
    docs = spark.createDataFrame([(1, "single"), (2, "two tokens")], ["doc_id", "text"])
    bg, ctx, vocab = lm.train_bigram_lm(docs)
    out = {r["doc_id"]: r for r in lm.score_perplexity(docs, bg, ctx, vocab).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["ppl"] == 1.0 and out[1]["avg_nll"] == 0.0
    assert out[2]["n_bigrams"] == 1
