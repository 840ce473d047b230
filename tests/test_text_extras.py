"""strip_markup + token_budget: the web-corpus cleanup and
token-accounting utilities (three-way mirrors)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_quantize_embeddings_three_way(spark, duck, sf_dir):
    """int8 quantization: DataFrame op == Spark SQL == DuckDB, and the
    dequantized vectors stay within 1e-3 cosine of the originals."""
    import numpy as np

    from etl_rust_spark.operators import similarity

    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    api = similarity.quantize_embeddings(emb.filter("vec_id <= 50")).orderBy("vec_id")
    sp_sql, du_sql = similarity.quantize_embeddings_sql(50)
    sq = spark.sql(sp_sql)
    h_api = canonical_hash([tuple(r) for r in api.collect()], list(api.columns))
    h_sq = canonical_hash([tuple(r) for r in sq.collect()], list(sq.columns))
    du_rows, du_cols = run_duck(duck, du_sql)
    assert h_api == h_sq == canonical_hash(du_rows, du_cols)

    # reconstruction quality: cosine(original, dequantized) > 0.999
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.filter("vec_id <= 50").collect()}
    for r in api.collect():
        v = orig[r["vec_id"]]
        dq = np.array(r["qvec"], dtype=np.float64) * r["scale"]
        denom = np.linalg.norm(v) * np.linalg.norm(dq)
        if denom == 0:
            continue
        cos = float(v @ dq / denom)
        assert cos > 0.999, (r["vec_id"], cos)
        assert max(abs(int(q)) for q in r["qvec"]) <= 127


def test_quantize_zero_vector(spark):
    from etl_rust_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(df).collect()}
    assert out[1]["scale"] == 0.0 and list(out[1]["qvec"]) == [0, 0, 0]
    assert list(out[2]["qvec"]) == [64, -127, 32]


def test_gopher_flags_planted_rules(spark):
    from etl_rust_spark.operators import text as T

    good = " ".join(["word"] * 60)                          # passes everything
    short = "too short"                                     # fails word count
    symbols = " ".join(["###"] * 60)                        # fails symbol + alpha
    bullets = "\n".join(f"- item {i} ok fine" for i in range(20))  # fails bullet
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, bullets)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in T.gopher_quality_flags(docs).collect()}
    assert out[1].gopher_pass
    assert not out[2].pass_word_count and not out[2].gopher_pass
    assert not out[3].pass_symbol and not out[3].pass_alpha
    assert not out[4].pass_bullet and out[4].bullet_bp == 10000


def test_gopher_flags_three_way_mirror(spark, duck, sf_dir):
    from etl_rust_spark.catalog import load_table, register_views
    from etl_rust_spark.functions.hashing import canonical_hash
    from etl_rust_spark.operators import text as T
    from tests.oracle import run_duck

    register_views(spark, sf_dir)
    api = T.gopher_quality_flags(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    ).orderBy("doc_id")
    sp_sql, du_sql = T.gopher_quality_sql(200)
    cols = sorted(api.columns)
    h_api = canonical_hash([tuple(r[c] for c in cols) for r in api.collect()], cols)
    sdf = spark.sql(sp_sql)
    h_sql = canonical_hash([tuple(r[c] for c in cols) for r in sdf.collect()], cols)
    drows, dcols = run_duck(duck, du_sql)
    h_du = canonical_hash(drows, dcols)
    assert h_api == h_sql == h_du
    # the rules discriminate on the synthetic corpus (non-vacuous)
    n_pass = api.filter("gopher_pass").count()
    assert 0 < n_pass < 201


SCRIPT_DOCS = [
    (1, "hello world entirely latin text"),
    (2, "привет мир полностью кириллица"),
    (3, "hello мир 世界"),                      # mixed, latin plurality
    (4, "日本語のテキストと漢字"),               # han + kana
    (5, None),
    (6, "   "),
]


def test_script_profile_semantics(spark):
    from etl_rust_spark.operators import text

    df = spark.createDataFrame(SCRIPT_DOCS, "doc_id: long, text: string")
    out = {r.doc_id: r for r in text.script_profile(df).collect()}
    assert out[1].latin_bp == 10000 and out[1].script_pred == "latin"
    assert out[2].cyrillic_bp == 10000 and out[2].script_pred == "cyrillic"
    assert out[3].script_pred == "latin" and out[3].cyrillic_bp > 0 and out[3].han_bp > 0
    assert out[4].script_pred in ("han", "hiragana", "katakana")
    # FLOOR(x*10000) per script: the parts may undershoot by < n_scripts
    assert 9997 <= out[4].han_bp + out[4].hiragana_bp + out[4].katakana_bp <= 10000
    for d in (5, 6):
        assert out[d].script_pred == "none" and out[d].latin_bp == 0


def test_script_profile_three_way_mirror(spark, duck, tmp_path):
    from etl_rust_spark.functions.hashing import canonical_hash
    from etl_rust_spark.operators import text
    from tests.oracle import run_duck

    df = spark.createDataFrame(SCRIPT_DOCS, "doc_id: long, text: string")
    p = str(tmp_path / "script_fixture")
    df.coalesce(1).write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("script_fixture")
    duck.execute(
        f"CREATE OR REPLACE VIEW script_fixture AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    sp_sql, du_sql = text.script_profile_sql(source="script_fixture")
    api = text.script_profile(spark.read.parquet(p)).orderBy("doc_id")
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols
    d_rows, d_cols = run_duck(duck, du_sql)
    idx = [d_cols.index(c) for c in cols]
    h = lambda rows: canonical_hash(rows, cols)
    assert (
        h([tuple(r[c] for c in cols) for r in api.collect()])
        == h([tuple(r[c] for c in cols) for r in sql_df.collect()])
        == h([tuple(r[i] for i in idx) for r in d_rows])
    )


def test_compression_stats_orders_repetitive_below_prose(spark):
    """The compression-ratio signal must order: repeated template <
    natural prose < high-entropy text — the property filtering relies
    on (exact byte counts are zlib-version-local, so the gate is
    ordering + determinism, not pinned bytes)."""
    import random

    from etl_rust_spark.operators.text import compression_stats

    rng = random.Random(11)
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors argue about breakfast and the tide tables of a small "
        "harbor town in early november "
    ) * 8
    spam = "buy cheap widgets now! " * 50
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(len(prose)))
    docs = spark.createDataFrame(
        [(0, spam), (1, prose), (2, noise), (3, None)],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in compression_stats(docs).collect()}
    assert rows[0].compression_ratio < rows[1].compression_ratio
    assert rows[1].compression_ratio < rows[2].compression_ratio
    assert rows[0].compression_ratio < 0.1      # template spam collapses
    assert rows[2].compression_ratio > 0.6      # noise barely compresses
    assert rows[3].raw_len is None and rows[3].compression_ratio is None
    # deterministic across runs and layouts
    again = {r.doc_id: r.compression_ratio
             for r in compression_stats(docs.repartition(7)).collect()}
    assert all(
        again[i] == rows[i].compression_ratio for i in (0, 1, 2)
    )
