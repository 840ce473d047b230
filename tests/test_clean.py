"""C4 line-level cleaning: rule semantics, edge cases, and the
three-way (API == Spark SQL == DuckDB) mirror equality on a planted
multi-line fixture (the synthetic documents corpus is single-line
word-soup, so the fixture carries the interesting structure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import clean

DOCS = [
    (1, 'Good first sentence here today.\nShort line.\nAnother fine sentence with words!\nIs this a question with words?\nno terminal punctuation line here'),
    (2, 'Only one good sentence survives here.\nbad\nbad again'),
    (3, 'This javascript line should be dropped here.\nKeep this sentence with many words.\nAnd keep this other sentence too!\nAlso keep a third good sentence here.'),
    (4, 'Lorem ipsum dolor sit amet something here.\nA second proper sentence lives here.\nA third proper sentence lives here!\nA fourth proper sentence lives here?'),
    (5, 'function f() { return 1; }\nA proper sentence with enough words.\nAnother proper sentence with enough words.\nThird proper sentence with enough words.'),
    (6, None),
    (7, ''),
    (8, 'He said "this ends with a quote."\nSecond sentence with enough words here.\nThird sentence with enough words here.'),
]


def _planted(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _duck_values_cte() -> str:
    rows = []
    for i, t in DOCS:
        if t is None:
            rows.append(f"({i}, CAST(NULL AS VARCHAR))")
        else:
            lit = t.replace("'", "''").replace("\n", "' || chr(10) || '")
            rows.append(f"({i}, '{lit}')")
    return "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS v(doc_id, text)"


def test_c4_rules(spark):
    out = {r.doc_id: r for r in clean.c4_clean_lines(_planted(spark)).collect()}
    # doc 1: 5 lines; "Short line." (<5 words) and the unpunctuated line drop
    assert out[1].n_lines == 5 and out[1].n_lines_kept == 3
    assert out[1].n_sentences == 3 and out[1].c4_keep is True
    assert "Short line." not in out[1].text_c4
    # doc 2: one surviving sentence < min_sentences → page dropped
    assert out[2].n_lines_kept == 1 and out[2].c4_keep is False
    # doc 3: javascript line dropped, page survives on the other three
    assert out[3].n_lines_kept == 3 and out[3].c4_keep is True
    assert "javascript" not in out[3].text_c4
    # doc 4: lorem ipsum page-level drop despite enough sentences
    assert out[4].n_sentences >= 3 and out[4].c4_keep is False
    # doc 5: curly brace page-level drop
    assert out[5].c4_keep is False
    # null/empty: empty clean text, false verdict, never NULL
    for d in (6, 7):
        assert out[d].text_c4 == "" and out[d].c4_keep is False
    # doc 8: closing-quote terminal punctuation counts
    assert out[8].text_c4.startswith('He said "this ends with a quote."')
    assert out[8].c4_keep is True


def test_c4_badwords_and_params(spark):
    out = {
        r.doc_id: r
        for r in clean.c4_clean_lines(
            _planted(spark), min_words=2, min_sentences=1, badwords=["quote"]
        ).collect()
    }
    assert out[1].n_lines_kept == 4  # "Short line." now long enough
    assert out[2].c4_keep is True    # one sentence suffices now
    assert out[8].c4_keep is False   # badword hit


def test_c4_three_way_mirror(spark, duck):
    sp_sql, du_sql = clean.c4_clean_sql(source="c4_fixture")
    _planted(spark).createOrReplaceTempView("c4_fixture")
    duck.execute(
        f"CREATE OR REPLACE VIEW c4_fixture AS {_duck_values_cte()}"
    )
    api = clean.c4_clean_lines(_planted(spark)).withColumn(
        "c4_keep", F.col("c4_keep").cast("long")
    ).orderBy("doc_id")
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols

    def h(rows):
        return canonical_hash([tuple(r[c] for c in cols) for r in rows], cols)

    from tests.oracle import run_duck

    d_rows, d_cols = run_duck(duck, du_sql)
    d_idx = [d_cols.index(c) for c in cols]
    h_api, h_sql = h(api.collect()), h(sql_df.collect())
    h_duck = canonical_hash([tuple(r[i] for i in d_idx) for r in d_rows], cols)
    assert h_api == h_sql == h_duck


def test_c4_mirror_on_corpus(spark, duck, sf_dir):
    """The single-line corpus is degenerate (no terminal punctuation →
    everything drops) but the mirror must still agree on it."""
    from etl_rust_spark.catalog import register_views
    from tests.oracle import compare

    register_views(spark, sf_dir)
    sp_sql, du_sql = clean.c4_clean_sql(max_doc=80)
    res = compare(spark, duck, sf_dir, sp_sql, du_sql)
    assert res["match"], res


NORM_DOCS = [
    (1, "“Hello” ‘world’ — fine…"),
    (2, "zero​width‌gone and nbsp  kept"),
    (3, "ctrl\x01chars\x07out\ttab  collapse"),
    (4, None),
    (5, "line one  here\nline\ttwo"),
]


def test_normalize_text_semantics(spark):
    out = {
        r.doc_id: r.text_norm
        for r in clean.normalize_text(
            spark.createDataFrame(NORM_DOCS, ["doc_id", "text"])
        ).collect()
    }
    assert out[1] == "\"Hello\" 'world' - fine..."
    assert out[2] == "zerowidthgone and nbsp kept"
    assert out[3] == "ctrlcharsout tab collapse"
    assert out[4] is None
    assert out[5] == "line one here\nline two"  # newline survives


def test_normalize_text_nfkc(spark):
    rows = [(1, "ﬁne ①ne Ｆullwidth"), (2, None)]
    out = {
        r.doc_id: r.text_norm
        for r in clean.normalize_text(
            spark.createDataFrame(rows, ["doc_id", "text"]), form="NFKC"
        ).collect()
    }
    assert out[1] == "fine 1ne Fullwidth"
    assert out[2] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        clean.normalize_text(
            spark.createDataFrame(rows, ["doc_id", "text"]), form="NFX"
        )


def test_normalize_text_three_way_mirror(spark, duck, tmp_path):
    """Fixture goes through parquet so control characters reach both
    engines byte-identically (VALUES literals would mangle them)."""
    df = spark.createDataFrame(NORM_DOCS, ["doc_id", "text"])
    p = str(tmp_path / "norm_fixture")
    df.coalesce(1).write.parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("norm_fixture")
    duck.execute(
        f"CREATE OR REPLACE VIEW norm_fixture AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    sp_sql, du_sql = clean.normalize_text_sql(source="norm_fixture")
    api = clean.normalize_text(spark.read.parquet(p)).orderBy("doc_id")
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols

    from tests.oracle import run_duck

    d_rows, d_cols = run_duck(duck, du_sql)
    idx = [d_cols.index(c) for c in cols]
    h = lambda rows: canonical_hash(rows, cols)
    assert (
        h([tuple(r[c] for c in cols) for r in api.collect()])
        == h([tuple(r[c] for c in cols) for r in sql_df.collect()])
        == h([tuple(r[i] for i in idx) for r in d_rows])
    )


def test_normalize_then_dedupe_composition(spark):
    """The point of the stage: typographic twins become exact dups."""
    from etl_rust_spark.operators import dedup

    rows = [
        (1, "“The cat sat.”"),
        (2, '"The cat sat."'),
        (3, "something else entirely"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    norm = clean.normalize_text(docs)
    kept = dedup.exact_dedupe(norm, ["text_norm"], "doc_id")
    assert {r.doc_id for r in kept.collect()} == {1, 3}


# ------------------------------------------- intra-doc line dedup (r10 s3)

DD_DOCS = [
    (1, "nav menu\nreal content line one.\nnav menu\nreal content line two.\nnav menu"),
    (2, "a\na\na\na"),
    (3, "unique one\nunique two\nunique three"),
    (4, None),
    (5, ""),
    (6, "x\n\ny\n\nx\n"),  # blank lines dedup like any other line
]


def test_dedup_lines_semantics(spark):
    df = spark.createDataFrame(DD_DOCS, ["doc_id", "text"])
    got = {r.doc_id: r for r in clean.dedup_lines(df).collect()}
    assert got[1].text_dd == "nav menu\nreal content line one.\nreal content line two."
    assert (got[1].n_lines, got[1].n_lines_kept) == (5, 3)
    assert got[2].text_dd == "a" and got[2].n_lines_kept == 1
    assert got[3].text_dd == "unique one\nunique two\nunique three"
    assert got[4].text_dd == "" and got[4].n_lines == 0
    assert got[5].text_dd == "" and got[5].n_lines == 0
    # first blank kept, second dropped; trailing split artifact counts
    assert got[6].text_dd == "x\n\ny"


def test_dedup_lines_three_way_mirror(spark, duck):
    rows = []
    for i, t in DD_DOCS:
        if t is None:
            rows.append(f"({i}, CAST(NULL AS VARCHAR))")
        else:
            lit = t.replace("'", "''").replace("\n", "' || chr(10) || '")
            rows.append(f"({i}, '{lit}')")
    cte = "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS v(doc_id, text)"
    sp_sql, du_sql = clean.dedup_lines_sql(source="dd_fixture")
    df = spark.createDataFrame(DD_DOCS, ["doc_id", "text"])
    df.createOrReplaceTempView("dd_fixture")
    duck.execute(f"CREATE OR REPLACE VIEW dd_fixture AS {cte}")
    api = clean.dedup_lines(df).withColumn(
        "n_lines", F.col("n_lines").cast("int")
    ).withColumn("n_lines_kept", F.col("n_lines_kept").cast("int"))
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols

    def h(rows_):
        return canonical_hash([tuple(r[c] for c in cols) for r in rows_], cols)

    from tests.oracle import run_duck

    d_rows, d_cols = run_duck(duck, du_sql)
    d_idx = [d_cols.index(c) for c in cols]
    assert h(api.collect()) == h(sql_df.collect()) == canonical_hash(
        [tuple(r[i] for i in d_idx) for r in d_rows], cols
    )


def test_dedup_lines_mirror_on_corpus(spark, duck, sf_dir):
    """The corpus is single-line word-soup (nothing dedups), which pins
    the IDENTITY behavior across all three forms on real data."""
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    sp_sql, du_sql = clean.dedup_lines_sql(max_doc=120)
    sql_df = spark.sql(sp_sql)
    cols = sorted(sql_df.columns)

    from tests.oracle import run_duck

    d_rows, d_cols = run_duck(duck, du_sql)
    d_idx = [d_cols.index(c) for c in cols]
    h_sql = canonical_hash(
        [tuple(r[c] for c in cols) for r in sql_df.collect()], cols
    )
    h_duck = canonical_hash(
        [tuple(r[i] for i in d_idx) for r in d_rows], cols
    )
    assert h_sql == h_duck
    kept = {r.doc_id: r for r in sql_df.collect()}
    assert all(r.n_lines == r.n_lines_kept for r in kept.values())


def test_dedup_lines_stage_in_curate(spark):
    """The opt-in pipeline stage: repeated boilerplate lines drop, the
    document survives with the rest of its columns intact; default-off
    leaves the gated curate plan untouched."""
    from etl_rust_spark.operators.curate import curate_corpus

    docs = spark.createDataFrame(
        [(1, "the same navigation bar again\n"
             "the quick brown fox jumps over the lazy dog near the river bank today. "
             "many plain english words follow in this sentence for the scorer.\n"
             "the same navigation bar again", "en")],
        ["doc_id", "text", "lang"],
    )
    out = curate_corpus(
        docs, near_dup_threshold=None, dedup_lines=True, min_quality_bp=0
    ).collect()
    assert len(out) == 1
    assert out[0].text.count("the same navigation bar again") == 1
