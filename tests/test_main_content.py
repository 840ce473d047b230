"""Main-content extraction (jusText-style block classifier): rule
semantics on a planted HTML fixture and three-way (API == Spark SQL ==
DuckDB) mirror equality.  The synthetic corpus is tag-free word-soup
(one block, kept iff >= min_len), so the planted pages carry the
interesting structure: nav bars, footers, link lists, real paragraphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import web

PAGES = [
    (1, '<html><head><title>T</title></head><body>'
        '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>'
        '<div>This is the first real paragraph of the article with plenty of content words in it.</div>'
        '<p>The second paragraph also carries genuine article content and a single <a href="/ref">reference</a> link inside it.</p>'
        '<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a></footer>'
        '</body></html>'),
    (2, '<ul><li><a href="/1">Link one</a></li><li><a href="/2">Link two</a></li>'
        '<li><a href="/3">Link three</a></li></ul>'),  # pure link list: all dropped
    (3, 'Plain text with no markup at all but easily long enough to pass the length rule.'),
    (4, '<div>short</div><div>Entities like &amp; and &lt;tags&gt; decode before the length rule is applied here.</div>'),
    (5, None),
    (6, ''),
]


def _planted(spark):
    return spark.createDataFrame(PAGES, ["doc_id", "text"])


def _duck_view(duck):
    rows = []
    for i, t in PAGES:
        if t is None:
            rows.append(f"({i}, CAST(NULL AS VARCHAR))")
        else:
            rows.append("({}, '{}')".format(i, t.replace("'", "''")))
    duck.execute(
        "CREATE OR REPLACE VIEW mc_fixture AS SELECT * FROM (VALUES "
        + ", ".join(rows) + ") AS v(doc_id, text)"
    )


def test_main_content_rules(spark):
    out = {r.doc_id: r for r in web.extract_main_content(_planted(spark)).collect()}
    # page 1: nav + footer dropped (link-dense / short), both paragraphs kept
    assert out[1].text_main.startswith("This is the first real paragraph")
    assert "second paragraph" in out[1].text_main
    assert "Home" not in out[1].text_main and "Privacy" not in out[1].text_main
    assert out[1].n_kept == 2 and out[1].n_blocks > 2
    assert 0 < out[1].kept_bp < 10000
    # page 2: pure link list -> nothing survives
    assert out[2].text_main == "" and out[2].n_kept == 0 and out[2].kept_bp == 0
    # page 3: markup-free page is one kept block, kept_bp == 10000
    assert out[3].n_blocks == 1 and out[3].n_kept == 1 and out[3].kept_bp == 10000
    # page 4: 'short' block dropped; entities decode BEFORE the length rule
    assert out[4].n_kept == 1 and "&amp;" not in out[4].text_main
    assert "& and <tags>" in out[4].text_main
    # null/empty: empty outputs, zero counts, never NULL
    for d in (5, 6):
        assert out[d].text_main == "" and out[d].n_blocks == 0 and out[d].kept_bp == 0


def test_main_content_three_way_mirror(spark, duck):
    sp_sql, du_sql = web.extract_main_content_sql(source="mc_fixture")
    _planted(spark).createOrReplaceTempView("mc_fixture")
    _duck_view(duck)
    api = web.extract_main_content(_planted(spark)).orderBy("doc_id")
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols

    def h(rows):
        return canonical_hash([tuple(r[c] for c in cols) for r in rows], cols)

    from tests.oracle import run_duck

    d_rows, d_cols = run_duck(duck, du_sql)
    d_idx = [d_cols.index(c) for c in cols]
    h_duck = canonical_hash([tuple(r[i] for i in d_idx) for r in d_rows], cols)
    assert h(api.collect()) == h(sql_df.collect()) == h_duck


def test_main_content_mirror_on_corpus(spark, duck, sf_dir):
    from etl_rust_spark.catalog import register_views
    from tests.oracle import compare

    register_views(spark, sf_dir)
    sp_sql, du_sql = web.extract_main_content_sql(max_doc=80)
    res = compare(spark, duck, sf_dir, sp_sql, du_sql)
    assert res["match"], res


def test_main_content_plan_is_scan_side(spark, sf_dir):
    from etl_rust_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        web.extract_main_content(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan  # zero shuffles: pure projection


def test_curate_with_main_content_stage(spark):
    """main_content=True in curate_corpus: link-list pages empty out
    and drop at the quality floor; article pages survive with
    boilerplate gone before shingling."""
    from etl_rust_spark.operators import curate

    docs = spark.createDataFrame(
        [
            (1, '<nav><a href="/">the home page</a> <a href="/b">the about page</a> '
                '<a href="/c">the contact page</a></nav>'
                '<p>the quick brown fox jumps over the lazy dog and then runs far away today</p>'),
            (2, '<ul><li><a href="/1">one link</a></li><li><a href="/2">two link</a></li>'
                '<li><a href="/3">three link</a></li></ul>'),
        ],
        ["doc_id", "text"],
    )
    out = curate.curate_corpus(
        docs, main_content=True, min_quality_bp=2000, near_dup_threshold=None
    ).collect()
    kept = {r.doc_id: r.text for r in out}
    assert 1 in kept and "home page" not in kept[1] and "quick brown fox" in kept[1]
    assert 2 not in kept  # pure link list emptied, then quality-floored


from hypothesis import given, settings
from hypothesis import strategies as st

_html_soup = st.lists(
    st.one_of(
        st.sampled_from(
            ["<div>", "</div>", "<p>", "</p>", "<nav>", "</nav>", "<a href='/x'>",
             "</a>", "&amp;", "&lt;", "<br>", "<li>"]
        ),
        st.text(alphabet="abc <>&/'\"=x", max_size=12),
    ),
    max_size=20,
).map("".join)


@settings(max_examples=8, deadline=None)  # a Spark job per example
@given(page=_html_soup)
def test_main_content_mirror_agrees_on_random_soup(spark, duck, page):
    """Cross-dialect regex semantics under adversarial input: the two
    engines must agree on arbitrary tag soup, not just well-formed
    fixtures (where mirrors historically break: escaping, empty-list
    folds, entity order)."""
    from tests.oracle import run_duck

    spark.createDataFrame([(1, page)], ["doc_id", "text"]).createOrReplaceTempView(
        "soup_fixture"
    )
    duck.execute(
        "CREATE OR REPLACE VIEW soup_fixture AS SELECT 1 AS doc_id, '{}' AS text".format(
            page.replace("'", "''")
        )
    )
    sp_sql, du_sql = web.extract_main_content_sql(source="soup_fixture")
    s_rows = [tuple(r) for r in spark.sql(sp_sql).collect()]
    d_rows, d_cols = run_duck(duck, du_sql)
    cols = ["doc_id", "text_main", "n_blocks", "n_kept", "kept_bp"]
    d_idx = [d_cols.index(c) for c in cols]
    assert canonical_hash(s_rows, cols) == canonical_hash(
        [tuple(r[i] for i in d_idx) for r in d_rows], cols
    )
