"""Exact substring-level dedup (repeated k-gram spans, Lee et al. style)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import substring


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _tok(n, p):
    return " ".join(f"{p}{i}" for i in range(n))


def test_planted_boilerplate_spans(spark):
    """A 12-token boilerplate block planted in three docs at different
    offsets: the first occurrence is exempt, later occurrences are
    flagged exactly at their planted [start, start+12) ranges."""
    boiler = _tok(12, "b")
    docs = _mk(spark, [
        (1, f"{_tok(5, 'a')} {boiler} {_tok(4, 'c')}"),   # first occurrence (pos 5)
        (2, f"{boiler} {_tok(9, 'd')}"),                   # at pos 0
        (3, f"{_tok(8, 'e')} {boiler}"),                   # at pos 8
        (4, _tok(20, "f")),                                # clean
    ])
    spans = {(r.doc_id): (r.span_start, r.span_end, r.n_windows)
             for r in substring.repeated_kgram_spans(docs, k=8).collect()}
    assert 1 not in spans          # first occurrence kept
    assert spans[2] == (0, 12, 5)  # 12-token repeat = 5 flagged 8-windows
    assert spans[3] == (8, 20, 5)
    assert 4 not in spans


def test_remove_spans_cuts_exact_tokens(spark):
    boiler = _tok(12, "b")
    docs = _mk(spark, [
        (1, f"{_tok(5, 'a')} {boiler}"),
        (2, f"{boiler} {_tok(9, 'd')}"),
        (3, _tok(20, "f")),
    ])
    spans = substring.repeated_kgram_spans(docs, k=8)
    out = {r.doc_id: r for r in substring.remove_spans(docs, spans).collect()}
    assert out[1].text_dedup == f"{_tok(5, 'a')} {boiler}"  # first occurrence intact
    assert out[1].n_tokens_removed == 0
    assert out[2].text_dedup == _tok(9, "d")
    assert out[2].n_tokens_removed == 12
    assert out[3].text_dedup == _tok(20, "f") and out[3].n_tokens_removed == 0


def test_adjacent_repeats_merge_into_one_span(spark):
    """Two distinct repeated blocks that are adjacent in one doc merge
    into one contiguous span there."""
    b1, b2 = _tok(10, "x"), _tok(10, "y")
    docs = _mk(spark, [
        (1, f"{b1} {_tok(15, 'p')} {b2}"),
        (2, f"{b1} {b2}"),
    ])
    spans = [
        (r.span_start, r.span_end)
        for r in substring.repeated_kgram_spans(docs, k=8)
        .filter(F.col("doc_id") == 2)
        .collect()
    ]
    assert spans == [(0, 20)]


def test_within_doc_repeat_is_flagged(spark):
    b = _tok(9, "r")
    docs = _mk(spark, [(1, f"{b} {_tok(6, 'm')} {b}")])
    spans = [
        (r.span_start, r.span_end)
        for r in substring.repeated_kgram_spans(docs, k=8).collect()
    ]
    assert spans == [(15, 24)]  # second occurrence only


def test_repeated_spans_three_way_mirror(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    sp_sql, du_sql = substring.repeated_spans_sql(k=8, max_doc=150)
    api = substring.repeated_kgram_spans(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 150), k=8
    ).orderBy("doc_id", "span_start")
    cols = sorted(api.columns)
    h_api = canonical_hash([tuple(r[c] for c in cols) for r in api.collect()], cols)
    sdf = spark.sql(sp_sql)
    h_sql = canonical_hash([tuple(r[c] for c in cols) for r in sdf.collect()], cols)
    from tests.oracle import run_duck

    drows, dcols = run_duck(duck, du_sql)
    h_du = canonical_hash(drows, dcols)
    assert h_api == h_sql == h_du
    assert api.count() > 0  # the synthetic corpus has real repeated 8-grams
