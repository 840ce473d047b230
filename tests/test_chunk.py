"""chunk_documents + paragraph_dedupe: semantics, edge cases, and the
three-way (API == Spark SQL == DuckDB) mirror equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import chunk


def _h(df):
    cols = sorted(df.columns)
    return canonical_hash(
        [tuple(r[c] for c in cols) for r in df.collect()], cols
    )


def _hp(pdf):
    cols = sorted(pdf.columns)
    return canonical_hash(
        [tuple(row) for row in pdf[cols].itertuples(index=False)], cols
    )


def test_chunk_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks: 2 chunks
            (2, "a b c"),                                # short: 1 chunk
            (3, " ".join(f"x{i}" for i in range(8))),    # exactly max: 1
            (4, None),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    out = chunk.chunk_documents(docs, max_tokens=8, overlap=2)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: stride 6 → chunks at 0..7 and 6..9
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3 t4 t5 t6 t7"
    assert rows[(1, 1)].chunk_text == "t6 t7 t8 t9"
    assert rows[(1, 1)].n_tokens == 4
    assert rows[(2, 0)].chunk_text == "a b c"
    assert (3, 1) not in rows and (3, 0) in rows
    assert not any(k[0] in (4, 5) for k in rows)  # null/empty yield nothing
    # overlap invariant: consecutive chunks share `overlap` tokens
    assert rows[(1, 0)].chunk_text.split()[-2:] == rows[(1, 1)].chunk_text.split()[:2]


def test_chunk_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk.chunk_documents(docs, max_tokens=8, overlap=8)


def test_chunk_three_way_mirror(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    sp_sql, du_sql = chunk.chunk_documents_sql(max_tokens=16, overlap=4, max_doc=60)
    api = chunk.chunk_documents(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 60),
        max_tokens=16,
        overlap=4,
    ).orderBy("doc_id", "chunk_idx")
    h_api = _h(api)
    h_sql = _h(spark.sql(sp_sql))
    h_du = _hp(duck.sql(du_sql).df())
    assert h_api == h_sql == h_du


def test_chunk_coverage_and_reconstruction_property(spark):
    """On a seeded random corpus: every token is covered, and stitching
    chunk 0 plus each later chunk's non-overlap suffix reconstructs the
    original token stream exactly — for several (max_tokens, overlap)
    configs including stride 1."""
    import random

    rng = random.Random(5)
    rows = [
        (i, " ".join(f"w{rng.randint(0, 20)}" for _ in range(rng.randint(1, 90))))
        for i in range(25)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for max_tokens, overlap in [(16, 4), (8, 7), (32, 0), (5, 1)]:
        out = chunk.chunk_documents(docs, max_tokens=max_tokens, overlap=overlap)
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split()
        stride = max_tokens - overlap
        for doc_id, text in rows:
            toks = text.split()
            chunks = by_doc[doc_id]
            assert sorted(chunks) == list(range(len(chunks))), (doc_id, max_tokens)
            rebuilt = list(chunks[0])
            for i in range(1, len(chunks)):
                assert chunks[i] == toks[i * stride : i * stride + max_tokens]
                rebuilt.extend(chunks[i][overlap:])
            assert rebuilt == toks, (doc_id, max_tokens, overlap)


def test_paragraph_dedupe_semantics(spark):
    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}. unique one. shared tail"),
            (2, f"{boiler}. unique two. shared tail"),
            (3, "entirely original content here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in chunk.paragraph_dedupe(docs).collect()}
    # doc 1 (first occurrence) keeps everything
    assert out[1].text_dedup == f"{boiler}. unique one. shared tail"
    assert out[1].n_paras == 3 and out[1].n_kept == 3
    # doc 2 loses the boilerplate and the shared tail
    assert out[2].text_dedup == "unique two"
    assert out[2].n_kept == 1
    assert out[3].text_dedup == "entirely original content here"


def test_paragraph_dedupe_fully_duplicate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "same. same2"), (2, "same. same2")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in chunk.paragraph_dedupe(docs).collect()}
    assert out[2].text_dedup == "" and out[2].n_kept == 0 and out[2].n_paras == 2


def test_paragraph_dedupe_three_way_mirror(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    sp_sql, du_sql = chunk.paragraph_dedupe_sql(max_doc=80)
    api = chunk.paragraph_dedupe(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 80)
    ).orderBy("doc_id")
    h_api = _h(api)
    h_sql = _h(spark.sql(sp_sql))
    h_du = _hp(duck.sql(du_sql).df())
    assert h_api == h_sql == h_du
