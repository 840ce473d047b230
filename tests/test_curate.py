"""Corpus curation composition (operators/curate.py): the end-to-end
LLM-training-data pipeline over the documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table
from etl_rust_spark.operators import curate, dedup, text


def test_curate_stages_compose(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cur = curate.curate_corpus(docs, languages=["en"], min_quality_bp=3000)
    rows = cur.collect()
    assert rows, "curation removed everything"
    assert {"lang_pred", "quality_bp"} <= set(cur.columns)
    assert all(r["lang_pred"] == "en" and r["quality_bp"] >= 3000 for r in rows)
    # exact dups gone
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))


def test_curate_drops_planted_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    base = docs.select("doc_id", "text", "lang").collect()
    # plant near-dups: same text with one token tweaked, higher ids
    planted = [
        (r["doc_id"] + 100000, r["text"] + " extra", r["lang"]) for r in base[:5]
    ]
    aug = docs.select("doc_id", "text", "lang").union(
        spark.createDataFrame(planted, ["doc_id", "text", "lang"])
    )
    cur = curate.curate_corpus(aug, near_dup_threshold=0.5)
    kept = {r["doc_id"] for r in cur.select("doc_id").collect()}
    # every planted near-dup (higher id of its pair) must be dropped,
    # every original of those pairs kept
    pairs = {
        (r["qid"], r["cid"])
        for r in dedup.minhash_lsh_pairs(aug, "text", "doc_id").collect()
    }
    dropped_expected = {c for _, c in pairs}
    assert dropped_expected, "fixture planted no verifiable near-dups"
    assert dropped_expected.isdisjoint(kept)
    assert {q for q, _ in pairs if q not in dropped_expected} <= kept


def test_curate_is_lazy_single_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cur = curate.curate_corpus(docs, languages=["en"])
    # a transformation chain — no job has run; explain must succeed
    plan = cur._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan


def test_curation_report(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cur = curate.curate_corpus(docs, languages=["en"], min_quality_bp=3000)
    rep = curate.curation_report(docs, cur)
    assert rep["input"] == docs.count()
    assert rep["kept"] == cur.count()
    assert rep["removed"] == rep["input"] - rep["kept"]
    assert 0 < rep["kept"] < rep["input"]
