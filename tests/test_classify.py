"""Model-based quality classifier (operators/classify.py)."""

from __future__ import annotations

import random


def _corpora(spark):
    rng = random.Random(11)
    ref_vocab = "the of and to in is study history science nature theory result".split()
    crawl_vocab = "click buy now free winner casino pills xxx deal offer cheap".split()

    def doc(vocab, n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    ref = spark.createDataFrame(
        [(i, doc(ref_vocab, 40)) for i in range(60)], ["doc_id", "text"]
    )
    crawl = spark.createDataFrame(
        [(1000 + i, doc(crawl_vocab, 40)) for i in range(60)], ["doc_id", "text"]
    )
    return ref, crawl


def test_classifier_separates_and_filters(spark):
    from etl_rust_spark.operators import classify

    ref, crawl = _corpora(spark)
    model = classify.train_quality_classifier(ref, crawl)

    scores_ref = [r.p_ref for r in classify.score_quality(model, ref).collect()]
    scores_crawl = [r.p_ref for r in classify.score_quality(model, crawl).collect()]
    assert min(scores_ref) > 0.5, min(scores_ref)
    assert max(scores_crawl) < 0.5, max(scores_crawl)

    # held-out mixed batch (in-distribution length) filters correctly
    mixed_rows = [
        (1, " ".join(["the study of science and history in nature theory"] * 4)),
        (2, " ".join(["click now free casino pills winner deal offer cheap"] * 4)),
    ]
    mixed = spark.createDataFrame(mixed_rows, ["doc_id", "text"])
    kept = classify.filter_by_quality(model, mixed)
    assert [r.doc_id for r in kept.collect()] == [1]
    # original columns survive the filter
    assert set(kept.columns) == {"doc_id", "text"}


def test_score_quality_bounds_and_determinism(spark):
    from etl_rust_spark.operators import classify

    ref, crawl = _corpora(spark)
    model = classify.train_quality_classifier(ref, crawl)
    s1 = sorted((r.doc_id, r.p_ref) for r in classify.score_quality(model, ref).collect())
    s2 = sorted((r.doc_id, r.p_ref) for r in classify.score_quality(model, ref).collect())
    assert s1 == s2
    assert all(0.0 <= p <= 1.0 for _, p in s1)
