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


# ---------------------------------------------------------------------------
# Connected-components near-dup strategy (opt-in; default greedy unchanged)
# ---------------------------------------------------------------------------


def _union_find_reps(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference components: id -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_property_vs_union_find(spark):
    """Min-id label propagation == union-find on adversarial edge lists
    (long chains exercise multi-round convergence; stars exercise
    fan-in; disjoint blobs exercise isolation)."""
    import random

    rng = random.Random(7)
    cases = [
        [(i, i + 1) for i in range(1, 12)],              # one long chain
        [(1, k) for k in range(2, 9)],                   # star
        [(1, 2), (3, 4), (5, 6), (2, 3)],                # chain merge
        [(rng.randint(1, 30), rng.randint(31, 60)) for _ in range(25)],
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, ["qid", "cid"])
        got = {
            r["id"]: r["rep"]
            for r in curate.near_dup_components(pairs).collect()
        }
        assert got == _union_find_reps(edges), edges


def test_curate_with_substring_stage(spark):
    """substring_k cuts cross-doc boilerplate BEFORE quality/dedup: a
    doc that is mostly repeated boilerplate shrinks and the surviving
    unique text flows through; the first occurrence keeps its copy."""
    boiler = " ".join(f"b{i}" for i in range(20))
    uniq1 = "the quick brown fox jumps over the lazy dog and runs far away"
    uniq2 = "a completely different sentence about spark execution engines here"
    docs = spark.createDataFrame(
        [(1, f"{uniq1} {boiler}"), (2, f"{boiler} {uniq2}")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text
        for r in curate.curate_corpus(
            docs, near_dup_threshold=None, substring_k=8
        ).collect()
    }
    assert out[1] == f"{uniq1} {boiler}"  # first occurrence intact
    assert out[2] == uniq2                # boilerplate cut


def test_curate_with_quality_model(spark):
    from etl_rust_spark.operators import classify

    import random
    rng = random.Random(4)
    ref_vocab = "the of and to in study science".split()
    spam_vocab = "click buy free casino pills".split()
    mk = lambda v, n: " ".join(rng.choice(v) for _ in range(n))
    ref = spark.createDataFrame([(i, mk(ref_vocab, 30)) for i in range(40)], ["doc_id", "text"])
    spam = spark.createDataFrame([(100 + i, mk(spam_vocab, 30)) for i in range(40)], ["doc_id", "text"])
    model = classify.train_quality_classifier(ref, spam)
    mixed = spark.createDataFrame(
        [(1, mk(ref_vocab, 30)), (2, mk(spam_vocab, 30))], ["doc_id", "text"]
    )
    kept = curate.curate_corpus(
        mixed, near_dup_threshold=None, quality_model=model
    ).collect()
    assert [r.doc_id for r in kept] == [1]


def test_components_long_chain_converges_with_pointer_jumping(spark):
    """A 120-node path graph has diameter 119: plain propagation would
    under-merge within max_iters=20, pointer jumping (path halving)
    converges in O(log n) rounds (ADVICE r5)."""
    edges = [(i, i + 1) for i in range(1, 120)]
    pairs = spark.createDataFrame(edges, ["qid", "cid"])
    got = {
        r["id"]: r["rep"]
        for r in curate.near_dup_components(pairs, max_iters=20).collect()
    }
    assert set(got.values()) == {1}
    assert len(got) == 120


def test_curate_components_vs_greedy_star(spark):
    """Star pairs (1,5),(2,5): greedy keeps {1,2}, components keeps {1}
    (the module-docstring divergence case).  Verified on a corpus whose
    LSH pairs form exactly that star."""
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base + " x"),
        (5, base + " y"),
        (9, "completely different text about spark adaptive query execution"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.2)
    got_pairs = {(r["qid"], r["cid"]) for r in pairs.collect()}
    assert got_pairs, "fixture must produce near-dup pairs"
    greedy = {
        r["doc_id"]
        for r in curate.curate_corpus(
            docs, near_dup_threshold=0.2, near_dup_strategy="greedy"
        ).collect()
    }
    comp = {
        r["doc_id"]
        for r in curate.curate_corpus(
            docs, near_dup_threshold=0.2, near_dup_strategy="components"
        ).collect()
    }
    # components keeps exactly one representative per cluster
    reps = _union_find_reps(list(got_pairs))
    expected_comp = ({1, 2, 5, 9} - set(reps)) | {r for r in reps.values()}
    assert comp == expected_comp
    # greedy keeps every id that never appears as the larger member
    expected_greedy = {1, 2, 5, 9} - {c for _, c in got_pairs}
    assert greedy == expected_greedy
    # and components is never larger than greedy
    assert comp <= greedy


def test_curate_rejects_unknown_strategy(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        curate.curate_corpus(docs, near_dup_strategy="nope").collect()


def test_curate_with_markup_stripping(spark):
    """strip_markup=True: tags are removed BEFORE language/quality/dedup,
    so an HTML-wrapped english doc classifies and dedupes like its plain
    twin instead of being polluted by markup tokens."""
    plain = "the cat and the dog sat on the mat in the sun for it is warm"
    rows = [
        (1, plain),
        (2, f"<div class='x'><p>{plain}</p></div>"),  # exact dup after strip
        (3, "der hund und die katze sind nicht mit der maus in den park"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate.curate_corpus(
        docs, languages=["en"], near_dup_threshold=None, strip_markup=True
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 2 became an exact dup of doc 1 after stripping -> min-id kept;
    # doc 3 is german -> filtered by the language stage.
    assert set(got) == {1}
    assert got[1] == plain
    # without stripping, the markup doc survives as a distinct document
    got_raw = {
        r["doc_id"]
        for r in curate.curate_corpus(
            docs, languages=["en"], near_dup_threshold=None
        ).collect()
    }
    assert got_raw == {1, 2}


def test_curate_with_c4_clean(spark):
    """c4_clean=True: boilerplate lines are cut before shingling and
    pages failing the C4 page rules are dropped entirely."""
    good = (
        "the cat and the dog sat on the mat in the warm sun today.\n"
        "the dog then chased the cat around the big green garden there.\n"
        "later they both slept on the mat for the whole afternoon there."
    )
    rows = [
        (1, good + "\nHome | About | Contact"),      # menu line must be cut
        (2, "click here\nlogin\nsignup"),             # no sentences -> dropped
        (3, good.replace("cat", "{cat}")),            # brace -> page dropped
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate.curate_corpus(
        docs, languages=["en"], near_dup_threshold=None, c4_clean=True
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1}
    assert "Home | About" not in got[1]
    assert got[1].count("\n") == 2


def test_curate_with_normalize(spark):
    """normalize=True: typographic twins reach the dedup stage as exact
    duplicates, so the curly-quoted copy drops on min-id."""
    base = 'he said "come here now" and the dog ran to the warm mat again'
    rows = [
        (1, base),
        (2, base.replace('"come here now"', "\u201ccome here now\u201d")),
        (3, "ein ganz anderes deutsches dokument ohne englische woerter hier"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate.curate_corpus(
        docs, languages=["en"], near_dup_threshold=None, normalize=True
    )
    got = {r.doc_id: r.text for r in out.collect()}
    # doc 2 folds to doc 1's exact text -> min-id keeps 1; german drops.
    assert set(got) == {1}
    assert got[1] == base
    # without normalization both quoted variants survive as distinct
    raw = {
        r.doc_id
        for r in curate.curate_corpus(
            docs, languages=["en"], near_dup_threshold=None
        ).collect()
    }
    assert raw == {1, 2}


def test_curate_with_perplexity_filter(spark):
    """reference_lm + max_perplexity: documents that look nothing like
    the reference corpus score high perplexity and drop; in-domain
    documents survive."""
    from etl_rust_spark.operators import lm

    ref_text = "the cat sat on the mat and the dog sat on the rug today"
    reference = spark.createDataFrame(
        [(i, ref_text) for i in range(20)], ["doc_id", "text"]
    )
    ref_lm = lm.train_bigram_lm(reference, lazy_vocab=True)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat on the rug today"),
            (2, "qqq zzz xxx vvv kkk jjj www yyy uuu ooo ppp lll mmm nnn"),
        ],
        ["doc_id", "text"],
    )
    from etl_rust_spark.operators import lm as _lm

    bg, ctx, vocab = ref_lm
    ppls = {
        r.doc_id: r.ppl
        for r in _lm.score_perplexity(docs, bg, ctx, vocab).collect()
    }
    cut = (ppls[1] + ppls[2]) / 2
    out = curate.curate_corpus(
        docs, near_dup_threshold=None, reference_lm=ref_lm, max_perplexity=cut
    )
    assert {r.doc_id for r in out.collect()} == {1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate.curate_corpus(docs, max_perplexity=10.0)


def test_curate_with_script_filter(spark):
    """scripts=["latin"]: a Cyrillic page drops on script even though
    stopword voting necessarily assigns it SOME stopword language."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog here today"),
        (2, "быстрая коричневая лиса прыгает через ленивую собаку здесь"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate.curate_corpus(docs, near_dup_threshold=None, scripts=["latin"])
    assert {r.doc_id for r in out.collect()} == {1}
    both = curate.curate_corpus(docs, near_dup_threshold=None)
    assert {r.doc_id for r in both.collect()} == {1, 2}


def test_curated_corpus_lifecycle_table_takedown_and_cdc(spark, sf_dir, tmp_path):
    """End-to-end story: curate the documents table, commit it as a
    versioned table with doc_id blooms, serve a single-document
    TAKEDOWN via a bloom-pointed delete, and publish the resulting
    change feed through the queue transport — the LLM-data pipeline
    feeding the table stack feeding the publish path."""
    import json as _json

    from etl_rust_spark import versions as V
    from etl_rust_spark.etl.sinks import DirQueueClient
    from etl_rust_spark.operators.curate import curate_corpus
    from etl_rust_spark.streaming.tables import publish_table_changes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    curated = curate_corpus(docs, near_dup_threshold=0.5)
    table = str(tmp_path / "corpus")
    V.write_table_version(
        curated.select("doc_id", "text"), table, bloom_cols=["doc_id"]
    )
    n1 = V.read_table_version(spark, table).count()
    assert 0 < n1 <= 200
    cursor = str(tmp_path / "cur")
    qroot = str(tmp_path / "q")
    publish_table_changes(
        spark, table, ["doc_id"], lambda: DirQueueClient(qroot), cursor
    )  # cold start: cursor at head
    victim = V.read_table_version(spark, table).select("doc_id").first()[0]
    v2 = V.delete_table_version(
        spark, table, F.col("doc_id") == victim, point=[("doc_id", victim)]
    )
    assert v2 == 2
    assert V.read_table_version(
        spark, table, point=[("doc_id", victim)]
    ).filter(F.col("doc_id") == victim).count() == 0
    assert V.read_table_version(spark, table).count() == n1 - 1
    # the takedown reaches the downstream queue as a delete record
    assert publish_table_changes(
        spark, table, ["doc_id"], lambda: DirQueueClient(qroot), cursor
    ) == 1
    recs = [
        _json.loads(line)
        for f in sorted((tmp_path / "q").rglob("*")) if f.is_file()
        for line in f.read_text().splitlines()
    ]
    assert [(r["doc_id"], r["_change_type"], r["_commit_version"])
            for r in recs] == [(victim, "delete", 2)]


def test_curate_compression_floor_drops_template_spam(spark):
    spam = "buy cheap widgets now! " * 60
    prose = (
        "a harbor town in early november keeps odd hours: the ferry "
        "runs late, the bakery opens before dawn, and the tide tables "
        "argue with the almanac about everything else; seventeen "
        "sailors disagree about breakfast while the lighthouse keeper "
        "files her third complaint of the season about foghorn pitch"
    )
    docs = spark.createDataFrame(
        [("spam", spam), ("keep", prose)], ["doc_id", "text"]
    )
    out = curate.curate_corpus(
        docs, near_dup_threshold=None, min_compression_ratio=0.2
    )
    assert [r.doc_id for r in out.collect()] == ["keep"]
