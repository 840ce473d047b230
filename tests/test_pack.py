"""Sampling + sequence packing (operators/pack.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import pack, text
from tests.oracle import run_duck


def test_hash_sample_matches_duckdb(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    sp_sql, du_sql = pack.hash_sample_sql(0.3)
    df = spark.sql(sp_sql)
    drows, dcols = run_duck(duck, du_sql)
    assert canonical_hash(
        [tuple(r) for r in df.collect()], list(df.columns)
    ) == canonical_hash(drows, dcols)


def test_hash_sample_operator_matches_sql_form(spark, sf_dir):
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    op = pack.hash_sample(docs, 0.3).orderBy("doc_id")
    sql = spark.sql(pack.hash_sample_sql(0.3)[0])
    assert [r["doc_id"] for r in op.collect()] == [r["doc_id"] for r in sql.collect()]


def test_hash_sample_properties(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s30 = pack.hash_sample(docs, 0.3)
    k = s30.count()
    # deterministic: same rows on a second evaluation
    assert sorted(r["doc_id"] for r in s30.collect()) == sorted(
        r["doc_id"] for r in pack.hash_sample(docs, 0.3).collect()
    )
    # rate roughly honored (binomial tolerance, small corpora are noisy)
    assert 0.12 * n <= k <= 0.5 * n
    # nested property: a 10% sample is a subset of the 30% sample
    # (same seed → same hash ordering — lets pipelines grow samples
    # without resampling everything)
    s10 = {r["doc_id"] for r in pack.hash_sample(docs, 0.1).collect()}
    assert s10 <= {r["doc_id"] for r in s30.collect()}
    # different seed → different draw
    other = {r["doc_id"] for r in pack.hash_sample(docs, 0.3, seed="s1").collect()}
    assert other != {r["doc_id"] for r in s30.collect()}


def test_hash_sample_stratified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = pack.hash_sample(docs, 0.1, strata_rates={"en": 0.9})
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    tot = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] / tot["en"] > 0.6
    non_en = sum(v for k, v in by_lang.items() if k != "en")
    non_en_tot = sum(v for k, v in tot.items() if k != "en")
    assert non_en / non_en_tot < 0.35


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = text.token_stats(docs, "text", "doc_id")
    max_tokens = 128
    packed = pack.pack_sequences(with_tokens, max_tokens, n_shards=8)
    rows = packed.collect()
    # every doc packed exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in with_tokens.collect()
    )
    # pack budgets respected except singleton-oversized packs
    from collections import defaultdict

    packs = defaultdict(list)
    for r in rows:
        packs[r["pack_id"]].append(r)
    for members in packs.values():
        total = sum(m["n_tokens"] for m in members)
        if len(members) > 1:
            assert total <= max_tokens
    # offsets are consistent: sorted offsets tile without overlap
    for members in packs.values():
        members = sorted(members, key=lambda m: m["pack_offset"])
        pos = 0
        for m in members:
            assert m["pack_offset"] == pos
            pos += m["n_tokens"]
    # deterministic across runs and partition layouts
    again = pack.pack_sequences(
        with_tokens.repartition(13), max_tokens, n_shards=8
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pack_sequences_utilization(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = text.token_stats(docs, "text", "doc_id")
    max_tokens = 256
    packed = pack.pack_sequences(with_tokens, max_tokens, n_shards=4)
    agg = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).collect()
    fill = sum(r["t"] for r in agg) / (len(agg) * max_tokens)
    # FFD on many small docs should fill packs well
    assert fill > 0.7, f"pack utilization {fill:.2f}"


def test_assign_split_matches_duckdb(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    sp_sql, du_sql = pack.assign_split_sql()
    df = spark.sql(sp_sql)
    drows, dcols = run_duck(duck, du_sql)
    assert canonical_hash(
        [tuple(r) for r in df.collect()], list(df.columns)
    ) == canonical_hash(drows, dcols)


def test_assign_split_properties(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = pack.assign_split(docs, w)
    rows = out.collect()
    n = len(rows)
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    # full partition of the corpus, deterministic across evaluations
    assert sum(len(v) for v in by.values()) == n
    again = {
        (r["doc_id"], r["split"]) for r in pack.assign_split(docs, w).collect()
    }
    assert {(d, s) for s, ds in by.items() for d in ds} == again
    # rough proportions (small corpus → loose binomial bounds)
    assert len(by["train"]) / n > 0.6
    assert 0 < len(by.get("val", set()) | by.get("test", set())) and len(
        by["train"]
    ) + len(by.get("val", set())) + len(by.get("test", set())) == n
    # growing train's share keeps earlier train members in train
    # (cumulative-bucket layout: train owns a prefix of hash space)
    w2 = {"train": 0.9, "val": 0.05, "test": 0.05}
    train2 = {
        r["doc_id"]
        for r in pack.assign_split(docs, w2).filter("split='train'").collect()
    }
    assert by["train"] <= train2
    with __import__("pytest").raises(ValueError):
        pack.assign_split(docs, {"train": 0.5, "val": 0.1})


def test_mix_corpora_epoch_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter("lang = 'en'")
    rest = docs.filter("lang <> 'en'")
    n_en, n_rest = en.count(), rest.count()
    mixed = pack.mix_corpora({"en": (en, 1.0), "rest": (rest, 2.5)})
    by = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    # exact integer epochs; fractional epoch within binomial tolerance
    assert by["en"] == n_en
    assert 2.2 * n_rest <= by["rest"] <= 2.8 * n_rest
    # epochs 1..2 of 'rest' contain every doc; epoch 3 is the sample
    full = mixed.filter("mix_source='rest' AND mix_epoch <= 2").count()
    assert full == 2 * n_rest
    # deterministic
    again = pack.mix_corpora({"en": (en, 1.0), "rest": (rest, 2.5)})
    assert sorted(
        (r["mix_source"], r["mix_epoch"], r["doc_id"]) for r in mixed.collect()
    ) == sorted((r["mix_source"], r["mix_epoch"], r["doc_id"]) for r in again.collect())


def test_leakage_safe_split_clusters_move_together(spark):
    """Near-dup clusters land in one split; singletons keep their plain
    assign_split placement (rep == own id)."""
    from pyspark.sql import functions as F

    from etl_rust_spark.operators import pack

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    # two chains: 0-1-2 and a long one 10..15; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)] + [(i, i + 1) for i in range(10, 15)],
        ["qid", "cid"],
    )
    out = pack.leakage_safe_split(
        docs, pairs, weights={"train": 0.6, "val": 0.2, "test": 0.2}
    )
    got = {r.doc_id: r.split for r in out.collect()}
    assert len({got[i] for i in (0, 1, 2)}) == 1
    assert len({got[i] for i in range(10, 16)}) == 1
    # singleton rows match plain assign_split exactly
    plain = {
        r.doc_id: r.split
        for r in pack.assign_split(
            docs, weights={"train": 0.6, "val": 0.2, "test": 0.2}
        ).collect()
    }
    clustered = {0, 1, 2} | set(range(10, 16))
    for i in range(200):
        if i not in clustered:
            assert got[i] == plain[i]
    # cluster members inherit the REPRESENTATIVE's placement
    assert got[0] == plain[0] and got[10] == plain[10]


def test_sample_to_budget(spark, sf_dir):
    """Per-group token budgets: achieved totals land near targets,
    under-budget groups keep everything, unnamed groups drop, and the
    selection is deterministic and nested under a budget increase."""
    from pyspark.sql import functions as F

    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import pack, text

    docs = load_table(spark, sf_dir, "documents")
    budget_en = 3000
    out = pack.sample_to_budget(docs, {"en": budget_en, "de": 10_000_000}, by="lang")
    got = {
        r.lang: r.n_tokens
        for r in text.token_budget(out, by=["lang"]).collect()
    }
    full = {
        r.lang: r.n_tokens
        for r in text.token_budget(docs, by=["lang"]).collect()
    }
    assert set(got) <= {"en", "de"}          # other langs dropped
    assert got["de"] == full["de"]            # under budget: kept whole
    assert abs(got["en"] - budget_en) < budget_en * 0.5  # near target
    assert got["en"] < full["en"]             # actually downsampled
    # determinism + nesting: same seed reselects identically; doubling
    # the budget keeps a superset
    ids1 = {r.doc_id for r in pack.sample_to_budget(docs, {"en": budget_en}, by="lang").collect()}
    ids2 = {r.doc_id for r in pack.sample_to_budget(docs, {"en": budget_en}, by="lang").collect()}
    ids4 = {r.doc_id for r in pack.sample_to_budget(docs, {"en": 2 * budget_en}, by="lang").collect()}
    assert ids1 == ids2 and ids1 <= ids4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack.sample_to_budget(docs, {"xx": 10}, by="lang")


def test_pack_sequences_duck_mirror_bit_equal(spark, duck, sf_dir):
    """The recursive-CTE DuckDB mirror (r7, gates 'pack' in
    op_dedup_exact) reproduces the operator bit-for-bit at a DIFFERENT
    (max_tokens, n_shards) than the gate uses — the mirror is general,
    not tuned to one configuration."""
    from tests.oracle import run_duck

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack.pack_sequences(
            docs.select("doc_id", F.col("n_chars").alias("n_tokens")),
            max_tokens=700,
            n_shards=4,
        ).collect()
    }
    rows, cols = run_duck(duck, pack.pack_sequences_duck_sql(700, 4))
    want = {r[cols.index("doc_id")]: (r[cols.index("pack_id")], r[cols.index("pack_offset")]) for r in rows}
    assert got == want
    # FFD invariants: no pack exceeds max_tokens unless singleton
    from collections import defaultdict
    packs = defaultdict(list)
    tokens = {r["doc_id"]: r["n_tokens"] for r in docs.select("doc_id", F.col("n_chars").alias("n_tokens")).collect()}
    for d, (p, o) in got.items():
        packs[p].append((o, tokens[d]))
    for members in packs.values():
        total = sum(n for _o, n in members)
        assert total <= 700 or len(members) == 1


def test_hash_shuffle_is_deterministic_and_decorrelates(spark, sf_dir):
    """hash_shuffle: per-partition row sequences are a pure function of
    (corpus, seed, n_shards); a different seed draws an independent
    permutation; the output order is decorrelated from doc_id order."""
    from pyspark.sql.functions import spark_partition_id

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def sequences(seed):
        out = pack.hash_shuffle(docs, n_shards=8, seed=seed)
        rows = out.withColumn("p", spark_partition_id()).collect()
        seqs = {}
        for r in rows:
            seqs.setdefault(r["p"], []).append(r["doc_id"])
        return seqs

    a, b, c = sequences("s0"), sequences("s0"), sequences("s1")
    assert a == b  # bit-for-bit replay
    assert a != c  # independent permutation per seed
    n = docs.count()
    assert sum(len(v) for v in a.values()) == n  # a permutation, not a sample
    assert sorted(x for v in a.values() for x in v) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    # shards are hash-balanced (uniform 62-bit keys): no empty shard and
    # no shard over 2x the mean on this corpus size
    sizes = [len(v) for v in a.values()]
    assert len(sizes) == 8 and min(sizes) > 0 and max(sizes) < 2 * n / 8 + 8
    # decorrelated from ingest order: within a shard, the doc_id sequence
    # is far from sorted (a sorted sequence has ~n ascending adjacent
    # pairs; a random permutation ~n/2)
    first = a[sorted(a)[0]]
    asc = sum(1 for x, y in zip(first, first[1:]) if y > x)
    assert 0.25 < asc / max(1, len(first) - 1) < 0.75


def test_hash_shuffle_rejects_bad_shards(spark, sf_dir):
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError, match="n_shards"):
        pack.hash_shuffle(docs, n_shards=0)


def test_pack_sequences_zero_token_docs_match_linear_spec(spark):
    """A shard whose FIRST (largest) doc has n_tokens == 0 used to be
    assigned to a phantom pack 0 at offset=max_tokens (segment-tree
    descend with zero open packs, ADVICE r7); the linear-scan spec and
    the recursive-CTE oracle open pack 0 at offset 0.  All-zero shards
    must collapse into pack 0 at offset 0."""
    df = spark.createDataFrame(
        [(i, 0) for i in range(6)], "doc_id long, n_tokens long"
    )
    out = pack.pack_sequences(df, max_tokens=100, n_shards=1).collect()
    assert len(out) == 6
    assert {r.pack_id for r in out} == {0}       # one pack, index 0
    assert all(r.pack_offset == 0 for r in out)  # spec offset

    # mixed: zero-token docs sort LAST and first-fit into pack 0 at its
    # current fill, never a phantom pack
    df2 = spark.createDataFrame(
        [(1, 60), (2, 30), (3, 0)], "doc_id long, n_tokens long"
    )
    got = {r.doc_id: (r.pack_id, r.pack_offset)
           for r in pack.pack_sequences(df2, max_tokens=100, n_shards=1).collect()}
    assert got == {1: (0, 0), 2: (0, 60), 3: (0, 90)}
