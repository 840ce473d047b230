"""Salted aggregation/join: exact result preservation on the planted
power-law keys, and the physical spreading they exist for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.operators.skew import salted_agg, salted_join
from etl_rust_spark.plans import audit
from etl_rust_spark.sources.chain import SyntheticChain
from etl_rust_spark.sources.ranges import block_range


@pytest.fixture(scope="module")
def tables(spark):
    chain = SyntheticChain()
    return chain.transform(chain.fetch(block_range(spark, 0, 300)))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain(spark, tables):
    ins = tables["instructions"]
    plain = ins.groupBy("program").agg(
        F.count(F.lit(1)).alias("n"), F.max("instr_index").alias("mx")
    )
    salted = salted_agg(
        ins, ["program"], {"n": ("count", "*"), "mx": ("max", "instr_index")}
    )
    assert _rows(salted) == _rows(plain)
    # the hot key really is hot (planted ~30% skew) — the premise holds
    top = plain.orderBy(F.desc("n")).first()
    total = ins.count()
    assert top["n"] / total > 0.2


def test_salted_agg_rejects_non_algebraic(spark, tables):
    with pytest.raises(ValueError):
        salted_agg(tables["instructions"], ["program"], {"a": ("avg", "instr_index")})


def test_salted_join_equals_plain(spark, tables):
    ins = tables["instructions"].select("program", "tx_index")
    dim = (
        tables["instructions"].select("program").distinct()
        .withColumn("program_tag", F.upper(F.col("program")))
    )
    plain = ins.join(dim, "program")
    salted = salted_join(ins, dim, "program")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_spreads_hot_key(spark, tables):
    ins = tables["instructions"].select("program", "tx_index")
    dim = tables["instructions"].select("program").distinct()
    out = salted_join(ins, dim, "program", n_salts=8)
    rep = audit(out)
    # the join key in the plan includes the salt column → hot 'program'
    # values hash to 8 distinct shuffle keys
    assert "__salt" in rep.plan


def test_salted_join_rejects_replication_unsafe_how(spark, tables):
    # right/full would emit every unmatched dim key once per salt
    # (ADVICE r1) — the operator must refuse instead of corrupting.
    ins = tables["instructions"].select("program", "tx_index")
    dim = tables["instructions"].select("program").distinct()
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError):
            salted_join(ins, dim, "program", how=how)


def test_salted_join_left_keeps_unmatched(spark, tables):
    ins = tables["instructions"].select("program", "tx_index").limit(200)
    dim = spark.createDataFrame([("nonexistent-program",)], ["program"]).withColumn(
        "tag", F.lit("x")
    )
    out = salted_join(ins, dim, "program", how="left")
    assert out.count() == 200
    assert out.filter(F.col("tag").isNotNull()).count() == 0


def test_lsh_verify_join_bounded_on_planted_hot_doc(spark):
    """VERDICT r6 #5: the exact-Jaccard verify join rejoins candidates
    on qid/cid — a planted degenerate corpus (every doc identical)
    would naively put one doc in ~n²/2 pairs and make the verify join
    the quadratic corner.  The bucket cap bounds it STRUCTURALLY: each
    (band, key) bucket is sliced to the max_bucket smallest ids, so a
    doc's join multiplicity is ≤ bands × (max_bucket − 1) candidates
    no matter how degenerate the corpus — asserted here as metrics on
    the verified output (threshold=0 ⇒ verified == candidates)."""
    from etl_rust_spark.operators import dedup

    n, cap, bands = 1200, 64, 4
    docs = spark.createDataFrame(
        [(i, "the same degenerate text repeated everywhere") for i in range(n)],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", bands=bands, threshold=0.0, max_bucket=cap
    ).collect()
    # identical signatures -> every band's bucket slices to the SAME
    # cap smallest ids -> exactly C(cap, 2) distinct candidate pairs
    assert len(pairs) == cap * (cap - 1) // 2
    ids = {r["qid"] for r in pairs} | {r["cid"] for r in pairs}
    assert ids == set(range(cap))  # deterministic sorted-slice cap
    # per-doc verify-join multiplicity stays under the structural bound
    from collections import Counter

    mult = Counter()
    for r in pairs:
        mult[r["qid"]] += 1
        mult[r["cid"]] += 1
    assert max(mult.values()) <= bands * (cap - 1)
    # and the hot doc pairs are genuine duplicates (jaccard 1.0)
    assert all(r["jaccard"] == 1.0 for r in pairs)
    dedup.release_caches()
