"""Incremental dedup (signature store) + source/domain operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table, register_views
from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import dedup, web


def test_incremental_equals_full_run_restricted_to_batch(spark, sf_dir, tmp_path):
    """Store built from corpus A; batch B arrives with near-dups of A
    and of itself.  incremental(B, store(A)) must equal the full-corpus
    run over A ∪ B restricted to pairs touching B — through a real
    parquet round-trip of the store (the production path)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") < 30)
    base = [(r.doc_id, r.text) for r in a.collect()]
    planted = [(d + 100000, "zzz" + t[3:]) for d, t in base[:10]]  # near-dups of A
    twins = [(200001, "spark adaptive execution rocks the benchmark suite"),
             (200002, "spark adaptive execution rocks the benchmark suite x")]
    b = spark.createDataFrame(planted + twins, ["doc_id", "text"])

    bands_df, hs_df = dedup.signature_store(a, "text", "doc_id")
    bands_df.write.parquet(str(tmp_path / "bands"))
    hs_df.write.parquet(str(tmp_path / "hs"))
    store_bands = spark.read.parquet(str(tmp_path / "bands"))
    store_hs = spark.read.parquet(str(tmp_path / "hs"))

    inc = dedup.incremental_near_dup_pairs(
        b, store_bands, store_hs, threshold=0.5
    ).collect()
    got = {(r.qid, r.cid, r.jaccard) for r in inc}
    got_pairs = {(q, c) for q, c, _ in got}

    full = dedup.minhash_lsh_pairs(a.unionByName(b), "text", "doc_id", threshold=0.5).collect()
    b_ids = {d for d, _ in planted + twins}
    want = set()
    for r in full:
        if r.qid in b_ids or r.cid in b_ids:
            # incremental reports (new, old) for store pairs; full run
            # reports sorted (min, max) — normalize to the new-doc-first
            # orientation for comparison.
            q, c = (r.qid, r.cid) if r.qid in b_ids else (r.cid, r.qid)
            if c in b_ids:  # batch-internal pair keeps sorted order
                q, c = min(r.qid, r.cid), max(r.qid, r.cid)
            want.add((q, c))
    assert got_pairs == want
    # at least the planted cross pairs and the twin pair are present
    assert (200001, 200002) in got_pairs
    assert any(q > 100000 and c < 30 for q, c in got_pairs)
    # every store pair carries the tag
    tags = {(r.qid, r.cid): r.vs for r in inc}
    assert tags[(200001, 200002)] == "batch"


def test_source_stats_mirror(spark, duck, sf_dir):
    register_views(spark, sf_dir)
    api = web.source_stats(load_table(spark, sf_dir, "documents"))
    sp_sql, du_sql = web.source_stats_sql()
    cols = sorted(api.columns)
    h_api = canonical_hash([tuple(r[c] for c in cols) for r in api.collect()], cols)
    sdf = spark.sql(sp_sql)
    h_sql = canonical_hash([tuple(r[c] for c in cols) for r in sdf.collect()], cols)
    pdf = duck.sql(du_sql).df()
    h_du = canonical_hash([tuple(row) for row in pdf[cols].itertuples(index=False)], cols)
    assert h_api == h_sql == h_du
    rows = api.collect()
    assert abs(sum(r.share_bp for r in rows) - 10000) < len(rows)


def test_domain_of_and_filter_sources(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://www.example.com/a/b?q=1"),
            (2, "http://sub.blog.org:8080/post"),
            (3, "ftp://user@files.net/x"),
            (4, "not a url"),
        ],
        ["id", "url"],
    )
    got = {r.id: r.d for r in urls.select("id", web.domain_of("url").alias("d")).collect()}
    assert got == {1: "example.com", 2: "sub.blog.org", 3: "files.net", 4: ""}

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(9)], ["doc_id", "source"]
    )
    kept = web.filter_sources(docs, blocklist=["src0"]).collect()
    assert all(r.source != "src0" for r in kept) and len(kept) == 6
    bl = spark.createDataFrame([("src1",)], ["source"])
    kept2 = web.filter_sources(docs, blocklist=bl).collect()
    assert all(r.source != "src1" for r in kept2) and len(kept2) == 6
    kept3 = web.filter_sources(docs, allowlist=["src2"]).collect()
    assert {r.source for r in kept3} == {"src2"}


URLS = [
    (1, "https://www.Example.COM/a/b/?utm_source=x&q=1&utm_medium=y#frag"),
    (2, "https://example.com/a/b?q=1"),            # canonical twin of 1
    (3, "http://example.com:80/a/b?q=1"),           # default port, http ≠ https
    (4, "https://example.com:8443/a/b?q=1"),        # non-default port kept
    (5, "https://user@example.com/a/b?b=2&a=1"),    # params sort, userinfo drops
    (6, "https://example.com/a/b?a=1&b=2&fbclid=z"),  # canonical twin of 5
    (7, "not a url"),
    (8, None),
    (9, "https://example.com"),                     # bare host
    (10, "https://example.com/"),                   # root path ≡ bare host
]


def test_canonical_url_semantics(spark):
    df = spark.createDataFrame(URLS, ["doc_id", "url"])
    got = {
        r.doc_id: r.c
        for r in df.select("doc_id", web.canonical_url("url").alias("c")).collect()
    }
    assert got[1] == "https://example.com/a/b?q=1"
    assert got[1] == got[2]
    assert got[3] == "http://example.com/a/b?q=1"
    assert got[4] == "https://example.com:8443/a/b?q=1"
    assert got[5] == "https://example.com/a/b?a=1&b=2" == got[6]
    assert got[7] is None and got[8] is None
    assert got[9] == "https://example.com" == got[10]


def test_url_dedupe_keeps_min_id_and_unparseable(spark):
    df = spark.createDataFrame(URLS, ["doc_id", "url"])
    kept = {r.doc_id for r in web.url_dedupe(df).collect()}
    # 2 dups 1; 6 dups 5; 10 dups 9; unparseable 7/8 both kept
    assert kept == {1, 3, 4, 5, 7, 8, 9}


def test_canonical_url_three_way_mirror(spark, duck):
    df = spark.createDataFrame(URLS, ["doc_id", "url"])
    df.createOrReplaceTempView("url_fixture")
    vals = ", ".join(
        f"({i}, {'NULL' if u is None else repr(u)})" for i, u in URLS
    )
    duck.execute(
        "CREATE OR REPLACE VIEW url_fixture AS "
        f"SELECT * FROM (VALUES {vals}) AS v(doc_id, url)"
    )
    sp_sql, du_sql = web.canonical_url_sql("url_fixture")
    api = df.select(
        "doc_id", web.canonical_url("url").alias("url_canon")
    ).orderBy("doc_id")
    sql_df = spark.sql(sp_sql)
    cols = sorted(api.columns)
    assert sorted(sql_df.columns) == cols

    from tests.oracle import run_duck

    d_rows, d_cols = run_duck(duck, du_sql)
    idx = [d_cols.index(c) for c in cols]
    h = lambda rows: canonical_hash(rows, cols)
    h_api = h([tuple(r[c] for c in cols) for r in api.collect()])
    h_sql = h([tuple(r[c] for c in cols) for r in sql_df.collect()])
    h_duck = h([tuple(r[i] for i in idx) for r in d_rows])
    assert h_api == h_sql == h_duck


def test_store_band_key_dtype_guard(spark):
    """A pre-r12 signature store (md5-hex string band keys) must fail
    loudly instead of silently matching nothing against the bigint
    batch keys (ADVICE r12)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etl_rust_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], ["doc_id", "text"]
    )
    bands, hs = dedup.signature_store(docs)
    old_bands = bands.withColumn("key", F.col("key").cast("string"))
    with _pytest.raises(TypeError, match="pre-r12"):
        dedup.incremental_near_dup_pairs(docs, old_bands, hs)
    # the bigint-keyed store passes the guard
    assert dedup.incremental_near_dup_pairs(docs, bands, hs) is not None
    dedup.release_caches()
