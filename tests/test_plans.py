"""Plan-shape assertions: the 100 TB design pass enforced in CI.

Every assertion here encodes a property that holds on a 1000-executor
cluster reading 100 TB, checked on the local plan: pushdown reaches the
scan, projections prune, dims broadcast, Python stays out of relational
queries, no cartesian blowups hide in the declared suite.
"""

from __future__ import annotations

import pytest

from etl_rust_spark.catalog import register_views
from etl_rust_spark.plans import audit
from etl_rust_spark.queries import DECLARED


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


def _df(spark, name):
    return spark.sql(DECLARED[name].spark_sql)


def test_dq01_pushdown_and_pruning(spark):
    rep = audit(
        _df(spark, "dq01"),
        expect_columns={"lineitem": {"l_orderkey", "l_linenumber", "l_quantity"}},
    )
    assert any("l_orderkey" in f and "100" in f for f in rep.pushed_filters), rep.pushed_filters
    assert rep.read_columns("lineitem") == {"l_orderkey", "l_linenumber", "l_quantity"}
    assert not rep.warnings, rep.warnings


def test_dq04_single_shuffle_agg(spark):
    # TPC-H Q1 shape: partial agg → one exchange on group keys → final agg
    # (+ at most a sort exchange for the ORDER BY).
    rep = audit(_df(spark, "dq04"))
    assert rep.num_exchanges <= 2, rep.plan
    assert rep.read_columns("lineitem") <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
    }


def test_dq08_star_join_broadcasts_dims(spark):
    # 5-way star join: region/nation/customer are small → broadcast, no
    # shuffle for the dimension sides at plan time.
    rep = audit(_df(spark, "dq08"))
    assert rep.broadcast_joins >= 2, rep.plan
    assert rep.cartesian_products == 0


def test_dq12_interval_join_not_cartesian(spark):
    # The theta join has an equi component (user_id) → must plan as a
    # hash/SMJ join with range predicate, never CartesianProduct.
    rep = audit(_df(spark, "dq12"))
    assert rep.cartesian_products == 0, rep.plan


def test_dq14_cross_join_is_declared(spark):
    # The one declared cross join: tiny × tiny, broadcast NL is the
    # correct physical choice.
    rep = audit(_df(spark, "dq14"))
    assert rep.broadcast_nl_joins + rep.cartesian_products >= 1


@pytest.mark.parametrize("name", sorted(DECLARED))
def test_no_python_in_declared_suite(spark, name):
    # Entire declared surface runs JVM-side: no row-at-a-time or pandas
    # Python evaluation anywhere (SURVEY §2.7 — the gate avoids UDFs).
    rep = audit(_df(spark, name))
    assert rep.python_evals == 0, f"{name}: python eval in plan"


@pytest.mark.parametrize(
    "name", ["dq02", "dq26", "dq27", "dq28", "dq29", "dq30", "dq42"]
)
def test_filter_queries_push_predicates(spark, name):
    # Every query with a base-table predicate must show a pushed filter.
    rep = audit(_df(spark, name))
    assert rep.pushed_filters, f"{name}: no PushedFilters\n{rep.plan}"


def test_streaming_window_ops_prune_events(spark, sf_dir):
    from etl_rust_spark.streaming import entry_queries

    rep = audit(entry_queries()["op_time_windows"](spark, sf_dir))
    # Tumble/slide need ts+value; the merged session level adds user_id
    # (key) and event_id (deterministic tie-break).  event_type and the
    # wide props column must stay pruned from the 6-column events table.
    assert rep.read_columns("events") <= {"ts", "value", "user_id", "event_id"}, rep.plan


def test_curate_pipeline_plan_shape(spark, sf_dir):
    """The composed curation pipeline stays a sane distributed plan:
    no cartesian products anywhere (the near-dup stage must remain the
    banded LSH join, never an all-pairs blowup), and NO row-at-a-time
    Python anywhere — the only Python in the plan is the Arrow-batched
    shingle-hash kernel (dedup._hashed_shingles), which appears once
    per shingled frame."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import curate

    docs = load_table(spark, sf_dir, "documents")
    cur = curate.curate_corpus(docs, languages=["en"], min_quality_bp=1000)
    rep = audit(cur)
    assert rep.cartesian_products == 0, rep.plan
    assert rep.rowwise_python_evals == 0, rep.plan
    assert rep.arrow_evals <= 4, rep.plan  # the declared hash kernels only


def test_dq33_engine_form_streams_corpus_once(spark, sf_dir):
    """The BLAS engine form must read embeddings without a join —
    one corpus scan into mapInPandas, then a 10-row-per-batch reduce;
    the quadratic pair relation of the spec SQL must NOT appear."""
    from etl_rust_spark.queries.engine_forms import dq33_engine

    rep = audit(dq33_engine(spark, sf_dir))
    assert rep.cartesian_products == 0, rep.plan
    assert "Join" not in rep.plan, rep.plan


def test_asof_join_is_single_exchange(spark, sf_dir):
    """The as-of rewrite's whole point: ONE shuffle (on the by-key) for
    union + carry-forward window — no per-row probe join, no second
    exchange.  This is the property that survives a 100× scale-up."""
    from pyspark.sql import functions as F

    from etl_rust_spark.operators import temporal

    ev = spark.table("events")
    m = temporal.asof_attach(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "ts", ["user_id"], ["value"], right_seq="event_id", left_seq="event_id",
    )
    rep = audit(m)
    assert rep.num_exchanges <= 1, rep.plan
    assert rep.python_evals == 0 and rep.cartesian_products == 0


def test_rollup_merge_reads_rollup_not_raw(spark, sf_dir):
    """Daily-from-hourly must not rescan events: the merge plan reads
    only the hourly aggregate (one more exchange on the coarser key)."""
    from etl_rust_spark.operators import rollup

    hourly = rollup.time_rollup(spark.table("events"), sketch=False)
    rep = audit(rollup.merge_rollup(hourly, 86400, estimate=False))
    # partial agg → exchange (hourly) → final → exchange (daily) → final
    assert rep.num_exchanges <= 2, rep.plan
    assert rep.python_evals == 0


def test_persist_discipline():
    """Cache-hygiene lint (VERDICT r2 #3/#9): every ``.persist(`` in the
    operator tree must go through ``dedup._persist_tracked`` so caches
    are bounded and releasable — a bare persist leaks one frame per
    invocation across the driver's repeated suite laps."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "etl_rust_spark"
    offenders = []
    for py in root.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".persist(" in code and "_persist_tracked" not in code and "def _persist_tracked" not in line:
                # the tracked helper itself is the one allowed call site
                if py.name == "dedup.py" and "out = df.persist(" in code:
                    continue
                offenders.append(f"{py.relative_to(root)}:{i}: {line.strip()}")
    assert not offenders, "untracked persist() calls:\n" + "\n".join(offenders)


def test_text_profile_entry_plan_shape(spark, sf_dir):
    """The consolidated text-profile entry (5 text ops + sketches +
    repetition + decontamination + perplexity) stays a sane plan: no
    cartesian products, no row-at-a-time Python, Arrow evals bounded to
    the declared hash kernels (LM bigram/context passes + the shingle
    hash), and the benchmark side of decontamination joins broadcast —
    document text must never shuffle for the membership probe."""
    from etl_rust_spark.operators import entry_queries

    df = entry_queries()["op_text_profile"](spark, sf_dir)
    rep = audit(df)
    assert rep.cartesian_products == 0, rep.plan
    assert rep.rowwise_python_evals == 0, rep.plan
    assert rep.arrow_evals <= 6, rep.plan
    assert rep.broadcast_joins >= 1, rep.plan  # decontamination bench side


def test_chunk_documents_is_scan_side(spark, sf_dir):
    """Chunking must ride the scan: zero exchanges, zero Python — at
    100 TB it is a free projection, not a pipeline stage."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import chunk

    df = chunk.chunk_documents(load_table(spark, sf_dir, "documents"))
    rep = audit(df)
    assert rep.num_exchanges == 0, rep.plan
    assert rep.python_evals == 0, rep.plan


def test_paragraph_dedupe_plan_shape(spark, sf_dir):
    """One first-occurrence window shuffle + one reassembly groupBy +
    the totals join — bounded exchanges, no cartesian, no Python."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import chunk

    df = chunk.paragraph_dedupe(load_table(spark, sf_dir, "documents"))
    rep = audit(df)
    assert rep.cartesian_products == 0, rep.plan
    assert rep.python_evals == 0, rep.plan
    assert rep.num_exchanges <= 4, rep.plan


def test_incremental_near_dup_store_join_is_equi(spark, sf_dir, tmp_path):
    """The batch-vs-store candidate join must be an equi-join on the
    band key (no BNLJ/cartesian): per batch the store side is probed by
    key, never scanned per row."""
    from pyspark.sql import functions as F

    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") < 50)
    b = docs.filter(F.col("doc_id").between(50, 80))
    bands_df, hs_df = dedup.signature_store(a)
    bands_df.write.parquet(str(tmp_path / "b"))
    hs_df.write.parquet(str(tmp_path / "h"))
    df = dedup.incremental_near_dup_pairs(
        b, spark.read.parquet(str(tmp_path / "b")), spark.read.parquet(str(tmp_path / "h"))
    )
    rep = audit(df)
    assert rep.cartesian_products == 0, rep.plan
    assert rep.rowwise_python_evals == 0, rep.plan


def test_lsh_bucket_cap_is_mapside_window_group_limit(spark, sf_dir):
    """The max_bucket hot-bucket cap must execute as a rank predicate
    (row_number ≤ cap ⇒ WindowGroupLimit) with a PARTIAL pass BELOW the
    banding exchange: a degenerate bucket then shrinks map-side before
    it ever shuffles, and the collect_list state is bounded — instead
    of one reducer materializing the whole bucket and slicing after
    (r12; guide §2.5).  The bucket groupBy must reuse the window's
    (band, key) partitioning: exactly ONE exchange between the melted
    band triples and the bucket aggregate."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import dedup

    df = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.2
    )
    rep = audit(df)
    plan = rep.plan
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final
    # partial limit sits below the exchange: in the tree walk the FINAL
    # WindowGroupLimit prints first, then the banding Exchange, then the
    # PARTIAL WindowGroupLimit (deepest prints last on its spine) — so
    # the Exchange index must lie STRICTLY BETWEEN the two
    # WindowGroupLimit indices (ADVICE r12: the old assertion also
    # passed a Final→Partial→Exchange order).
    tree = plan.split("\n\n")[0]
    lines = [ln for ln in tree.splitlines() if "WindowGroupLimit" in ln or "Exchange" in ln]
    wgl_idx = [i for i, ln in enumerate(lines) if "WindowGroupLimit" in ln]
    assert len(wgl_idx) >= 2, plan
    assert any(
        "Exchange" in lines[i] for i in range(wgl_idx[0] + 1, wgl_idx[1])
    ), plan
    dedup.release_caches()


def test_repeated_spans_plan_shape(spark, sf_dir):
    """Substring dedup: window hashing scan-side, one hash-keyed
    groupBy + join + per-doc window — no cartesian, no Python."""
    from pyspark.sql import functions as F

    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import substring

    df = substring.repeated_kgram_spans(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100), k=8
    )
    rep = audit(df)
    assert rep.cartesian_products == 0, rep.plan
    assert rep.python_evals == 0, rep.plan


def test_media_operators_are_scan_side(spark):
    """resample_audio and frame_features must stay scan→mapInPandas with
    no shuffle of payload bytes: at 100 TB of media the plan is one
    Arrow-batched Python eval riding the scan (the decode is the honest
    per-asset cost), never an exchange carrying payloads."""
    from etl_rust_spark.operators import mediacodec as mc
    from etl_rust_spark.operators import multimodal

    import numpy as np

    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    rows = [
        (1, "audio", bytearray(mc.encode_wav(np.zeros(16), 8000)), ("audio/wav", None, None, 2, "u")),
        (2, "video", bytearray(mc.encode_avi(frames)), ("video/avi", 4, 4, 40, "u")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    for out in (
        multimodal.frame_features(df),
        multimodal.extract_features(df, decode_stub=False),
    ):
        rep = audit(out)
        assert rep.num_exchanges == 0, rep.plan
    # resample_audio unions the passthrough branch — still exchange-free
    rep = audit(multimodal.resample_audio(df, 16000, decode_stub=False))
    assert rep.num_exchanges == 0, rep.plan


def test_near_dup_images_is_banded_equi_join(spark):
    """Image near-dup must be the LSH shape: an equi-join on
    (band_idx, band_val) over small signature rows — no cartesian
    product, and the payload column pruned before the shuffle."""
    from etl_rust_spark.operators import mediacodec as mc
    from etl_rust_spark.operators import multimodal

    import numpy as np

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    rows = [
        (i, "image", bytearray(mc.encode_png(img)), ("image/png", 8, 8, None, "u"))
        for i in range(3)
    ]
    df = multimodal.make_asset_df(spark, rows)
    out = multimodal.near_dup_images(df, decode_stub=False)
    rep = audit(out)
    assert rep.cartesian_products == 0, rep.plan
    assert "payload" not in str(out.schema)


def test_cosine_join_plan_is_cogroup_no_cartesian(spark, sf_dir):
    """Cross-corpus cosine join: sharded cogroup — no cartesian/BNLJ
    anywhere; both sides exchange on the shard key only."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.cosine_join(
        emb.filter("vec_id < 10"), emb.filter("vec_id >= 10"), 0.9
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is expected and it is the broadcast
    # replication of the tiny shard range onto the query side — never a
    # data-by-data cross (the corpus side reaches the cogroup via a
    # hash exchange on shard).
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "Range (0, 16" in plan  # the n_shards generator is the build side


def test_ivf_search_prunes_list_partitions(spark, sf_dir, tmp_path):
    """The index search's corpus scan must carry a list_id partition
    filter (directory pruning), not scan every inverted list."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_plan")
    similarity.build_ivf_index(emb, idx, n_lists=8, seed=7)
    out = similarity.ivf_search(emb.filter("vec_id < 5"), idx, k=2, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*list_id[^\]]*\]", plan)
    assert m, "corpus scan lost its list_id partition filter"


def test_delete_probe_pushes_filter_and_prunes_columns(spark, tmp_path):
    """delete_table_version's find-the-files job must reach the scan as
    a pushed filter with a predicate-columns-only ReadSchema — the
    probe reads footer-pruned row groups of only the candidate files,
    never whole rows."""
    import re

    from pathlib import Path

    from pyspark.sql import functions as F

    from etl_rust_spark import versions as V

    p = str(tmp_path / "t")
    V.write_table_version(
        spark.range(0, 1000).selectExpr(
            "id AS k", "CAST(id % 10 AS INT) AS ds", "'x' AS val"
        ),
        p, "ds",
    )
    m = V._load_manifest(p, 1)
    data = str(Path(p) / "data")
    cdf = spark.read.option("basePath", data).parquet(
        *[f"{data}/{f}" for f in m["files"]]
    )
    probe = (
        cdf.filter(F.expr("k = 500"))
        .select(F.input_file_name().alias("f"))
        .distinct()
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(k,500\)", plan), plan[:600]
    assert re.search(r"ReadSchema: struct<k:bigint>", plan), "probe reads more than the predicate column"


def test_mor_read_anti_join_broadcasts_delete_side(spark, tmp_path):
    """A merge-on-read read applies sidecars as a BROADCAST anti-join —
    the KB-sized delete side ships to executors, the data side never
    shuffles; a table without sidecars keeps the plain one-scan plan
    (zero MoR tax on the common path)."""
    from etl_rust_spark import versions as V

    p = str(tmp_path / "t")
    V.write_table_version(
        spark.range(0, 2000).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS ds", "'x' AS val"
        ),
        p, "ds",
    )
    clean_plan = (
        V.read_table_version(spark, p)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in clean_plan  # no-deletes path: plain scan
    V.delete_table_version(spark, p, "k = 7", mode="mor")
    df = V.read_table_version(spark, p)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:800]
    assert "SortMergeJoin" not in plan  # the data side must not shuffle
    assert df.filter("k = 7").count() == 0


def test_merge_insert_anti_join_prunes_to_key_columns(spark, tmp_path):
    """MERGE's not-matched insert anti-join reads only the KEY columns
    of the head (ReadSchema pruned) — the key-membership scan is the
    one whole-table touch a merge pays, and it must never drag payload
    columns through it.  The find-the-files probe side is covered by
    the delete-probe test (same shared shape)."""
    import re

    from pathlib import Path

    from etl_rust_spark import versions as V

    p = str(tmp_path / "t")
    V.write_table_version(
        spark.range(0, 1000).selectExpr(
            "id AS k", "'payload' AS val", "uuid() AS extra"
        ),
        p,
    )
    m = V._load_manifest(p, 1)
    data = str(Path(p) / "data")
    existing = V._plan_with_deletes(spark, data, m["files"], None)
    src = spark.createDataFrame(
        [(5000, "n", "n")], ["k", "val", "extra"]
    )
    anti = src.join(existing.select("k"), ["k"], "left_anti")
    plan = anti._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"ReadSchema: struct<k:bigint>", plan), (
        "insert anti-join reads more than the key columns: "
        + plan[:600]
    )
