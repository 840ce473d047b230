"""Streaming semantics tests (SURVEY §5.4) — not DuckDB-hash-gated.

Strategy: the window operators are the SAME code in batch and streaming
(etl_rust_spark.streaming.windows), so batch results — themselves
oracle-gated via op_{tumbling,sliding,session}_window — serve as the
expected output for the streaming runs.  Plus: watermark late-data drop,
exact-gap session merge semantics, and checkpoint-resume of the
subscription pipeline without duplicates.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.catalog import load_table
from etl_rust_spark.streaming import (
    events_stream,
    run_subscription,
    session_window_agg,
    sliding_window,
    tumbling_window,
)
from etl_rust_spark.sources.chain import SyntheticChain


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ["op_time_windows"])
def test_window_entry_matches_oracle(spark, duck, sf_dir, name):
    from etl_rust_spark.functions.hashing import canonical_hash
    from etl_rust_spark.streaming import entry_oracle_sql, entry_queries
    from tests.oracle import run_duck

    df = entry_queries()[name](spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    drows, dcols = run_duck(duck, entry_oracle_sql()[name])
    assert sorted(df.columns) == sorted(dcols), name
    assert canonical_hash(rows, df.columns) == canonical_hash(drows, dcols), name


@pytest.fixture(scope="module")
def events_src(spark, sf_dir, tmp_path_factory):
    """sf0.001 events rewritten as micros-timestamp parquet for streaming
    (file-source streams read the normalized form, as a real feed would)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").write.parquet(path)
    return path


def _run_stream(spark, agg, name):
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.table(name)
    finally:
        q.stop()


def test_text_operators_stream_equals_batch(spark, sf_dir, tmp_path):
    """The scan-side curation operators (language-ID, quality, PII
    scrub, text profile) are stateless projections, so the SAME code
    runs under Structured Streaming unchanged — a streaming corpus feed
    (e.g. a crawl landing in parquet) profiles incrementally with
    stream == batch equality."""
    from etl_rust_spark.operators import scrub, text

    docs_path = str(tmp_path / "docs_stream")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    docs.write.parquet(docs_path)
    batch_df = spark.read.parquet(docs_path)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(docs_path)

    for label, op in [
        ("profile", lambda d: text.text_profile(d, "text", "doc_id")),
        ("scrub", lambda d: scrub.scrub_pii(d, "text", "doc_id")),
    ]:
        expected = _rows(op(batch_df))
        q = (
            op(stream_df)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"txt_{label}")
            .start()
        )
        try:
            q.processAllAvailable()
            got = _rows(spark.table(f"txt_{label}"))
        finally:
            q.stop()
        assert got == expected, label


def test_incremental_dedup_stream(spark, tmp_path):
    """Continuous-ingestion dedup: two arriving batches; the second's
    near-dup of a FIRST-batch doc is dropped against the signature
    store (history never rescanned), within-batch dups drop too, and
    unique docs survive."""
    from pyspark.sql import types as T

    from etl_rust_spark.streaming.curation import run_incremental_dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    spark.createDataFrame(
        [(1, base), (2, base + " x"), (10, "completely unrelated first text")],
        schema,
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "4"
    ).parquet(str(src / "*"))
    q = run_incremental_dedup_stream(stream, out, ckpt)
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(20, "zzz" + base[3:]), (21, "another brand new unique document")],
            schema,
        ).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/docs").collect()}
    assert kept == {1, 10, 21}
    # the store accumulated signatures for every survivor
    store_ids = {r.doc_id for r in spark.read.parquet(f"{out}/store_hs").collect()}
    assert store_ids == {1, 10, 21}


def test_tumbling_stream_matches_batch(spark, sf_dir, events_src):
    batch = tumbling_window(load_table(spark, sf_dir, "events"))
    stream = tumbling_window(events_stream(spark, events_src))
    got = _run_stream(spark, stream, "t_tumbling")
    assert _rows(got) == _rows(batch)


def test_sliding_stream_matches_batch(spark, sf_dir, events_src):
    batch = sliding_window(load_table(spark, sf_dir, "events"))
    stream = sliding_window(events_stream(spark, events_src))
    got = _run_stream(spark, stream, "t_sliding")
    assert _rows(got) == _rows(batch)


def test_session_stream_matches_batch(spark, sf_dir, events_src):
    batch = session_window_agg(load_table(spark, sf_dir, "events"))
    stream = session_window_agg(events_stream(spark, events_src))
    got = _run_stream(spark, stream, "t_session")
    assert _rows(got) == _rows(batch)


def test_session_counts_match_dq35(spark, sf_dir):
    """session_window sessions-per-user == DQ-35 gaps-and-islands."""
    from etl_rust_spark.queries import DECLARED
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    want = {
        r["user_id"]: r["n_sessions"]
        for r in spark.sql(DECLARED["dq35"].spark_sql).collect()
    }
    per_user = {
        r["user_id"]: r["n"]
        for r in session_window_agg(load_table(spark, sf_dir, "events"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {u: n for u, n in per_user.items() if u in want}  # dq35 LIMITs users
    assert got == want


def test_session_exact_gap_merges(spark):
    """Boundary semantics the DuckDB oracle encodes: diff == gap merges,
    diff == gap + 1µs splits."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 10, 30, 0)),
        (2, dt.datetime(2024, 1, 1, 10, 0, 0)),
        (2, dt.datetime(2024, 1, 1, 10, 30, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"],): r
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)))
        .collect()
    }
    sess = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    n_sessions = {r["user_id"]: r["count"] for r in sess}
    assert n_sessions == {1: 1, 2: 2}, (n_sessions, got)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append mode + 10-min watermark: a row older than the watermark is
    discarded; the already-emitted window is not revised."""
    src = tmp_path / "late_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def _write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(i, minute, second=0):
        return (i, t0.replace(minute=minute % 60, hour=10 + minute // 60, second=second), 1, "click", 1.0, "{}")

    # Batch 1: three rows in [10:00, 10:10) and a row at 10:40 that will
    # push the watermark to 10:30 → the 10:00 window emits.
    _write("b1", [ev(1, 0), ev(2, 3), ev(3, 9), ev(4, 40)])

    agg = tumbling_window(
        events_stream(spark, str(src), max_files_per_trigger=1).withWatermark(
            "ts", "10 minutes"
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = {tuple(r) for r in spark.table("t_late").collect()}
        first = {r for r in emitted if r[0] == t0}
        assert first == {(t0, t0.replace(minute=10), 3, 300)}
        # Batch 2: one LATE row at 10:05 (< watermark 10:30 → dropped) and
        # one at 11:20 (advances watermark past 10:40's window).
        _write("b2", [ev(5, 5), ev(6, 80)])
        q.processAllAvailable()
        emitted = {tuple(r) for r in spark.table("t_late").collect()}
        # 10:00 window unchanged (late row discarded, no revision)...
        assert {r for r in emitted if r[0] == t0} == {(t0, t0.replace(minute=10), 3, 300)}
        # ...and the 10:40 window emitted with only its on-time row.
        t40 = t0.replace(minute=40)
        assert {r for r in emitted if r[0] == t40} == {(t40, t0.replace(minute=50), 1, 100)}
    finally:
        q.stop()


def test_subscription_checkpoint_resume(spark, tmp_path):
    """S-03 + S-08 parity: work items drive run_range via foreachBatch;
    restart from checkpoint neither reprocesses committed items nor
    duplicates output rows."""
    chain = SyntheticChain()
    work = tmp_path / "work"
    work.mkdir()
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def submit(name, start, end):
        (work / f"{name}.json").write_text(json.dumps({"start": start, "end": end}) + "\n")

    submit("w1", 0, 10)
    q = run_subscription(spark, chain, str(work), out, ckpt, bucket_size=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    blocks = spark.read.parquet(f"{out}/blocks")
    assert blocks.count() == 10

    # Restart with one new item: only the new range is processed; the
    # committed item is not replayed; no duplicate blocks appear.
    submit("w2", 10, 25)
    q = run_subscription(spark, chain, str(work), out, ckpt, bucket_size=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    blocks = spark.read.parquet(f"{out}/blocks")
    assert blocks.count() == 25
    assert blocks.select("block_index").distinct().count() == 25

    # Third restart with no new work: a no-op.
    q = run_subscription(spark, chain, str(work), out, ckpt, bucket_size=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(f"{out}/blocks").count() == 25


def test_stream_dedupe_matches_batch_and_drops_in_window_dups(spark, sf_dir, events_src):
    """dropDuplicatesWithinWatermark keeps first arrivals; the batch
    fallback (plain dropDuplicates) is the row-set oracle."""
    from etl_rust_spark.streaming import stream_dedupe

    batch = load_table(spark, sf_dir, "events")
    # plant exact dups: union the stream with itself (source read twice)
    stream = events_stream(spark, events_src)
    deduped = stream_dedupe(stream.union(stream), ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("sdedup").select("event_id")
    finally:
        q.stop()
    expected = stream_dedupe(batch.union(batch), ["event_id"]).select("event_id")
    assert sorted(_rows(got)) == sorted(_rows(expected))
    assert got.count() == batch.select("event_id").distinct().count()


def test_stream_interval_join_matches_batch(spark, sf_dir, events_src):
    """Stream×stream interval join == the identical join on bounded
    frames (batch oracle), purchase-after-click attribution shape."""
    from etl_rust_spark.streaming import stream_interval_join

    batch = load_table(spark, sf_dir, "events")
    clicks_b = batch.filter(F.col("event_type") == "click")
    purch_b = batch.filter(F.col("event_type") == "purchase")
    expected = stream_interval_join(
        clicks_b, purch_b, on="user_id", upper="10 minutes"
    ).select("event_id", "event_id_r")

    stream = events_stream(spark, events_src)
    clicks_s = stream.filter(F.col("event_type") == "click")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    joined = stream_interval_join(
        clicks_s, purch_s, on="user_id", upper="10 minutes"
    ).select("event_id", "event_id_r")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("sjoin")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("sjoin")
    finally:
        q.stop()
    assert sorted(_rows(got)) == sorted(_rows(expected))
    assert expected.count() > 0  # the fixture must actually exercise the join


def test_stateful_running_totals_match_batch(spark, tmp_path):
    """applyInPandasWithState totals accumulate across micro-batches and
    end equal to the batch groupBy over all input."""
    src = tmp_path / "stateful_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def rows(batch, n):
        # Fractional values so the oracle discriminates rounding rules:
        # .125 → 12.5 cents exercises HALF_UP-vs-banker's; .004 → 0.4
        # cents rounds to 0 per row but accumulates per batch — a
        # per-batch-rounding implementation fails on both (ADVICE r1).
        return [
            (
                batch * 100 + i,
                t0 + dt.timedelta(minutes=batch * 10 + i),
                (i % 3) + 1,
                "click",
                float(i) + (0.125 if i % 2 else 0.004),
                "{}",
            )
            for i in range(n)
        ]

    all_rows = []

    def write(batch, n):
        data = rows(batch, n)
        all_rows.extend(data)
        spark.createDataFrame(data, schema).coalesce(1).write.mode("append").parquet(str(src))

    from etl_rust_spark.streaming.stateful import running_user_totals
    from etl_rust_spark.streaming import events_stream

    write(0, 7)
    q = (
        running_user_totals(events_stream(spark, str(src), max_files_per_trigger=1))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .start()
    )
    try:
        q.processAllAvailable()
        write(1, 9)
        q.processAllAvailable()
        # update-mode memory sink appends every emitted row; the LAST row
        # per user is its final state.
        emitted = spark.table("t_stateful").collect()
    finally:
        q.stop()

    final: dict[int, tuple] = {}
    for r in emitted:  # memory sink preserves batch order
        final[r["user_id"]] = (r["n_events"], r["value_c"])

    batch_df = spark.createDataFrame(all_rows, schema)
    want = {
        r["user_id"]: (r["n"], r["v_c"])
        for r in batch_df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("v_c"),
        )
        .collect()
    }
    assert final == want
    # intermediate emissions existed: more rows than distinct users
    assert len(emitted) > len(final)


def test_multimodal_features_stream_equals_batch(spark, tmp_path):
    """extract_features and image_signatures are stateless mapInPandas
    projections, so a streaming asset feed (media landing in parquet)
    featurizes incrementally with stream == batch equality — including
    the REAL decode path, since the codecs live inside the batch loop."""
    import numpy as np

    from etl_rust_spark.operators import mediacodec as mc
    from etl_rust_spark.operators import multimodal

    rng = np.random.default_rng(21)
    rows = [
        (
            i,
            "image",
            bytearray(mc.encode_png(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))),
            ("image/png", 8, 8, None, f"u{i}"),
        )
        for i in range(6)
    ]
    assets_path = str(tmp_path / "assets_stream")
    multimodal.make_asset_df(spark, rows).write.parquet(assets_path)
    batch_df = spark.read.parquet(assets_path)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(assets_path)

    for label, op in [
        ("feat", lambda d: multimodal.extract_features(d, decode_stub=False)),
        ("sig", lambda d: multimodal.image_signatures(d, decode_stub=False)),
    ]:
        expected = _rows(op(batch_df))
        q = (
            op(stream_df)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"mm_{label}")
            .start()
        )
        try:
            q.processAllAvailable()
            got = _rows(spark.table(f"mm_{label}"))
        finally:
            q.stop()
        assert got == expected, label


def test_rollup_stream_continuous_aggregate(spark, sf_dir, tmp_path):
    """Streaming continuous aggregate: events arrive over multiple
    micro-batches; the folded rollup state (counters, sketches,
    histograms) equals a one-shot batch rollup, before AND after
    compaction, and the histogram median reads identically off both."""
    from etl_rust_spark.catalog import register_views
    from etl_rust_spark.operators import rollup as br
    from etl_rust_spark.streaming.rollup import (
        compact_rollup,
        read_continuous_rollup,
        run_rollup_stream,
    )

    register_views(spark, sf_dir)
    ev = spark.table("events").select("ts", "event_type", "value", "user_id")
    src = tmp_path / "ev_src"
    src.mkdir()
    # three arrival files -> multiple epochs under maxFilesPerTrigger=1
    for i in range(3):
        ev.filter(F.col("user_id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
    out = str(tmp_path / "cagg")
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = run_rollup_stream(
        stream, out, str(tmp_path / "ckpt"), hist_bins=br.HIST_BINS
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from pathlib import Path

    assert len(list(Path(out, "delta").glob("batch=*"))) >= 2

    def check(level_sec):
        got = read_continuous_rollup(spark, out, level_sec).withColumn(
            "p50_c", br.hist_quantile("hist", 0.5)
        )
        want = br.time_rollup(
            ev, bucket_sec=level_sec, sketch=True, hist_bins=br.HIST_BINS
        ).withColumn("p50_c", br.hist_quantile("hist", 0.5))
        key = ["bs", "event_type"]
        j = got.select(
            key + ["n", "v_c", "p50_c", F.hll_sketch_estimate("user_sketch").alias("e1")]
        ).join(
            want.select(
                key
                + [
                    F.col("n").alias("n2"),
                    F.col("v_c").alias("v2"),
                    F.col("p50_c").alias("p2"),
                    F.hll_sketch_estimate("user_sketch").alias("e2"),
                ]
            ),
            key,
            "full",
        )
        assert j.filter(
            F.col("n").isNull() | F.col("n2").isNull()
            | (F.col("n") != F.col("n2")) | (F.col("v_c") != F.col("v2"))
            | (F.col("p50_c") != F.col("p2")) | (F.col("e1") != F.col("e2"))
        ).count() == 0

    check(3600)
    check(86400)  # coarser level off the same hourly state
    gen = compact_rollup(spark, out)
    assert gen == 0
    assert not list(Path(out, "delta").glob("batch=*"))
    check(3600)   # state identical after the fold


def test_rollup_stream_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A crashed foreachBatch epoch is re-invoked with the same rows and
    epoch id; the epoch-delta layout must make that a no-op (the exact
    failure read-modify-write state cannot survive: it would
    double-count)."""
    from etl_rust_spark.catalog import register_views
    from etl_rust_spark.operators import rollup as br
    from etl_rust_spark.streaming.rollup import (
        _epoch_processor,
        read_continuous_rollup,
    )

    register_views(spark, sf_dir)
    ev = spark.table("events").select("ts", "event_type", "value", "user_id")
    out = str(tmp_path / "replay")
    process = _epoch_processor(out, hist_bins=br.HIST_BINS)
    b0 = ev.filter(F.col("user_id") % 2 == 0)
    b1 = ev.filter(F.col("user_id") % 2 == 1)
    process(b0, 0)
    process(b1, 1)
    first = read_continuous_rollup(spark, out).orderBy("bs", "event_type")
    snap = [tuple(r) for r in first.drop("user_sketch").collect()]
    # crash replay: epoch 1 re-runs with the same rows
    process(b1, 1)
    again = read_continuous_rollup(spark, out).orderBy("bs", "event_type")
    assert [tuple(r) for r in again.drop("user_sketch").collect()] == snap
    # and the totals still equal the one-shot batch rollup
    want = br.time_rollup(ev, sketch=False)
    got_n = again.agg(F.sum("n")).collect()[0][0]
    assert got_n == want.agg(F.sum("n")).collect()[0][0]


def test_ann_index_stream_keeps_index_current(spark, sf_dir, tmp_path):
    """Embeddings arriving over micro-batches fold into the persisted
    IVF index; after the stream drains, search equals a from-scratch
    assignment over everything that arrived."""
    import numpy as np

    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import similarity
    from etl_rust_spark.streaming.ann import run_ann_index_stream

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = str(tmp_path / "ann_stream_idx")
    similarity.build_ivf_index(emb.filter("vec_id < 100"), idx, n_lists=8, seed=7)

    src = tmp_path / "emb_src"
    src.mkdir()
    for i, lo, hi in ((0, 100, 140), (1, 140, 180)):
        emb.filter(f"vec_id >= {lo} AND vec_id < {hi}").coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = run_ann_index_stream(stream, idx, str(tmp_path / "ann_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(f"{idx}/corpus")
    assert got.count() == 180 and got.select("cid").distinct().count() == 180
    cent = np.array(
        [
            r["centroid"]
            for r in sorted(
                spark.read.parquet(f"{idx}/centroids").collect(),
                key=lambda r: r["list_id"],
            )
        ]
    )
    want = similarity.ivf_assign(emb.filter("vec_id < 180"), cent)
    j = got.select("cid", F.col("list_id").alias("l1")).join(
        want.select("cid", F.col("list_id").alias("l2")), "cid", "full"
    )
    assert j.filter(
        F.col("l1").isNull() | F.col("l2").isNull() | (F.col("l1") != F.col("l2"))
    ).count() == 0


def test_ann_index_stream_maintains_ivfpq_codes(spark, tmp_path):
    """kind='ivfpq': streamed embeddings fold into the persisted codes
    table; post-drain state equals a from-scratch encode+assign with
    the stored artifacts (the batch update's pinned invariant)."""
    import numpy as np

    from etl_rust_spark.operators import similarity
    from etl_rust_spark.streaming.ann import run_ann_index_stream

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(8, 16))
    rows = [
        (i, [float(x) for x in centers[i % 8] + 0.1 * rng.normal(size=16)])
        for i in range(160)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivfpq_stream_idx")
    similarity.build_ivfpq_index(
        emb.filter("vec_id < 100"), idx, n_lists=4, m=4, k_codes=4, sample=100
    )

    src = tmp_path / "pq_src"
    src.mkdir()
    for i, lo, hi in ((0, 100, 130), (1, 130, 160)):
        emb.filter(f"vec_id >= {lo} AND vec_id < {hi}").coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = run_ann_index_stream(stream, idx, str(tmp_path / "pq_ckpt"), kind="ivfpq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(f"{idx}/codes")
    assert got.count() == 160 and got.select("cid").distinct().count() == 160
    cent, books, _res = similarity._read_ivfpq_artifacts(spark, idx)
    want = similarity.pq_encode(emb, books).join(
        similarity.ivf_assign(emb, cent).select("cid", "list_id"), "cid"
    )
    j = got.select("cid", "list_id", "codes").join(
        want.select("cid", F.col("list_id").alias("l2"), F.col("codes").alias("c2")),
        "cid",
        "full",
    )
    assert (
        j.filter(
            F.col("list_id").isNull()
            | F.col("l2").isNull()
            | (F.col("list_id") != F.col("l2"))
            | (F.col("codes") != F.col("c2"))
        ).count()
        == 0
    )


def test_rollup_stream_theta_retention_from_stream_state(spark, tmp_path):
    """Theta/KLL opt-ins ride the epoch-delta log: user sets arriving
    across micro-batches union into per-bucket Theta state, and
    retention reads exactly off the CONTINUOUS rollup (small sets are
    exact below the sketch's nominal entries)."""
    import datetime as dt

    from etl_rust_spark.operators import rollup as br
    from etl_rust_spark.streaming.rollup import (
        _epoch_processor,
        read_continuous_rollup,
    )

    UTC = dt.timezone.utc
    rows = [
        (dt.datetime(2024, 3, 1 + d, 10, tzinfo=UTC), "click", u, float(u))
        for d, users in [(0, range(0, 100)), (1, range(50, 150))]
        for u in users
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double"
    )
    out = str(tmp_path / "theta_stream")
    process = _epoch_processor(out, bucket_sec=86400, dims=(), theta=True, kll=True)
    # split ORTHOGONALLY to the buckets so each day's set is built from
    # two different epochs (the union-across-epochs claim under test)
    process(ev.filter(F.col("user_id") % 2 == 0), 0)
    process(ev.filter(F.col("user_id") % 2 == 1), 1)
    cont = read_continuous_rollup(spark, out, dims=())
    r = br.retention_matrix(cont, 86400).collect()[0]
    assert (r.users_a, r.users_b) == (100, 100)
    assert (r.retained, r.churned, r.new_users) == (50, 50, 50)
    q = cont.agg(F.kll_merge_agg_double("v_kll").alias("k")).select(
        br.kll_quantile("k", 0.5).alias("q")
    ).collect()[0].q
    assert abs(q - 74.0) <= 2.0  # 0..99 ∪ 50..149 → true median 74.5
