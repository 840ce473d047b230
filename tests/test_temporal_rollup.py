"""Unit + plan tests for the temporal joins and the hypertable rollup.

The entry-level hash gates (tests/test_operators.py) already check
op_temporal_join / op_rollup against independent DuckDB derivations;
these tests pin the operator-level semantics the gates can't see:
tolerance, tie-breaking, boundary modes, plan shape (no BNLJ), sketch
mergeability, and incremental-update == full-recompute.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.operators import rollup, temporal

UTC = dt.timezone.utc


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 12, minute, second, tzinfo=UTC)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (2, 102, _ts(5)), (3, 103, _ts(30))],
        "k int, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts(10), 1.0),   # same-ts as lid=100 → visible (<=)
            (1, 901, _ts(10), 2.0),   # same ts, higher id → wins the tie
            (1, 902, _ts(15), 3.0),   # latest before lid=101
            (2, 903, _ts(6), 4.0),    # AFTER lid=102 → no match for it
        ],
        "k int, rid long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_and_ties(spark, tiny):
    left, right = tiny
    m = temporal.asof_attach(
        left, right, "ts", ["k"], ["rid", "v"], right_seq="rid", left_seq="lid"
    )
    got = {r["lid"]: (r["r_rid"], r["r_v"]) for r in m.collect()}
    assert got[100] == (901, 2.0)  # same-ts match, max rid wins the tie
    assert got[101] == (902, 3.0)  # latest at-or-before
    assert got[102] == (None, None)  # only later right rows exist
    assert got[103] == (None, None)  # key has no right rows at all


def test_asof_tolerance_nulls_stale_matches(spark, tiny):
    left, right = tiny
    m = temporal.asof_attach(
        left, right, "ts", ["k"], ["rid"], right_seq="rid", left_seq="lid",
        tolerance_sec=120,
    )
    got = {r["lid"]: r["r_rid"] for r in m.collect()}
    assert got[100] == 901          # 0s old — within tolerance
    assert got[101] is None         # match is 5 min old > 120 s
    assert got[102] is None and got[103] is None


def test_asof_join_preserves_left(spark, tiny):
    left, right = tiny
    out = temporal.asof_join(
        left, right, "ts", ["k"], ["v"], right_seq="rid", left_seq="lid"
    )
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns) and "r_v" in out.columns


def test_range_join_boundary_modes(spark):
    pts = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(15)), (3, _ts(20))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(9, _ts(10), _ts(20))], "iid long, lo timestamp, hi timestamp"
    )
    def ids(closed):
        out = temporal.range_point_join(pts, iv, "ts", "lo", "hi", 600, closed=closed)
        return sorted(r["pid"] for r in out.collect())
    assert ids("(]") == [2, 3]
    assert ids("[)") == [1, 2]
    assert ids("[]") == [1, 2, 3]
    assert ids("()") == [2]


def test_range_join_guard_rejects_small_bucket(spark):
    iv = spark.createDataFrame(
        [(9, _ts(0), _ts(30))], "iid long, lo timestamp, hi timestamp"
    )
    pts = spark.createDataFrame([(1, _ts(10))], "pid long, ts timestamp")
    with pytest.raises(ValueError, match="bucket_sec"):
        temporal.range_point_join(pts, iv, "ts", "lo", "hi", 600)


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    pts = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("pid"), "ts"
    )
    iv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTE")).alias("hi"),
    )
    plan = temporal.range_point_join(pts, iv, "ts", "lo", "hi", 600)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # The interval side explodes to ≤2 bucket rows and equi-joins.
    assert "Generate" in plan


def test_rollup_counters_match_direct_aggregation(spark, sf_dir):
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    hourly = rollup.time_rollup(ev, exact_ndv=True, sketch=True)
    direct = ev.groupBy(
        rollup.time_bucket("ts", 3600).alias("bs"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    j = hourly.join(direct.withColumnRenamed("n", "n2"), ["bs", "event_type"])
    assert j.filter(F.col("n") != F.col("n2")).count() == 0
    # Sketch estimate is near-exact at this cardinality (≤150 users).
    bad = hourly.withColumn(
        "est", F.hll_sketch_estimate("user_sketch")
    ).filter(F.abs(F.col("est") - F.col("n_users")) > F.col("n_users") * 0.05)
    assert bad.count() == 0


def test_merge_rollup_sketches_survive_two_levels(spark, sf_dir):
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    hourly = rollup.time_rollup(ev, bucket_sec=3600)
    daily = rollup.merge_rollup(hourly, 86400)
    weekly = rollup.merge_rollup(daily.drop("n_users_est"), 7 * 86400)
    exact = ev.groupBy(
        rollup.time_bucket("ts", 7 * 86400).alias("bs"), "event_type"
    ).agg(F.countDistinct("user_id").alias("exact"))
    j = weekly.join(exact, ["bs", "event_type"])
    bad = j.filter(
        F.abs(F.col("n_users_est") - F.col("exact")) > F.col("exact") * 0.05
    )
    assert bad.count() == 0
    # Counters re-associate exactly across both merge levels.
    tot = ev.count()
    assert weekly.agg(F.sum("n")).collect()[0][0] == tot


def test_update_rollup_incremental_equals_full(spark, sf_dir, tmp_path):
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    # Mid-day cut so the delta overlaps an already-written date partition
    # (the interesting incremental case: merge, not just append).
    cut = dt.datetime(2024, 1, 20, 12, tzinfo=UTC)
    base, delta = ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)

    path = str(tmp_path / "rollup")
    rollup.write_rollup(rollup.time_rollup(base), path)
    rollup.update_rollup(spark, path, delta)

    inc = rollup.read_rollup(spark, path)
    full = rollup.time_rollup(ev)
    key = ["bs", "event_type"]
    j = inc.select(key + ["n", "v_c", F.hll_sketch_estimate("user_sketch").alias("e1")]).join(
        full.select(key + ["n", "v_c", F.hll_sketch_estimate("user_sketch").alias("e2")])
        .withColumnRenamed("n", "n2").withColumnRenamed("v_c", "v2"),
        key,
        "full",
    )
    assert j.filter(
        F.col("n").isNull() | F.col("n2").isNull()
        | (F.col("n") != F.col("n2")) | (F.col("v_c") != F.col("v2"))
    ).count() == 0
    # Sketch state unions to the same estimates as a one-shot build.
    assert j.filter(F.col("e1") != F.col("e2")).count() == 0


def test_hist_quantile_semantics(spark):
    """Inverse-CDF reading of histogram state: lower edge of the first
    bin whose cumulative count reaches ceil(q*n); empty hist → NULL."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    schema = StructType([
        StructField("id", LongType()),
        StructField("hist", ArrayType(LongType())),
    ])
    rows = [
        (1, [0, 3, 1, 0]),   # n=4, thr=2 → bin 1
        (2, [5, 0, 0, 0]),   # all in bin 0
        (3, [0, 0, 0, 2]),   # all in the last bin
        (4, [0, 0, 0, 0]),   # empty → NULL
        (5, [1, 1, 1, 1]),   # n=4, thr=2 → bin 1
    ]
    df = spark.createDataFrame(rows, schema)
    out = {
        r.id: r.p
        for r in df.select(
            "id", rollup.hist_quantile("hist", 0.5, lo=0.0, hi=4.0, bins=4).alias("p")
        ).collect()
    }
    # width=1 → edges 0,1,2,3 → cents 0,100,200,300
    assert out == {1: 100, 2: 0, 3: 300, 4: None, 5: 100}
    p99 = df.filter("id = 5").select(
        rollup.hist_quantile("hist", 0.99, lo=0.0, hi=4.0, bins=4).alias("p")
    ).collect()[0].p
    assert p99 == 300  # thr=ceil(3.96)=4 → last bin


def test_hist_bin_clamps_out_of_range(spark):
    ev = spark.createDataFrame(
        [(-5.0,), (0.0,), (511.9,), (9999.0,)], ["value"]
    )
    bins = ev.select(
        rollup._hist_bin("value", rollup.HIST_LO, rollup.HIST_HI, rollup.HIST_BINS).alias("b")
    ).collect()
    assert [r.b for r in bins] == [0, 0, 31, 31]


def test_hist_merges_exactly_across_levels(spark, sf_dir):
    """Element-wise-summed histograms at the daily level equal a daily
    histogram built from raw — the exact-mergeability claim — and the
    median read from merged state equals the median from raw state."""
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    hourly = rollup.time_rollup(ev, sketch=False, hist_bins=rollup.HIST_BINS)
    daily_merged = rollup.merge_rollup(hourly, 86400)
    daily_raw = rollup.time_rollup(
        ev, bucket_sec=86400, sketch=False, hist_bins=rollup.HIST_BINS
    )
    key = ["bs", "event_type"]
    j = daily_merged.select(key + [F.col("hist").alias("h1")]).join(
        daily_raw.select(key + [F.col("hist").alias("h2")]), key, "full"
    )
    assert j.filter(
        F.col("h1").isNull() | F.col("h2").isNull() | (F.col("h1") != F.col("h2"))
    ).count() == 0
    q = j.select(
        rollup.hist_quantile("h1", 0.5).alias("p1"),
        rollup.hist_quantile("h2", 0.5).alias("p2"),
    )
    assert q.filter(F.col("p1") != F.col("p2")).count() == 0


def test_update_rollup_carries_hist(spark, sf_dir, tmp_path):
    """The incremental path round-trips histogram state through parquet
    (bin count from column metadata) and merges it to the one-shot
    result."""
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    cut = dt.datetime(2024, 1, 20, 12, tzinfo=UTC)
    base, delta = ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)
    path = str(tmp_path / "rollup_hist")
    rollup.write_rollup(
        rollup.time_rollup(base, hist_bins=rollup.HIST_BINS), path
    )
    rollup.update_rollup(spark, path, delta)
    inc = rollup.read_rollup(spark, path)
    full = rollup.time_rollup(ev, hist_bins=rollup.HIST_BINS)
    key = ["bs", "event_type"]
    j = inc.select(key + [F.col("hist").alias("h1")]).join(
        full.select(key + [F.col("hist").alias("h2")]), key, "full"
    )
    assert j.filter(
        F.col("h1").isNull() | F.col("h2").isNull() | (F.col("h1") != F.col("h2"))
    ).count() == 0


def test_drop_chunks_retention(spark, sf_dir, tmp_path):
    """drop_chunks removes exactly the partitions older than the
    cutoff; the surviving rollup still reads and re-merges cleanly."""
    from etl_rust_spark.catalog import register_views

    register_views(spark, sf_dir)
    ev = spark.table("events")
    path = str(tmp_path / "retention")
    rollup.write_rollup(rollup.time_rollup(ev), path)
    import os

    dates = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("b_date=")
    )
    assert len(dates) >= 3
    cutoff = dates[1]
    n = rollup.drop_chunks(path, cutoff)
    assert n == 1  # only the partition strictly before dates[1]
    left = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("b_date=")
    )
    assert left == dates[1:]
    survivors = rollup.read_rollup(spark, path)
    daily = rollup.merge_rollup(survivors, 86400)
    assert daily.count() > 0
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        rollup.drop_chunks(str(tmp_path / "nope"), cutoff)


def _days(spark, day_users: dict[int, range]) -> "DataFrame":  # noqa: F821
    """Planted events: one row per (day, user), value = user + 1."""
    rows = [
        (dt.datetime(2024, 3, 1 + d, 10, tzinfo=UTC), "click", u, float(u + 1))
        for d, users in day_users.items()
        for u in users
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double"
    )


def test_theta_retention_matrix_exact(spark):
    """Theta state answers retention/churn exactly while sets are under
    the sketch's nominal entries: 0..99 then 50..149 → 50/50/50."""
    ev = _days(spark, {0: range(0, 100), 1: range(50, 150)})
    daily = rollup.time_rollup(ev, bucket_sec=86400, dims=(), theta=True)
    m = rollup.retention_matrix(daily, 86400).collect()
    assert len(m) == 1
    r = m[0]
    assert (r.users_a, r.users_b) == (100, 100)
    assert (r.retained, r.churned, r.new_users) == (50, 50, 50)
    assert r.retention_bp == 5000
    assert r.bs_next == r.bs + dt.timedelta(days=1)


def test_theta_retention_matrix_respects_dims(spark):
    """Per-dim retention: the join matches buckets WITHIN each dim."""
    rows = [
        (dt.datetime(2024, 3, 1 + d, 10, tzinfo=UTC), et, u, 1.0)
        for d, et, users in [
            (0, "a", range(0, 10)),
            (1, "a", range(5, 15)),    # a: 5 retained of 10
            (0, "b", range(0, 4)),
            (1, "b", range(100, 104)),  # b: disjoint → 0 retained
        ]
        for u in users
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double"
    )
    daily = rollup.time_rollup(ev, bucket_sec=86400, theta=True)
    got = {
        r.event_type: (r.retained, r.retention_bp)
        for r in rollup.retention_matrix(
            daily, 86400, dims=("event_type",)
        ).collect()
    }
    assert got == {"a": (5, 5000), "b": (0, 0)}


def test_theta_state_merges_like_raw(spark):
    """theta_union_agg over hourly state == a direct daily build — and
    the merged state still intersects (retention from MERGED rollups)."""
    ev = _days(spark, {0: range(0, 100), 1: range(50, 150)})
    hourly = rollup.time_rollup(ev, bucket_sec=3600, dims=(), theta=True)
    daily_merged = rollup.merge_rollup(hourly, 86400, dims=())
    daily_direct = rollup.time_rollup(ev, bucket_sec=86400, dims=(), theta=True)
    est = lambda df: {  # noqa: E731
        r.bs: r.e for r in df.select("bs", rollup.theta_estimate("user_theta").alias("e")).collect()
    }
    assert est(daily_merged) == est(daily_direct)
    r = rollup.retention_matrix(daily_merged, 86400).collect()[0]
    assert (r.retained, r.churned, r.new_users) == (50, 50, 50)


def test_kll_quantile_from_merged_state(spark):
    """KLL state: exact on a small single bucket; rank-ε bounded after
    merging hourly sketches to a day (4000 uniform values → p50 within
    the default-k rank tolerance of the true median)."""
    small = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 10, tzinfo=UTC), "e", 1, float(v))
         for v in range(1, 101)],
        "ts timestamp, event_type string, user_id long, value double",
    )
    one = rollup.time_rollup(small, bucket_sec=86400, dims=(), kll=True)
    p50 = one.select(rollup.kll_quantile("v_kll", 0.5).alias("q")).collect()[0].q
    assert abs(p50 - 50.0) <= 1.0  # n <= k: sketch holds every value

    big = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, v % 24, tzinfo=UTC), "e", v, float(v))
         for v in range(1, 4001)],
        "ts timestamp, event_type string, user_id long, value double",
    )
    hourly = rollup.time_rollup(big, bucket_sec=3600, dims=(), kll=True)
    assert hourly.count() == 24
    day = rollup.merge_rollup(hourly, 86400, dims=())
    q = day.select(rollup.kll_quantile("v_kll", 0.5).alias("q")).collect()[0].q
    # uniform 1..4000: rank(v) = v/4000; default k=200 → ε ≈ 1.65 %,
    # doubled for the merge and slack: |rank - 0.5| ≤ 0.035
    assert abs(q / 4000.0 - 0.5) <= 0.035, q


def test_update_rollup_carries_kll_and_theta(spark, tmp_path):
    """The incremental path detects opt-in sketch states from the
    persisted schema and folds deltas into them."""
    ev = _days(spark, {0: range(0, 100), 1: range(50, 150)})
    cut = dt.datetime(2024, 3, 2, tzinfo=UTC)
    base, delta = ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)
    path = str(tmp_path / "r")
    rollup.write_rollup(
        rollup.time_rollup(base, bucket_sec=86400, kll=True, theta=True), path
    )
    rollup.update_rollup(spark, path, delta, bucket_sec=86400)
    back = rollup.read_rollup(spark, path).drop("b_date")
    assert {"v_kll", "user_theta"} <= set(back.columns)
    r = rollup.retention_matrix(
        rollup.merge_rollup(back, 86400, dims=()), 86400
    ).collect()[0]
    assert (r.users_a, r.retained, r.new_users) == (100, 50, 50)
    q = (
        back.agg(F.kll_merge_agg_double("v_kll").alias("k"))
        .select(rollup.kll_quantile("k", 0.5).alias("q")).collect()[0].q
    )
    assert abs(q - 75.0) <= 2.0  # 1..100 ∪ 51..150 → true median 75.5


def test_retention_matrix_periods_lag(spark):
    """D-k retention off the same daily state: periods=2 intersects each
    bucket with the one TWO days later — planted so D1 and D2 differ."""
    ev = _days(
        spark,
        {0: range(0, 100), 1: range(50, 150), 2: range(90, 190)},
    )
    daily = rollup.time_rollup(ev, bucket_sec=86400, dims=(), theta=True)
    d1 = {
        r.bs.day: r.retained
        for r in rollup.retention_matrix(daily, 86400, periods=1).collect()
    }
    assert d1 == {1: 50, 2: 60}  # 0..99∩50..149, 50..149∩90..189
    d2 = rollup.retention_matrix(daily, 86400, periods=2).collect()
    assert len(d2) == 1
    assert d2[0].retained == 10  # 0..99 ∩ 90..189
    assert d2[0].bs_next == d2[0].bs + dt.timedelta(days=2)
