"""Schema registry + loaders for the engine's tables.

The reference fixes every table schema at compile time (proto messages
compiled by prost, ``/root/reference/docs/protobuf.md:3-8``,
``src/example_config/build_proto.rs:216-278``); there is no runtime schema
inference.  The Spark-native equivalent is this module: one declared
``StructType`` per table, a canonical loader, and view registration —
every query runs against these views, never ad-hoc reads.

The synthetic test tables (TESTDATA.md) stand in for the reference's
per-chain tables; ``etl_rust_spark.etl`` adds the blockchain-domain
tables (FIXTURES.md §4) on top of the same registry mechanism.

Scale notes (100 TB design):
- Loads are plain ``spark.read.parquet`` — Catalyst handles predicate
  pushdown, column pruning and partition pruning against these views, so
  a query touching 2 of 16 lineitem columns scans only those pages.
- ``events.ts`` normalization (parquet TIMESTAMP(NANOS) → TimestampType
  via integer-division to micros) lives HERE, once, not per-query:
  the cast is a cheap projection fused into the scan by codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "TABLES",
    "SCHEMAS",
    "load_table",
    "register_views",
    "autotune_shuffle_partitions",
    "create_bucketed_table",
    "write_clustered",
    "write_zordered",
    "zorder_frame",
    "upsert_table",
    "layout_report",
]

# The ten driver-provided synthetic tables (TESTDATA.md / FIXTURES.md §1).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Declared schemas — the engine's analog of the reference's compiled
# .proto messages.  Used for validation (tests assert the parquet files
# actually match) and as documentation for writers of new queries.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts arrives as parquet TIMESTAMP(NANOS, adjusted=false): read as
    # LongType (nanosAsLong) and normalized to TimestampType (micros) in
    # load_table — matching DuckDB's ns→us truncation exactly.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def autotune_shuffle_partitions(
    spark: SparkSession,
    sf_dir: str,
    advisory_bytes: int = 64 * 1024 * 1024,
    floor: int = 8,
    cap: int = 4096,
    aqe_threshold_bytes: int = 64 * 1024 * 1024,
) -> None:
    """Size ``spark.sql.shuffle.partitions`` — and the AQE switch — to
    the dataset, once per (session, sf_dir).

    The scale rule cuts both ways: at 100 TB you want thousands of
    initial partitions (AQE coalesces/splits at runtime); at bench/test
    scale (~100 MB) a 32-reducer shuffle is pure scheduling overhead —
    measured ~3 s across the 50-entry suite at sf0.1.  partitions =
    clamp(total_input_bytes / 64 MB, 8, 4096); the floor keeps CPU-heavy
    reduces (hashing, BLAS) parallel even when the data is tiny.  No-op
    when the input size can't be inspected (non-local paths).

    AQE follows the same logic (r6): runtime re-planning earns its keep
    when shuffles are big enough to coalesce/skew-split (it stays ON at
    or above ``aqe_threshold_bytes``, default 64 MB), but below that the
    per-stage replanning round trip is pure latency — measured ~70 ms ×
    40 queries ≈ 2.8 s of the sequential suite at sf0.1 (17.5 MB input,
    8 shuffle partitions leave AQE nothing to adapt) with zero plan
    improvement.  The threshold sits where the benefit flips on this
    suite: at sf1 (164 MB) AQE-on wins measurably (dq41's
    low-cardinality join key lands all 1 M probe rows in ≤5 of 8
    reducers without the skew split — 3.4 s vs 1.2 s warm), so one
    advisory-block's worth of input (64 MB) is the crossover.  The same
    user-override rules apply.

    User overrides win (ADVICE r5): set session conf
    ``etl_rust_spark.autotune=false`` to disable entirely, and if the
    user changes ``spark.sql.shuffle.partitions`` AFTER a tune, the
    tuner backs off for the rest of the session instead of clobbering
    the explicit choice on the next ``load_table``.
    """
    marker = "etl_rust_spark.autotuned_sf_dir"
    vmark = "etl_rust_spark.autotuned_value"
    amark = "etl_rust_spark.autotuned_aqe"
    try:
        if spark.conf.get("etl_rust_spark.autotune", "true").lower() == "false":
            return
        if spark.conf.get(marker, "") == sf_dir:
            return
        prev = spark.conf.get(vmark, "")
        if prev and spark.conf.get("spark.sql.shuffle.partitions", "") != prev:
            # The setting moved since we last tuned: an explicit user
            # override.  Respect it permanently for this session.
            spark.conf.set("etl_rust_spark.autotune", "false")
            return
        prev_aqe = spark.conf.get(amark, "")
        if prev_aqe and spark.conf.get("spark.sql.adaptive.enabled", "") != prev_aqe:
            spark.conf.set("etl_rust_spark.autotune", "false")
            return
    except Exception:
        pass
    try:
        from pathlib import Path

        root = Path(sf_dir)
        total = sum(
            sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
            if p.is_dir()
            else p.stat().st_size
            for p in root.glob("*.parquet")
        )
        if total <= 0:
            return
        sp = max(floor, min(cap, total // advisory_bytes))
        spark.conf.set("spark.sql.shuffle.partitions", str(int(sp)))
        aqe = "true" if total >= aqe_threshold_bytes else "false"
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set(marker, sf_dir)
        spark.conf.set(vmark, str(int(sp)))
        spark.conf.set(amark, aqe)
    except Exception:
        return  # foreign filesystem / permissions: keep the session default


# (path, mtime) → inferred StructType.  Schema inference reads parquet
# footers on the DRIVER (measured 70-100 ms per call at sf0.1, ~60-85 ms
# more than an explicit-schema read); operator entries call load_table
# 1-3 times each, so the sequential 50-entry suite was paying >1 s of
# repeated footer reads per lap.  Caching the SCHEMA is safe where
# caching DataFrames is not (the r6 shuffle-reuse lesson): every call
# still builds a fresh plan and re-executes scans/shuffles — only the
# driver-side inference is skipped.  mtime in the key invalidates on
# rewrite (tmp-path tables in tests, re-synthesized fixtures).
_SCHEMA_CACHE: dict[tuple[str, float], T.StructType] = {}


def _table_schema(spark: SparkSession, path: str) -> T.StructType:
    import os

    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (path, mtime)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from ``{sf_dir}/{name}.parquet`` with canonical types.

    ``events.ts`` normalization: integer-divide nanos by 1000 (NOT float
    division — epoch-nanos ~1.7e18 exceeds double's 2^53 integer range)
    and reinterpret as micros.  This matches the DuckDB oracle's ns→us
    truncation bit-for-bit (FIXTURES.md §3).
    """
    autotune_shuffle_partitions(spark, sf_dir)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.schema(_table_schema(spark, path)).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def create_bucketed_table(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    keys: list[str],
    n_buckets: int,
    location: str | None = None,
    sorted_by: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) parquet
    table — the co-located-join layout for repeated large joins.

    Two tables bucketed on the same keys into the same bucket count
    join WITHOUT a shuffle: each bucket pair is joined in place (and
    with ``sorted_by`` on the join keys the sort disappears too) —
    asserted in tests/test_catalog.py against the physical plan.  At
    100 TB this converts every recurring fact-to-fact join on the
    bucket key from a full-data exchange into a metadata decision; the
    write itself pays one clustering shuffle, amortized across every
    subsequent join.

    Uses ``CREATE TABLE … CLUSTERED BY … INTO n BUCKETS`` DDL (works on
    the in-memory catalog, no Hive metastore) so ``location`` can point
    anywhere; falls back to the session warehouse when omitted.
    """
    # Quote every interpolated identifier/literal (ADVICE r5): backtick
    # identifiers (doubling embedded backticks), single-quote the
    # location (doubling embedded quotes) — a path like /tmp/o'brien or
    # a creative table name must not break (or inject into) the DDL.
    def q_id(ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    cols = ", ".join(f"{q_id(f.name)} {f.dataType.simpleString()}" for f in df.schema)
    bucket_cols = ", ".join(q_id(k) for k in keys)
    sort_clause = (
        "SORTED BY (" + ", ".join(q_id(s) for s in sorted_by) + ")"
        if sorted_by
        else ""
    )
    loc_clause = (
        " LOCATION '" + location.replace("'", "''") + "'" if location else ""
    )
    spark.sql(
        f"CREATE TABLE {q_id(name)} ({cols}) USING parquet "
        f"CLUSTERED BY ({bucket_cols}) {sort_clause} INTO {n_buckets} BUCKETS"
        f"{loc_clause}"
    )
    df.write.insertInto(name)


def write_clustered(
    df: DataFrame,
    path: str,
    by: list[str],
    n_files: int,
    partition_by: list[str] | None = None,
) -> None:
    """Materialize ``df`` range-clustered on ``by``: rows are range-
    partitioned into ``n_files`` output files and sorted within each —
    so every file (and every parquet row group inside it) covers a
    DISJOINT key range.

    This is the file-skipping layout, the other axis from
    :func:`create_bucketed_table` (which co-locates JOINS by hash):
    with disjoint min/max statistics, a point or range predicate on the
    cluster key touches only the files whose range intersects it — the
    parquet reader drops every other row group on its footer stats, and
    the matching rows concentrate in O(selectivity × n_files) files
    instead of smearing over all of them.  At 100 TB this is the
    difference between reading one file and reading ten thousand;
    tests/test_catalog.py asserts a narrow range filter on a clustered
    write reads from exactly one file where the unclustered layout
    touches most of them.

    ``partition_by`` composes directory-level partition pruning on top
    (cluster within each partition).  Cost: one range-exchange (with a
    sampling pass to pick the range bounds) + per-partition sort at
    write time, amortized over every subsequent scan.
    """
    out = df.repartitionByRange(n_files, *by).sortWithinPartitions(*by)
    w = out.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    by: list[str],
    n_files: int,
    bits_per_col: int = 8,
    partition_by: list[str] | None = None,
    relative_error: float = 0.01,
) -> None:
    """Materialize ``df`` Z-ORDER clustered on 2+ numeric columns — the
    multi-dimensional file-skipping layout (Delta's OPTIMIZE ZORDER BY,
    the Hilbert/Morton-curve family).

    :func:`write_clustered` gives overlap ≈ 1 on ONE axis and ≈ n_files
    on every other; interleaving the bits of per-column QUANTILE bucket
    ids (so skew cannot collapse the curve — uniform-width buckets
    would) makes every file cover a small hyper-rectangle: a point or
    range predicate on ANY clustered column prunes to ~n_files^((d-1)/d)
    files by parquet footer stats alone (√n_files for two columns),
    with no second copy of the data and nothing at read time to know
    about.

    Mechanics, all engine-side: one sampled ``approxQuantile`` pass per
    column picks ≤ 2^bits_per_col bucket boundaries (duplicate quantiles
    from heavy hitters are collapsed); ``pyspark.ml.Bucketizer``
    assigns bucket ids scan-side (JVM binary search); a bit-interleave
    expression forms the Morton key; then one range exchange + in-file
    sort on it, exactly :func:`write_clustered`'s write shape.  NULLs
    sort as the lowest bucket.  Cost: the sampling pass + one shuffle —
    amortized over every subsequent multi-predicate scan.
    """
    out = zorder_frame(df, by, n_files, bits_per_col, relative_error)
    w = out.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(path)


def zorder_frame(
    df: DataFrame,
    by: list[str],
    n_files: int,
    bits_per_col: int = 8,
    relative_error: float = 0.01,
) -> DataFrame:
    """The z-order transformation alone — ``df`` range-exchanged and
    in-file sorted on the Morton key of quantile-bucketed ``by``
    columns, ready for any writer (:func:`write_zordered` materializes
    to a plain path; ``versions.compact_table_version(zorder_by=...)``
    stages it into a versioned commit)."""
    if len(by) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use write_clustered")
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits_per_col
    qs = [i / n_buckets for i in range(1, n_buckets)]
    work = df
    bucket_cols = []
    for c in by:
        dcol = f"__zd_{c}"
        work = work.withColumn(dcol, F.col(c).cast("double"))
        cuts = work.stat.approxQuantile(dcol, qs, relative_error)
        # empty input yields no cuts; Bucketizer needs >= 3 split points
        splits = [float("-inf")] + (sorted(set(cuts)) or [0.0]) + [float("inf")]
        lo = work.agg(F.min(dcol)).first()[0]
        work = work.withColumn(dcol, F.coalesce(dcol, F.lit(lo)))
        bcol = f"__zb_{c}"
        work = Bucketizer(
            splits=splits, inputCol=dcol, outputCol=bcol
        ).transform(work)
        work = work.withColumn(bcol, F.col(bcol).cast("long")).drop(dcol)
        bucket_cols.append(bcol)
    k = len(by)
    terms = [
        f"(shiftleft((shiftright(__zb_{c}, {i}) & 1), {i * k + j}))"
        for i in range(bits_per_col)
        for j, c in enumerate(by)
    ]
    work = work.withColumn("__z", F.expr(" + ".join(terms)))
    return (
        work.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *bucket_cols)
    )


def upsert_table(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
) -> None:
    """MERGE-style keyed upsert into a parquet table: rows of ``delta``
    replace same-key rows and new keys append — without a table format
    that supports row-level MERGE.

    Unpartitioned: rewrite = (existing anti-join delta keys) ∪ delta —
    one full rewrite per upsert (correct, but O(table)).  WITH
    ``partition_by`` (a column present in both sides) the rewrite
    touches ONLY the partitions the delta lands in, via dynamic
    partition overwrite — the same dirty-partition discipline as
    ``update_rollup``: cost scales with the delta's partitions, never
    with table history.  Keys spanning a partition change (same key,
    new partition value) would leave the old row behind — callers
    partition by an immutable column (date of creation, shard), the
    standard constraint for partition-scoped upserts.

    Replaying the same delta is IDEMPOTENT (unlike counter merges):
    the anti-join drops the previous version of every delta key, so the
    second application rewrites the same bytes.  The read-modify-write
    snapshot is localCheckpointed before the overwrite (Spark refuses
    to overwrite files still being read).

    SCHEMA EVOLUTION (VERDICT r6 #7): a delta whose schema is a strict
    SUPERSET of the table's (added columns) union-by-names with NULL
    backfill for the pre-existing rows — the MERGE-with-new-column
    operation every real table eventually needs.  On a PARTITIONED
    table an add-column upsert rewrites the WHOLE table, not just the
    dirty partitions: plain parquet has no table-level schema metadata,
    so mixed-schema partition directories would make later reads
    schema-dependent on file sampling order (table formats pay this
    with a metadata commit instead; full rewrite is the honest
    plain-parquet cost, and it keeps ``layout_report`` valid on every
    file).  A delta MISSING non-key table columns is rejected — silent
    NULL-filling a forgotten column is a bug magnet, and the caller can
    always select the full schema explicitly.
    """
    missing = [k for k in keys if k not in delta.columns]
    if missing:
        raise ValueError(f"delta is missing key columns: {missing}")
    try:
        existing = spark.read.parquet(path)
    except Exception as exc:
        # Bootstrap ONLY on a genuinely absent path — any other read
        # failure (corrupt footer, permissions) must surface, not get
        # silently clobbered by a fresh overwrite.
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        w = delta.write
        if partition_by:
            w = w.partitionBy(partition_by)
        w.mode("overwrite").parquet(path)
        return
    dropped = [c for c in existing.columns if c not in delta.columns]
    if dropped:
        raise ValueError(
            f"delta is missing table columns {dropped}; select the full "
            "table schema (adding columns is supported, dropping is not)"
        )
    added = [c for c in delta.columns if c not in existing.columns]
    if partition_by and not added:
        dirty = [
            r[partition_by]
            for r in delta.select(partition_by).distinct().collect()
        ]
        existing = existing.filter(F.col(partition_by).isin(dirty))
    if added:
        # null-backfill the new columns on the existing side, delta
        # column types win (allowMissingColumns fills with NULL)
        survivors = existing.join(
            delta.select(*keys).distinct(), keys, "left_anti"
        )
        merged = survivors.unionByName(
            delta, allowMissingColumns=True
        ).select(*delta.columns).localCheckpoint(eager=True)
        w = merged.write
        if partition_by:
            w = w.partitionBy(partition_by)  # full rewrite: static mode
        w.mode("overwrite").parquet(path)
        return
    survivors = existing.join(
        delta.select(*keys).distinct(), keys, "left_anti"
    )
    merged = survivors.unionByName(delta.select(*existing.columns)).localCheckpoint(
        eager=True
    )
    w = merged.write
    if partition_by:
        # Per-write dynamic overwrite (ADVICE r6): never mutate the
        # shared session conf — later unrelated partitioned overwrites
        # would silently inherit dynamic semantics.
        w = w.partitionBy(partition_by).option(
            "partitionOverwriteMode", "dynamic"
        )
    w.mode("overwrite").parquet(path)


def layout_report(path: str, key: str) -> dict:
    """Audit a parquet table's physical layout for skippability on
    ``key``: per-file min/max from the parquet FOOTERS (pyarrow,
    driver-side — an audit over file metadata, not a data scan) and the
    headline ``overlap`` metric: the mean number of files whose
    [min, max] range contains a probe key, sampled at every file
    boundary.  1.0 = perfectly clustered (a point predicate opens one
    file); ≈ n_files = hash-smeared (every file must be opened).

    The number to watch after :func:`write_clustered` (expect ~1) or to
    justify re-clustering an append-accumulated table (it drifts toward
    n_files as appends interleave key ranges).
    """
    from pathlib import Path

    import pyarrow.parquet as pq

    files = sorted(str(p) for p in Path(path).rglob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    ranges = []
    n_groups = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i
               for i in range(meta.num_columns)} if meta.num_row_groups else {}
        if key not in idx:
            raise ValueError(f"column {key!r} not in {f}")
        lo = hi = None
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx[key]).statistics
            if st is None or not st.has_min_max:
                return {"files": len(files), "overlap": float(len(files)),
                        "stats": "absent"}
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
            n_groups += 1
        ranges.append((lo, hi))
    probes = sorted({r[0] for r in ranges} | {r[1] for r in ranges})
    hits = [
        sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes
    ]
    return {
        "files": len(files),
        "row_groups": n_groups,
        "overlap": round(sum(hits) / len(hits), 2),
        "max_overlap": max(hits),
        "stats": "present",
    }


def register_views(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register every table as a temp view under its bare name.

    Idempotent and cached per (session, sf_dir) via a session conf marker
    so the 40-query suite doesn't re-register 10 views per query.
    """
    marker = "etl_rust_spark.registered_sf_dir"
    try:
        if not force and spark.conf.get(marker, "") == sf_dir:
            return
    except Exception:
        pass
    # Self-sufficient on foreign sessions (e.g. the driver's harness):
    # these are runtime-settable and required for correct reads — events.ts
    # is parquet TIMESTAMP(NANOS) and the oracle compares in UTC.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark.conf.set(marker, sf_dir)
