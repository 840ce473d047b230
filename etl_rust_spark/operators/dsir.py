"""DSIR-style importance resampling for training-data selection.

Implements the published Data Selection via Importance Resampling
recipe (Xie et al., 2023 — hashed n-gram features, bag-of-words
importance weights, Gumbel-top-k selection) as Spark-first operators,
composing with the rest of the curation surface (`mix_corpora` picks
HOW MUCH of each corpus; DSIR picks WHICH documents look like a trusted
target domain):

- :func:`fit_hashed_ngram_dist` — one scan: unigrams + bigrams hashed
  into ``n_buckets`` (default 10 k, the paper's setting) → bucket
  counts.  The fitted "model" is a DataFrame bounded by ``n_buckets``
  rows — broadcastable by construction, never driver-resident.
- :func:`dsir_log_weights` — per-document importance log-weight
  ``Σ_grams log p̂_target(b) − log p̂_raw(b)`` with add-1 smoothing.
  Both distribution tables broadcast (≤ n_buckets rows); the only
  shuffle is the final ``groupBy(doc_id)``, which partial-aggregates
  map-side.  Document text never shuffles.
- :func:`dsir_select` — sample-without-replacement ∝ exp(logw) via the
  Gumbel-top-k trick with DETERMINISTIC noise: the Gumbel variate is
  derived from the portable 60-bit hash of ``(seed, doc_id)`` — no
  ``rand()``, bit-for-bit replayable across runs and engines, the same
  design rule as ``pack.hash_sample`` / ``pack.hash_shuffle``.  Top-k
  runs as Spark's TakeOrdered (per-partition partial top-k + merge),
  not a global sort.

100 TB posture: fit is two partial-aggregated groupBys over hashed
longs; scoring is a scan + two broadcast joins + one partial-agg
shuffle; selection is TakeOrdered.  Nothing quadratic, nothing
driver-paced, no full sort.

Mirrors: :func:`dsir_duck_sql` emits the dual-dialect SQL pair used by
the three-way pytest (tests/test_dsir.py); the float form compares
weights at 1e-6 tolerance (float-sum association order differs across
engines).  Since r9 the FIXED-POINT variant
(:func:`dsir_log_weights_fixed` / :func:`dsir_select_fixed` /
:func:`dsir_fixed_duck_sql`, VERDICT r8 #8) is EXACT-integer across
API == Spark SQL == DuckDB — weights, selected set and selection keys
all equal with no tolerance.  It stays out of the driver's 50-entry
union by a RECORDED bench decision (BASELINE.md r9: widening
op_dedup_exact would cost +1.75 s engine vs +0.22 s oracle at sf0.1 —
local-mode dispatch floor on the extra Python kernel passes — eroding
the headline ratio ~1.73 → ~1.82 for a fourth gate form of an operator
already exactly mirrored in pytest).

Reference note: the reference engine has no data-selection surface at
all (extract→publish skeleton, ``src/example_config/mod.rs``) — this
is part of the net-new LLM-data mandate (SURVEY.md §2.6b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators.hashes import MINHASH_P, duck_h, spark_h

__all__ = [
    "fit_hashed_ngram_dist",
    "dsir_log_weights",
    "dsir_log_weights_fixed",
    "dsir_select",
    "dsir_select_fixed",
    "dsir_duck_sql",
    "dsir_fixed_duck_sql",
]

DEFAULT_BUCKETS = 10_000

#: fixed-point grid for the r9 hash-gateable variant: each per-gram
#: log-ratio rounds to 1e-4 BEFORE summation, so the per-doc total is
#: an exact int64 — identical for any partition order AND any engine
#: (the kmeans_fixed / ROUND(x, 6) precedent).  1e-4 is coarse enough
#: that a 1-ulp libm LN divergence between JVM and DuckDB can flip a
#: rounding only when the true value sits within ~1e-15 of a grid
#: boundary (measure-zero in practice), and fine enough that per-doc
#: weights stay discriminative (per-gram values are O(1)).
FP_GRID = 10_000


def _bucket_kernel(docs: DataFrame, text_col: str, id_col: str | None,
                   n_buckets: int) -> DataFrame:
    """Explode each document into hashed (unigram + bigram) feature
    buckets via an Arrow-batched pass — the same md5→60-bit→mod
    reduction as the expression mirror, at hashlib speed with a Zipfian
    memo (the ``lm.py`` lesson: HOF md5 lambdas evaluate interpreted,
    ~10× slower)."""
    import hashlib

    import pandas as pd
    from pyspark.sql import types as T

    fields = [T.StructField("bucket", T.LongType())]
    if id_col:
        fields.insert(0, T.StructField(id_col, T.LongType()))
    out_schema = T.StructType(fields)

    def h(s: str) -> int:
        return (
            int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % n_buckets
        )

    def gen(batches):
        memo: dict[str, int] = {}

        def hm(s: str) -> int:
            v = memo.get(s)
            if v is None:
                if len(memo) > 1_000_000:
                    memo.clear()
                v = memo[s] = h(s)
            return v

        for pdf in batches:
            ids: list[int] = []
            buckets: list[int] = []
            for row in pdf.itertuples(index=False):
                text = getattr(row, text_col)
                if not isinstance(text, str) or not text:
                    continue
                t = text.split(" ")
                doc_buckets = [hm(w) for w in t]
                doc_buckets += [
                    hm(t[i] + " " + t[i + 1]) for i in range(len(t) - 1)
                ]
                buckets.extend(doc_buckets)
                if id_col:
                    ids.extend([getattr(row, id_col)] * len(doc_buckets))
            if buckets:
                data = {"bucket": buckets}
                if id_col:
                    data = {id_col: ids, "bucket": buckets}
                yield pd.DataFrame(data)

    cols = [id_col, text_col] if id_col else [text_col]
    return docs.select(*cols).mapInPandas(gen, out_schema)


def fit_hashed_ngram_dist(
    docs: DataFrame, text_col: str = "text", n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Hashed bag-of-ngrams distribution: (bucket, c) counts, ≤
    ``n_buckets`` rows.  Persist as parquet to reuse across runs; the
    probability normalization (add-1 over ``n_buckets``) happens at
    scoring time so counts stay mergeable."""
    return (
        _bucket_kernel(docs, text_col, None, n_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_log_weights(
    docs: DataFrame,
    target_dist: DataFrame,
    raw_dist: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, logw): importance log-weight of each document
    under target vs raw hashed-ngram distributions, add-1 smoothed.

    Both distribution totals are computed lazily as 1-row frames and
    broadcast (the ``lm.train_bigram_lm(lazy_vocab=True)`` pattern), so
    the whole thing stays one lazy plan."""
    nt = target_dist.agg(F.sum("c").cast("double").alias("_nt"))
    nr = raw_dist.agg(F.sum("c").cast("double").alias("_nr"))
    pairs = (
        _bucket_kernel(docs, text_col, id_col, n_buckets)
        .join(F.broadcast(target_dist.withColumnRenamed("c", "ct")), "bucket", "left")
        .join(F.broadcast(raw_dist.withColumnRenamed("c", "cr")), "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
    )
    gram_lw = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("_nt") + n_buckets))
        - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / (F.col("_nr") + n_buckets))
    )
    return (
        pairs.withColumn("glw", gram_lw)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("glw").alias("logw"),
        )
    )


def dsir_log_weights_fixed(
    docs: DataFrame,
    target_dist: DataFrame,
    raw_dist: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, logw_fp): the FIXED-POINT importance weight
    (VERDICT r8 #8) — per-gram log-ratio rounded to the :data:`FP_GRID`
    grid and summed as int64, so the result hash-gates across engines
    and partitionings where :func:`dsir_log_weights`'s float sum only
    mirrors at tolerance.  ``logw_fp / FP_GRID`` approximates ``logw``
    to ≤ 0.5e-4 per gram.  Same plan shape: scan + two broadcast joins
    + ONE partial-agg shuffle."""
    nt = target_dist.agg(F.sum("c").cast("double").alias("_nt"))
    nr = raw_dist.agg(F.sum("c").cast("double").alias("_nr"))
    pairs = (
        _bucket_kernel(docs, text_col, id_col, n_buckets)
        .join(F.broadcast(target_dist.withColumnRenamed("c", "ct")), "bucket", "left")
        .join(F.broadcast(raw_dist.withColumnRenamed("c", "cr")), "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
    )
    gram_lw = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("_nt") + n_buckets))
        - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / (F.col("_nr") + n_buckets))
    )
    return (
        pairs.withColumn("glw_fp", F.round(gram_lw * FP_GRID, 0).cast("long"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("glw_fp").alias("logw_fp"),
        )
    )


def dsir_select_fixed(
    weights: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, logw_fp, key_fp): Gumbel-top-k over the
    fixed-point weights with the Gumbel variate ALSO on the grid
    (``round(gumbel * FP_GRID)`` as int64) — the selection key is pure
    integer arithmetic, so the selected set and its ordering keys are
    exactly reproducible in any engine (ties broken by id).  TakeOrdered
    shape like :func:`dsir_select`, never a global sort."""
    h = spark_h(x=f"concat('{seed}:', CAST({id_col} AS STRING))")
    u = f"(({h} % {MINHASH_P}) + 0.5) / {MINHASH_P}"
    g_fp = f"CAST(ROUND(-LN(-LN({u})) * {FP_GRID}, 0) AS BIGINT)"
    return (
        weights.withColumn(
            "key_fp", F.col("logw_fp") + F.expr(g_fp)
        )
        .orderBy(F.col("key_fp").desc(), F.col(id_col))
        .limit(k)
    )


def dsir_select(
    weights: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
    per_gram: bool = False,
) -> DataFrame:
    """Gumbel-top-k selection: keep the ``k`` documents with the
    largest ``logw + Gumbel(hash(seed, id))`` — an exact sample
    without replacement ∝ exp(logw), deterministic because the Gumbel
    variate comes from the portable hash, not ``rand()``.

    ``per_gram=True`` normalizes ``logw`` by ``n_grams`` first (length-
    debiased selection — raw DSIR favors long documents since weights
    are sums over grams)."""
    h = spark_h(x=f"concat('{seed}:', CAST({id_col} AS STRING))")
    u = f"(({h} % {MINHASH_P}) + 0.5) / {MINHASH_P}"
    base = (
        F.col("logw") / F.col("n_grams") if per_gram else F.col("logw")
    )
    key = base + F.expr(f"-LN(-LN({u}))")
    return (
        weights.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_key")
    )


def dsir_duck_sql(
    target_filter: str,
    raw_filter: str,
    score_filter: str,
    n_buckets: int = DEFAULT_BUCKETS,
    k: int | None = None,
    seed: int = 0,
) -> tuple[str, str]:
    """Dual-dialect mirror of fit(target) + fit(raw) + score + optional
    Gumbel-top-k select, over the ``documents`` table with SQL WHERE
    fragments choosing the three corpora.  Used by the three-way pytest
    (weights compared at tolerance; the selected set exactly)."""

    def body(dialect: str) -> str:
        if dialect == "spark":
            split = "split(text, ' ')"
            h_uni = spark_h(x="element_at(toks, i)")
            h_bi = spark_h(x="concat(element_at(toks, i), ' ', element_at(toks, i + 1))")
            uni = f"transform(sequence(1, size(toks)), i -> {h_uni} % {n_buckets})"
            bi = (
                f"CASE WHEN size(toks) >= 2 THEN"
                f" transform(sequence(1, size(toks) - 1), i -> {h_bi} % {n_buckets})"
                f" ELSE CAST(array() AS array<bigint>) END"
            )
            explode = "SELECT doc_id, explode(concat(unis, bis)) AS bucket FROM g"
            h_sel = spark_h(x=f"concat('{seed}:', CAST(doc_id AS STRING))")
        else:
            split = "string_split(text, ' ')"
            h_uni = duck_h(x="toks[i]")
            h_bi = duck_h(x="toks[i] || ' ' || toks[i + 1]")
            uni = f"list_transform(range(1, len(toks) + 1), i -> {h_uni} % {n_buckets})"
            bi = f"list_transform(range(1, len(toks)), i -> {h_bi} % {n_buckets})"
            explode = (
                "SELECT doc_id, unnest(list_concat(unis, bis)) AS bucket FROM g"
            )
            h_sel = duck_h(x=f"'{seed}:' || CAST(doc_id AS VARCHAR)")
        fit = """
{name} AS (
  SELECT bucket, COUNT(*) AS c FROM (
    SELECT doc_id, {explode_body}
    FROM (SELECT doc_id, {uni} AS unis, {bi} AS bis
          FROM (SELECT doc_id, {split} AS toks FROM documents WHERE {flt}))
  ) GROUP BY bucket),
{name}_n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM {name})"""
        explode_body = (
            "explode(concat(unis, bis)) AS bucket"
            if dialect == "spark"
            else "unnest(list_concat(unis, bis)) AS bucket"
        )

        def fit_cte(name: str, flt: str) -> str:
            return fit.format(
                name=name, explode_body=explode_body, uni=uni, bi=bi,
                split=split, flt=flt,
            )

        sel = ""
        order = "ORDER BY doc_id"
        if k is not None:
            sel = f", logw + -LN(-LN((({h_sel} % {MINHASH_P}) + 0.5) / {MINHASH_P})) AS _key"
            order = f"ORDER BY _key DESC, doc_id LIMIT {k}"
        return f"""
WITH {fit_cte('td', target_filter)},
{fit_cte('rd', raw_filter)},
g AS (SELECT doc_id, {uni} AS unis, {bi} AS bis
      FROM (SELECT doc_id, {split} AS toks FROM documents WHERE {score_filter})),
p AS ({explode}),
w AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
    SUM( LN((COALESCE(td.c, 0) + 1.0) / ((SELECT n FROM td_n) + {n_buckets}))
       - LN((COALESCE(rd.c, 0) + 1.0) / ((SELECT n FROM rd_n) + {n_buckets})) ) AS logw
  FROM p LEFT JOIN td ON p.bucket = td.bucket
         LEFT JOIN rd ON p.bucket = rd.bucket
  GROUP BY doc_id)
SELECT doc_id, n_grams, logw{sel} FROM w {order}
"""

    return body("spark"), body("duck")


def dsir_fixed_duck_sql(
    target_filter: str,
    raw_filter: str,
    score_filter: str,
    n_buckets: int = DEFAULT_BUCKETS,
    k: int | None = None,
    seed: int = 0,
) -> tuple[str, str]:
    """Dual-dialect mirror of the FIXED-POINT pipeline
    (:func:`dsir_log_weights_fixed` [+ :func:`dsir_select_fixed` when
    ``k``]) — per-gram ``ROUND(glw * FP_GRID)`` summed as BIGINT, the
    Gumbel key on the same grid.  All output columns are integers, so
    the driver hash-gates this where the float form only mirrors at
    tolerance (VERDICT r8 #8)."""

    def body(dialect: str) -> str:
        if dialect == "spark":
            split = "split(text, ' ')"
            h_uni = spark_h(x="element_at(toks, i)")
            h_bi = spark_h(x="concat(element_at(toks, i), ' ', element_at(toks, i + 1))")
            uni = f"transform(sequence(1, size(toks)), i -> {h_uni} % {n_buckets})"
            bi = (
                f"CASE WHEN size(toks) >= 2 THEN"
                f" transform(sequence(1, size(toks) - 1), i -> {h_bi} % {n_buckets})"
                f" ELSE CAST(array() AS array<bigint>) END"
            )
            explode = "SELECT doc_id, explode(concat(unis, bis)) AS bucket FROM g"
            h_sel = spark_h(x=f"concat('{seed}:', CAST(doc_id AS STRING))")
        else:
            split = "string_split(text, ' ')"
            h_uni = duck_h(x="toks[i]")
            h_bi = duck_h(x="toks[i] || ' ' || toks[i + 1]")
            uni = f"list_transform(range(1, len(toks) + 1), i -> {h_uni} % {n_buckets})"
            bi = f"list_transform(range(1, len(toks)), i -> {h_bi} % {n_buckets})"
            explode = (
                "SELECT doc_id, unnest(list_concat(unis, bis)) AS bucket FROM g"
            )
            h_sel = duck_h(x=f"'{seed}:' || CAST(doc_id AS VARCHAR)")
        explode_body = (
            "explode(concat(unis, bis)) AS bucket"
            if dialect == "spark"
            else "unnest(list_concat(unis, bis)) AS bucket"
        )
        fit = """
{name} AS (
  SELECT bucket, COUNT(*) AS c FROM (
    SELECT doc_id, {explode_body}
    FROM (SELECT doc_id, {uni} AS unis, {bi} AS bis
          FROM (SELECT doc_id, {split} AS toks FROM documents WHERE {flt}))
  ) GROUP BY bucket),
{name}_n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM {name})"""

        def fit_cte(name: str, flt: str) -> str:
            return fit.format(
                name=name, explode_body=explode_body, uni=uni, bi=bi,
                split=split, flt=flt,
            )

        sel = ""
        order = "ORDER BY doc_id"
        if k is not None:
            g_fp = (
                f"CAST(ROUND(-LN(-LN((({h_sel} % {MINHASH_P}) + 0.5) / {MINHASH_P}))"
                f" * {FP_GRID}, 0) AS BIGINT)"
            )
            sel = f", logw_fp + {g_fp} AS key_fp"
            order = f"ORDER BY key_fp DESC, doc_id LIMIT {k}"
        return f"""
WITH {fit_cte('td', target_filter)},
{fit_cte('rd', raw_filter)},
g AS (SELECT doc_id, {uni} AS unis, {bi} AS bis
      FROM (SELECT doc_id, {split} AS toks FROM documents WHERE {score_filter})),
p AS ({explode}),
w AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
    SUM(CAST(ROUND((
      LN((COALESCE(td.c, 0) + 1.0) / ((SELECT n FROM td_n) + {n_buckets}))
    - LN((COALESCE(rd.c, 0) + 1.0) / ((SELECT n FROM rd_n) + {n_buckets}))
    ) * {FP_GRID}, 0) AS BIGINT)) AS logw_fp
  FROM p LEFT JOIN td ON p.bucket = td.bucket
         LEFT JOIN rd ON p.bucket = rd.bucket
  GROUP BY doc_id)
SELECT doc_id, n_grams, logw_fp{sel} FROM w {order}
"""

    return body("spark"), body("duck")
