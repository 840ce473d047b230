"""N-gram language-model training + per-document perplexity scoring.

Perplexity under a small LM trained on a trusted corpus is the classic
corpus-quality signal (CCNet-style filtering): gibberish, boilerplate,
and wrong-language text score high.  The reference has no analog
(extract→publish only, SURVEY §2.5); this implements the fully
distributed form:

- :func:`train_bigram_lm` — one pass over the training corpus:
  tokenize → hashed-bigram explode → two partial-aggregated
  ``groupBy`` counts (bigram and context).  The model IS a pair of
  DataFrames — at 100 TB it stays distributed, written as parquet,
  never driver-resident.
- :func:`score_perplexity` — add-k smoothed negative log-likelihood:
  ``P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V)``.  Scoring joins the
  corpus's exploded bigrams against the counts on a single 60-bit
  **hash key** (compact longs — document text never shuffles; the same
  trick as MinHash-LSH banding in ``dedup.py``), then one
  ``groupBy(doc_id)`` average.  Counts tables are keyed equi-joins:
  broadcast when small, shuffle-hash at full scale — either way the
  plan has no driver round-trip.

Everything below hashes with the portable md5 reduction
(`operators/hashes.py`) so the DuckDB mirror is bit-identical; swap in
``xxhash64`` for production (same plan, JVM intrinsic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators.hashes import MINHASH_P, duck_h, spark_h

__all__ = ["train_bigram_lm", "score_perplexity", "perplexity_sql"]


def _bigram_hashes(toks_col: str, dialect: str) -> str:
    """Hashed bigram list of an array<string> column (empty when < 2
    tokens).  Bigram key = H(w1 || ' ' || w2) % P."""
    if dialect == "spark":
        h = spark_h(x=f"concat(element_at({toks_col}, i), ' ', element_at({toks_col}, i + 1))")
        return (
            f"CASE WHEN size({toks_col}) >= 2 THEN"
            f" transform(sequence(1, size({toks_col}) - 1), i -> {h} % {MINHASH_P})"
            f" ELSE CAST(array() AS array<bigint>) END"
        )
    h = duck_h(x=f"{toks_col}[i] || ' ' || {toks_col}[i + 1]")
    return f"list_transform(range(1, len({toks_col})), i -> {h} % {MINHASH_P})"


def _context_hashes(toks_col: str, dialect: str) -> str:
    """Hashed context (all tokens except the last) — the denominator
    counts c(w1) as 'occurrences of w1 followed by anything'."""
    if dialect == "spark":
        h = spark_h(x=f"element_at({toks_col}, i)")
        return (
            f"CASE WHEN size({toks_col}) >= 2 THEN"
            f" transform(sequence(1, size({toks_col}) - 1), i -> {h} % {MINHASH_P})"
            f" ELSE CAST(array() AS array<bigint>) END"
        )
    h = duck_h(x=f"{toks_col}[i]")
    return f"list_transform(range(1, len({toks_col})), i -> {h} % {MINHASH_P})"


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", lazy_vocab: bool = False
) -> tuple[DataFrame, DataFrame, "int | DataFrame"]:
    """Returns ``(bigram_counts(bg, c), context_counts(ctx, cc), vocab)``.

    ``vocab`` is the exact distinct-token count.  By default it is
    collected eagerly (one scalar to the driver).  With
    ``lazy_vocab=True`` it is returned as a 1-row DataFrame instead so
    the whole train+score pipeline stays ONE lazy plan — no job runs at
    construction time, and the vocab aggregation overlaps with the rest
    of the suite under concurrent submission (score_perplexity
    cross-joins the single row; Spark plans it as a broadcast).
    """
    toks = docs.select(F.split(F.col(text_col), " ").alias("toks"))
    # ONE tagged corpus pass for BOTH count tables (r12 optimization):
    # the bigram and context hash streams used to be two independent
    # mapInPandas passes over the full training corpus — two Python
    # round-trips of every byte.  They now ride one pass emitting
    # (kind, g) rows and one partial-aggregated groupBy; the bg/ctx
    # splits are filters ABOVE the shared aggregation, so the physical
    # plan reuses a single Exchange (ReusedExchange) and the corpus is
    # read, tokenized and hashed exactly once (guide §2.4/§4.1 — the
    # 100 TB training pass halves).
    # The lazy localCheckpoint is load-bearing: without it Catalyst
    # pushes the kind-filters below the aggregation and each branch
    # re-runs the (now double-volume) corpus pass — WORSE than two
    # passes (measured: op_text_profile 2.3 s → 5.3 s).  The barrier
    # materializes the counts once (O(distinct grams) rows — Zipf-small
    # next to the corpus) and both splits read it.
    counts = (
        _gram_hashes_pandas(docs, text_col, "both")
        .groupBy("kind", "g")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    bg = counts.filter(F.col("kind") == 0).select(
        F.col("g").alias("bg"), F.col("c")
    )
    ctx = counts.filter(F.col("kind") == 1).select(
        F.col("g").alias("ctx"), F.col("c").alias("cc")
    )
    vocab_df = toks.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").cast("double").alias("_vocab")
    )
    if lazy_vocab:
        return bg, ctx, vocab_df
    return bg, ctx, int(vocab_df.collect()[0]["_vocab"])


def _gram_hashes_pandas(docs: DataFrame, text_col: str, kind: str) -> DataFrame:
    """One exploded hash per bigram position via an Arrow-batched Python
    pass — bit-identical to the ``_bigram_hashes``/``_context_hashes``
    expression forms (same md5 → 15-hex-digit reduction → % P on the
    same utf-8 bytes; Python ``str.split(' ')`` and Spark
    ``split(col, ' ')`` agree on single-space separators including
    empty fields).  The expression forms stay as the documented
    semantics and the oracle-mirror template; this pass exists because
    HOF lambdas evaluate md5+conv interpreted per element — measured
    ~10× slower than hashlib over Arrow batches on the training corpus.

    ``kind='both'`` emits BOTH streams from the single pass as tagged
    ``(kind tinyint, g)`` rows (0 = bigram, 1 = context) so training
    reads the corpus once instead of twice.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql import types as T

    if kind == "both":
        out_schema = T.StructType(
            [
                T.StructField("kind", T.ByteType()),
                T.StructField("g", T.LongType()),
            ]
        )
    else:
        out_schema = T.StructType([T.StructField(kind, T.LongType())])

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P

    def gen(batches):
        # Gram-hash memo, long-lived across the partition's batches: md5
        # of a pure string is referentially transparent, and natural
        # language is Zipfian — the distinct gram set is orders of
        # magnitude smaller than the gram stream (the bench corpus has
        # 270 k token positions over 31 distinct tokens), so the dict
        # turns almost every md5 into a hash-map hit.  Bounded: cleared
        # if it ever exceeds ~1 M entries (pathological high-entropy
        # corpora), which just reverts to hashing speed.
        memo: dict[str, int] = {}

        def hm(s: str) -> int:
            v = memo.get(s)
            if v is None:
                if len(memo) > 1_000_000:
                    memo.clear()
                v = memo[s] = h(s)
            return v

        for pdf in batches:
            out = []
            ctx_out = []
            for text in pdf[text_col]:
                # NULL text: split(NULL) is NULL in the expression form,
                # whose size() guard then yields an empty gram array — so
                # a null row contributes no grams.  Mirror that instead
                # of crashing on None/NaN (ADVICE r5).
                if not isinstance(text, str):
                    continue
                t = text.split(" ")
                if len(t) < 2:
                    continue
                if kind == "bg":
                    out.extend(hm(t[i] + " " + t[i + 1]) for i in range(len(t) - 1))
                elif kind == "ctx":
                    out.extend(hm(t[i]) for i in range(len(t) - 1))
                else:
                    out.extend(hm(t[i] + " " + t[i + 1]) for i in range(len(t) - 1))
                    ctx_out.extend(hm(t[i]) for i in range(len(t) - 1))
            if kind == "both":
                if out or ctx_out:
                    yield pd.DataFrame(
                        {
                            "kind": pd.array(
                                [0] * len(out) + [1] * len(ctx_out), dtype="int8"
                            ),
                            "g": out + ctx_out,
                        }
                    )
            elif out:
                yield pd.DataFrame({kind: out})

    return docs.select(text_col).mapInPandas(gen, out_schema)


def score_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: "int | DataFrame",
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, avg_nll, ppl): add-k smoothed bigram NLL.

    Docs with < 2 tokens have no bigrams: ``avg_nll = 0.0, ppl = 1.0``
    (nothing to score — filter on ``n_bigrams`` downstream if that
    matters).  Unseen bigram → c = 0; unseen context → P = 1/V.

    ``vocab`` is the driver-side int from the default
    :func:`train_bigram_lm`, or the 1-row DataFrame from its
    ``lazy_vocab=True`` form (cross-joined here — broadcast of one row).
    """
    pairs = docs.select(
        F.col(id_col),
        F.posexplode_outer(F.arrays_zip(
            F.expr(_bigram_hashes(f"split({text_col}, ' ')", "spark")),
            F.expr(_context_hashes(f"split({text_col}, ' ')", "spark")),
        )).alias("pos", "z"),
    ).select(id_col, F.col("z.0").alias("bg"), F.col("z.1").alias("ctx"))
    if isinstance(vocab, DataFrame):
        pairs = pairs.crossJoin(F.broadcast(vocab))
        vocab_expr = F.col("_vocab")
    else:
        vocab_expr = F.lit(float(vocab))
    scored = (
        pairs.join(bigram_counts, "bg", "left")
        .join(context_counts, "ctx", "left")
        .withColumn(
            "nll",
            F.when(
                F.col("bg").isNotNull(),
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + k)
                    / (F.coalesce(F.col("cc"), F.lit(0)) + k * vocab_expr)
                ),
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("nll").cast("long").alias("n_bigrams"),
            F.round(F.coalesce(F.avg("nll"), F.lit(0.0)), 4).alias("avg_nll"),
            F.round(F.exp(F.coalesce(F.avg("nll"), F.lit(0.0))), 2).alias("ppl"),
        )
    )


def perplexity_sql(max_doc: int = 100, k: float = 1.0) -> tuple[str, str]:
    """Dual-dialect mirror: train on ALL documents, score docs
    ``doc_id <= max_doc`` — matches :func:`train_bigram_lm` +
    :func:`score_perplexity` composed."""

    def body(dialect: str) -> str:
        split = "split(text, ' ')" if dialect == "spark" else "string_split(text, ' ')"
        bg_list = _bigram_hashes("toks", dialect)
        ctx_list = _context_hashes("toks", dialect)
        if dialect == "spark":
            explode_bg = "SELECT explode(bgs) AS bg FROM t"
            explode_ctx = "SELECT explode(ctxs) AS ctx FROM t"
            vocab = "SELECT COUNT(DISTINCT tok) FROM (SELECT explode(toks) AS tok FROM t)"
            pairs = (
                "SELECT doc_id, z.bgs AS bg, z.ctxs AS ctx FROM s "
                "LATERAL VIEW OUTER posexplode(arrays_zip(bgs, ctxs)) p AS pos, z"
            )
        else:
            explode_bg = "SELECT unnest(bgs) AS bg FROM t"
            explode_ctx = "SELECT unnest(ctxs) AS ctx FROM t"
            vocab = "SELECT COUNT(DISTINCT tok) FROM (SELECT unnest(toks) AS tok FROM t)"
            pairs = (
                "SELECT doc_id,"
                " unnest(CASE WHEN len(bgs) = 0 THEN [NULL::BIGINT] ELSE bgs END) AS bg,"
                " unnest(CASE WHEN len(ctxs) = 0 THEN [NULL::BIGINT] ELSE ctxs END) AS ctx"
                " FROM s"
            )
        return f"""
WITH t AS (SELECT toks, {bg_list} AS bgs, {ctx_list} AS ctxs
           FROM (SELECT {split} AS toks FROM documents)),
bgc AS (SELECT bg, COUNT(*) AS c FROM ({explode_bg}) GROUP BY bg),
ctxc AS (SELECT ctx, COUNT(*) AS cc FROM ({explode_ctx}) GROUP BY ctx),
v AS ({vocab}),
s AS (SELECT doc_id, {bg_list.replace('toks', 'toks2')} AS bgs, {ctx_list.replace('toks', 'toks2')} AS ctxs
      FROM (SELECT doc_id, {split} AS toks2 FROM documents WHERE doc_id <= {max_doc})),
p AS ({pairs}),
nl AS (SELECT doc_id, p.bg,
         CASE WHEN p.bg IS NOT NULL THEN
           -LN((COALESCE(bgc.c, 0) + {k}) / (COALESCE(ctxc.cc, 0) + {k} * (SELECT * FROM v)))
         END AS nll
       FROM p LEFT JOIN bgc ON p.bg = bgc.bg LEFT JOIN ctxc ON p.ctx = ctxc.ctx)
SELECT doc_id, CAST(COUNT(nll) AS BIGINT) AS n_bigrams,
  ROUND(COALESCE(AVG(nll), 0.0), 4) AS avg_nll,
  ROUND(EXP(COALESCE(AVG(nll), 0.0)), 2) AS ppl
FROM nl GROUP BY doc_id ORDER BY doc_id
"""

    return body("spark"), body("duck")
