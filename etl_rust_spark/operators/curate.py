"""End-to-end corpus curation: the composed LLM-training-data pipeline.

The individual operators (language-ID, quality scoring, exact dedup,
MinHash-LSH near-dedup) are each oracle-gated; this module is the
user-facing composition a training-data pipeline actually runs:

    filter by language → filter by quality → drop exact dups →
    drop near-dups (keep the lowest-id member of each near-dup pair)

Design for 100 TB:
- Every stage is a TRANSFORMATION — one logical plan, no intermediate
  actions; Catalyst pushes the language/quality filters below the dedup
  shuffles, so the expensive stages see only surviving rows.
- Near-dup removal reuses :func:`dedup.minhash_lsh_pairs` (banded — one
  shuffle of id triples, never text) and drops the HIGHER id of each
  verified pair via a left-anti join on ids only.
- Stage attrition counts (the thing a pipeline operator actually
  watches) ride a single extra aggregation over a tagged union — one
  job, not one count() per stage — via :func:`curation_report`.

greedy-vs-connected-component note: dropping the higher id of every
near-dup PAIR approximates clustering (a→b, b→c drops b and c even if
a~c was never tested).  That is the standard large-scale choice
(transitive near-dup chains are overwhelmingly true dup clusters); the
exact alternative is available opt-in via
``near_dup_strategy="components"`` — :func:`near_dup_components` runs
bounded-iteration min-id label propagation over the pair graph and the
pipeline keeps exactly one representative (the min id) per connected
component.  The two differ on star shapes: pairs (1,5),(2,5) keep
{1,2} under greedy (5 is the only larger member) but only {1} under
components (1-5-2 is one cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators import dedup, text

__all__ = [
    "curate_corpus",
    "curation_report",
    "curate_duck_sql",
    "near_dup_components",
]


def near_dup_components(
    pairs: DataFrame,
    max_iters: int = 20,
    a_col: str = "qid",
    b_col: str = "cid",
) -> DataFrame:
    """Connected components of the near-dup pair graph: ``(id, rep)``
    for every id that appears in a pair, ``rep`` = the component's
    minimum id.

    Min-id label propagation with pointer jumping: every node starts
    labeled with itself; each round every node takes the min of its own
    label and its neighbors' labels, then hops once more to its label's
    label (path halving).  The hop doubles the distance a label travels
    per round, so convergence needs O(log diameter) rounds — the default
    ``max_iters=20`` covers any graph a near-dup pipeline can produce
    (2^20-hop chains), where plain propagation needed diameter rounds
    and silently under-merged past the bound (ADVICE r5).  If the loop
    still hasn't converged after ``max_iters`` rounds a RuntimeError is
    raised rather than returning under-merged labels.  The loop exits
    early on convergence (one count per round — the
    driver only ever sees that scalar).  Each round ``localCheckpoint``s
    its labels: iterative self-joins grow the logical plan EXPONENTIALLY
    without lineage truncation (persist bounds recompute, not plan size
    — round ~10 OOMs the driver just rendering the tree), while a
    checkpoint makes every round's plan one join deep.

    Scale: the state is (id, rep) pairs — 16 bytes/node — and each
    round is one join + groupBy on id keys; document text never enters
    the graph.
    """
    fwd = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    edges = edges.localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("rep", F.col("id"))
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("rep").alias("nrep")), "b"
            )
            .groupBy("a")
            .agg(F.min("nrep").alias("min_nbr"))
        )
        prop = labels.join(
            nbr.select(F.col("a").alias("id"), "min_nbr"), "id", "left"
        ).select(
            "id",
            F.least(
                F.col("rep"), F.coalesce(F.col("min_nbr"), F.col("rep"))
            ).alias("rep"),
        )
        # Pointer jumping (path halving): rep ← rep's rep.  Every rep is
        # itself a node id, so the self-join always resolves; labels are
        # monotone decreasing, so the fixpoint is unchanged — this only
        # shortcuts the rounds a long chain needs from O(diameter) to
        # O(log diameter).  State stays (id, rep) pairs; the extra join
        # shuffles 16-byte rows.
        jump = prop.select(F.col("id").alias("rep"), F.col("rep").alias("rep2"))
        new = (
            prop.join(jump, "rep", "left")
            .select("id", F.coalesce(F.col("rep2"), F.col("rep")).alias("rep"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iters} rounds; "
            "raise max_iters (labels would be under-merged)"
        )
    return labels


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: list[str] | None = None,
    scripts: list[str] | None = None,
    min_quality_bp: int = 0,
    near_dup_threshold: float | None = 0.5,
    shingle_width: int = 3,
    near_dup_strategy: str = "greedy",
    main_content: bool = False,
    strip_markup: bool = False,
    normalize: bool = False,
    c4_clean: bool = False,
    dedup_lines: bool = False,
    substring_k: int | None = None,
    min_compression_ratio: float | None = None,
    quality_model=None,
    quality_model_threshold: float = 0.5,
    reference_lm=None,
    max_perplexity: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_buckets: int = 10_000,
    dsir_seed: int = 0,
    dsir_per_gram: bool = False,
) -> DataFrame:
    """Return the curated corpus (original columns + language votes +
    ``lang_pred`` + ``quality_bp``), lazily — one composed plan, no
    actions.  The language filter uses the PREDICTED language
    (``lang_pred``): a production corpus has no ground-truth ``lang``
    column, so the pipeline must run on its own classifier output.

    ``main_content=True`` (r7) prepends jusText-style main-content
    extraction (``web.extract_main_content``): nav bars, footers, and
    link lists are dropped BLOCK-wise before anything downstream runs —
    the strongest web cleanup, strictly ahead of ``strip_markup``
    (which keeps boilerplate text verbatim).  When both are set,
    main-content wins (its output is already markup-free).

    ``strip_markup=True`` prepends the web-corpus cleanup stage
    (``text.strip_markup``): every downstream operator — language
    votes, quality, shingles, near-dup — then sees the cleaned text,
    the order a real pipeline runs (tags would otherwise pollute
    shingles and token stats).  Off by default so the gated entry's
    semantics are unchanged.

    ``normalize=True`` (r6) folds typography (curly quotes, dashes,
    NBSP, zero-width characters — ``clean.normalize_text``) right after
    markup stripping, so typographic twins reach the dedup stages as
    exact duplicates.

    ``dedup_lines=True`` (r10 s3) runs intra-document exact line dedup
    (``clean.dedup_lines``) after C4 cleaning: repeated boilerplate
    lines inside one page drop before the corpus-level dedup stages
    (which never look inside a document).  An EDIT stage — no page is
    removed by it.

    ``c4_clean=True`` (r6) runs the C4 line-level cleaner
    (``clean.c4_clean_lines``) after markup stripping: pages failing
    the C4 page rules (``c4_keep``) are dropped and the survivors
    continue with the line-filtered ``text_c4`` — so menus and cookie
    banners never reach shingling.  Off by default (the gated entry's
    corpus is single-line word-soup; C4 would empty it).

    ``substring_k`` (r6): run exact substring dedup first — repeated
    ``substring_k``-gram spans are cut (first occurrence kept,
    ``operators/substring.py``) BEFORE language/quality/dedup, so
    removed boilerplate can neither carry a document through the
    quality floor nor pollute the shingle space.

    ``min_compression_ratio`` (r9s2): the RefinedWeb-style repetitive-
    text floor — documents whose zlib ratio (``text.compression_stats``)
    falls below it are dropped before the learned-quality stages;
    template spam and keyword stuffing collapse under compression in a
    way n-gram heuristics miss.  Scan-side Arrow kernel, one keyed
    semi-join back, zero shuffle of payloads.

    ``quality_model`` (r6): a fitted reference-vs-crawl classifier
    (``classify.train_quality_classifier``) applied after the
    rule-based floor — the CCNet-style learned filter.

    ``reference_lm`` + ``max_perplexity`` (r6): the third CCNet signal
    — a bigram LM trained on a REFERENCE corpus
    (``lm.train_bigram_lm``, pass its (bigrams, contexts, vocab)
    triple) scores every document; documents whose perplexity against
    reference text exceeds ``max_perplexity`` are dropped.  Together
    the three stages are the standard quality ladder: cheap rules →
    learned classifier → LM perplexity.

    ``dsir_target`` + ``dsir_k`` (r7): DSIR importance resampling as
    the FINAL stage — after cleaning/quality/dedup, select ``dsir_k``
    documents ∝ how target-domain-like they are (``operators/dsir.py``:
    hashed-ngram importance weights against ``dsir_target``'s
    distribution, deterministic Gumbel-top-k).  Runs last because the
    paper's recipe selects from the already-cleaned raw pool; the
    surviving corpus is lazily localCheckpointed first since the DSIR
    stage reads it three times (raw-distribution fit, scoring, final
    join) — without the barrier the whole upstream pipeline would
    recompute per read.
    """
    if main_content:
        from etl_rust_spark.operators import web

        mc = web.extract_main_content(docs, text_col, id_col).select(
            id_col, F.col("text_main")
        )
        docs = (
            docs.drop(text_col)
            .join(mc, id_col)
            .withColumnRenamed("text_main", text_col)
            # a page whose every block was boilerplate has no content —
            # drop it here: the quality formula's ratio guards score an
            # empty string mid-scale (4062 bp), so the floor alone
            # would keep it
            .filter(F.length(F.col(text_col)) > 0)
        )
    elif strip_markup:
        cleaned = text.strip_markup(docs, text_col, id_col).select(
            id_col, F.col("text_clean")
        )
        docs = (
            docs.drop(text_col)
            .join(cleaned, id_col)
            .withColumnRenamed("text_clean", text_col)
        )
    if normalize:
        from etl_rust_spark.operators import clean as _clean

        norm = _clean.normalize_text(docs, text_col, id_col).select(
            id_col, "text_norm"
        )
        docs = (
            docs.drop(text_col)
            .join(norm, id_col)
            .withColumnRenamed("text_norm", text_col)
        )
    if c4_clean:
        from etl_rust_spark.operators import clean as _clean

        c4 = _clean.c4_clean_lines(docs, text_col, id_col)
        docs = (
            docs.drop(text_col)
            .join(c4.filter(F.col("c4_keep")).select(id_col, "text_c4"), id_col)
            .withColumnRenamed("text_c4", text_col)
        )
    if dedup_lines:
        from etl_rust_spark.operators import clean as _clean

        dd = _clean.dedup_lines(docs, text_col, id_col)
        docs = (
            docs.drop(text_col)
            .join(dd.select(id_col, "text_dd"), id_col)
            .withColumnRenamed("text_dd", text_col)
        )
    if substring_k is not None:
        from etl_rust_spark.operators import substring as _substring

        spans = _substring.repeated_kgram_spans(docs, substring_k, text_col, id_col)
        docs = (
            _substring.remove_spans(docs, spans, text_col, id_col)
            .drop(text_col, "n_tokens_removed")
            .withColumnRenamed("text_dedup", text_col)
        )
    if min_compression_ratio is not None:
        cs = text.compression_stats(docs, text_col, id_col)
        docs = docs.join(
            cs.filter(
                F.col("compression_ratio") >= min_compression_ratio
            ).select(id_col),
            id_col,
            "left_semi",
        )
    if quality_model is not None:
        from etl_rust_spark.operators import classify as _classify

        docs = _classify.filter_by_quality(
            quality_model, docs, quality_model_threshold, text_col, id_col
        )
    if max_perplexity is not None:
        if reference_lm is None:
            raise ValueError("max_perplexity requires reference_lm")
        from etl_rust_spark.operators import lm as _lm

        bg, ctx, vocab = reference_lm
        ppl = _lm.score_perplexity(
            docs, bg, ctx, vocab, text_col=text_col, id_col=id_col
        ).select(id_col, "ppl")
        docs = (
            docs.join(ppl, id_col)
            .filter(F.col("ppl") <= max_perplexity)
            .drop("ppl")
        )
    if scripts is not None:
        # Dominant-script floor (script_profile): keeps stopword
        # language-ID honest — a Cyrillic page always classifies as
        # SOME stopword language, but its script_pred is unambiguous.
        sp = text.script_profile(docs, text_col, id_col).select(
            id_col, "script_pred"
        )
        docs = (
            docs.join(sp, id_col)
            .filter(F.col("script_pred").isin(list(scripts)))
            .drop("script_pred")
        )
    # Language votes + prediction + quality as PURE PROJECTIONS (r12):
    # the previous ``docs ⋈ language_id(docs) ⋈ quality_score(docs)``
    # self-joined the corpus twice to attach per-row arithmetic — two
    # broadcasts at bench scale, two full-corpus SHUFFLES at 100 TB.
    # ``with_language_quality`` appends the identical columns in one
    # codegen pass; the select pins the join-form column order
    # (id first) so downstream schemas are unchanged.
    cur = text.with_language_quality(docs, text_col).select(
        id_col, *[c for c in docs.columns if c != id_col],
        *[f"n_{lang}" for lang in text.STOPWORDS],
        "lang_pred", "quality_bp",
    )
    if languages is not None:
        cur = cur.filter(F.col("lang_pred").isin(list(languages)))
    if min_quality_bp > 0:
        cur = cur.filter(F.col("quality_bp") >= min_quality_bp)
    cur = dedup.exact_dedupe(cur, [text_col], id_col)
    if near_dup_threshold is not None:
        if near_dup_strategy not in ("greedy", "components"):
            raise ValueError(f"unknown near_dup_strategy: {near_dup_strategy!r}")
        # The deduped corpus feeds TWO consumers — the LSH pair subtree
        # (via the shingle kernel) and the anti-join's left side — so
        # without a barrier the whole prefix (scan → language/quality
        # filter → exact-dedup window over a full-text exchange) runs
        # twice per execution (r12, guide §2.4/§5).  r13: the barrier is
        # the TRACKED MEMORY_AND_DISK persist, not localCheckpoint —
        # interleaved A/B at sf0.1 (best-of-6, noop sink): persist 2.69 s
        # vs checkpoint 3.27 s vs no barrier 2.85 s, i.e. the checkpoint
        # was the one form slower than recomputing (the r12 driver
        # artifact's 12%-under-control reading, root-caused).  persist
        # also keeps lineage (an executor loss recomputes instead of
        # killing the job — the §5 trade localCheckpoint silently made)
        # and the registry's eviction bounds live cache across calls.
        # At 100 TB this still halves the pipeline's scan+filter compute
        # and removes a second full-text dedup shuffle; the cached state
        # spills gracefully (same policy as the LSH shingle frame).
        cur = dedup._persist_tracked(cur)
        pairs = dedup.minhash_lsh_pairs(
            cur, text_col, id_col,
            width=shingle_width, threshold=near_dup_threshold,
        )
        if near_dup_strategy == "components":
            # exact clustering: keep one representative (min id) per
            # connected component of the pair graph (module docstring).
            comp = near_dup_components(pairs)
            drop = comp.filter(F.col("rep") != F.col("id")).select(
                F.col("id").alias(id_col)
            )
        else:
            # keep the lowest id of each pair: drop ids that appear as
            # the larger member (cid > qid by construction in the pair op)
            drop = pairs.select(F.col("cid").alias(id_col)).distinct()
        cur = cur.join(drop, id_col, "left_anti")
    if dsir_k is not None:
        if dsir_target is None:
            raise ValueError("dsir_k requires dsir_target")
        from etl_rust_spark.operators import dsir as _dsir

        cur = cur.localCheckpoint(eager=False)
        td = _dsir.fit_hashed_ngram_dist(
            dsir_target, text_col=text_col, n_buckets=dsir_buckets
        )
        rd = _dsir.fit_hashed_ngram_dist(
            cur, text_col=text_col, n_buckets=dsir_buckets
        )
        w = _dsir.dsir_log_weights(
            cur, td, rd, n_buckets=dsir_buckets,
            text_col=text_col, id_col=id_col,
        )
        picked = _dsir.dsir_select(
            w, dsir_k, seed=dsir_seed, id_col=id_col, per_gram=dsir_per_gram
        ).select(id_col)
        # k ids by construction — broadcast, no shuffle of the corpus
        cur = cur.join(F.broadcast(picked), id_col)
    return cur


def curation_report(
    docs: DataFrame,
    curated: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lsh_stats: bool = False,
    shingle_width: int = 3,
    max_bucket: int = 256,
) -> dict[str, int]:
    """Attrition summary: {input, kept, removed}.  Two count jobs total —
    callers wanting per-stage attribution run the stages explicitly.

    ``lsh_stats=True`` adds the near-dup hot-bucket cap counters
    (``lsh_n_buckets``, ``lsh_n_spilled``, ``lsh_max_size``,
    ``lsh_pairs_saved`` — :func:`dedup.minhash_bucket_stats` over the
    input corpus, one extra aggregation job): a nonzero spill count is
    the signal that degenerate content hit the cap and candidate
    generation was bounded rather than quadratic.
    """
    n_in = docs.count()
    n_kept = curated.count()
    out = {"input": n_in, "kept": n_kept, "removed": n_in - n_kept}
    if lsh_stats:
        st = dedup.minhash_bucket_stats(
            docs, text_col, id_col, width=shingle_width, max_bucket=max_bucket
        )
        out.update({f"lsh_{k}": v for k, v in st.items()})
    return out


def curate_duck_sql(
    languages: tuple[str, ...] = ("en",),
    min_quality_bp: int = 2000,
    near_dup_threshold: float = 0.2,
    shingle_width: int = 3,
) -> str:
    """DuckDB mirror of the full curation composition over ``documents``
    — language-ID filter (predicted), quality filter, exact dedupe
    (min-id keep), MinHash-LSH near-dup drop — so the one pipeline a
    training-data user actually runs is itself hash-gated end to end,
    not only its stages.  Reuses the stage mirrors verbatim:
    language/quality CTEs from text.py conventions, LSH CTE chain from
    :func:`dedup.minhash_lsh_duck_ctes` re-pointed at the filtered
    corpus."""
    votes = ", ".join(text._vote_exprs("duck"))
    case = text._argmax_case()
    en = ", ".join(f"'{w}'" for w in text.STOPWORDS["en"])
    langs = ", ".join(f"'{lang}'" for lang in languages)
    lsh = dedup.minhash_lsh_duck_ctes(
        "ded", threshold=near_dup_threshold, width=shingle_width
    )
    return f"""
WITH d0 AS (SELECT doc_id, text, lang FROM documents),
tq AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d0),
v AS (SELECT doc_id, {votes} FROM tq),
langp AS (SELECT doc_id, {case} AS lang_pred FROM v),
qm AS (SELECT doc_id, len(toks) AS nt,
        len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS ttr,
        len(list_filter(toks, x -> list_contains([{en}], x))) / CAST(len(toks) AS DOUBLE) AS swr
      FROM tq),
qual AS (SELECT doc_id,
  CAST(FLOOR((LEAST(nt / 64.0, 1.0) * 0.4 + ttr * 0.4 + LEAST(swr * 5, 1.0) * 0.2) * 10000) AS BIGINT) AS quality_bp
  FROM qm),
filt AS (SELECT d0.doc_id, d0.text, d0.lang, langp.lang_pred, qual.quality_bp
         FROM d0 JOIN langp USING (doc_id) JOIN qual USING (doc_id)
         WHERE langp.lang_pred IN ({langs}) AND qual.quality_bp >= {min_quality_bp}),
keep AS (SELECT MIN(doc_id) AS keep_id FROM filt GROUP BY text),
ded AS (SELECT f.* FROM filt f JOIN keep k ON f.doc_id = k.keep_id),
{lsh}
SELECT doc_id, lang, lang_pred, quality_bp FROM ded
WHERE doc_id NOT IN (SELECT cid FROM lshp) ORDER BY doc_id"""
