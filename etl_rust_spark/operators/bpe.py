"""Distributed BPE tokenizer training + encoding.

`text.bpe_token_stats` counts tokens with a BPE-ish regex; this module
TRAINS an actual byte-pair-encoding merge table on the corpus and
encodes with it — the tokenizer-fitting stage of a training-data
pipeline (the reference is extract→publish only; no analog).

Algorithm = classic BPE (Sennrich et al. 2016), shaped for Spark:

- The state is the **word-frequency table**, not the corpus: one row
  per distinct whitespace word with its corpus count and current symbol
  segmentation.  Zipf makes this orders of magnitude smaller than the
  corpus (the 17 MB bench corpus has 31 distinct words); at 100 TB the
  distinct-word table is ~10⁷ rows — iteration state that fits
  comfortably distributed, reached from the corpus by ONE groupBy.
- Each merge round: explode adjacent symbol pairs weighted by word
  count → groupBy pair → top-K to the driver (deterministic tie-break
  on (freq desc, left, right)) → accept up to ``batch`` pairwise
  symbol-DISJOINT merges (disjoint merges can't perturb each other's
  counts — see :func:`train_bpe`) → rewrite the segmentations with the
  batch fused.  ``batch=1`` is exactly classic BPE; ``batch=16`` cuts
  1 000 merges from 2 000 Spark jobs to ~126.  ``localCheckpoint``
  every round bounds plan growth (the near_dup_components lesson).
- Merge application (here and in :func:`bpe_encode`) is the standard
  sequential fuse per word — an Arrow-batched kernel with the merge
  ranks broadcast, memoized per distinct word (Zipf again: each
  distinct word is encoded once per partition, not once per token).

Training is deterministic for a given corpus: counts are exact and the
argmax tie-break is total, so the merge table is reproducible across
runs, partitionings, and cluster sizes — pinned in tests against a pure
Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "train_bpe", "bpe_encode"]

_EOW = "</w>"  # end-of-word marker (standard BPE word boundary symbol)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc): distinct whitespace words with corpus counts — the
    one corpus-sized aggregation in BPE training."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _initial_segments(wc: DataFrame) -> DataFrame:
    """(word, wc, syms): per-word symbol arrays = characters + EOW."""
    return wc.withColumn(
        "syms",
        F.expr(f"concat(split(word, ''), array('{_EOW}'))"),
    )


def _fuse_segments(segs: DataFrame, batch: list[tuple[str, str]]) -> DataFrame:
    """Apply ``batch`` merges to every segmentation — one Arrow kernel,
    each merge as the classic leftmost-first single pass (identical
    semantics to an ``aggregate`` fold, without n_batch nested HOF
    lambdas in the plan)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                for left, right in batch:
                    fused, acc = left + right, []
                    for s in syms:
                        if acc and acc[-1] == left and s == right:
                            acc[-1] = fused
                        else:
                            acc.append(s)
                    syms = acc
                out.append(syms)
            yield pd.DataFrame(
                {"word": pdf["word"], "wc": pdf["wc"], "syms": out}
            )

    return segs.mapInPandas(gen, "word string, wc long, syms array<string>")


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    min_freq: int = 2,
    text_col: str = "text",
    batch: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in rank order.

    Stops early when the best remaining pair's weighted frequency drops
    below ``min_freq``.  The returned list is the tokenizer artifact —
    KBs, broadcast-sized; persist it alongside the corpus.

    ``batch`` (VERDICT r6 #4): merges accepted per driver round trip.
    ``batch=1`` is EXACTLY classic BPE (pinned against the pure-Python
    reference).  ``batch>1`` takes the top-ranked candidates that are
    pairwise symbol-disjoint (neither side nor the fused symbol shared)
    — disjoint merges cannot create or destroy each other's pair
    occurrences, so their post-batch counts equal their pre-batch
    counts and applying them in rank order equals applying them one
    round apart.  The ACCEPTED DEVIATION from classic BPE: a merge can
    spawn a brand-new pair (x, left+right) whose count outranks a
    later candidate in the same batch; classic BPE would pick it first,
    batched BPE sees it next round.  Rank interleaving may therefore
    differ while the learned merge SET stays essentially the same —
    the standard frequency-batched trade (tests pin batch=1 equality,
    batch>1 determinism + merge-set overlap + round-trip count).
    Driver cost: ⌈n_merges/batch⌉ rounds instead of n_merges — Spark
    jobs scale with rounds (a handful each under AQE: top-K
    TakeOrdered stages + the eager checkpoint), so batch=16 cuts both
    job count and driver round trips ~16× while the iteration state
    never leaves the cluster (measured in tests: batch=8 runs ≥3×
    fewer jobs than classic for the same merge count).
    """
    segs = _initial_segments(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs = (
            segs.select(
                "wc",
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r)) "
                        "ELSE array() END"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("freq"))
        )
        want = min(batch, n_merges - len(merges))
        # over-fetch so the disjointness filter still fills the batch
        top = (
            pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(max(4 * want, want + 8))
            .collect()
        )
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            if row["freq"] < min_freq:
                break
            l, r = row["l"], row["r"]
            if l in used or r in used or l + r in used:
                continue
            accepted.append((l, r))
            used.update((l, r, l + r))
            if len(accepted) >= want:
                break
        if not accepted:
            break
        merges.extend(accepted)
        segs = _fuse_segments(segs, accepted).localCheckpoint()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens, n_bpe_tokens): encode with a learned merge
    table.  Arrow-batched; the merge ranks are broadcast (KBs) and each
    distinct word is encoded once per partition (memo — Zipf)."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )
    out_schema = T.StructType(
        [
            T.StructField("__id", docs.schema[id_col].dataType),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def encode_word(word: str, ranks: dict) -> list[str]:
        syms = list(word) + [_EOW]
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return syms

    def gen(batches):
        ranks = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    ids.append(rid), toks.append(None), ns.append(0)
                    continue
                out: list[str] = []
                for w in text.split():
                    enc = memo.get(w)
                    if enc is None:
                        if len(memo) > 1_000_000:
                            memo.clear()
                        enc = memo[w] = encode_word(w, ranks)
                    out.extend(enc)
                ids.append(rid), toks.append(out), ns.append(len(out))
            yield pd.DataFrame({"__id": ids, "bpe_tokens": toks, "n_bpe_tokens": ns})

    return (
        docs.select(id_col, text_col)
        .mapInPandas(gen, out_schema)
        .withColumnRenamed("__id", id_col)
    )
