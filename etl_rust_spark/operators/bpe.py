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
  count → groupBy pair → argmax (ONE scalar row to the driver —
  deterministic tie-break on (freq desc, left, right)) → rewrite the
  segmentations with that merge fused.  ``localCheckpoint`` every round
  bounds plan growth (the near_dup_components lesson).
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


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    min_freq: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in rank order.

    Stops early when the best remaining pair's weighted frequency drops
    below ``min_freq``.  The returned list is the tokenizer artifact —
    KBs, broadcast-sized; persist it alongside the corpus.
    """
    segs = _initial_segments(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
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
        top = pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["freq"] < min_freq:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        # fuse (left, right) -> left||right in every segmentation via an
        # aggregate fold: walk the symbol list once, appending either a
        # fused pair or the bare symbol (classic leftmost-first greedy).
        l_lit, r_lit = left.replace("'", "\\'"), right.replace("'", "\\'")
        segs = segs.withColumn(
            "syms",
            F.expr(
                "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
                f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l_lit}' AND s = '{r_lit}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l_lit}{r_lit}')) "
                "ELSE concat(acc, array(s)) END)"
            ),
        ).localCheckpoint()
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
