"""Distributed WordPiece tokenizer training + encoding.

Completes the tokenizer-training family next to :mod:`bpe` (pair-
frequency merges) and :mod:`unigram` (EM over a piece lattice): the
BERT-style WordPiece objective (Schuster & Nakajima 2012) picks the
merge maximizing the LIKELIHOOD GAIN score ``freq(l,r) / (freq(l) *
freq(r))`` instead of raw pair frequency, and marks word-internal
pieces with the ``##`` continuation prefix.  The reference repo is
extract→publish only (no analog); the Spark shaping below is the
:mod:`bpe` discipline re-used:

- iteration state = the word-frequency table (one corpus-sized groupBy,
  Zipf-small thereafter), never the corpus;
- each round: ONE job — pair counts and symbol counts are two scan-side
  aggregations over the segment table, the symbol table (alphabet +
  accepted merges, KBs) broadcast-joins onto the pairs, and the scored
  top-K comes back via TakeOrdered with a total (score desc, l, r)
  tie-break;
- ``batch`` accepts up to that many pairwise symbol-DISJOINT merges per
  round trip: merges sharing no symbol (either side or the fused
  result) cannot perturb each other's pair OR symbol counts, so their
  scores are unchanged by each other — the same accepted deviation as
  batched BPE (a brand-new pair spawned mid-batch is seen next round);
- merge application and encoding are Arrow-batched kernels with the
  artifact broadcast and per-distinct-word memoization.

Scores are IEEE doubles computed from exact integer counts (correctly
rounded single division of a single product), so training is
deterministic across runs, partitionings and cluster sizes — pinned in
tests against a pure-Python reference at two corpus scales, the
:mod:`bpe`/:mod:`unigram` gate discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators.bpe import word_counts

__all__ = ["train_wordpiece", "wordpiece_encode"]

_PRE = "##"  # continuation prefix (BERT convention)


def _initial_segments(wc: DataFrame) -> DataFrame:
    """(word, wc, syms): first character bare, the rest ##-prefixed."""
    return wc.withColumn(
        "syms",
        F.expr(
            "transform(split(word, ''), "
            f"(c, i) -> IF(i = 0, c, concat('{_PRE}', c)))"
        ),
    )


def _fused(l: str, r: str) -> str:
    if not r.startswith(_PRE):
        raise ValueError(f"right symbol {r!r} lacks the {_PRE} prefix")
    return l + r[len(_PRE):]


def _fuse_segments(segs: DataFrame, batch: list[tuple[str, str]]) -> DataFrame:
    """Apply ``batch`` merges to every segmentation — one Arrow kernel,
    leftmost-first single pass per merge (the bpe._fuse_segments
    mechanics with the WordPiece prefix-stripping fuse)."""
    import pandas as pd

    fused = {(l, r): _fused(l, r) for l, r in batch}

    def gen(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                for left, right in batch:
                    f, acc = fused[(left, right)], []
                    for s in syms:
                        if acc and acc[-1] == left and s == right:
                            acc[-1] = f
                        else:
                            acc.append(s)
                    syms = acc
                out.append(syms)
            yield pd.DataFrame(
                {"word": pdf["word"], "wc": pdf["wc"], "syms": out}
            )

    return segs.mapInPandas(gen, "word string, wc long, syms array<string>")


_PAIR_EXPR = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r)) "
    "ELSE array() END"
)


def train_wordpiece(
    docs: DataFrame,
    n_merges: int = 50,
    min_freq: int = 2,
    text_col: str = "text",
    batch: int = 1,
) -> dict:
    """Learn a WordPiece vocabulary; returns ``{"vocab": [...],
    "merges": [(l, r), ...]}`` — vocab is the initial alphabet (sorted)
    followed by the fused pieces in acceptance order, the broadcast-
    sized artifact :func:`wordpiece_encode` consumes.

    Each round scores every co-occurring symbol pair with
    ``freq(pair) / (freq(l) * freq(r))`` — pairs of already-frequent
    symbols must co-occur MORE than chance to win, the likelihood-gain
    objective that separates WordPiece from BPE.  Pairs below
    ``min_freq`` never qualify.  ``batch=1`` is the exact classic
    algorithm (test-pinned against the pure-Python reference);
    ``batch>1`` takes the top-scored pairwise symbol-disjoint
    candidates per round (module docstring for why that commutes)."""
    segs = _initial_segments(word_counts(docs, text_col)).localCheckpoint()
    alphabet = sorted(
        r[0]
        for r in segs.select(F.explode("syms").alias("s")).distinct().collect()
    )
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs = (
            segs.select(
                "wc", F.explode(F.expr(_PAIR_EXPR)).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("freq"))
            .filter(F.col("freq") >= min_freq)
        )
        sym_freq = (
            segs.select("wc", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("wc").alias("sf"))
        )
        scored = (
            pairs.join(
                F.broadcast(sym_freq.select(
                    F.col("s").alias("l"), F.col("sf").alias("lf")
                )),
                "l",
            )
            .join(
                F.broadcast(sym_freq.select(
                    F.col("s").alias("r"), F.col("sf").alias("rf")
                )),
                "r",
            )
            .withColumn(
                "score",
                F.col("freq").cast("double")
                / (F.col("lf").cast("double") * F.col("rf").cast("double")),
            )
        )
        want = min(batch, n_merges - len(merges))
        top = (
            scored.orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
            .limit(max(4 * want, want + 8))
            .collect()
        )
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            l, r = row["l"], row["r"]
            if l in used or r in used or _fused(l, r) in used:
                continue
            accepted.append((l, r))
            used.update((l, r, _fused(l, r)))
            if len(accepted) >= want:
                break
        if not accepted:
            break
        merges.extend(accepted)
        segs = _fuse_segments(segs, accepted).localCheckpoint()
    vocab = alphabet + [_fused(l, r) for l, r in merges]
    return {"vocab": vocab, "merges": merges}


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = "[UNK]",
    max_word_chars: int = 100,
) -> DataFrame:
    """(id, wp_tokens, n_wp_tokens): greedy longest-match-first encoding
    with the learned vocabulary (the BERT tokenizer's MaxMatch) —
    Arrow-batched, vocab broadcast, per-distinct-word memo.  A word
    with any un-coverable span (or longer than ``max_word_chars``, the
    standard guard) encodes to ``[unk]`` whole, matching the reference
    implementations."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(frozenset(vocab))
    out_schema = T.StructType(
        [
            T.StructField("__id", docs.schema[id_col].dataType),
            T.StructField("wp_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_wp_tokens", T.LongType()),
        ]
    )

    def encode_word(word: str, v: frozenset) -> list[str]:
        if len(word) > max_word_chars:
            return [unk]
        out: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = _PRE + sub
                if sub in v:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [unk]
            out.append(piece)
            start = end
        return out

    def gen(batches):
        v = bc.value
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
                        enc = memo[w] = encode_word(w, v)
                    out.extend(enc)
                ids.append(rid), toks.append(out), ns.append(len(out))
            yield pd.DataFrame(
                {"__id": ids, "wp_tokens": toks, "n_wp_tokens": ns}
            )

    return (
        docs.select(id_col, text_col)
        .mapInPandas(gen, out_schema)
        .withColumnRenamed("__id", id_col)
    )
