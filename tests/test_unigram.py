"""Distributed unigram-LM (SentencePiece-style) training vs a pure-
Python reference implementation (VERDICT r8 #7).

The reference re-derives the WHOLE pipeline single-node: substring
seeding, forward–backward EM with the same fixed-point (1e-6 int)
expected-count grid, expected-count pruning with character coverage,
and Viterbi encoding with first-maximizer tie-breaks.  Matching vocab
AND logp floats is the evidence that the distributed E-step (Arrow
kernel + int64 sum shuffle) computes exactly the same statistics."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from etl_rust_spark.operators import unigram

GRID = 1_000_000


def _lattice_counts(word, logp, max_len):
    n = len(word)
    arcs = []
    for i in range(n):
        row = []
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is not None:
                row.append((j, lp))
        arcs.append(row)
    NEG = float("-inf")

    def lse(acc, x):
        if acc == NEG:
            return x
        if x == NEG:
            return acc
        hi, lo = (acc, x) if acc > x else (x, acc)
        return hi + math.log1p(math.exp(lo - hi))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j, lp in arcs[i]:
            alpha[j] = lse(alpha[j], alpha[i] + lp)
    if alpha[n] == NEG:
        return None
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j, lp in arcs[i]:
            if beta[j] != NEG:
                beta[i] = lse(beta[i], lp + beta[j])
    out = {}
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j, lp in arcs[i]:
            if beta[j] == NEG:
                continue
            piece = word[i:j]
            out[piece] = out.get(piece, 0.0) + math.exp(
                alpha[i] + lp + beta[j] - alpha[n]
            )
    return out


def _ref_train(texts, vocab_size, max_piece_len=8, seed_size=2000,
               shrink=0.75, em_iters=2):
    wc = Counter(w for t in texts for w in t.split() if w)
    subs = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                subs[w[i:j]] += c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    chars = {p for p in subs if len(p) == 1}
    pieces = sorted({p for p, _ in top} | chars)
    lz = math.log(len(pieces))
    vocab = {p: -lz for p in pieces}

    def em_totals(v):
        totals = Counter()
        for w, c in wc.items():
            counts = _lattice_counts(w, v, max_piece_len)
            if not counts:
                continue
            for piece, e in counts.items():
                g = round(e * GRID)
                if g:
                    totals[piece] += g * c
        return totals

    def renorm(totals, ps):
        z = sum(max(totals.get(p, 0), 1) for p in ps)
        lzz = math.log(z)
        return {p: math.log(max(totals.get(p, 0), 1)) - lzz for p in ps}

    while True:
        for _ in range(em_iters):
            totals = em_totals(vocab)
            vocab = renorm(totals, list(vocab))
        if len(vocab) <= vocab_size:
            break
        keep = max(vocab_size, int(len(vocab) * shrink))
        multi = sorted((p for p in vocab if len(p) > 1),
                       key=lambda p: (-totals.get(p, 0), p))
        room = keep - len(chars)
        vocab = renorm(totals, sorted(chars | set(multi[:room])))
    return sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))


def _ref_viterbi(word, logp, max_len):
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [None] * (n + 1)
    best[0] = 0.0
    unk_lp = min(logp.values(), default=-1.0) - 10.0
    for i in range(n):
        if best[i] == NEG:
            continue
        matched = False
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            matched = True
            s = best[i] + lp
            if s > best[j]:
                best[j], back[j] = s, (i, word[i:j])
        if not matched:
            s = best[i] + unk_lp
            if s > best[i + 1]:
                best[i + 1], back[i + 1] = s, (i, "<unk>")
    if best[n] == NEG:
        return [ch if ch in logp else "<unk>" for ch in word]
    out, k = [], n
    while k > 0:
        i, piece = back[k]
        out.append(piece)
        k = i
    out.reverse()
    return out


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wide wider widest wide",
    "low new wide low new",
]

CORPUS2 = CORPUS + [
    "the winding road widens below",
    "newly widened lanes flow lower",
    "the lowest note rings newest",
    "slow flowing water below the wide road",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_train_unigram_matches_reference_two_scales(spark):
    """Vocab AND logp equality at two corpus scales — the distributed
    E-step computes exactly the reference statistics (fixed-point grid
    makes the cross-partition sum exact, so floats match bitwise)."""
    for texts, vs in ((CORPUS, 30), (CORPUS2, 45)):
        got = unigram.train_unigram(
            _docs(spark, texts), vocab_size=vs, max_piece_len=4,
            seed_size=60,
        )
        want = _ref_train(texts, vocab_size=vs, max_piece_len=4,
                          seed_size=60)
        assert [p for p, _ in got] == [p for p, _ in want]
        for (gp, gl), (wp, wl) in zip(got, want):
            assert gl == wl, (gp, gl, wl)


def test_train_unigram_layout_invariant(spark):
    """Same vocab from a 1-partition and a 7-partition layout — the
    determinism claim the fixed-point grid exists for."""
    d1 = _docs(spark, CORPUS2).coalesce(1)
    d7 = _docs(spark, CORPUS2).repartition(7)
    v1 = unigram.train_unigram(d1, vocab_size=40, max_piece_len=4, seed_size=50)
    v7 = unigram.train_unigram(d7, vocab_size=40, max_piece_len=4, seed_size=50)
    assert v1 == v7


def test_unigram_encode_matches_reference_viterbi(spark):
    docs = _docs(spark, CORPUS2)
    vocab = unigram.train_unigram(docs, vocab_size=40, max_piece_len=4,
                                  seed_size=50)
    logp = dict(vocab)
    max_len = max(len(p) for p, _ in vocab)
    enc = {r.doc_id: r for r in unigram.unigram_encode(docs, vocab).collect()}
    for i, text in enumerate(CORPUS2):
        want = [t for w in text.split() for t in _ref_viterbi(w, logp, max_len)]
        assert enc[i].uni_tokens == want, (i, text)
        assert enc[i].n_uni_tokens == len(want)


def test_unigram_encode_unknown_chars_and_nulls(spark):
    train = _docs(spark, CORPUS)
    vocab = unigram.train_unigram(train, vocab_size=30, max_piece_len=4,
                                  seed_size=60)
    docs = spark.createDataFrame(
        [(1, "low löw"), (2, None)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in unigram.unigram_encode(docs, vocab).collect()}
    assert "<unk>" in out[1].uni_tokens          # ö never seen in training
    assert out[1].uni_tokens[:1] == ["low"] or "low" in out[1].uni_tokens
    assert out[2].uni_tokens is None and out[2].n_uni_tokens == 0


def test_train_unigram_coverage_and_guards(spark):
    docs = _docs(spark, CORPUS)
    vocab = unigram.train_unigram(docs, vocab_size=30, max_piece_len=4,
                                  seed_size=60)
    pieces = {p for p, _ in vocab}
    chars = {c for t in CORPUS for c in t if c != " "}
    assert chars <= pieces                       # coverage: chars never pruned
    assert len(vocab) <= 30
    import pytest

    with pytest.raises(ValueError, match="cannot cover"):
        unigram.train_unigram(docs, vocab_size=5)
    with pytest.raises(ValueError, match="shrink"):
        unigram.train_unigram(docs, vocab_size=30, shrink=1.5)


def test_renormalize_overflow_guard_names_remediation():
    """VERDICT r9 #5: the fixed-point grid's int64 headroom (~9e12
    corpus tokens at the 1e-6 grid) is enforced in the M-step, not just
    documented — an overflow-scale total raises with the raise-the-grid
    remediation instead of deterministically corrupting the vocab."""
    import pytest

    # synthetic overflow-scale totals: one piece holding 2^62 grid units
    with pytest.raises(OverflowError, match="raise the grid"):
        unigram._renormalize({"a": 2**62}, ["a", "b"])
    # just under the ceiling stays fine and finite
    out = unigram._renormalize({"a": 2**62 - 2}, ["a", "b"])
    assert out["a"] <= 0.0 and out["b"] < out["a"]
    assert all(math.isfinite(v) for v in out.values())


def test_sample_segmentations_valid_deterministic_and_diverse(spark):
    """Subword regularization: every sample re-concatenates to its word,
    uses vocab pieces (or <unk>), is bit-identical across runs AND
    layouts (hash-derived draws), and at small alpha an ambiguous word
    segments differently across samples — the augmentation point."""
    docs = _docs(spark, CORPUS2)
    vocab = unigram.train_unigram(docs, vocab_size=40, max_piece_len=4,
                                  seed_size=50)
    pieces = {p for p, _ in vocab}

    out = unigram.sample_segmentations(docs, vocab, n_samples=4, alpha=0.1,
                                       seed=3).collect()
    assert len(out) == 4 * len(CORPUS2)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.sample_idx] = r.uni_tokens
        assert set(r.uni_tokens) <= pieces  # training corpus: no <unk>
    for i, text in enumerate(CORPUS2):
        for s, toks in by_doc[i].items():
            assert "".join(toks) == text.replace(" ", ""), (i, s)
    # deterministic replay, independent of layout
    again = unigram.sample_segmentations(
        docs.repartition(7), vocab, n_samples=4, alpha=0.1, seed=3
    ).collect()
    key = lambda r: (r.doc_id, r.sample_idx)  # noqa: E731
    assert sorted((r.doc_id, r.sample_idx, r.uni_tokens) for r in again) == \
           sorted((r.doc_id, r.sample_idx, r.uni_tokens) for r in out)
    # diversity: at least one doc's samples differ from each other
    assert any(
        len({tuple(t) for t in samples.values()}) > 1
        for samples in by_doc.values()
    )
    # a different seed draws a different corpus-wide sampling
    other = unigram.sample_segmentations(docs, vocab, n_samples=4, alpha=0.1,
                                         seed=4).collect()
    assert sorted((r.doc_id, r.sample_idx, r.uni_tokens) for r in other) != \
           sorted((r.doc_id, r.sample_idx, r.uni_tokens) for r in out)


def test_sample_segmentations_peaks_to_viterbi_and_guards(spark):
    docs = _docs(spark, CORPUS)
    vocab = unigram.train_unigram(docs, vocab_size=30, max_piece_len=4,
                                  seed_size=60)
    # large alpha → the distribution peaks: samples == Viterbi encode
    vit = {r.doc_id: r.uni_tokens
           for r in unigram.unigram_encode(docs, vocab).collect()}
    peaked = unigram.sample_segmentations(docs, vocab, n_samples=2,
                                          alpha=50.0, seed=1).collect()
    for r in peaked:
        assert r.uni_tokens == vit[r.doc_id], (r.doc_id, r.sample_idx)
    # null text and guards
    nd = spark.createDataFrame([(1, None)], "doc_id: long, text: string")
    rows = unigram.sample_segmentations(nd, vocab, n_samples=2).collect()
    assert all(r.uni_tokens is None and r.n_uni_tokens == 0 for r in rows)
    import pytest

    with pytest.raises(ValueError, match="n_samples"):
        unigram.sample_segmentations(docs, vocab, n_samples=0)


from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

word_st = st.text(alphabet="abcxyz", min_size=1, max_size=6)
corpus_st = st.lists(
    st.lists(word_st, min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=6,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=corpus_st)
@example(texts=["aaaa aaaa aa", "aa a aaa"])     # maximal lattice ambiguity
@example(texts=["abcabc abcabc", "abc bca cab"])  # repeated multigrams
def test_train_unigram_random_corpora_match_reference(spark, texts):
    """Hypothesis: the distributed trainer equals the pure-Python
    reference (vocab AND logp, bitwise) on random corpora — the
    fixed-point E-step contract holds beyond the handwritten cases."""
    chars = {c for t in texts for c in t if c != " "}
    vs = len(chars) + 4
    got = unigram.train_unigram(
        _docs(spark, texts), vocab_size=vs, max_piece_len=3, seed_size=25
    )
    want = _ref_train(texts, vocab_size=vs, max_piece_len=3, seed_size=25)
    assert got == want
