"""Distributed WordPiece training vs a pure-Python reference
implementation (the bpe/unigram gate discipline: exact artifact
equality at two corpus scales + encode parity)."""

from __future__ import annotations

from collections import Counter

from etl_rust_spark.operators import wordpiece as wp

PRE = "##"


def _ref_train(texts: list[str], n_merges: int, min_freq: int = 2):
    """Reference WordPiece (Schuster & Nakajima 2012): word-frequency
    table, exact pair/symbol counts, argmax of freq(p)/(f(l)*f(r)) as
    IEEE doubles with (score desc, l, r) tie-break, leftmost
    non-overlapping merge application, ## continuation prefix."""
    wc = Counter(w for t in texts for w in t.split())
    segs = {
        w: [c if i == 0 else PRE + c for i, c in enumerate(w)] for w in wc
    }
    alphabet = sorted({s for syms in segs.values() for s in syms})
    merges = []
    while len(merges) < n_merges:
        pairs: Counter = Counter()
        syms_f: Counter = Counter()
        for w, syms in segs.items():
            for s in syms:
                syms_f[s] += wc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        cand = [
            (f / (float(syms_f[l]) * float(syms_f[r])), l, r)
            for (l, r), f in pairs.items()
            if f >= min_freq
        ]
        if not cand:
            break
        score, l, r = min(cand, key=lambda t: (-t[0], t[1], t[2]))
        merges.append((l, r))
        fused = l + r[len(PRE):]
        for w, syms in segs.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = fused
                else:
                    out.append(s)
            segs[w] = out
    vocab = alphabet + [l + r[len(PRE):] for l, r in merges]
    return {"vocab": vocab, "merges": merges}, segs


def _ref_encode_word(word: str, vocab: set, unk="[UNK]", max_chars=100):
    if len(word) > max_chars:
        return [unk]
    out, start = [], 0
    while start < len(word):
        end, piece = len(word), None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = PRE + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        start = end
    return out


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wide wider widest wide",
    "low new wide low new",
    "unrelated undone unring unrest",
]


def test_train_wordpiece_matches_reference(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    got = wp.train_wordpiece(docs, n_merges=15, min_freq=2)
    want, _ = _ref_train(CORPUS, 15, 2)
    assert got == want
    assert len(got["merges"]) >= 10  # a real merge sequence happened
    assert any(m[1].startswith(PRE) for m in got["merges"])


def test_wordpiece_objective_differs_from_bpe(spark):
    """The likelihood-gain score must be able to pick a pair raw
    frequency would not: 'ab' co-occurs always (score 1/freq) while
    'xy' co-occurs more often in absolute terms but x and y are
    everywhere."""
    corpus = ["ab ab ab xz xy xy xy xy yx yx yx yx"] * 2
    docs = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = wp.train_wordpiece(docs, n_merges=1, min_freq=2)
    want, _ = _ref_train(corpus, 1, 2)
    assert got["merges"] == want["merges"]
    # (a, ##b) always co-occur; (x, ##y) are diluted by xz and yx
    assert got["merges"][0] == ("a", PRE + "b")


def test_train_wordpiece_on_sf_documents(spark, sf_dir):
    """Second corpus scale (sf0.001 documents table): artifact equality
    with the reference, end to end through the real table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    texts = [r.text for r in docs.select("text").collect()]
    got = wp.train_wordpiece(docs, n_merges=25, min_freq=2)
    want, _ = _ref_train(texts, 25, 2)
    assert got == want


def test_wordpiece_encode_matches_reference(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    art = wp.train_wordpiece(docs, n_merges=12, min_freq=2)
    enc = {
        r.doc_id: list(r.wp_tokens)
        for r in wp.wordpiece_encode(docs, art["vocab"]).collect()
    }
    vset = set(art["vocab"])
    for i, text in enumerate(CORPUS):
        want = [t for w in text.split() for t in _ref_encode_word(w, vset)]
        assert enc[i] == want
    # round trip: stripping ## and re-joining pieces rebuilds the words
    for i, text in enumerate(CORPUS):
        rebuilt, cur = [], ""
        for t in enc[i]:
            if t.startswith(PRE):
                cur += t[len(PRE):]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = t
        if cur:
            rebuilt.append(cur)
        assert rebuilt == text.split()


def test_wordpiece_encode_unk_and_nulls(spark):
    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, "qqq"), (2, None), (3, "z" * 200)],
        ["doc_id", "text"],
    )
    art = wp.train_wordpiece(docs.limit(1), n_merges=6, min_freq=2)
    rows = {r.doc_id: r for r in wp.wordpiece_encode(docs, art["vocab"]).collect()}
    assert rows[1].wp_tokens == ["[UNK]"]     # uncoverable span
    assert rows[2].wp_tokens is None and rows[2].n_wp_tokens == 0
    assert rows[3].wp_tokens == ["[UNK]"]     # over max_word_chars


def test_train_wordpiece_batched_equals_classic_merge_budget(spark):
    """batch>1 stays deterministic and lands essentially the same
    vocabulary (disjoint batching's accepted deviation — the bpe
    contract)."""
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    classic = wp.train_wordpiece(docs, n_merges=12, min_freq=2, batch=1)
    batched1 = wp.train_wordpiece(docs, n_merges=12, min_freq=2, batch=4)
    batched2 = wp.train_wordpiece(docs, n_merges=12, min_freq=2, batch=4)
    assert batched1 == batched2  # deterministic
    overlap = set(classic["vocab"]) & set(batched1["vocab"])
    assert len(overlap) >= int(0.75 * len(classic["vocab"]))


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
@example(texts=["aaaa aaaa aa", "aa a aaa"])      # self-pairs (l == r)
@example(texts=["abcabc abcabc", "abc bca cab"])  # repeated multigrams
def test_train_wordpiece_random_corpora_match_reference(spark, texts):
    """Hypothesis: the distributed trainer equals the pure-Python
    reference (vocab AND merges, exactly) on random corpora — score
    ties, self-pairs and overlap counting included."""
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = wp.train_wordpiece(docs, n_merges=8, min_freq=2)
    want, _ = _ref_train(texts, 8, 2)
    assert got == want
