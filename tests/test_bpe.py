"""Distributed BPE training vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_rust_spark.operators import bpe

EOW = "</w>"


def _ref_train(texts: list[str], n_merges: int, min_freq: int = 2):
    """Reference BPE (Sennrich et al.): word-frequency table, exact pair
    counts (all adjacent occurrences), argmax with (freq desc, left,
    right) tie-break, leftmost non-overlapping merge application."""
    wc = Counter(w for t in texts for w in t.split())
    segs = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), freq = best
        if freq < min_freq:
            break
        merges.append((l, r))
        for w, syms in segs.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            segs[w] = out
    return merges, segs


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wide wider widest wide",
    "low new wide low new",
]


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    got = bpe.train_bpe(docs, n_merges=12, min_freq=2)
    want, _ = _ref_train(CORPUS, 12, 2)
    assert got == want
    assert len(got) >= 8  # the corpus supports a real merge sequence


def test_train_bpe_min_freq_stops_early(spark):
    docs = spark.createDataFrame([(1, "ab ab cd")], ["doc_id", "text"])
    got = bpe.train_bpe(docs, n_merges=50, min_freq=2)
    want, _ = _ref_train(["ab ab cd"], 50, 2)
    assert got == want
    assert len(got) < 50  # ran dry before the cap


def test_bpe_encode_matches_reference_segmentation(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges = bpe.train_bpe(docs, n_merges=12, min_freq=2)
    _, ref_segs = _ref_train(CORPUS, 12, 2)
    enc = {
        r.doc_id: r
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    for doc_id, text in enumerate(CORPUS):
        want = [s for w in text.split() for s in ref_segs[w]]
        assert enc[doc_id].bpe_tokens == want, (doc_id, text)
        assert enc[doc_id].n_bpe_tokens == len(want)
    # more merges -> no more tokens than fewer merges
    enc0 = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_encode(docs, merges[:2]).collect()}
    assert all(enc[d].n_bpe_tokens <= enc0[d] for d in enc0)


def test_bpe_encode_null_text(spark):
    docs = spark.createDataFrame([(1, "ab ab"), (2, None)], ["doc_id", "text"])
    merges = bpe.train_bpe(docs.filter(F.col("text").isNotNull()), n_merges=3, min_freq=2)
    out = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    assert out[2].bpe_tokens is None and out[2].n_bpe_tokens == 0
    assert out[1].n_bpe_tokens > 0


def test_train_bpe_batched_equals_classic_at_batch_1(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    assert bpe.train_bpe(docs, n_merges=12, min_freq=2, batch=1) == _ref_train(
        CORPUS, 12
    )[0]


def test_train_bpe_batched_merge_set_and_job_budget(spark):
    """batch>1 (VERDICT r6 #4): deterministic across runs, the learned
    merge SET essentially matches classic BPE (rank interleaving may
    differ — the documented deviation: a batch member's spawned pair
    can outrank a later member), and n_merges merges complete in
    ceil(n/batch) driver rounds — the >=10x Spark-job cut."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS * 3)], ["doc_id", "text"]
    )
    classic = bpe.train_bpe(docs, n_merges=24, min_freq=1, batch=1)
    batched = bpe.train_bpe(docs, n_merges=24, min_freq=1, batch=8)
    assert batched == bpe.train_bpe(docs, n_merges=24, min_freq=1, batch=8)
    # merge PAIRS are path-sensitive (batched may build 'ide' as id+e
    # where classic used i+de), so compare the learned VOCABULARY —
    # the set of fused symbols, which is what encoding consumes
    assert min(len(batched), len(classic)) >= 20
    v_b = {l + r for l, r in batched}
    v_c = {l + r for l, r in classic}
    overlap = len(v_b & v_c) / min(len(v_b), len(v_c))
    assert overlap >= 0.7, (overlap, sorted(v_b), sorted(v_c))
    # job budget: Spark jobs scale with driver ROUNDS (a handful per
    # round under AQE), so batch=8 must cut the job count vs classic
    # by roughly the batch factor — assert a conservative 3x
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def count_jobs(group, **kw):
        sc.setJobGroup(group, "bpe job-count probe")
        bpe.train_bpe(docs, n_merges=16, min_freq=1, **kw)
        sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group) or [])

    jobs_batched = count_jobs("bpe-batched", batch=8)
    jobs_classic = count_jobs("bpe-classic", batch=1)
    assert jobs_batched * 3 <= jobs_classic, (jobs_batched, jobs_classic)


def test_bpe_encode_with_batched_merges_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    merges = bpe.train_bpe(docs, n_merges=16, min_freq=1, batch=4)
    enc = bpe.bpe_encode(docs, merges).collect()
    got = {r["doc_id"]: r["bpe_tokens"] for r in enc}
    # every document reconstructs exactly (BPE is lossless)
    for i, t in enumerate(CORPUS):
        rebuilt = "".join(got[i]).replace(EOW, " ").split()
        assert rebuilt == t.split()
