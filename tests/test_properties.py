"""Property-based spot checks (SURVEY §5.2 item 4, hypothesis).

Spark-backed properties run few examples (a Spark job per example);
pure-Python properties run the default budget.
"""

from __future__ import annotations

import datetime as dt
import random

from hypothesis import example, given, settings, strategies as st

from etl_rust_spark.functions.hashing import canonical_hash

GAP_S = 1800  # 30 minutes


# ---------------------------------------------------------------------------
# Canonical hasher: order-insensitivity is what makes the oracle compare
# meaningful — pin it as a property.
# ---------------------------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(
        st.integers(-1000, 1000),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        st.text(max_size=8),
    ),
    min_size=0,
    max_size=30,
)


@given(rows=rows_strategy, seed=st.integers(0, 2**16))
def test_hash_invariant_under_row_order(rows, seed):
    cols = ["a", "b", "c"]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    assert canonical_hash(rows, cols) == canonical_hash(shuffled, cols)


@given(rows=rows_strategy)
def test_hash_invariant_under_column_order(rows):
    cols = ["a", "b", "c"]
    perm = [2, 0, 1]
    permuted_rows = [tuple(r[i] for i in perm) for r in rows]
    permuted_cols = [cols[i] for i in perm]
    assert canonical_hash(rows, cols) == canonical_hash(permuted_rows, permuted_cols)


@given(rows=rows_strategy)
def test_hash_sensitive_to_values(rows):
    cols = ["a", "b", "c"]
    mutated = [(r[0] + 1, r[1], r[2]) for r in rows]
    if rows:
        assert canonical_hash(rows, cols) != canonical_hash(mutated, cols)


def test_hash_discriminates_negative_zero():
    """The r4 op_ann_topk lesson: -0.0 and +0.0 must hash differently
    (the driver's canonicalizer does), so queries normalize with + 0.0
    rather than relying on the hash to forgive the sign."""
    assert canonical_hash([(0.0,)], ["x"]) != canonical_hash([(-0.0,)], ["x"])


def test_hash_discriminates_decimal_from_float():
    """The r2 dq04 lesson: a Decimal result is a different wire type
    than an equal-valued double and must not hash-collide."""
    from decimal import Decimal

    assert canonical_hash([(Decimal("1.5"),)], ["x"]) != canonical_hash(
        [(1.5,)], ["x"]
    )
    # and Decimal scale matters (DECIMAL(4,2) vs DECIMAL(4,1) wire diff)
    assert canonical_hash([(Decimal("1.50"),)], ["x"]) != canonical_hash(
        [(Decimal("1.5"),)], ["x"]
    )


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_hash_float_rounding_is_stable(x):
    """repr(round(x, 6)) canonicalization: equal doubles always equal
    hashes, and a value differing beyond 6 dp maps to the same bucket
    (the documented tolerance — queries ROUND in SQL first)."""
    assert canonical_hash([(x,)], ["v"]) == canonical_hash([(float(x),)], ["v"])


# ---------------------------------------------------------------------------
# Sessionization: session_window must agree with a direct gaps-and-islands
# computation for arbitrary event streams (exact-gap merges included).
# ---------------------------------------------------------------------------

def _py_sessions(ts_sorted: list[dt.datetime]) -> list[int]:
    """Session sizes from the DQ-35 rule: new session iff gap > 30 min."""
    out: list[int] = []
    for i, t in enumerate(ts_sorted):
        if i == 0 or (t - ts_sorted[i - 1]).total_seconds() > GAP_S:
            out.append(1)
        else:
            out[-1] += 1
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),  # user_id
        st.integers(0, 7200),  # seconds offset; spans several gap widths
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(events=events_strategy)
def test_session_window_matches_gaps_and_islands(spark, events):
    from pyspark.sql import functions as F

    from etl_rust_spark.streaming import session_window_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0 + dt.timedelta(seconds=s * 4)) for u, s in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = session_window_agg(df, "30 minutes").collect()

    by_user: dict[int, list[dt.datetime]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u in by_user:
        by_user[u].sort()

    for u, ts_list in by_user.items():
        sizes = sorted(_py_sessions(ts_list))
        got_sizes = sorted(r["n_events"] for r in got if r["user_id"] == u)
        assert got_sizes == sizes, (u, sizes, got_sizes)
        # invariants: sessions ≤ events; within-session span bounded
        assert len(sizes) <= len(ts_list)
    for r in got:
        span = (r["session_end"] - r["session_start"]).total_seconds()
        assert span >= GAP_S  # end = max ts + gap ≥ start + gap
        assert span <= 7200 * 4 + GAP_S


# ---------------------------------------------------------------------------
# Shingling: cardinality bounds for any text.
# ---------------------------------------------------------------------------

@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=40
        ).map(lambda s: s.strip() or "x"),
        min_size=1,
        max_size=8,
    )
)
def test_shingle_count_bounds(spark, texts):
    from pyspark.sql import functions as F

    from etl_rust_spark.operators.dedup import with_shingles

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = with_shingles(df, "text", width=3).select(
        "id", F.size("shingles").alias("n"), F.size(F.split("text", " ")).alias("toks")
    ).collect()
    for r in out:
        n_tokens = r["toks"]
        if n_tokens >= 3:
            assert 1 <= r["n"] <= n_tokens - 2  # distinct ≤ raw shingle count
        else:
            assert r["n"] == 1  # whole-text fallback


# ---------------------------------------------------------------------------
# Serialization round-trips (pure Python — full example budget):
# borsh decode(encode(x)) == x, and the proto3/Avro encoders never crash
# and respect framing invariants on arbitrary records.
# ---------------------------------------------------------------------------

BORSH_SPEC = {
    "struct": [
        ("a", "u64"),
        ("b", "i32"),
        ("c", "string"),
        ("d", {"option": "f64"}),
        ("e", {"vec": "u16"}),
        ("f", "bytes"),
        ("g", "bool"),
        ("h", "i128"),
    ]
}

borsh_values = st.fixed_dictionaries(
    {
        "a": st.integers(0, 2**64 - 1),
        "b": st.integers(-(2**31), 2**31 - 1),
        "c": st.text(max_size=40),
        "d": st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
        "e": st.lists(st.integers(0, 2**16 - 1), max_size=10),
        "f": st.binary(max_size=32),
        "g": st.booleans(),
        "h": st.integers(-(2**127), 2**127 - 1),
    }
)


@given(borsh_values)
def test_borsh_roundtrip_property(val):
    from etl_rust_spark.functions.borsh import borsh_decode_bytes, borsh_encode_bytes

    assert borsh_decode_bytes(borsh_encode_bytes(val, BORSH_SPEC), BORSH_SPEC) == val


@given(
    st.integers(-(2**63), 2**63 - 1),
    st.text(max_size=30),
    st.lists(st.integers(0, 2**63 - 1), max_size=8),
)
def test_proto_wire_invariants(n, s, xs):
    """Wire-level invariants: every field starts with the right tag and
    the whole buffer is consumed by a minimal tag/len walk."""
    from etl_rust_spark.functions.wireformats import proto_encode_bytes

    spec = [(1, "n", "int64"), (2, "s", "string"), (3, "xs", ("repeated", "uint64"))]
    buf = proto_encode_bytes({"n": n, "s": s, "xs": xs}, spec)

    # walk: varint tag -> wire type 0 (varint) or 2 (len-delimited)
    i, seen = 0, []
    while i < len(buf):
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fno, wt = tag >> 3, tag & 7
        seen.append(fno)
        if wt == 0:
            while buf[i] & 0x80:
                i += 1
            i += 1
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            i += ln
        else:
            raise AssertionError(f"unexpected wire type {wt}")
    assert i == len(buf)
    expected = [1, 2] + ([3] if xs else [])
    assert seen == expected


@given(
    st.integers(-(2**63), 2**63 - 1),
    st.one_of(st.none(), st.text(max_size=20)),
    st.lists(st.integers(-(2**31), 2**31 - 1), max_size=6),
)
def test_avro_binary_decodable(n, tag, xs):
    """Encode then decode with an independent minimal reader — the
    encoder must produce spec-conformant zigzag/blocks/unions."""
    from etl_rust_spark.functions.wireformats import avro_encode_bytes

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "tag", "type": ["null", "string"]},
            {"name": "xs", "type": {"type": "array", "items": "int"}},
        ],
    }
    buf = avro_encode_bytes({"n": n, "tag": tag, "xs": xs}, schema)

    pos = [0]

    def zz() -> int:
        v, shift = 0, 0
        while True:
            b = buf[pos[0]]
            pos[0] += 1
            v |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (v >> 1) ^ -(v & 1)

    assert zz() == n
    branch = zz()
    if tag is None:
        assert branch == 0
    else:
        assert branch == 1
        ln = zz()
        got = buf[pos[0] : pos[0] + ln].decode()
        pos[0] += ln
        assert got == tag
    got_xs = []
    while True:
        cnt = zz()
        if cnt == 0:
            break
        for _ in range(cnt):
            got_xs.append(zz())
    assert got_xs == xs
    assert pos[0] == len(buf)


# ---------------------------------------------------------------------------
# Media codecs: round-trip exactness is what makes decode_stub=False
# oracle-pinnable — pin PNG/AVI losslessness and the WAV error bound as
# properties over arbitrary shapes (pure Python, full example budget).
# ---------------------------------------------------------------------------


@settings(deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**16),
)
def test_png_roundtrip_lossless_any_shape(h, w, ch, seed):
    import numpy as np

    from etl_rust_spark.operators import mediacodec as mc

    a = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(a))
    assert out.shape == a.shape and (out == a).all()


@settings(deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    n=st.integers(1, 5),
    seed=st.integers(0, 2**16),
)
def test_avi_roundtrip_lossless_any_shape(h, w, n, seed):
    import numpy as np

    from etl_rust_spark.operators import mediacodec as mc

    frames = [
        np.random.default_rng(seed + i).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for i in range(n)
    ]
    out = mc.decode_avi(mc.encode_avi(frames))
    assert len(out) == n
    for a, b in zip(frames, out):
        assert (a == b).all()


@settings(deadline=None)
@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**16),
)
def test_wav_roundtrip_within_quantization_bound(n, ch, rate, seed):
    import numpy as np

    from etl_rust_spark.operators import mediacodec as mc

    s = np.random.default_rng(seed).uniform(-1.0, 1.0, size=(n, ch))
    dec, got_rate = mc.decode_wav(mc.encode_wav(s, rate))
    assert got_rate == rate and dec.shape == s.shape
    # encode quantizes to 16-bit (×32767) and decode scales by 32768:
    # worst case is half an LSB of rounding plus the scale mismatch
    assert float(np.max(np.abs(dec - s))) < 2.0 / 32768.0


# ---------------------------------------------------------------------------
# Banded Hamming join: the pigeonhole exact-recall claim must hold for
# ARBITRARY signatures, not just the planted fixtures — run the band
# equi-join against a brute-force all-pairs popcount on random inputs.
# (Spark job per example → few examples, like the other Spark properties.)
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 2**16),
    n=st.integers(2, 24),
    max_hamming=st.integers(0, 7),
    dups=st.integers(0, 4),
)
def test_hamming_banded_join_equals_brute_force(spark, seed, n, max_hamming, dups):
    import numpy as np

    from etl_rust_spark.operators import multimodal

    rng = np.random.default_rng(seed)
    sigs = list(rng.integers(-(2**63), 2**63, size=n, dtype=np.int64))
    # plant near-dups: copies of sig[0] with up to max_hamming bits flipped
    for d in range(min(dups, n - 1)):
        flips = rng.choice(64, size=rng.integers(0, max_hamming + 1), replace=False)
        v = int(sigs[0])
        for b in flips:
            v ^= 1 << int(b)
        sigs[1 + d] = np.int64((v + 2**63) % 2**64 - 2**63)
    df = spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(sigs)], "asset_id long, dhash long"
    )
    got = {
        (r["aid"], r["bid"], r["hamming"])
        for r in multimodal.hamming_near_dup_pairs(df, max_hamming=max_hamming).collect()
    }
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            ham = bin((int(sigs[i]) ^ int(sigs[j])) & (2**64 - 1)).count("1")
            if ham <= max_hamming:
                want.add((i, j, ham))
    assert got == want


text_strategy = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_categories=("Cs",)
                ),
                max_size=80,
            ),
        ),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None)
@given(rows=text_strategy)
def test_normalize_text_is_idempotent(spark, rows):
    """normalize(normalize(x)) == normalize(x) on arbitrary unicode —
    the fixpoint property that makes the stage safe to re-run (and a
    re-ingested already-normalized corpus hashes identically)."""
    from etl_rust_spark.operators import clean

    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    once = clean.normalize_text(df)
    twice = clean.normalize_text(
        once.withColumnRenamed("text_norm", "text")
    )
    a = {r.doc_id: r.text_norm for r in once.collect()}
    b = {r.doc_id: r.text_norm for r in twice.collect()}
    assert a == b


@settings(max_examples=10, deadline=None)
@given(rows=text_strategy)
def test_c4_clean_is_idempotent(spark, rows):
    """Cleaning already-cleaned text changes nothing: every surviving
    line still passes the line rules."""
    from etl_rust_spark.operators import clean

    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    once = clean.c4_clean_lines(df)
    twice = clean.c4_clean_lines(
        once.withColumnRenamed("text_c4", "text").select("doc_id", "text")
    )
    a = {r.doc_id: r.text_c4 for r in once.collect()}
    b = {r.doc_id: r.text_c4 for r in twice.collect()}
    assert a == b


kv_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.one_of(st.none(), st.text(max_size=6))),
    min_size=0,
    max_size=20,
    unique_by=lambda r: r[0],
)


@settings(max_examples=15, deadline=None)
@given(a_rows=kv_strategy, b_rows=kv_strategy)
@example(a_rows=[(0, None)], b_rows=[(0, "\x1e")]).via(
    "r8 falsifier: a VALUE equal to the old null sentinel chr(30) "
    "collided with NULL — fixed by length-prefix fingerprint encoding"
)
def test_table_diff_set_math(spark, a_rows, b_rows):
    """diff statuses are exactly the key-set/value-map algebra:
    removed = keys(a)-keys(b), added = keys(b)-keys(a), changed =
    common keys with different values; diff(a, a) is empty."""
    from etl_rust_spark.operators.profile import table_diff

    schema = "k: long, v: string"
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)
    got = {r.k: r.diff for r in table_diff(a, b, ["k"]).collect()}
    da, db = dict(a_rows), dict(b_rows)
    want = {}
    for k in set(da) - set(db):
        want[k] = "removed"
    for k in set(db) - set(da):
        want[k] = "added"
    for k in set(da) & set(db):
        if da[k] != db[k]:
            want[k] = "changed"
    assert got == want
    assert table_diff(a, a, ["k"]).count() == 0


def test_operator_outputs_are_layout_invariant(spark, sf_dir):
    """The determinism claims mean nothing if results depend on input
    partitioning: key operators must hash identically over a 1-partition
    and a 13-partition layout of the same rows."""
    from etl_rust_spark.catalog import load_table
    from etl_rust_spark.operators import dedup, pack, similarity
    from etl_rust_spark.operators.curate import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def h(df):
        cols = sorted(df.columns)
        return canonical_hash(
            [tuple(r[c] for c in cols) for r in df.collect()], cols
        )

    cases = [
        lambda d, e: dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.2),
        lambda d, e: similarity.ann_lsh_topk(e.filter("vec_id < 10"), e, k=3),
        lambda d, e: curate_corpus(
            d, languages=["en"], min_quality_bp=1000, near_dup_threshold=0.3
        ),
        lambda d, e: pack.hash_sample(d, 0.2),
    ]
    for fn in cases:
        a = fn(docs.repartition(1), emb.repartition(1))
        b = fn(docs.repartition(13), emb.repartition(13))
        assert h(a) == h(b), fn


# ---------------------------------------------------------------------------
# PQ quantizer kernel invariants (pure numpy — full hypothesis budget)
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(0, 2**16),
    n=st.integers(8, 60),
    m=st.sampled_from([2, 4, 8]),
    kc=st.integers(2, 8),
)
@settings(max_examples=60, deadline=None)
def test_pq_kernel_invariants(seed, n, m, kc):
    """(1) codes always index into the codebook; (2) a vector EQUAL to a
    row of concatenated codewords reconstructs itself exactly (distance
    0 beats every other codeword unless a duplicate ties — then the
    lowest index wins, still reconstructing the same values); (3) the
    encode is deterministic."""
    import numpy as np

    from etl_rust_spark.operators.similarity import _kmeans_l2, _round_half_up

    rng = np.random.default_rng(seed)
    d_sub = 3
    mat = rng.normal(size=(n, m * d_sub))
    books = np.stack(
        [_kmeans_l2(mat[:, j * d_sub : (j + 1) * d_sub], kc, seed=seed + j) for j in range(m)]
    )

    def encode(x):
        codes = []
        for j in range(m):
            sub = x[j * d_sub : (j + 1) * d_sub]
            diff = sub[None, :] - books[j]
            d2 = np.cumsum(diff * diff, axis=1)[:, -1]
            codes.append(int(np.argmin(_round_half_up(d2, 6))))
        return codes

    for row in mat[:10]:
        c1, c2 = encode(row), encode(row)
        assert c1 == c2
        assert all(0 <= c < len(books[0]) for c in c1)

    # self-reconstruction: feed a codeword-concatenation through encode
    chosen = [int(rng.integers(0, len(books[j]))) for j in range(m)]
    exact_vec = np.concatenate([books[j][chosen[j]] for j in range(m)])
    got = encode(exact_vec)
    recon = np.concatenate([books[j][got[j]] for j in range(m)])
    assert np.array_equal(recon, exact_vec)


mixed_row_strategy = st.lists(
    st.tuples(
        st.integers(0, 25),                              # key
        st.one_of(st.none(), st.integers(-5, 5)),        # unprefixed int
        st.one_of(st.none(), st.text(max_size=4)),       # prefixed string
        st.one_of(st.none(), st.sampled_from(["\x1f", "n", "1:", "", "2:\x1fx"])),
    ),
    min_size=0, max_size=15, unique_by=lambda r: r[0],
)


@settings(max_examples=10, deadline=None)
@given(a_rows=mixed_row_strategy, b_rows=mixed_row_strategy)
@example(
    # boundary-injection probe: with the int UNPREFIXED (r9 dtype-aware
    # encoding) a string holding "1:" or "\x1f" must still not be able
    # to masquerade as a neighboring column's encoding
    a_rows=[(0, 1, ":x", None)],
    b_rows=[(0, None, "1:x", None)],
)
def test_table_diff_mixed_types_stays_injective(spark, a_rows, b_rows):
    """r9 fingerprint change (VERDICT r8 #3): separator-free types skip
    the length prefix — the set-math contract must survive adversarial
    strings (separators, 'n', 'len:'-lookalikes) next to them."""
    from etl_rust_spark.operators.profile import table_diff

    schema = "k: long, i: long, s: string, t: string"
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)
    got = {r.k: r.diff for r in table_diff(a, b, ["k"]).collect()}
    da = {r[0]: r[1:] for r in a_rows}
    db = {r[0]: r[1:] for r in b_rows}
    want = {}
    for k in set(da) - set(db):
        want[k] = "removed"
    for k in set(db) - set(da):
        want[k] = "added"
    for k in set(da) & set(db):
        if da[k] != db[k]:
            want[k] = "changed"
    assert got == want
    assert table_diff(a, a, ["k"]).count() == 0
