"""mediacodec: the pure-stdlib PNG codec + pluggable decoder registry,
and the decode_stub=False paths of the multimodal operators
(VERDICT r5 #4 — the last stub, now real for PNG in-container)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_rust_spark.operators import mediacodec as mc


def _img(h=12, w=10, ch=3, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_roundtrip_rgb_rgba_gray():
    for ch in (1, 2, 3, 4):
        a = _img(ch=ch, seed=ch)
        out = mc.decode_png(mc.encode_png(a))
        assert out.shape == a.shape
        np.testing.assert_array_equal(out, a)


def test_png_decoder_handles_all_filter_types():
    """Exercise Sub/Up/Average/Paeth by re-encoding with each filter
    explicitly (hand-rolled encoder variant) and decoding back."""
    import struct
    import zlib

    a = _img(h=6, w=5, ch=3, seed=9)
    h, w, ch = a.shape

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    for ftype in (1, 2, 3, 4):
        rows = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            cur = a[y].reshape(-1).astype(np.int32)
            filt = np.empty_like(cur)
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = left
                elif ftype == 2:
                    pred = up
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                filt[x] = (cur[x] - pred) & 0xFF
            rows.append(ftype)
            rows.extend(filt.astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            mc.PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(rows)))
            + chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(mc.decode_png(png), a, err_msg=f"filter {ftype}")


def test_resize_nearest_shapes_and_determinism():
    a = _img(h=8, w=8)
    up = mc.resize_nearest(a, 16, 4)
    assert up.shape == (4, 16, 3)
    np.testing.assert_array_equal(up, mc.resize_nearest(a, 16, 4))
    # identity resize is exact
    np.testing.assert_array_equal(mc.resize_nearest(a, 8, 8), a)


def test_image_feature_dim_and_range():
    f = mc.image_feature(_img(), dim=8)
    assert len(f) == 8
    assert all(0.0 <= v <= 1.0 for v in f)
    assert f == mc.image_feature(_img(), dim=8)


def test_decode_image_registry_unknown_magic():
    with pytest.raises(ValueError, match="no decoder"):
        mc.decode_image(b"\x00\x01\x02\x03not-an-image")


def test_use_pillow_registers_or_importerrors():
    """K-05 pattern: with Pillow absent the call raises ImportError and
    the real-format path is skip-marked; with Pillow present JPEG magic
    must dispatch."""
    try:
        mc.use_pillow()
    except ImportError:
        pytest.skip("Pillow not installed in this container")
    # Pillow available: registry should now claim a JPEG prefix
    assert any(m == b"\xff\xd8\xff" for m, _ in mc._DECODERS)


def test_extract_features_real_decode(spark):
    """decode_stub=False end to end: PNG payloads decode to real pixel
    statistics; the fake and real features must differ (proving pixels,
    not payload bytes, drive the vector)."""
    from etl_rust_spark.operators import multimodal

    a1, a2 = _img(seed=1), _img(seed=2)
    rows = [
        (1, "image", bytearray(mc.encode_png(a1)), ("image/png", 10, 12, None, "u1")),
        (2, "image", bytearray(mc.encode_png(a2)), ("image/png", 10, 12, None, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = {r["asset_id"]: r for r in multimodal.extract_features(df, decode_stub=False).collect()}
    assert got[1]["feature"] == [pytest.approx(v) for v in mc.image_feature(a1, 8)]
    assert got[2]["feature"] == [pytest.approx(v) for v in mc.image_feature(a2, 8)]
    fake = {r["asset_id"]: r for r in multimodal.extract_features(df, decode_stub=True).collect()}
    assert fake[1]["feature"] != got[1]["feature"]


def _tone(freq=440.0, rate=8000, n=4000, seed=None):
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    if seed is not None:
        x = x + np.random.default_rng(seed).normal(0, 0.05, n)
    return np.clip(x, -1, 1)


def test_wav_roundtrip_mono_stereo():
    for shape in [(500,), (500, 2)]:
        rng = np.random.default_rng(11)
        s = rng.uniform(-0.9, 0.9, size=shape)
        dec, rate = mc.decode_wav(mc.encode_wav(s, 16000))
        assert rate == 16000 and dec.shape == (500, shape[1] if len(shape) == 2 else 1)
        # encode scales by 32767, decode by 32768 — bound is ~2 LSB
        assert np.max(np.abs(dec.reshape(-1) - np.asarray(s).reshape(-1))) < 2 / 32768


def test_wav_float_and_8bit_variants():
    import struct

    s = _tone(seed=5)
    f32 = s.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(f32)) + f32)
    dec, rate = mc.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 44100 and np.allclose(dec[:, 0], s, atol=1e-6)
    pcm8 = (np.clip(np.round(s * 127) + 128, 0, 255)).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm8)) + pcm8)
    dec8, rate8 = mc.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate8 == 8000 and np.max(np.abs(dec8[:, 0] - s)) < 2 / 128


def test_audio_feature_range_and_determinism():
    s = _tone(seed=1)
    f = mc.audio_feature(s, 8000, dim=8)
    assert len(f) == 8 and all(0.0 <= v <= 1.0 for v in f)
    assert f == mc.audio_feature(s, 8000, dim=8)
    # a pure low tone concentrates spectral energy in the first band
    low = mc.audio_feature(_tone(freq=50.0), 8000)
    assert low[2] == max(low[2:])
    assert mc.audio_feature(np.array([]), 8000) == [0.0] * 8


def test_avi_roundtrip_and_frame_cap():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8) for _ in range(5)]
    avi = mc.encode_avi(frames, fps=10)
    out = mc.decode_avi(avi)
    assert len(out) == 5
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)
    assert len(mc.decode_avi(avi, max_frames=2)) == 2
    # odd width exercises the 4-byte DIB row padding
    odd = [rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8) for _ in range(2)]
    for a, b in zip(odd, mc.decode_avi(mc.encode_avi(odd))):
        np.testing.assert_array_equal(a, b)


def test_video_feature_matches_frame_mean():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(3)]
    vf = mc.video_feature(frames, dim=8)
    want = np.array([mc.image_feature(f, 8) for f in frames]).mean(axis=0)
    assert vf == [round(float(v), 6) for v in want]
    assert mc.video_feature([], 8) == [0.0] * 8


def test_audio_video_registry_rejects_unknown():
    # fLaC is a REGISTERED magic since r7 — a truncated FLAC fails
    # inside its decoder with a descriptive error, not registry miss
    with pytest.raises(ValueError, match="truncated FLAC"):
        mc.decode_audio(b"fLaC....")
    with pytest.raises(ValueError, match="no audio decoder"):
        mc.decode_audio(b"OggS....")
    with pytest.raises(ValueError, match="no video decoder"):
        mc.decode_video(b"\x00\x00\x00\x18ftypmp42")
    # a WAV payload routed to the video registry fails loudly inside
    # decode_avi (shared RIFF magic, wrong form type)
    with pytest.raises(ValueError, match="not an AVI"):
        mc.decode_video(mc.encode_wav(_tone(), 8000))


def test_extract_features_real_decode_audio_video(spark):
    """decode_stub=False decodes ALL modalities in-container now: WAV
    audio and raw-frame AVI video produce real content features through
    the same Arrow path as images."""
    from etl_rust_spark.operators import multimodal

    s = _tone(seed=2)
    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(4)]
    rows = [
        (1, "audio", bytearray(mc.encode_wav(s, 8000)), ("audio/wav", None, None, 500, "u1")),
        (2, "video", bytearray(mc.encode_avi(frames)), ("video/avi", 8, 8, 160, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = {r["asset_id"]: r for r in multimodal.extract_features(df, decode_stub=False).collect()}
    dec, rate = mc.decode_wav(mc.encode_wav(s, 8000))
    assert got[1]["feature"] == [pytest.approx(v) for v in mc.audio_feature(dec, rate, 8)]
    assert got[2]["feature"] == [pytest.approx(v) for v in mc.video_feature(frames, 8)]


def test_resample_audio_real_decode(spark):
    """decode_stub=False: WAV payload is decoded, linearly resampled to
    the target rate, and re-encoded; duration is preserved and non-audio
    rows pass through untouched."""
    from etl_rust_spark.operators import multimodal

    s = _tone(freq=200.0, rate=16000, n=8000, seed=7)  # 0.5 s
    rows = [
        (1, "audio", bytearray(mc.encode_wav(s, 16000)), ("audio/wav", None, None, 500, "u1")),
        (2, "image", bytearray(b"\x89PNGfake"), ("image/png", 4, 4, None, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    out = {r["asset_id"]: r for r in multimodal.resample_audio(df, 8000, decode_stub=False).collect()}
    dec, rate = mc.decode_wav(bytes(out[1]["payload"]))
    assert rate == 8000
    assert dec.shape[0] == pytest.approx(4000, abs=1)  # duration preserved
    # downsampled tone still matches the original at shared instants
    assert np.max(np.abs(dec[:100, 0] - s[:200:2][:100])) < 0.01
    assert bytes(out[2]["payload"]) == b"\x89PNGfake"  # untouched passthrough
    # stub path: deterministic fake, schema preserved
    stub = multimodal.resample_audio(df, 8000).collect()
    assert {r["asset_id"] for r in stub} == {1, 2}
    assert multimodal.resample_audio(df, 8000).schema == df.schema


def test_frame_features_real_decode(spark):
    """frame_features fans a video asset out to one row per sampled
    frame with real per-frame pixel features — payload never leaves the
    decode task."""
    from etl_rust_spark.operators import multimodal

    rng = np.random.default_rng(8)
    frames = [rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8) for _ in range(6)]
    rows = [
        (1, "video", bytearray(mc.encode_avi(frames)), ("video/avi", 4, 6, 240, "u1")),
        (2, "audio", bytearray(mc.encode_wav(_tone(), 8000)), ("audio/wav", None, None, 500, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = multimodal.frame_features(df, every_n=2).collect()
    assert [(r["asset_id"], r["frame_idx"]) for r in sorted(got, key=lambda r: r["frame_idx"])] == [
        (1, 0), (1, 2), (1, 4)
    ]
    byidx = {r["frame_idx"]: r["feature"] for r in got}
    for i in (0, 2, 4):
        assert byidx[i] == [pytest.approx(v) for v in mc.image_feature(frames[i], 8)]
    assert "payload" not in multimodal.frame_features(df).columns


def test_resize_images_real_decode(spark):
    """decode_stub=False: payload is decoded, nearest-resized, and
    re-encoded PNG with updated meta dims; non-image rows pass through."""
    from etl_rust_spark.operators import multimodal

    a = _img(h=12, w=10)
    rows = [
        (1, "image", bytearray(mc.encode_png(a)), ("image/png", 10, 12, None, "u1")),
        (2, "audio", bytearray(b"RIFF1234"), ("audio/wav", None, None, 500, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    out = {r["asset_id"]: r for r in multimodal.resize_images(df, 5, 6, decode_stub=False).collect()}
    dec = mc.decode_png(bytes(out[1]["payload"]))
    np.testing.assert_array_equal(dec, mc.resize_nearest(a, 5, 6))
    assert out[1]["meta"]["width"] == 5 and out[1]["meta"]["height"] == 6
    assert bytes(out[2]["payload"]) == b"RIFF1234"  # untouched passthrough


def test_dhash_properties():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    h = mc.dhash(img)
    assert h == mc.dhash(img)
    # uniform brightness scaling preserves every gradient sign -> identical hash
    brighter = np.clip(img.astype(np.float64) * 1.2, 0, 255).astype(np.uint8)
    assert mc.dhash(brighter) == h
    # a strictly increasing horizontal gradient sets every bit -> folds to -1
    grad = np.tile(np.arange(18, dtype=np.uint8) * 10, (16, 1))
    assert mc.dhash(grad) == -1
    # decreasing gradient clears every bit
    assert mc.dhash(grad[:, ::-1]) == 0


def test_near_dup_images_banded_join(spark):
    """Banded Hamming join finds the perceptual near-dup pair (real
    decode), skips the unrelated image, and never moves payload bytes
    through the join."""
    from etl_rust_spark.operators import multimodal

    rng = np.random.default_rng(10)
    base = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.float64) * 1.15, 0, 255).astype(np.uint8)
    other = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(mc.encode_png(base)), ("image/png", 16, 16, None, "u1")),
        (2, "image", bytearray(mc.encode_png(bright)), ("image/png", 16, 16, None, "u2")),
        (3, "image", bytearray(mc.encode_png(other)), ("image/png", 16, 16, None, "u3")),
        (4, "audio", bytearray(b"RIFFxxxx"), ("audio/wav", None, None, 9, "u4")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = multimodal.near_dup_images(df, max_hamming=4, decode_stub=False).collect()
    assert [(r["aid"], r["bid"], r["hamming"]) for r in got] == [(1, 2, 0)]
    # hamming agrees with a python popcount over the same signatures
    sigs = {r["asset_id"]: r["dhash"] for r in
            multimodal.image_signatures(df, decode_stub=False).collect()}
    assert bin((sigs[1] ^ sigs[2]) & (2**64 - 1)).count("1") == 0
    assert bin((sigs[1] ^ sigs[3]) & (2**64 - 1)).count("1") > 4
    # stub plumbing: deterministic, image rows only
    stub = multimodal.image_signatures(df).collect()
    assert {r["asset_id"] for r in stub} == {1, 2, 3}
    assert stub == multimodal.image_signatures(df).collect()


def test_near_dup_images_validates_banding():
    import pytest as _pytest

    from etl_rust_spark.operators import multimodal

    with _pytest.raises(ValueError, match="pigeonhole"):
        multimodal.near_dup_images(None, max_hamming=8, bands=8)
    with _pytest.raises(ValueError, match="divide"):
        multimodal.near_dup_images(None, bands=7)


def test_audio_fingerprint_amplitude_invariance():
    s = _tone(freq=330.0, seed=12)
    fp = mc.audio_fingerprint(s, 8000)
    assert fp == mc.audio_fingerprint(s, 8000)
    # positive gain scales every band energy equally -> identical bits
    assert mc.audio_fingerprint(s * 0.3, 8000) == fp
    assert mc.audio_fingerprint(s * 1.7, 8000) == fp
    # different content diverges
    other = _tone(freq=1900.0, seed=13)
    ham = bin((fp ^ mc.audio_fingerprint(other, 8000)) & (2**64 - 1)).count("1")
    assert ham > 8
    with pytest.raises(ValueError, match="64 bits"):
        mc.audio_fingerprint(s, 8000, nbits=32)


def test_near_dup_audio_banded_join(spark):
    """Amplitude-scaled copy pairs at Hamming 0 through the real decode
    path; unrelated audio stays unpaired; non-audio rows are ignored."""
    from etl_rust_spark.operators import multimodal

    s = _tone(freq=330.0, seed=14)
    rows = [
        (1, "audio", bytearray(mc.encode_wav(s, 8000)), ("audio/wav", None, None, 500, "u1")),
        (2, "audio", bytearray(mc.encode_wav(s * 0.5, 8000)), ("audio/wav", None, None, 500, "u2")),
        (3, "audio", bytearray(mc.encode_wav(_tone(freq=1900.0, seed=15), 8000)),
         ("audio/wav", None, None, 500, "u3")),
        (4, "image", bytearray(b"\x89PNGfake"), ("image/png", 4, 4, None, "u4")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = multimodal.near_dup_audio(df, max_hamming=4, decode_stub=False).collect()
    assert [(r["aid"], r["bid"]) for r in got] == [(1, 2)]
    assert got[0]["hamming"] <= 2  # 16-bit quantization can flip a near-tie bit


def test_near_dup_videos_frame_level(spark):
    """Two videos sharing brightness-scaled frames pair (alignment-free,
    gain-invariant through dHash); an unrelated video stays unpaired;
    min_matching_frames filters single-frame coincidences."""
    from etl_rust_spark.operators import multimodal

    rng = np.random.default_rng(20)
    shared = [rng.integers(0, 200, size=(12, 12, 3), dtype=np.uint8) for _ in range(3)]
    scaled = [np.clip(f.astype(np.float64) * 1.2, 0, 255).astype(np.uint8) for f in shared]
    unrelated = [rng.integers(0, 200, size=(12, 12, 3), dtype=np.uint8) for _ in range(3)]
    rows = [
        (1, "video", bytearray(mc.encode_avi(shared)), ("video/avi", 12, 12, 120, "u1")),
        (2, "video", bytearray(mc.encode_avi(scaled + [unrelated[0]])), ("video/avi", 12, 12, 160, "u2")),
        (3, "video", bytearray(mc.encode_avi(unrelated[1:])), ("video/avi", 12, 12, 80, "u3")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = multimodal.near_dup_videos(df, max_hamming=4, min_matching_frames=2).collect()
    assert [(r["aid"], r["bid"]) for r in got] == [(1, 2)]
    assert got[0]["n_frames"] >= 3 and got[0]["min_hamming"] == 0
    # raising the frame floor above the overlap drops the pair
    assert multimodal.near_dup_videos(df, max_hamming=4, min_matching_frames=9).count() == 0


def test_ima_adpcm_hand_golden_block():
    """Hand-derived nibble walk: pred=0, idx=0 (step=7) through nibbles
    [0,1,2,8, 3,0,0,0]:
      n=0: diff=7>>3=0        -> pred 0, idx -1 -> 0
      n=1: diff=0+ (7>>2)=1   -> pred 1, idx 0
      n=2: diff=0+ (7>>1)=3   -> pred 4, idx 0
      n=8: diff=0, sign       -> pred 4, idx 0
      n=3: diff=0+1+3=4       -> pred 8, idx +(-1) -> 0  (adj[3] = -1)
      n=0 x3: pred stays 8."""
    import struct

    header = struct.pack("<hBB", 0, 0, 0)
    nibs = [0, 1, 2, 8, 3, 0, 0, 0]
    body = bytes(nibs[j] | (nibs[j + 1] << 4) for j in range(0, 8, 2))
    out = mc._decode_ima_adpcm(header + body, 1, len(header + body))
    assert out[:, 0].tolist() == [0, 0, 1, 4, 4, 8, 8, 8, 8]


def test_ima_adpcm_roundtrip_mono_stereo():
    """ADPCM is lossy (4 bits/sample) but on a band-limited tone the
    step-size adaptation tracks within a few percent."""
    for shape in [(2000,), (2000, 2)]:
        s = np.broadcast_to(_tone(n=2000, seed=2).reshape(-1, *([1] * (len(shape) - 1))), shape)
        raw = mc.encode_ima_adpcm(np.asarray(s), 8000, block_frames=505)
        dec, rate = mc.decode_wav(raw)
        n_ch = shape[1] if len(shape) == 2 else 1
        assert rate == 8000 and dec.shape == (2000, n_ch)  # fact trims padding
        err = dec - np.asarray(s).reshape(2000, n_ch)
        rms = float(np.sqrt((err**2).mean()))
        assert rms < 0.03, f"ADPCM rms {rms}"
        # peak bound past the first adaptation window
        assert np.max(np.abs(err[20:])) < 0.12
    # 4:1 compression vs 16-bit PCM (modulo headers)
    pcm = mc.encode_wav(_tone(n=2000), 8000)
    adp = mc.encode_ima_adpcm(_tone(n=2000), 8000)
    assert len(adp) < len(pcm) / 3


def test_ima_adpcm_flows_through_decode_audio_registry():
    raw = mc.encode_ima_adpcm(_tone(n=1000), 8000)
    samples, rate = mc.decode_audio(raw)  # RIFF magic dispatch
    assert rate == 8000 and samples.shape[0] == 1000


def test_ima_adpcm_corrupt_inputs_raise():
    import pytest as _pytest
    import struct

    raw = mc.encode_ima_adpcm(_tone(n=1000), 8000)
    # step index out of range inside a block header
    pos = raw.index(b"data") + 8
    bad = bytearray(raw)
    bad[pos + 2] = 200
    with _pytest.raises(ValueError, match="step index"):
        mc.decode_wav(bytes(bad))
    # data chunk too short for one block
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, 256, 4, 2, 505)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 3) + b"\x00\x00\x00")
    with _pytest.raises(ValueError, match="no complete block"):
        mc.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_bmp_roundtrip_and_variants():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(13, 10, 3), dtype=np.uint8)  # odd stride pad
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    # top-down (negative height) variant, hand-built 32-bit
    import struct

    px = np.concatenate([img[:, :, ::-1], np.zeros((13, 10, 1), np.uint8)], axis=2)
    off = 54
    raw = (b"BM" + struct.pack("<IHHI", off + px.size, 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, 10, -13, 1, 32, 0, px.size, 0, 0, 0, 0)
           + px.tobytes())
    assert np.array_equal(mc.decode_bmp(raw), img)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compression"):
        bad = bytearray(mc.encode_bmp(img))
        struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
        mc.decode_bmp(bytes(bad))
    with _pytest.raises(ValueError, match="truncated BMP pixel"):
        mc.decode_bmp(mc.encode_bmp(img)[:-10])


def test_gif_roundtrip_and_dispatch():
    rng = np.random.default_rng(4)
    # limited palette: quantize to 4 levels/channel then paint
    img = (rng.integers(0, 4, size=(9, 14, 3), dtype=np.uint8) * 85).astype(np.uint8)
    raw = mc.encode_gif(img)
    assert raw[:6] == b"GIF89a"
    assert np.array_equal(mc.decode_gif(raw), img)
    # registry dispatch via magic
    assert np.array_equal(mc.decode_image(raw), img)
    # grayscale ramp exercises >4-bit palette + multi-sub-block streams
    ramp = np.repeat(np.arange(0, 256, 2, dtype=np.uint8), 3).reshape(1, 128, 3)
    big = np.repeat(ramp, 20, axis=0)
    assert np.array_equal(mc.decode_gif(mc.encode_gif(big)), big)


def test_gif_hand_lzw_with_dictionary_growth():
    """A REAL LZW stream (not the clear-per-symbol encoder form):
    hand-packed codes for indices [0,1,0,1,0,1] over a 2-color table —
    code 6 is created mid-stream (entry [0,1]) and then referenced,
    exercising the dictionary-growth path the fixture encoder skips."""
    # min_code=2: clear=4, eoi=5, width starts at 3
    # walk: 0 -> [0]; 1 -> [1] dict+=[0,1]=6 (len 7); 6 -> [0,1]
    #       dict+=[1,0]=7 (len 8 == 2^3 -> WIDTH GROWS to 4);
    #       1 (4-bit) -> [1]; eoi (4-bit)  => output 0 1 0 1 1
    codes = [(4, 3), (0, 3), (1, 3), (6, 3), (1, 4), (5, 4)]
    acc = bits = 0
    data = bytearray()
    for c, wdt in codes:
        acc |= c << bits
        bits += wdt
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)
    assert mc._gif_lzw_decode(bytes(data), 2) == [0, 1, 0, 1, 1]


def test_gif_corrupt_inputs_raise():
    import pytest as _pytest

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    raw = mc.encode_gif(img)
    with _pytest.raises(ValueError, match="GIF"):
        mc.decode_gif(raw[:20])
    with _pytest.raises(ValueError, match="magic"):
        mc.decode_gif(b"GIF00a" + raw[6:])


def test_extract_features_real_decode_bmp_gif(spark):
    """BMP and GIF payloads flow through the registry into the real
    multimodal feature path — same pixels, same features as PNG."""
    from etl_rust_spark.operators import multimodal

    a = (_img(seed=7) // 64 * 64).astype(np.uint8)  # <=256 colors for GIF
    rows = [
        (1, "image", bytearray(mc.encode_png(a)), ("image/png", 10, 12, None, "u1")),
        (2, "image", bytearray(mc.encode_bmp(a)), ("image/bmp", 10, 12, None, "u2")),
        (3, "image", bytearray(mc.encode_gif(a)), ("image/gif", 10, 12, None, "u3")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = {
        r["asset_id"]: r["feature"]
        for r in multimodal.extract_features(df, decode_stub=False).collect()
    }
    assert got[1] == got[2] == got[3]  # identical pixels through 3 codecs


def test_animated_gif_decodes_as_video_frames():
    rng = np.random.default_rng(6)
    frames = [
        (rng.integers(0, 3, size=(8, 11, 3), dtype=np.uint8) * 100).astype(np.uint8)
        for _ in range(4)
    ]
    raw = mc.encode_gif_animated(frames)
    out = mc.decode_gif_frames(raw)
    assert len(out) == 4
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)
    assert len(mc.decode_gif_frames(raw, max_frames=2)) == 2
    # video registry dispatch: GIF magic -> frame list
    via_registry = mc.decode_video(raw)
    assert len(via_registry) == 4
    np.testing.assert_array_equal(via_registry[-1], frames[-1])
    # the still-image view stays frame 1
    np.testing.assert_array_equal(mc.decode_gif(raw), frames[0])


def test_gif_partial_frame_composites_on_canvas():
    """A second descriptor smaller than the screen draws over the prior
    canvas at its offset (the draw-over composite contract)."""
    import struct

    base = np.full((6, 6, 3), 200, dtype=np.uint8)
    raw = bytearray(mc.encode_gif(base))
    # append a 2x2 black patch at (1, 1): palette idx of 0 not known ->
    # use a local color table on the patch descriptor
    patch_ct = bytes([0, 0, 0] * 2)  # 2-entry table, idx 0 = black
    min_code = 2
    clear, eoi, width = 4, 5, 3
    acc = bits = 0
    stream = bytearray()
    for v in [0, 0, 0, 0]:
        for code in (clear, v):
            acc |= code << bits
            bits += width
            while bits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
    acc |= eoi << bits
    bits += width
    while bits > 0:
        stream.append(acc & 0xFF)
        acc >>= 8
        bits -= 8
    desc = (b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80)  # local CT, 2 colors
            + patch_ct + bytes([min_code, len(stream)]) + bytes(stream) + b"\x00")
    assert raw[-1:] == b"\x3b"
    patched = bytes(raw[:-1]) + desc + b"\x3b"
    frames = mc.decode_gif_frames(patched)
    assert len(frames) == 2
    want = base.copy()
    want[1:3, 1:3] = 0
    np.testing.assert_array_equal(frames[1], want)


def test_tiff_roundtrip_gray_rgb_packbits():
    rng = np.random.default_rng(8)
    gray = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(6, 11, 3), dtype=np.uint8)
    runs = np.repeat(np.arange(5, dtype=np.uint8) * 50, 40).reshape(10, 20)
    for img in (gray, rgb):
        np.testing.assert_array_equal(mc.decode_tiff(mc.encode_tiff(img)), img)
    # PackBits actually compresses the runs fixture and round-trips
    packed = mc.encode_tiff(runs, packbits=True)
    assert len(packed) < runs.size  # RLE won
    np.testing.assert_array_equal(mc.decode_tiff(packed), runs)
    np.testing.assert_array_equal(
        mc.decode_tiff(mc.encode_tiff(rgb, packbits=True)), rgb
    )
    # registry dispatch
    np.testing.assert_array_equal(mc.decode_image(mc.encode_tiff(rgb)), rgb)


def test_tiff_big_endian_and_unsupported():
    import pytest as _pytest
    import struct

    # hand-build a 2x2 gray MM (big-endian) file
    px = bytes([10, 20, 30, 40])
    ntags = 7
    strip_off = 8 + 2 + 12 * ntags + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8) + struct.pack(">H", ntags))
    for tag, typ, cnt, val in [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, strip_off), (279, 4, 1, 4),
    ]:
        out += struct.pack(">HHI", tag, typ, cnt)
        out += struct.pack(">HH", val, 0) if typ == 3 else struct.pack(">I", val)
    out += struct.pack(">I", 0) + px
    np.testing.assert_array_equal(
        mc.decode_tiff(bytes(out)), np.array([[10, 20], [30, 40]], dtype=np.uint8)
    )
    with _pytest.raises(ValueError, match="compression"):
        bad = mc.encode_tiff(np.zeros((2, 2), np.uint8))
        # patch compression tag (259) value to LZW (5)
        idx = bad.index(struct.pack("<HHI", 259, 3, 1))
        mc.decode_tiff(bad[: idx + 8] + struct.pack("<HH", 5, 0) + bad[idx + 12 :])
    with _pytest.raises(ValueError, match="magic"):
        mc.decode_tiff(b"XX*\x00" + bytes(10))


def test_g711_roundtrip_and_registry():
    s = _tone(n=1500)
    for law, code in (("u", 7), ("a", 6)):
        raw = mc.encode_g711_wav(s, 8000, law=law)
        dec, rate = mc.decode_wav(raw)
        assert rate == 8000 and dec.shape == (1500, 1)
        # G.711 is ~13-bit effective near full scale; log companding
        # keeps relative error small — standard fidelity bound
        err = np.max(np.abs(dec[:, 0] - s))
        assert err < 0.02, f"{law}-law err {err}"
        samples, r2 = mc.decode_audio(raw)  # RIFF registry dispatch
        assert r2 == 8000 and samples.shape[0] == 1500
    # stereo keeps channel interleave
    st = np.stack([s, -s], axis=1)
    dec2, _ = mc.decode_wav(mc.encode_g711_wav(st, 8000, law="u"))
    assert dec2.shape == (1500, 2)
    assert np.max(np.abs(dec2[:, 1] + dec2[:, 0])) < 0.02


# ---------------------------------------------------------------------------
# Full static PNG surface (r8): palette / sub-byte depths / 16-bit /
# Adam7 / tRNS — fixtures hand-built chunk by chunk (the GIF/JPEG
# precedent), expected pixels derived independently of the decoder.
# ---------------------------------------------------------------------------

def _png_chunk(t: bytes, b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))


def _png_file(w, h, depth, ctype, idat_raw, plte=None, trns=None, interlace=0):
    out = bytearray(mc.PNG_MAGIC)
    out += _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    out += _png_chunk(b"IDAT", zlib.compress(idat_raw))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


_PLTE = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])


def test_png_palette_and_trns():
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    out = mc.decode_png(_png_file(2, 2, 8, 3, raw, plte=_PLTE))
    assert out.shape == (2, 2, 3) and tuple(out[1, 0]) == (70, 80, 90)
    # 4-bit indices, odd width (pad bits in the last byte), tRNS alpha
    rows = [b"\x00" + bytes([(0 << 4) | 1, 2 << 4]),
            b"\x00" + bytes([(2 << 4) | 2, 0 << 4])]
    out = mc.decode_png(_png_file(
        3, 2, 4, 3, b"".join(rows), plte=_PLTE, trns=bytes([255, 128, 0])
    ))
    assert out.shape == (2, 3, 4)
    assert tuple(out[0, 1]) == (40, 50, 60, 128)   # entry 1, alpha 128
    assert out[0, 2, 3] == 0                        # entry 2, transparent
    # palette index beyond PLTE is corrupt, not a crash
    bad = b"\x00" + bytes([9, 0])
    with pytest.raises(ValueError, match="palette"):
        mc.decode_png(_png_file(2, 1, 8, 3, bad, plte=_PLTE))


def test_png_sub_byte_gray_depths():
    # 1-bit: 9 px/row → 2 bytes with 7 pad bits
    bits = [1, 0, 1, 1, 0, 1, 0, 0, 1]
    v = 0
    for i, b in enumerate(bits):
        v |= b << (15 - i)
    raw = b"\x00" + struct.pack(">H", v) + b"\x00" + struct.pack(">H", 0)
    out = mc.decode_png(_png_file(9, 2, 1, 0, raw))
    assert out.shape == (2, 9, 1)
    assert [p // 255 for p in out[0, :, 0].tolist()] == bits
    # 2-bit scales by 85, 4-bit by 17
    raw2 = b"\x00" + bytes([(3 << 6) | (1 << 4) | (2 << 2)])
    assert mc.decode_png(_png_file(3, 1, 2, 0, raw2))[0, :, 0].tolist() == [255, 85, 170]
    raw4 = b"\x00" + bytes([(15 << 4) | 3])
    assert mc.decode_png(_png_file(2, 1, 4, 0, raw4))[0, :, 0].tolist() == [255, 51]


def test_png_16bit_high_byte_and_filter_distance():
    """16-bit samples downscale to the high byte, and the Sub filter
    works at the 6-byte pixel distance (a wrong bpp shows instantly)."""
    px0 = struct.pack(">HHH", 0x1234, 0x0001, 0xFF00)
    raw = b"\x01" + px0 + bytes([1, 2, 3, 4, 5, 6])
    out = mc.decode_png(_png_file(2, 1, 16, 2, raw))
    assert tuple(out[0, 0]) == (0x12, 0x00, 0xFF)
    assert tuple(out[0, 1]) == (0x13, 0x03, 0x04)  # byte-wise +deltas, high bytes


_A7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
       (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _interlaced_idat(src: np.ndarray) -> bytes:
    """Test-side Adam7 pass extraction (independent re-derivation of
    the spec's pass geometry — differential against the decoder's)."""
    raw = bytearray()
    for x0, y0, dx, dy in _A7:
        sub = src[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in sub:
            raw += b"\x00" + r.tobytes()
    return bytes(raw)


def test_png_adam7_interlace():
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (5, 3), (1, 1), (16, 9), (2, 10)]:
        src = rng.integers(0, 256, shape, dtype=np.uint8)
        data = _png_file(shape[1], shape[0], 8, 0, _interlaced_idat(src), interlace=1)
        assert np.array_equal(mc.decode_png(data)[:, :, 0], src), shape
    # interlaced RGB too
    src = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _A7:
        sub = src[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in sub:
            raw += b"\x00" + r.tobytes()
    data = _png_file(7, 6, 8, 2, bytes(raw), interlace=1)
    assert np.array_equal(mc.decode_png(data), src)


def test_png_color_key_transparency():
    g = np.array([[5, 9], [9, 1]], np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in g)
    out = mc.decode_png(_png_file(2, 2, 8, 0, raw, trns=struct.pack(">H", 9)))
    assert out.shape == (2, 2, 2)
    assert out[0, 1, 1] == 0 and out[1, 0, 1] == 0 and out[0, 0, 1] == 255
    # RGB key
    px = np.array([[[1, 2, 3], [9, 9, 9]]], np.uint8)
    raw = b"\x00" + px.tobytes()
    out = mc.decode_png(_png_file(2, 1, 8, 2, raw, trns=struct.pack(">HHH", 9, 9, 9)))
    assert out.shape == (1, 2, 4) and out[0, 1, 3] == 0 and out[0, 0, 3] == 255


def test_png_new_surface_bitflip_fuzz():
    """The unified corrupt-input contract over the r8 PNG surface:
    palette, interlaced, and 16-bit payloads under bit flips."""
    import random

    rng = np.random.default_rng(12)
    src = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    payloads = [
        _png_file(2, 2, 8, 3, b"\x00\x00\x01\x00\x02\x00", plte=_PLTE,
                  trns=bytes([200])),
        _png_file(5, 6, 8, 0, _interlaced_idat(src), interlace=1),
        _png_file(2, 1, 16, 2,
                  b"\x00" + struct.pack(">HHHHHH", 1, 2, 3, 4, 5, 6)),
    ]
    rnd = random.Random(9)
    for payload in payloads:
        for _ in range(400):
            buf = bytearray(payload)
            buf[rnd.randrange(len(buf))] ^= rnd.randrange(1, 256)
            try:
                mc.decode_png(bytes(buf))
            except ValueError:
                pass


def test_gif_gce_transparency_composites_through():
    """A GCE-transparent index leaves the underlying canvas visible in
    decode_gif_frames (r8).  Hand-built: 2×1 canvas, frame 1 paints
    [red, blue], frame 2 paints [green, T] where T is the transparent
    index — pixel 2 must still be blue."""
    pal = bytes([200, 0, 0,  0, 0, 200,  0, 200, 0,  9, 9, 9])  # r b g T
    def lzw(indices, min_code=2):
        # clear-per-symbol form (matches the in-repo encoders)
        clear, eoi, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
        acc = bits = 0
        out = bytearray()
        def emit(c):
            nonlocal acc, bits
            acc |= c << bits
            bits += width
            while bits >= 8:
                out.append(acc & 0xFF); acc >>= 8; bits -= 8
        emit(clear)
        for i in indices:
            emit(i); emit(clear)
        emit(eoi)
        if bits:
            out.append(acc & 0xFF)
        return bytes(out)
    def img_desc(indices):
        body = lzw(indices)
        return (b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
                + bytes([2]) + bytes([len(body)]) + body + b"\x00")
    gce_t = b"\x21\xf9\x04" + bytes([0x01, 0, 0, 3]) + b"\x00"  # transparent idx 3
    data = (b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0) + pal
            + img_desc([0, 1])           # no GCE: opaque
            + gce_t + img_desc([2, 3])   # idx 3 transparent
            + b"\x3b")
    frames = mc.decode_gif_frames(data)
    assert len(frames) == 2
    assert tuple(frames[0][0, 0]) == (200, 0, 0) and tuple(frames[0][0, 1]) == (0, 0, 200)
    assert tuple(frames[1][0, 0]) == (0, 200, 0)   # painted green
    assert tuple(frames[1][0, 1]) == (0, 0, 200)   # transparent → blue shows
    # the still decoder is unaffected (frame 1, raw colors)
    assert tuple(mc.decode_gif(data)[0, 1]) == (0, 0, 200)


# ---------------------------------------------------------------------------
# APNG (r8): acTL/fcTL/fdAT animation over the full static decoder —
# containers hand-built chunk by chunk.
# ---------------------------------------------------------------------------

def _apng_idat_raw(img: np.ndarray) -> bytes:
    return zlib.compress(b"".join(b"\x00" + r.tobytes() for r in img))


def _fctl(seq, w, h, x, y, dispose=0, blend=0):
    return _png_chunk(
        b"fcTL", struct.pack(">IIIIIHHBB", seq, w, h, x, y, 1, 10, dispose, blend)
    )


def _apng(frames_spec, w, h, ctype=2):
    """frames_spec: list of (img, x, y, dispose, blend); the first
    frame rides the default IDAT (fcTL before IDAT), the rest fdAT."""
    out = bytearray(mc.PNG_MAGIC)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames_spec), 0))
    seq = 0
    for i, (img, x, y, dispose, blend) in enumerate(frames_spec):
        out += _fctl(seq, img.shape[1], img.shape[0], x, y, dispose, blend)
        seq += 1
        if i == 0:
            out += _png_chunk(b"IDAT", _apng_idat_raw(img))
        else:
            out += _png_chunk(
                b"fdAT", struct.pack(">I", seq) + _apng_idat_raw(img)
            )
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def test_apng_frames_composite_and_still_contract():
    rng = np.random.default_rng(8)
    f1 = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    f2 = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    data = _apng([(f1, 0, 0, 0, 0), (f2, 2, 1, 0, 0)], 6, 4)
    frames = mc.decode_apng_frames(data)
    assert len(frames) == 2 and frames[0].shape == (4, 6, 3)
    assert np.array_equal(frames[0], f1)
    want = f1.copy()
    want[1:3, 2:4] = f2
    assert np.array_equal(frames[1], want)
    # the STILL decoder ignores animation chunks → the default image
    assert np.array_equal(mc.decode_png(data), f1)
    # the video registry routes PNG here; a still PNG is one frame
    assert len(mc.decode_video(data)) == 2
    assert len(mc.decode_video(mc.encode_png(f1))) == 1


def test_apng_dispose_and_blend_ops():
    base = np.full((2, 2, 3), 50, np.uint8)
    patch = np.full((1, 1, 3), 250, np.uint8)
    third = np.full((1, 1, 3), 7, np.uint8)
    # dispose=1 (background): the patch region clears to transparent
    # black after frame 2, so frame 3's canvas shows black there
    data = _apng(
        [(base, 0, 0, 0, 0), (patch, 1, 1, 1, 0), (third, 0, 0, 0, 0)], 2, 2
    )
    frames = mc.decode_apng_frames(data)
    assert tuple(frames[1][1, 1]) == (250, 250, 250)
    assert tuple(frames[2][1, 1]) == (0, 0, 0)      # disposed to background
    assert tuple(frames[2][0, 0]) == (7, 7, 7)
    # dispose=2 (previous): region reverts to the pre-frame content
    data = _apng(
        [(base, 0, 0, 0, 0), (patch, 1, 1, 2, 0), (third, 0, 0, 0, 0)], 2, 2
    )
    frames = mc.decode_apng_frames(data)
    assert tuple(frames[1][1, 1]) == (250, 250, 250)
    assert tuple(frames[2][1, 1]) == (50, 50, 50)   # reverted
    # blend=1 (over) with RGBA frames: half-transparent white over black
    black = np.zeros((1, 1, 4), np.uint8); black[:, :, 3] = 255
    overlay = np.full((1, 1, 4), 255, np.uint8); overlay[:, :, 3] = 128
    data = _apng([(black, 0, 0, 0, 0), (overlay, 0, 0, 0, 1)], 1, 1, ctype=6)
    frames = mc.decode_apng_frames(data)
    assert abs(int(frames[1][0, 0, 0]) - 128) <= 1


def test_apng_corrupt_and_fuzz():
    rng = np.random.default_rng(10)
    f1 = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    good = _apng([(f1, 0, 0, 0, 0)], 3, 3)
    # frame rect outside canvas
    bad = _apng([(f1, 0, 0, 0, 0), (f1, 1, 1, 0, 0)], 3, 3)
    with pytest.raises(ValueError, match="outside"):
        mc.decode_apng_frames(bad)
    import random

    rnd = random.Random(13)
    for _ in range(400):
        buf = bytearray(good)
        buf[rnd.randrange(len(buf))] ^= rnd.randrange(1, 256)
        try:
            mc.decode_apng_frames(bytes(buf))
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# AIFF / AIFC (r8) — big-endian archival PCM, fixtures hand-built with
# a test-local 80-bit-extended-float packer.
# ---------------------------------------------------------------------------

def _f80(rate: int) -> bytes:
    e = rate.bit_length() - 1
    return struct.pack(">H", 16383 + e) + (rate << (63 - e)).to_bytes(8, "big")


def _aiff(samples16, rate, nch=1, form=b"AIFF", comp=b"", le=False):
    pcm = samples16.astype("<i2" if le else ">i2").tobytes()
    comm = struct.pack(">HIH", nch, len(samples16) // nch, 16) + _f80(rate) + comp
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = form
    for cc, b in [(b"COMM", comm), (b"SSND", ssnd)]:
        body += cc + struct.pack(">I", len(b)) + b + (b"\x00" if len(b) % 2 else b"")
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aiff_decode_and_registry():
    x = (np.sin(np.arange(300) / 7.0) * 20000).astype(np.int16)
    data = _aiff(x, 44100)
    s, r = mc.decode_aiff(data)
    assert r == 44100 and s.shape == (300, 1)
    assert np.allclose(s[:, 0], x / 32768.0)
    # the audio registry dispatches FORM payloads here
    s2, r2 = mc.decode_audio(data)
    assert r2 == 44100 and np.allclose(s2, s)
    # AIFC little-endian ('sowt') decodes; compressed AIFC raises
    d2 = _aiff(x, 8000, form=b"AIFC", comp=b"sowt", le=True)
    s3, r3 = mc.decode_aiff(d2)
    assert r3 == 8000 and np.allclose(s3[:, 0], x / 32768.0)
    with pytest.raises(ValueError, match="ima4"):
        mc.decode_aiff(_aiff(x, 8000, form=b"AIFC", comp=b"ima4"))
    # stereo interleave
    st = np.stack([x, -x], axis=1).reshape(-1)
    s4, _ = mc.decode_aiff(_aiff(st, 8000, nch=2))
    assert s4.shape == (300, 2) and np.allclose(s4[:, 1], -x / 32768.0)


def test_aiff_bitflip_contract():
    import random

    x = (np.sin(np.arange(200) / 5.0) * 1000).astype(np.int16)
    data = _aiff(x, 8000)
    rnd = random.Random(3)
    for _ in range(800):
        buf = bytearray(data)
        buf[rnd.randrange(len(buf))] ^= rnd.randrange(1, 256)
        try:
            mc.decode_aiff(bytes(buf))
        except ValueError:
            pass


def test_au_decode_all_encodings_and_registry():
    """Sun .au (r8): µ-law reuses the pinned G.711 table; linear PCM
    8/16/32-bit big-endian; unknown-size sentinel tolerated."""
    x = (np.sin(np.arange(250) / 6.0) * 24000).astype(np.int16)

    def au(payload, enc, rate=8000, nch=1, size=None):
        return (b".snd" + struct.pack(">IIIII", 24, len(payload) if size is None else size,
                enc, rate, nch) + payload)

    # 16-bit linear
    s, r = mc.decode_au(au(x.astype(">i2").tobytes(), 3))
    assert r == 8000 and np.allclose(s[:, 0], x / 32768.0)
    # registry dispatch
    s2, _ = mc.decode_audio(au(x.astype(">i2").tobytes(), 3))
    assert np.allclose(s2, s)
    # µ-law round-trip: encode through the WAV G.711 encoder's table
    from etl_rust_spark.operators.mediacodec import _g711_encode

    codes = _g711_encode(x / 32768.0, "u")
    s3, _ = mc.decode_au(au(codes, 1))
    # µ-law quantization error bound (~1/128 at full scale)
    assert np.abs(s3[:, 0] - x / 32768.0).max() < 0.04
    # 8-bit linear, stereo, unknown-size sentinel
    pcm8 = (x[:100] >> 8).astype(np.int8).tobytes()
    s4, _ = mc.decode_au(au(pcm8, 2, nch=2, size=0xFFFFFFFF))
    assert s4.shape == (50, 2)
    # unsupported encoding raises
    with pytest.raises(ValueError, match="encoding"):
        mc.decode_au(au(b"\x00" * 8, 27))
    # bit-flip contract
    import random

    good = au(x.astype(">i2").tobytes(), 3)
    rnd = random.Random(7)
    for _ in range(600):
        buf = bytearray(good)
        buf[rnd.randrange(len(buf))] ^= rnd.randrange(1, 256)
        try:
            mc.decode_au(bytes(buf))
        except ValueError:
            pass


def test_png_16bit_trns_color_key_full_depth():
    """ADVICE r8: the tRNS color key on 16-bit images compares the FULL
    16-bit samples — a pixel matching the key's high bytes but not its
    low bytes is opaque, not keyed out."""
    key = (0x1234, 0x0001, 0xFF00)
    exact = struct.pack(">HHH", *key)                 # == key → alpha 0
    high_only = struct.pack(">HHH", 0x1235, 0x0001, 0xFF00)  # low byte off
    raw = b"\x00" + exact + high_only
    out = mc.decode_png(_png_file(
        2, 1, 16, 2, raw, trns=struct.pack(">HHH", *key)
    ))
    assert out.shape == (1, 2, 4) and out.dtype == np.uint8
    assert out[0, 0, 3] == 0      # exact 16-bit match → transparent
    assert out[0, 1, 3] == 255    # high-byte-only match → OPAQUE
    assert tuple(out[0, 1, :3]) == (0x12, 0x00, 0xFF)
    # 16-bit grayscale key too
    graw = b"\x00" + struct.pack(">HH", 0xABCD, 0xAB00)
    gout = mc.decode_png(_png_file(
        2, 1, 16, 0, graw, trns=struct.pack(">H", 0xABCD)
    ))
    assert gout[0, 0, 1] == 0 and gout[0, 1, 1] == 255
