"""Pure-stdlib FLAC codec: lossless round-trips + hand-built frames.

Decode paths the encoder cannot produce (LPC subframes, mid/side
stereo, Rice escape partitions, wasted bits) are pinned by frames BUILT
BY HAND from the spec in this file — a symmetric encode/decode bug
cannot satisfy them.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_rust_spark.operators import mediacodec as mc
from etl_rust_spark.operators.flaccodec import (
    FLAC_MAGIC,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _tone(freq=440.0, rate=8000, n=4000):
    t = np.arange(n) / rate
    return 0.5 * np.sin(2 * np.pi * freq * t)


def _q16(x):
    return np.clip(np.round(np.asarray(x) * 32767.0), -32768, 32767)


def test_roundtrip_mono_lossless_and_compressed():
    x = _tone()
    data = encode_flac(x, 8000)
    assert data.startswith(FLAC_MAGIC)
    out, rate = decode_flac(data)
    assert rate == 8000 and out.shape == (4000, 1)
    assert np.array_equal(_q16(x), np.round(out[:, 0] * 32768))
    # a tone is highly predictable: FLAC must actually compress it
    assert len(data) < 4000 * 2 * 0.9


def test_roundtrip_stereo_multiframe_and_constant():
    x = _tone(n=5000)
    st = np.stack([x, np.full(5000, 0.25)], axis=1)  # ch1 is CONSTANT
    data = encode_flac(st, 44100, block_size=1024)  # 5 frames, last short
    out, rate = decode_flac(data)
    assert rate == 44100 and out.shape == (5000, 2)
    assert np.array_equal(_q16(st), np.round(out * 32768))


def test_roundtrip_noise_and_md5_detects_corruption():
    rng = np.random.default_rng(7)
    x = np.clip(rng.normal(0, 0.3, 3000), -1, 1)
    data = bytearray(encode_flac(x, 16000, block_size=512))
    out, _ = decode_flac(bytes(data))
    assert np.array_equal(_q16(x), np.round(out[:, 0] * 32768))
    # flip one bit inside a frame body: either a CRC or the stream MD5
    # must catch it (never a silent wrong decode)
    data[len(data) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC|MD5"):
        decode_flac(bytes(data))


def _hand_stream(frame_body: bytes, n_ch: int, n_samples: int, bps: int = 16) -> bytes:
    """Wrap one hand-built frame (sans CRC16) in a minimal stream with
    a zeroed MD5 (hand vectors skip stream verification)."""
    si = _BitWriter()
    si.write(4096, 16), si.write(4096, 16)
    si.write(0, 24), si.write(0, 24)
    si.write(8000, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_samples, 36)
    si.align()
    streaminfo = si.bytes() + b"\x00" * 16
    head = FLAC_MAGIC + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    return head + streaminfo + frame_body + struct.pack(">H", _crc16(frame_body))


def _frame_header(bw: _BitWriter, n_samples: int, ch_code: int) -> None:
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)  # reserved + fixed blocking
    bw.write(7, 4)  # 16-bit block size at end
    bw.write(0, 4)  # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(4, 3)  # 16 bps
    bw.write(0, 1)
    for b in _utf8_number(0):
        bw.write(b, 8)
    bw.write(n_samples - 1, 16)
    bw.align()
    hdr = bw.bytes()
    bw.write(_crc8(hdr), 8)


def test_hand_built_lpc_subframe():
    """LPC order 2, coefs [2, -1] (precision 4, shift 0) over warmup
    [100, 103] with residuals [1, -2, 3]: s[i] = r + 2·s[i-1] − s[i-2]
    → 100, 103, 107, 109, 114."""
    bw = _BitWriter()
    _frame_header(bw, 5, ch_code=0)
    bw.write(0, 1)
    bw.write(0b100001, 6)  # LPC, order 2
    bw.write(0, 1)  # no wasted bits
    bw.write(100, 16)
    bw.write(103, 16)
    bw.write(3, 4)   # precision - 1 = 3 -> 4-bit coefs
    bw.write(0, 5)   # shift 0
    bw.write(2, 4)   # coef c0 = 2  (applies to s[i-1])
    bw.write(-1, 4)  # coef c1 = -1 (applies to s[i-2])
    bw.write(0, 2)   # residual method 0
    bw.write(0, 4)   # partition order 0
    bw.write(0, 4)   # rice param 0
    for r in (1, -2, 3):
        zz = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        bw.write_unary(zz)
    bw.align()
    out, rate = decode_flac(_hand_stream(bw.bytes(), 1, 5))
    got = np.round(out[:, 0] * 32768).astype(int).tolist()
    assert got == [100, 103, 107, 109, 114]


def test_hand_built_mid_side_stereo():
    """Mid/side channel decorrelation: L = [10, 11], R = [4, 7] →
    mid = (L+R)>>1 = [7, 9], side = L−R = [6, 4]; the side subframe
    carries 17 bits.  Decode must reconstruct L/R exactly."""
    bw = _BitWriter()
    _frame_header(bw, 2, ch_code=10)  # mid/side
    for vals, bits in (([7, 9], 16), ([6, 4], 17)):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in vals:
            bw.write(v, bits)
    bw.align()
    out, _ = decode_flac(_hand_stream(bw.bytes(), 2, 2))
    lr = np.round(out * 32768).astype(int)
    assert lr[:, 0].tolist() == [10, 11]
    assert lr[:, 1].tolist() == [4, 7]


def test_hand_built_rice_escape_partition_and_wasted_bits():
    """FIXED order 0 with an ESCAPED residual partition (param 0b1111 →
    5-bit raw width) and a CONSTANT subframe with 2 wasted bits."""
    # frame 1: escape partition, raw 5-bit residuals [3, -4, 7]
    bw = _BitWriter()
    _frame_header(bw, 3, ch_code=0)
    bw.write(0, 1)
    bw.write(8, 6)  # FIXED order 0
    bw.write(0, 1)
    bw.write(0, 2)
    bw.write(0, 4)    # partition order 0
    bw.write(0xF, 4)  # escape
    bw.write(5, 5)    # 5-bit raw residuals
    for v in (3, -4, 7):
        bw.write(v, 5)
    bw.align()
    out, _ = decode_flac(_hand_stream(bw.bytes(), 1, 3))
    assert np.round(out[:, 0] * 32768).astype(int).tolist() == [3, -4, 7]

    # frame 2: CONSTANT 25 with 2 wasted bits -> decoded value 100
    bw = _BitWriter()
    _frame_header(bw, 4, ch_code=0)
    bw.write(0, 1)
    bw.write(0, 6)   # CONSTANT
    bw.write(1, 1)   # wasted-bits flag
    bw.write_unary(1)  # wasted - 1 = 1 -> 2 wasted bits
    bw.write(25, 14)   # bps reduced by wasted
    bw.align()
    out, _ = decode_flac(_hand_stream(bw.bytes(), 1, 4))
    assert np.round(out[:, 0] * 32768).astype(int).tolist() == [100] * 4


def test_rejects_garbage_and_bad_sync():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"not a flac stream")
    data = bytearray(encode_flac(_tone(n=100), 8000))
    # corrupt the first frame's sync byte
    data[4 + 4 + 34] = 0x00
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(data))


def test_registry_dispatches_flac_end_to_end(spark):
    """decode_audio sniffs fLaC; audio features/fingerprints run on
    FLAC payloads through the multimodal pipeline in-container."""
    from etl_rust_spark.operators import multimodal

    x1, x2 = _tone(440), _tone(1310)
    f1, f2 = encode_flac(x1, 8000), encode_flac(x2, 8000)
    s1, r1 = mc.decode_audio(f1)
    assert r1 == 8000 and s1.shape == (4000, 1)

    rows = [
        (1, "audio", bytearray(f1), ("audio/flac", None, None, 4000, "u1")),
        (2, "audio", bytearray(f2), ("audio/flac", None, None, 4000, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = {
        r["asset_id"]: r
        for r in multimodal.extract_features(df, decode_stub=False).collect()
    }
    want = mc.audio_feature(s1, 8000, 8)
    assert got[1]["feature"] == [pytest.approx(v) for v in want]
    assert got[1]["feature"] != got[2]["feature"]
    # fingerprint parity with the WAV encoding of the same signal
    wav_fp = mc.audio_fingerprint(*mc.decode_audio(mc.encode_wav(x1, 8000)))
    flac_fp = mc.audio_fingerprint(s1, 8000)
    assert bin((wav_fp ^ flac_fp) & (2**64 - 1)).count("1") <= 4
