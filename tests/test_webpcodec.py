"""WebP lossless (VP8L) codec tests.

The container has no WebP reference tool, so verification follows the
GIF/LZW precedent with the JPEG hand-golden lesson applied: every
decoder path is pinned by HAND-BUILT bitstreams whose expected pixels
are derived on paper from the spec (bit packing done by a local helper
in this file, independent of the module's _BitWriter), plus
encoder→decoder round-trips and corrupt-input fuzz under the uniform
ValueError contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_rust_spark.operators.webpcodec import (
    _DIST_MAP,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
    register_webp,
)


class _W:
    """Test-local LSB-first bit packer (deliberately separate from the
    module's writer so stream constructions don't inherit its bugs)."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int):  # LSB-first field
        for i in range(n):
            self.bits.append((v >> i) & 1)
        return self

    def code(self, c: int, n: int):  # prefix code, MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((c >> i) & 1)
        return self

    def bytes(self) -> bytes:
        out = bytearray()
        for i, b in enumerate(self.bits):
            if i % 8 == 0:
                out.append(0)
            out[-1] |= b << (i % 8)
        return bytes(out)


def _header(w: _W, width: int, height: int, alpha: int = 0) -> _W:
    w.put(0x2F, 8).put(width - 1, 14).put(height - 1, 14).put(alpha, 1).put(0, 3)
    return w


def _simple1(w: _W, sym: int) -> _W:
    """Single-symbol simple code (zero-bit at decode time)."""
    if sym < 2:
        w.put(1, 1).put(0, 1).put(0, 1).put(sym, 1)
    else:
        w.put(1, 1).put(0, 1).put(1, 1).put(sym, 8)
    return w


def _simple2(w: _W, s0: int, s1: int) -> _W:
    """Two-symbol simple code: s0 → bit 0, s1 → bit 1."""
    w.put(1, 1).put(1, 1).put(1, 1).put(s0, 8).put(s1, 8)
    return w


def _green_two_symbol_cl(w: _W, sym_a: int, sym_b: int, alphabet: int) -> _W:
    """Code-length-coded green code with exactly two length-1 symbols
    (needed when a symbol ≥ 256 — simple codes store only 8 bits).
    CL code used: {1:len1, 17:len2, 18:len2} → canonical 1→0, 17→10,
    18→11."""
    assert 3 <= sym_a < sym_b < alphabet

    def zeros(n: int):
        while n:
            if n < 3:
                raise AssertionError("gap too small for 17/18 runs")
            if n <= 10:
                w.code(0b10, 2).put(n - 3, 3)  # code 17
                return
            step = min(n, 138)
            if n - step in (1, 2):
                step = n - 3
            w.code(0b11, 2).put(step - 11, 7)  # code 18
            n -= step

    w.put(0, 1)  # not simple
    w.put(4 - 4, 4)  # 4 code-length codes: order 17, 18, 0, 1
    for ln in (2, 2, 0, 1):
        w.put(ln, 3)
    w.put(0, 1)  # no max_symbol shortcut
    zeros(sym_a)
    w.code(0b0, 1)  # length 1 for sym_a
    zeros(sym_b - sym_a - 1)
    w.code(0b0, 1)  # length 1 for sym_b
    if alphabet - sym_b - 1:
        zeros(alphabet - sym_b - 1)
    return w


def test_frozen_hand_golden_1x1():
    # Derived bit-by-bit on paper: header 1×1, no transform/cache/meta,
    # simple single-symbol codes g=0x42 r=0x10 b=0x20 a=0xFF, distance
    # sym 0; the single pixel consumes zero bits.
    frame = bytes.fromhex("2f00000000a850210ad2ff00")
    out = decode_vp8l(frame)
    assert out.tolist() == [[[0x10, 0x42, 0x20]]]


def test_hand_built_literals_and_two_symbol_code():
    w = _header(_W(), 2, 1)
    w.put(0, 1).put(0, 1).put(0, 1)  # no transforms, cache, meta
    _simple2(w, 10, 20)  # green
    _simple1(w, 100)  # red
    _simple1(w, 30)  # blue
    _simple1(w, 255)  # alpha
    _simple1(w, 0)  # distance
    w.put(0, 1)  # pixel 0: green sym 10
    w.put(1, 1)  # pixel 1: green sym 20
    out = decode_vp8l(w.bytes())
    assert out.tolist() == [[[100, 10, 30], [100, 20, 30]]]


def test_hand_built_subtract_green():
    w = _header(_W(), 2, 1)
    w.put(1, 1).put(2, 2)  # one transform: subtract-green
    w.put(0, 1)  # end transforms
    w.put(0, 1).put(0, 1)  # no cache, no meta
    _simple2(w, 10, 20)
    _simple1(w, 100)
    _simple1(w, 30)
    _simple1(w, 255)
    _simple1(w, 0)
    w.put(0, 1).put(1, 1)
    out = decode_vp8l(w.bytes())
    # inverse adds green back into red/blue
    assert out.tolist() == [[[110, 10, 40], [120, 20, 50]]]


def test_hand_built_predictor_transform():
    w = _header(_W(), 2, 2)
    w.put(1, 1).put(0, 2)  # predictor transform
    w.put(0, 3)  # size_bits = 2 → one 1×1 block
    # block sub-image: mode 2 (top) in the green channel
    w.put(0, 1)  # no cache (sub-images read the cache bit)
    _simple1(w, 2)  # green = predictor mode
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    w.put(0, 1)  # end transforms
    w.put(0, 1).put(0, 1)  # main image: no cache, no meta
    _simple1(w, 5)  # green residual
    _simple1(w, 7)  # red
    _simple1(w, 9)  # blue
    _simple1(w, 0)  # alpha residual (borders add 0xff via black/L/T)
    _simple1(w, 0)  # distance
    out = decode_vp8l(w.bytes())
    # (0,0) black → (7,5,9); (1,0) += left; (0,1) += top; (1,1) mode
    # top → += (1,0)
    assert out.tolist() == [
        [[7, 5, 9], [14, 10, 18]],
        [[14, 10, 18], [21, 15, 27]],
    ]


def test_hand_built_cross_color():
    w = _header(_W(), 1, 1)
    w.put(1, 1).put(1, 2)  # cross-color transform
    w.put(0, 3)  # size_bits = 2
    w.put(0, 1)  # sub-image: no cache
    _simple1(w, 0)  # green = green_to_blue = 0
    _simple1(w, 0)  # red = red_to_blue = 0
    _simple1(w, 252)  # blue = green_to_red = -4 (int8)
    _simple1(w, 0)  # alpha
    _simple1(w, 0)  # distance
    w.put(0, 1)  # end transforms
    w.put(0, 1).put(0, 1)
    _simple1(w, 64)  # green
    _simple1(w, 10)  # red residual
    _simple1(w, 20)  # blue
    _simple1(w, 255)  # alpha
    _simple1(w, 0)
    out = decode_vp8l(w.bytes())
    # red += (-4 * 64) >> 5 = -8
    assert out.tolist() == [[[2, 64, 20]]]


def test_hand_built_palette_with_bundling():
    # 5×1, 2-colour palette → width_bits 3, packed width 1: the single
    # packed pixel's green byte carries five 1-bit indices 0,1,1,0,1.
    w = _header(_W(), 5, 1)
    w.put(1, 1).put(3, 2)  # color-indexing transform
    w.put(2 - 1, 8)  # palette size 2
    # palette sub-image (2×1), entries delta-coded per channel:
    # c0 = (a255, r1, g2, b3); stored second = c1 - c0 = (0, 4, 4, 4)
    w.put(0, 1)  # no cache
    _simple2(w, 2, 4)  # green
    _simple2(w, 1, 4)  # red
    _simple2(w, 3, 4)  # blue
    _simple2(w, 255, 0)  # alpha
    _simple1(w, 0)  # distance
    w.put(0, 1).put(0, 1).put(0, 1).put(0, 1)  # c0 channels: g,r,b,a
    w.put(1, 1).put(1, 1).put(1, 1).put(1, 1)  # delta channels
    w.put(0, 1)  # end transforms
    w.put(0, 1).put(0, 1)  # main: no cache, no meta
    _simple1(w, 0b10110)  # green byte = packed indices
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    _simple1(w, 0)
    out = decode_vp8l(w.bytes())
    c0, c1 = [1, 2, 3], [5, 6, 7]
    assert out.tolist() == [[c0, c1, c1, c0, c1]]


def test_hand_built_lz77_backreference():
    # 4×1: literal then a length-3 distance-1 copy.  Green needs symbol
    # 258 (length prefix 2 → 3 px), which simple codes cannot store —
    # exercises the code-length path.  Distance sym 1 → prefix value 2
    # → map[1] = (1,0) → distance 1.
    w = _header(_W(), 4, 1)
    w.put(0, 1).put(0, 1).put(0, 1)
    _green_two_symbol_cl(w, 5, 258, 280)
    _simple1(w, 7)
    _simple1(w, 9)
    _simple1(w, 0)
    _simple1(w, 1)  # distance code
    w.code(0b0, 1)  # literal: green sym 5
    w.code(0b1, 1)  # back-reference: green sym 258
    out = decode_vp8l(w.bytes())
    assert out.tolist() == [[[7, 5, 9]] * 4]


def test_hand_built_color_cache():
    # 3×1: literal P, cache hit, literal P again.  Cache index of P is
    # computed with the spec hash (0x1e35a7bd, top cache_bits bits).
    pix = (0 << 24) | (7 << 16) | (5 << 8) | 9
    cache_bits = 1
    idx = ((0x1E35A7BD * pix) & 0xFFFFFFFF) >> (32 - cache_bits)
    w = _header(_W(), 3, 1)
    w.put(0, 1)  # no transforms
    w.put(1, 1).put(cache_bits, 4)  # color cache on
    w.put(0, 1)  # no meta
    alphabet = 256 + 24 + (1 << cache_bits)
    _green_two_symbol_cl(w, 5, 280 + idx, alphabet)
    _simple1(w, 7)
    _simple1(w, 9)
    _simple1(w, 0)
    _simple1(w, 0)
    w.code(0b0, 1)  # literal
    w.code(0b1, 1)  # cache reference
    w.code(0b0, 1)  # literal again
    out = decode_vp8l(w.bytes())
    assert out.tolist() == [[[7, 5, 9]] * 3]


def test_distance_map_matches_spec_listing():
    assert _DIST_MAP[:8] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)
    ]
    assert _DIST_MAP[34:40] == [
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)
    ]
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[117:] == [(-7, 7), (8, 6), (8, 7)]


def test_roundtrip_images():
    rng = np.random.default_rng(5)
    cases = {
        "flat": np.full((7, 5, 3), 200, np.uint8),
        "grad": (np.arange(48 * 64 * 3) % 251).astype(np.uint8).reshape(48, 64, 3),
        "noise": rng.integers(0, 256, (33, 17, 3), dtype=np.uint8),
        "alpha": rng.integers(0, 256, (9, 11, 4), dtype=np.uint8),
        "1x1": np.array([[[16, 66, 32]]], dtype=np.uint8),
        "wide": rng.integers(0, 256, (1, 300, 3), dtype=np.uint8),
    }
    for name, arr in cases.items():
        enc = encode_webp_lossless(arr)
        dec = decode_webp(enc)
        assert dec.shape == arr.shape, name
        assert np.array_equal(dec, arr), name


def test_vp8x_extended_container_walk():
    arr = np.array([[[1, 2, 3]]], dtype=np.uint8)
    enc = encode_webp_lossless(arr)
    vp8l_chunk = enc[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    frame = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(decode_webp(frame), arr)


def test_lossy_vp8_raises_descriptively():
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    frame = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="lossless|VP8L|use_pillow"):
        decode_webp(frame)


def test_registry_dispatch():
    register_webp()
    from etl_rust_spark.operators.mediacodec import decode_image

    arr = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    assert np.array_equal(decode_image(encode_webp_lossless(arr)), arr)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_never_crashes(tail):
    for payload in (tail, b"\x2f" + tail, b"RIFF\x10\x00\x00\x00WEBP" + tail):
        try:
            if payload[:4] == b"RIFF":
                decode_webp(payload)
            else:
                decode_vp8l(payload)
        except ValueError:
            pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_bit_flips_raise_or_decode(data):
    arr = (np.arange(6 * 9 * 3) % 256).astype(np.uint8).reshape(6, 9, 3)
    base = encode_webp_lossless(arr)
    i = data.draw(st.integers(12, len(base) - 1))
    bit = data.draw(st.integers(0, 7))
    mutated = bytearray(base)
    mutated[i] ^= 1 << bit
    try:
        out = decode_webp(bytes(mutated))
        assert isinstance(out, np.ndarray)
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM + ANMF, r8) — containers hand-built per the
# public WebP container spec around the module's own lossless encoder.
# ---------------------------------------------------------------------------

from etl_rust_spark.operators.webpcodec import decode_webp_frames  # noqa: E402


def _u24le(v: int) -> bytes:
    return bytes([v & 255, (v >> 8) & 255, (v >> 16) & 255])


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _anmf(x: int, y: int, frame_rgba, flags: int = 0x02, dur: int = 100) -> bytes:
    inner = encode_webp_lossless(frame_rgba)[12:]  # the VP8L chunk
    h, w = frame_rgba.shape[:2]
    hdr = (_u24le(x // 2) + _u24le(y // 2) + _u24le(w - 1) + _u24le(h - 1)
           + _u24le(dur) + bytes([flags]))
    return _chunk(b"ANMF", hdr + inner)


def _anim_container(cw, ch, chunks, bg=(0, 0, 0, 0), loops=0) -> bytes:
    vp8x = _chunk(b"VP8X", bytes([0x12, 0, 0, 0]) + _u24le(cw - 1) + _u24le(ch - 1))
    anim = _chunk(b"ANIM", bytes([bg[2], bg[1], bg[0], bg[3]])
                  + struct.pack("<H", loops))
    body = b"WEBP" + vp8x + anim + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rgba(rgb, a=255):
    return np.dstack([rgb, np.full(rgb.shape[:2], a, np.uint8)])


def test_animated_webp_frames_composite_on_canvas():
    rng = np.random.default_rng(3)
    f1 = _rgba(rng.integers(0, 256, (4, 6, 3), dtype=np.uint8))
    f2 = _rgba(rng.integers(0, 256, (2, 2, 3), dtype=np.uint8))
    data = _anim_container(6, 4, [_anmf(0, 0, f1), _anmf(2, 2, f2)])
    frames = decode_webp_frames(data)
    assert len(frames) == 2 and frames[0].shape == (4, 6, 3)
    assert np.array_equal(frames[0], f1[:, :, :3])
    want = f1[:, :, :3].copy()
    want[2:4, 2:4] = f2[:, :, :3]
    assert np.array_equal(frames[1], want)
    # the still-image contract yields frame 1 (the GIF precedent)
    assert np.array_equal(decode_webp(data), f1)
    # and the VIDEO registry routes RIFF/WEBP here (AVIs still work)
    from etl_rust_spark.operators import mediacodec as mc

    assert len(mc.decode_video(data)) == 2


def test_animated_webp_alpha_blend_and_dispose():
    base = _rgba(np.zeros((2, 2, 3), np.uint8))
    overlay = _rgba(np.full((2, 2, 3), 200, np.uint8), a=128)
    third = _rgba(np.full((1, 1, 3), 7, np.uint8))
    data = _anim_container(
        2, 2,
        [_anmf(0, 0, base),
         _anmf(0, 0, overlay, flags=0x00 | 0x01),  # blend, then dispose-to-bg
         _anmf(0, 0, third)],
        bg=(9, 10, 11, 255),
    )
    frames = decode_webp_frames(data)
    # alpha "over": 200*(128/255) over opaque black ≈ 100
    assert abs(int(frames[1][0, 0, 0]) - 100) <= 1
    # dispose filled the rect with the ANIM background before frame 3
    assert tuple(frames[2][1, 1]) == (9, 10, 11)
    assert tuple(frames[2][0, 0]) == (7, 7, 7)


def test_animated_webp_corrupt_containers_raise():
    f1 = _rgba(np.zeros((2, 2, 3), np.uint8))
    good = _anim_container(2, 2, [_anmf(0, 0, f1)])
    with pytest.raises(ValueError, match="no ANMF"):
        decode_webp_frames(_anim_container(2, 2, []))
    # frame rect outside canvas
    with pytest.raises(ValueError, match="outside"):
        decode_webp_frames(_anim_container(2, 2, [_anmf(2, 2, f1)]))
    # ANMF without an animated VP8X
    body = b"WEBP" + _anmf(0, 0, f1)
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp_frames(b"RIFF" + struct.pack("<I", len(body)) + body)
    # bit-flip fuzz: uniform contract
    import random

    rnd = random.Random(5)
    for _ in range(300):
        buf = bytearray(good)
        buf[rnd.randrange(len(buf))] ^= rnd.randrange(1, 256)
        try:
            decode_webp_frames(bytes(buf))
        except ValueError:
            pass
