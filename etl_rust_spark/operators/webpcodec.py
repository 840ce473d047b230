"""Pure-stdlib WebP **lossless** (VP8L) codec.

Round-7 closed PNG, baseline JPEG, BMP, GIF and TIFF in-container; WebP
was the last image format still riding a registry adapter.  This module
implements the PUBLIC "WebP Lossless Bitstream Specification" (VP8L,
the format behind ``cwebp -lossless`` and most transparent web images):

- ``decode_webp``: RIFF container walk (plain ``VP8L``, extended
  ``VP8X``, and animated layouts — frame 1, the GIF precedent) + the
  full VP8L decoder — LSB-first bit reader, canonical prefix codes
  (simple 1/2-symbol and code-length-coded forms with the 16/17/18
  repeat semantics and the optional max_symbol shortcut), meta-prefix
  images, color cache, LZ77 backward references with the 120-entry 2D
  distance map, and all four inverse transforms (predictor with its 14
  modes, cross-color, subtract-green, color-indexing with sub-byte
  pixel bundling).
- ``decode_webp_frames`` (r8): animated WebP (``ANIM``/``ANMF``) →
  full-canvas frames with alpha-"over" compositing and
  dispose-to-background, routed through the VIDEO registry so animated
  stickers flow through frame_features / near_dup_videos.
- ``encode_webp_lossless``: a spec-legal minimal encoder — no
  transforms, no cache, one prefix group, flat 8-bit literal codes via
  the code-length path — whose frames any WebP reader decodes (the
  interop-over-ratio trade of the other fixture encoders here).

Lossy VP8 frames raise a descriptive ValueError directing to the
Pillow registry adapter (``use_pillow``): VP8 is a full DCT video
intra-frame — the boundary where a pure-stdlib decoder stops paying
its weight, same call as H.264.

Verification: hand-derived golden bitstreams (bit-order pinned
independently of the encoder — the JPEG inverted-zigzag lesson),
encoder→decoder round-trips over gradients/noise/flat/alpha images,
and corrupt-input fuzz under the uniform ValueError contract.

Reference parity note: the reference repo has no media pipeline at all
(its Kafka sink ships opaque bytes, src/output/apache_kafka.rs) — this
is part of the net-new multimodal surface mandated for the LLM-data
pipeline (SURVEY.md §2.6b, op_multimodal_features).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "decode_webp_frames", "encode_webp_lossless", "register_webp"]


# ---------------------------------------------------------------------------
# LSB-first bit I/O (VP8L convention: the first bit read is the LSB of
# the returned value; prefix-code bits are read one at a time)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if (end + 7) // 8 > len(self.data):
            raise ValueError("truncated VP8L bitstream")
        acc = int.from_bytes(self.data[self.pos // 8 : (end + 7) // 8], "little")
        val = (acc >> (self.pos % 8)) & ((1 << n) - 1)
        self.pos = end
        return val


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go to the stream MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Decode table: (length, code-bits-so-far) → symbol, walked one bit
    at a time (VP8L codes are ≤ 15 bits; a dict walk is plenty for the
    fixture/control-plane path this codec serves)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]  # zero-bit code: never consumes bits
            self.table = {}
            return
        self.single = None
        kraft = sum(1 << (15 - ln) for ln, _ in used)
        if kraft != 1 << 15:
            raise ValueError("VP8L prefix code is not complete")
        code = 0
        prev_len = 0
        table: dict[tuple[int, int], int] = {}
        for ln, sym in sorted(used):
            code <<= ln - prev_len
            table[(ln, code)] = sym
            code += 1
            prev_len = ln
        self.table = table

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
            pc.table = {}
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | bits.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code word")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _PrefixCode:
    if bits.read(1):  # simple code
        num_symbols = bits.read(1) + 1
        first_8 = bits.read(1)
        sym0 = bits.read(8 if first_8 else 1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(bits.read(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("VP8L simple-code symbol out of alphabet")
        return _PrefixCode.simple(syms)
    num_codes = bits.read(4) + 4
    if num_codes > len(_CL_ORDER):
        raise ValueError("too many code-length codes")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = bits.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if bits.read(1):  # optional symbol-count shortcut
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code = cl_code.decode(bits)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_len = code
        elif code == 16:
            rep = 3 + bits.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overruns alphabet")
                lengths[sym] = prev_len
                sym += 1
        elif code == 17:
            sym += 3 + bits.read(3)
        else:
            sym += 11 + bits.read(7)
    if sym > alphabet_size:
        raise ValueError("VP8L code lengths overrun alphabet")
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(bits: _Bits, prefix_sym: int) -> int:
    """Length/distance prefix decoding (spec §4.2.2): symbols < 4 are
    the value itself + 1; beyond that, (2 + lowbit) << extra + extras."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + bits.read(extra) + 1


def _make_distance_map() -> list[tuple[int, int]]:
    # The 120-entry 2D neighborhood from the spec's distance-code table:
    # all (dx, dy) with dy in 0..7, dx in -7..8 (dy==0 restricted to
    # dx>=1), ordered by squared distance, ties by DESCENDING dy then
    # DESCENDING dx — reproducing the spec listing exactly, e.g.
    # [(0,1), (1,0), (1,1), (-1,1), (0,2), (2,0), ...] ... [(8,6), (8,7)].
    pts = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            pts.append((dx, dy))
    pts.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    assert len(pts) == 120
    return pts


_DIST_MAP = _make_distance_map()


# ---------------------------------------------------------------------------
# Core image-stream decoder (ARGB pixels as uint32 a<<24|r<<16|g<<8|b)
# ---------------------------------------------------------------------------


def _decode_image_stream(
    bits: _Bits, w: int, h: int, is_level0: bool, max_pixels: int
) -> tuple[list[int], list]:
    """Returns (pixels row-major, transforms-read) — transforms only at
    level 0; sub-images (entropy/predictor/color/palette) never carry
    them."""
    if w * h > max_pixels:
        raise ValueError("VP8L image exceeds pixel bound")
    transforms: list[tuple] = []
    cur_w = w
    if is_level0:
        seen: set[int] = set()
        while bits.read(1):
            ttype = bits.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                size_bits = bits.read(3) + 2
                bw = _sub_size(cur_w, size_bits)
                bh = _sub_size(h, size_bits)
                sub, _ = _decode_image_stream(bits, bw, bh, False, max_pixels)
                transforms.append((ttype, size_bits, bw, sub, cur_w))
            elif ttype == 2:  # subtract green
                transforms.append((2, cur_w))
            else:  # color indexing
                n_colors = bits.read(8) + 1
                pal, _ = _decode_image_stream(bits, n_colors, 1, False, max_pixels)
                # palette entries are delta-coded per channel
                for i in range(1, len(pal)):
                    pal[i] = _add_pixels(pal[i], pal[i - 1])
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                packed_w = _sub_size(cur_w, width_bits)
                transforms.append((3, width_bits, pal, cur_w))
                cur_w = packed_w
    # color cache
    cache_bits = 0
    if bits.read(1):
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix image (level 0 only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and bits.read(1):
        meta_bits = bits.read(3) + 2
        mw = _sub_size(cur_w, meta_bits)
        mh = _sub_size(h, meta_bits)
        meta, _ = _decode_image_stream(bits, mw, mh, False, max_pixels)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1 if meta else 1
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(bits, green_alpha),
                _read_prefix_code(bits, 256),
                _read_prefix_code(bits, 256),
                _read_prefix_code(bits, 256),
                _read_prefix_code(bits, 40),
            )
        )
    # pixel loop
    n = cur_w * h
    pixels: list[int] = []
    x = 0
    group = groups[0]
    mw = _sub_size(cur_w, meta_bits) if meta is not None else 0
    while len(pixels) < n:
        if meta is not None:
            y = len(pixels) // cur_w
            mpix = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            gidx = (mpix >> 8) & 0xFFFF
            if gidx >= len(groups):
                raise ValueError("VP8L meta-prefix index out of range")
            group = groups[gidx]
        g_code, r_code, b_code, a_code, d_code = group
        sym = g_code.decode(bits)
        if sym < 256:
            red = r_code.decode(bits)
            blue = b_code.decode(bits)
            alpha = a_code.decode(bits)
            pix = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pixels.append(pix)
            if cache is not None:
                cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
            x += 1
        elif sym < 280:
            length = _prefix_value(bits, sym - 256)
            dist_sym = d_code.decode(bits)
            if dist_sym >= 40:
                raise ValueError("VP8L distance symbol out of range")
            dist_code = _prefix_value(bits, dist_sym)
            if dist_code > 120:
                distance = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                distance = dy * cur_w + dx
                if distance < 1:
                    distance = 1
            if distance > len(pixels):
                raise ValueError("VP8L back-reference before image start")
            for _ in range(length):
                pix = pixels[-distance]
                pixels.append(pix)
                if cache is not None:
                    cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
            x += length
        else:
            if cache is None:
                raise ValueError("VP8L cache reference without color cache")
            idx = sym - 280
            if idx >= len(cache):
                raise ValueError("VP8L cache index out of range")
            pixels.append(cache[idx])
            x += 1
        while x >= cur_w:
            x -= cur_w
    if len(pixels) != n:
        raise ValueError("VP8L back-reference overran image")
    return pixels, transforms


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _add_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24 & 0xFF) + (b >> 24 & 0xFF)) & 0xFF) << 24
        | (((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) & 0xFF) << 16
        | (((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


# ---------------------------------------------------------------------------
# Inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        (((a >> 24 & 0xFF) + (b >> 24 & 0xFF)) >> 1) << 24
        | (((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) >> 1) << 16
        | (((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select: the spec's Manhattan-distance-to-estimate
        # rule reduces to pL = Σ|T−TL|, pT = Σ|L−TL|; L wins strictly.
        p_l = (
            abs((top >> 24 & 0xFF) - (tl >> 24 & 0xFF))
            + abs((top >> 16 & 0xFF) - (tl >> 16 & 0xFF))
            + abs((top >> 8 & 0xFF) - (tl >> 8 & 0xFF))
            + abs((top & 0xFF) - (tl & 0xFF))
        )
        p_t = (
            abs((left >> 24 & 0xFF) - (tl >> 24 & 0xFF))
            + abs((left >> 16 & 0xFF) - (tl >> 16 & 0xFF))
            + abs((left >> 8 & 0xFF) - (tl >> 8 & 0xFF))
            + abs((left & 0xFF) - (tl & 0xFF))
        )
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            out |= _clamp(
                (left >> sh & 0xFF) + (top >> sh & 0xFF) - (tl >> sh & 0xFF)
            ) << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf
        avg = _avg2(left, top)
        out = 0
        for sh in (24, 16, 8, 0):
            a = avg >> sh & 0xFF
            t = tl >> sh & 0xFF
            # (a - t) / 2 with C truncation-toward-zero semantics
            out |= _clamp(a + (a - t) // 2 if a >= t else a - (t - a) // 2) << sh
        return out
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _inverse_predictor(pixels: list[int], w: int, h: int, size_bits: int,
                       bw: int, sub: list[int]) -> None:
    for i in range(len(pixels)):
        y, x = divmod(i, w)
        if i == 0:
            mode = 0
        elif y == 0:
            mode = 1  # left
        elif x == 0:
            mode = 2  # top
        else:
            mode = (sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
        left = pixels[i - 1] if x > 0 else 0
        top = pixels[i - w] if y > 0 else 0
        tl = pixels[i - w - 1] if (x > 0 and y > 0) else 0
        # rightmost column: top-right wraps to the current row's first
        # pixel (index arithmetic i - w + 1), per the spec's border rule
        tr = pixels[i - w + 1] if y > 0 else 0
        pred = _predict(mode, left, top, tl, tr)
        pixels[i] = _add_pixels(pixels[i], pred)


def _cdelta(t: int, c: int) -> int:
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _inverse_cross_color(pixels: list[int], w: int, h: int, size_bits: int,
                         bw: int, sub: list[int]) -> None:
    for i in range(len(pixels)):
        y, x = divmod(i, w)
        cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
        g2r = cte & 0xFF  # blue channel of the transform pixel
        g2b = (cte >> 8) & 0xFF  # green channel
        r2b = (cte >> 16) & 0xFF  # red channel
        pix = pixels[i]
        green = pix >> 8 & 0xFF
        red = (pix >> 16 & 0xFF) + _cdelta(g2r, green) & 0xFF
        blue = (pix & 0xFF) + _cdelta(g2b, green) & 0xFF
        blue = blue + _cdelta(r2b, red) & 0xFF
        pixels[i] = (pix & 0xFF000000) | (red << 16) | (green << 8) | blue


def _inverse_subtract_green(pixels: list[int]) -> None:
    for i, pix in enumerate(pixels):
        g = pix >> 8 & 0xFF
        red = ((pix >> 16 & 0xFF) + g) & 0xFF
        blue = ((pix & 0xFF) + g) & 0xFF
        pixels[i] = (pix & 0xFF00FF00) | (red << 16) | blue


def _inverse_color_index(
    pixels: list[int], packed_w: int, h: int, width_bits: int,
    palette: list[int], full_w: int,
) -> list[int]:
    if width_bits == 0:
        out = []
        for pix in pixels:
            idx = pix >> 8 & 0xFF
            if idx >= len(palette):
                raise ValueError("VP8L palette index out of range")
            out.append(palette[idx])
        return out
    per = 1 << width_bits
    bits_per = 8 >> width_bits
    mask = (1 << bits_per) - 1
    out = []
    for y in range(h):
        row: list[int] = []
        for xp in range(packed_w):
            packed = pixels[y * packed_w + xp] >> 8 & 0xFF
            for k in range(per):
                if len(row) >= full_w:
                    break
                idx = (packed >> (k * bits_per)) & mask
                if idx >= len(palette):
                    raise ValueError("VP8L palette index out of range")
                row.append(palette[idx])
        out.extend(row)
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def decode_vp8l(data: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """Decode a raw VP8L payload (chunk body) → (h, w, 3|4) uint8."""
    try:
        return _decode_vp8l(data, max_pixels)
    except ValueError:
        raise
    except (IndexError, struct.error, OverflowError) as exc:
        raise ValueError(f"corrupt VP8L stream: {exc!r}") from exc


def _decode_vp8l(data: bytes, max_pixels: int) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    bits = _Bits(data)
    bits.read(8)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    alpha_used = bits.read(1)
    if bits.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    pixels, transforms = _decode_image_stream(bits, w, h, True, max_pixels)
    # Inverse transforms in reverse read order.  Each transform tuple
    # carries the width current when IT was read (color-indexing shrinks
    # the width for everything read after it), so each inverse operates
    # at the right geometry and the color-indexing unpack restores the
    # pre-palette width for transforms read before it.
    for t in reversed(transforms):
        if t[0] == 0:
            _, size_bits, bw, sub, tw = t
            _inverse_predictor(pixels, tw, h, size_bits, bw, sub)
        elif t[0] == 1:
            _, size_bits, bw, sub, tw = t
            _inverse_cross_color(pixels, tw, h, size_bits, bw, sub)
        elif t[0] == 2:
            _inverse_subtract_green(pixels)
        else:
            _, width_bits, palette, full_w = t
            packed_w = _sub_size(full_w, width_bits)
            pixels = _inverse_color_index(pixels, packed_w, h, width_bits,
                                          palette, full_w)
    if len(pixels) != w * h:
        raise ValueError("VP8L decoded pixel count mismatch")
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    return rgba if alpha_used else rgba[..., :3].copy()


def decode_webp(data: bytes, max_pixels: int = 1 << 24) -> np.ndarray:
    """RIFF/WEBP container → pixel array.  Lossless (``VP8L``) decodes
    in-container, including inside an extended ``VP8X`` layout; lossy
    ``VP8 `` raises with a pointer to the Pillow adapter."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WebP chunk {fourcc!r}")
        if fourcc == b"VP8L":
            return decode_vp8l(body, max_pixels)
        if fourcc == b"VP8 ":
            raise ValueError(
                "lossy VP8 WebP needs a registry adapter (use_pillow); "
                "only lossless VP8L decodes in-container"
            )
        if fourcc == b"ANMF":
            # animated WebP: the still-image contract yields frame 1
            # (the GIF precedent) — the VP8L payload nests inside ANMF
            # after its 16-byte frame header
            return decode_webp(
                b"RIFF" + struct.pack("<I", 4 + len(body) - 16)
                + b"WEBP" + bytes(body[16:]),
                max_pixels,
            )
        # VP8X / ICCP / EXIF / XMP / ANIM metadata: keep walking
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L image chunk")


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def decode_webp_frames(
    data: bytes, max_pixels: int = 1 << 24
) -> list[np.ndarray]:
    """Animated WebP (VP8X+ANIM+ANMF, lossless frames) → list of
    full-canvas (H, W, 3) RGB frames.

    Container semantics per the public WebP container spec: each ANMF
    carries a 16-byte header (x/2, y/2, w-1, h-1 as 24-bit LE fields,
    24-bit duration, flags byte with B = do-not-blend bit 1 and D =
    dispose-to-background bit 0) followed by the frame's own image
    chunks.  Frames composite onto the canvas with alpha "over"
    blending (B=0) or overwrite (B=1); D=1 fills the frame rect with
    the ANIM background color after rendering.  Lossy VP8 frames raise
    toward the registry adapter, like the still path."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    pos = 12
    canvas = None
    bg = np.zeros(4, np.uint8)
    frames: list[np.ndarray] = []
    animated = False
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WebP chunk {fourcc!r}")
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise ValueError("short VP8X chunk")
            animated = bool(body[0] & 0x02)
            cw = _u24(body, 4) + 1
            ch = _u24(body, 7) + 1
            if cw * ch > max_pixels:
                raise ValueError(f"canvas {cw}x{ch} exceeds max_pixels")
            canvas = np.zeros((ch, cw, 4), np.uint8)
        elif fourcc == b"ANIM":
            if len(body) < 6:
                raise ValueError("short ANIM chunk")
            bg = np.frombuffer(body[:4], np.uint8)[[2, 1, 0, 3]]  # BGRA→RGBA
        elif fourcc == b"ANMF":
            if canvas is None or not animated:
                raise ValueError("ANMF before an animated VP8X header")
            if len(body) < 16:
                raise ValueError("short ANMF chunk")
            x, y = 2 * _u24(body, 0), 2 * _u24(body, 3)
            fw, fh = _u24(body, 6) + 1, _u24(body, 9) + 1
            flags = body[15]
            frame = decode_webp(
                b"RIFF" + struct.pack("<I", 4 + len(body) - 16)
                + b"WEBP" + bytes(body[16:]),
                max_pixels,
            )
            if frame.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame size mismatch with its header")
            if frame.shape[2] == 3:
                frame = np.dstack(
                    [frame, np.full(frame.shape[:2], 255, np.uint8)]
                )
            if y + fh > canvas.shape[0] or x + fw > canvas.shape[1]:
                raise ValueError("ANMF frame rect outside the canvas")
            region = canvas[y : y + fh, x : x + fw]
            if flags & 0x02:  # do not blend: overwrite
                region[:] = frame
            else:  # alpha "over"
                fa = frame[:, :, 3:4].astype(np.float64) / 255.0
                ba = region[:, :, 3:4].astype(np.float64) / 255.0
                oa = fa + ba * (1.0 - fa)
                safe = np.where(oa == 0.0, 1.0, oa)
                rgb = (
                    frame[:, :, :3] * fa
                    + region[:, :, :3] * ba * (1.0 - fa)
                ) / safe
                region[:, :, :3] = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
                region[:, :, 3] = np.clip(np.rint(oa[:, :, 0] * 255.0), 0, 255)
            frames.append(canvas[:, :, :3].copy())
            if flags & 0x01:  # dispose to background color
                canvas[y : y + fh, x : x + fw] = bg
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("WebP carries no ANMF animation frames")
    return frames


def encode_webp_lossless(arr: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → RIFF/WEBP with a minimal VP8L payload: one
    prefix group, flat 8-bit literal codes through the code-length
    path, no transforms/cache/LZ77 (spec-legal; ~raw size)."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4) or arr.dtype != np.uint8:
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("image dimensions out of VP8L range")
    has_alpha = arr.shape[2] == 4
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image

    def flat_code(alphabet: int) -> None:
        """All 256 literal symbols at length 8 via the code-length path.
        Code-length code: {8:1, 0:2, 18:2} (complete).  After 256
        eights, symbol 18 skips the 24 length/cache entries (green)."""
        bw.write(0, 1)  # not simple
        # entries in _CL_ORDER up to index 11 cover symbols 18 (idx 1),
        # 0 (idx 2) and 8 (idx 11)
        bw.write(12 - 4, 4)
        cl = {17: 0, 18: 2, 0: 2, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 16: 0,
              6: 0, 7: 0, 8: 1}
        for i in range(12):
            bw.write(cl[_CL_ORDER[i]], 3)
        bw.write(0, 1)  # no max_symbol shortcut
        # canonical CL codes: len1: {8}→0; len2: {0}→10, {18}→11
        for _ in range(256):
            bw.write_code(0b0, 1)  # symbol 8
        if alphabet > 256:
            bw.write_code(0b11, 2)  # symbol 18: skip 11+extra zeros
            bw.write(24 - 11, 7)

    flat_code(280)  # green (+24 length codes, all zero-length)
    flat_code(256)  # red
    flat_code(256)  # blue
    flat_code(256)  # alpha
    # distance: simple 1-symbol zero-bit code
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # flat 8-bit canonical codes: code(symbol) == symbol, MSB first
    alpha_plane = arr[..., 3] if has_alpha else None
    for y in range(h):
        row = arr[y]
        for x in range(w):
            r, g, b = int(row[x, 0]), int(row[x, 1]), int(row[x, 2])
            bw.write_code(g, 8)
            bw.write_code(r, 8)
            bw.write_code(b, 8)
            bw.write_code(255 if alpha_plane is None else int(alpha_plane[y, x]), 8)
    payload = bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def register_webp() -> None:
    """Hook ``decode_webp`` into the image registry under the RIFF
    magic (the registry's WAV/AVI entries live in the audio/video
    registries, so images see RIFF only as WebP), and a RIFF
    dispatcher into the VIDEO registry so animated WebPs flow through
    frame_features / near_dup_videos alongside AVIs and animated GIFs
    (r8)."""
    from etl_rust_spark.operators import mediacodec

    mediacodec.register_decoder(b"RIFF", decode_webp)

    def riff_video(data: bytes):
        if data[8:12] == b"WEBP":
            return decode_webp_frames(data)
        return mediacodec.decode_avi(data)

    mediacodec.register_video_decoder(b"RIFF", riff_video)
