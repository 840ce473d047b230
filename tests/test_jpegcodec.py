"""Pure-stdlib baseline JPEG codec (VERDICT r6 #3).

The DC path is pinned by HAND-DERIVED golden entropy bytes (worked out
from the Annex K code tables on paper, independent of the encoder — a
symmetric encode/decode bug cannot satisfy them); AC/color/subsampling
by encode→decode error bounds and hand-BUILT 4:2:0 / restart-marker
files the encoder itself cannot produce.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_rust_spark.operators import mediacodec as mc
from etl_rust_spark.operators.jpegcodec import (
    AC_LUM,
    DC_CHROM,
    DC_LUM,
    AC_CHROM,
    JPEG_MAGIC,
    ZZ_COLS,
    ZZ_ROWS,
    _BitWriter,
    _build_encode_table,
    decode_jpeg,
    encode_jpeg,
)


def _flat_quant_segments(gray: bool) -> bytes:
    """DQT with every coefficient = 16 (so DC quantization is a clean
    /16) + the standard DHT tables."""
    out = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes([16] * 64)
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tables += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tcth, (bits, values) in tables:
        body = bytes([tcth]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    return out


def _gray_jpeg(h: int, w: int, entropy: bytes, dri: int = 0) -> bytes:
    out = b"\xff\xd8" + _flat_quant_segments(gray=True)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return out + entropy + b"\xff\xd9"


def test_hand_derived_golden_solid_gray_128():
    """Solid 128 single block: level-shifted data is all zero, so the
    entropy coding is DC category 0 ('00' in the Annex K DC-luminance
    table) + EOB ('1010' in the AC-luminance table), 1-padded to the
    byte 0b00101011 = 0x2B.  Derived by hand from the spec tables."""
    img = decode_jpeg(_gray_jpeg(8, 8, b"\x2b"))
    assert img.shape == (8, 8)
    assert (img == 128).all()


def test_hand_derived_golden_solid_gray_136():
    """DC diff +4: category 3 → DC code '100' + magnitude bits '100',
    then EOB '1010' → 1001001010 + 1-padding = 0x92 0xBF.  With Q=16
    the dequantized DC is 64, IDCT gives a flat 64/8 = +8 plane →
    pixels 136."""
    img = decode_jpeg(_gray_jpeg(8, 8, b"\x92\xbf"))
    assert (img == 136).all()


def test_restart_markers_reset_dc_prediction():
    """6 blocks, DRI=2: RSTn every 2 MCUs byte-aligns the reader and
    resets the DC predictor — so each segment's first block re-encodes
    the full DC value and decode still yields a uniform plane."""
    dc_lum = _build_encode_table(*DC_LUM)
    ac_lum = _build_encode_table(*AC_LUM)

    def seg(first_diff: int, n_blocks: int) -> bytes:
        bw = _BitWriter()
        for i in range(n_blocks):
            diff = first_diff if i == 0 else 0
            t = int(abs(diff)).bit_length()
            code, ln = dc_lum[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            code, ln = ac_lum[0x00]  # EOB
            bw.write(code, ln)
        return bw.flush()

    entropy = (
        seg(4, 2) + b"\xff\xd0" + seg(4, 2) + b"\xff\xd1" + seg(4, 2)
    )
    img = decode_jpeg(_gray_jpeg(8, 48, entropy, dri=2))
    assert img.shape == (8, 48)
    assert (img == 136).all()


def test_420_subsampled_decode():
    """Hand-built 4:2:0 file (the encoder only writes 4:4:4): one MCU =
    4 Y blocks + Cb + Cr, chroma upsampled 2× both ways.  Solid
    Y=136/Cb=160/Cr=96 → RGB (91, 148, 193) by the BT.601 inverse."""
    dc_lum = _build_encode_table(*DC_LUM)
    ac_lum = _build_encode_table(*AC_LUM)
    dc_chrom = _build_encode_table(*DC_CHROM)
    ac_chrom = _build_encode_table(*AC_CHROM)

    bw = _BitWriter()

    def block(diff: int, dc_tab, ac_tab):
        t = int(abs(diff)).bit_length()
        code, ln = dc_tab[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac_tab[0x00]
        bw.write(code, ln)

    # Y blocks: first carries DC (136-128)*8/16 = 4, rest diff 0
    block(4, dc_lum, ac_lum)
    for _ in range(3):
        block(0, dc_lum, ac_lum)
    block(16, dc_chrom, ac_chrom)   # Cb: (160-128)*8/16
    block(-16, dc_chrom, ac_chrom)  # Cr: (96-128)*8/16
    entropy = bw.flush()

    out = b"\xff\xd8" + _flat_quant_segments(gray=False)
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0])  # Y 2x2
    sof += bytes([2, 0x11, 1])  # Cb 1x1
    sof += bytes([3, 0x11, 1])  # Cr 1x1
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy + b"\xff\xd9"

    img = decode_jpeg(out)
    assert img.shape == (16, 16, 3)
    assert (img == np.array([91, 148, 193], np.uint8)).all()


def test_roundtrip_gray_and_rgb_gradients():
    x = np.linspace(0, 255, 64)
    gray = (x[None, :] * np.ones((48, 1))).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, 90))
    assert out.shape == gray.shape
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2

    rgb = np.stack(
        [
            x[None, :] * np.ones((48, 1)),
            x[::-1][None, :] * np.ones((48, 1)),
            np.full((48, 64), 100.0),
        ],
        axis=2,
    ).astype(np.uint8)
    out3 = decode_jpeg(encode_jpeg(rgb, 90))
    assert out3.shape == rgb.shape
    assert np.abs(out3.astype(int) - rgb.astype(int)).max() <= 3


def test_roundtrip_non_multiple_of_8_and_psnr():
    rng = np.random.default_rng(7)
    img = np.clip(rng.normal(128, 30, (41, 55, 3)), 0, 255).astype(np.uint8)
    data = encode_jpeg(img, 95)
    assert data.startswith(JPEG_MAGIC) and data.endswith(b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == img.shape  # edge padding cropped exactly
    mse = ((out.astype(float) - img) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 30  # PSNR bar

    # quality ladder: lower quality -> smaller file, still decodable
    sizes = [len(encode_jpeg(img, q)) for q in (95, 75, 40, 10)]
    assert sizes == sorted(sizes, reverse=True)
    decode_jpeg(encode_jpeg(img, 10))


def test_zigzag_table_is_the_spec_order():
    # spot-pin the first diagonal runs of the spec zigzag
    zz = list(zip(ZZ_ROWS.tolist(), ZZ_COLS.tolist()))
    assert zz[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert zz[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_unsupported_sofs_rejected_with_guidance():
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
    with pytest.raises(ValueError, match="lossless|use_pillow"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # a BASELINE stream relabeled SOF2 is malformed progressive (its
    # single scan declares Ss=0 Se=63 — a DC scan must have Se=0) and
    # still dies with the uniform error, not a crash (r8: progressive
    # is decodable, so the old "unsupported" rejection is gone)
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_registry_dispatches_jpeg_and_multimodal_pipeline(spark):
    """decode_image sniffs FF D8 FF and the multimodal feature pipeline
    decodes JPEG payloads in-container with decode_stub=False (the
    VERDICT r6 'realistic corpus' ask)."""
    from etl_rust_spark.operators import multimodal

    rng = np.random.default_rng(3)
    a1 = np.clip(rng.normal(128, 40, (16, 16, 3)), 0, 255).astype(np.uint8)
    a2 = np.clip(rng.normal(100, 40, (16, 16, 3)), 0, 255).astype(np.uint8)
    j1, j2 = encode_jpeg(a1, 90), encode_jpeg(a2, 90)
    d1 = mc.decode_image(j1)  # registry dispatch
    assert d1.shape == (16, 16, 3)

    rows = [
        (1, "image", bytearray(j1), ("image/jpeg", 16, 16, None, "u1")),
        (2, "image", bytearray(j2), ("image/jpeg", 16, 16, None, "u2")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    got = {
        r["asset_id"]: r
        for r in multimodal.extract_features(df, decode_stub=False).collect()
    }
    assert got[1]["feature"] == [
        pytest.approx(v) for v in mc.image_feature(mc.decode_image(j1), 8)
    ]
    assert got[1]["feature"] != got[2]["feature"]
    # dhash near-dup: a re-encoded (quality-60) copy of a STRUCTURED
    # image stays Hamming-close (noise images are dHash's worst case —
    # every gradient sign sits near zero)
    xx, yy = np.meshgrid(np.linspace(0, 255, 32), np.linspace(0, 255, 32))
    smooth = np.stack([xx, yy, (xx + yy) / 2], axis=2).astype(np.uint8)
    h_orig = mc.dhash(mc.decode_image(encode_jpeg(smooth, 90)))
    h_re = mc.dhash(mc.decode_image(encode_jpeg(smooth, 60)))
    assert bin((h_orig ^ h_re) & ((1 << 64) - 1)).count("1") <= 8

    # near_dup_images end-to-end on a JPEG corpus (the VERDICT r6 'done'
    # criterion): the re-encode pairs with its original, the unrelated
    # image does not
    jrows = [
        (10, "image", bytearray(encode_jpeg(smooth, 90)),
         ("image/jpeg", 32, 32, None, "u10")),
        (11, "image", bytearray(encode_jpeg(smooth, 60)),
         ("image/jpeg", 32, 32, None, "u11")),
        (12, "image", bytearray(encode_jpeg(a2, 90)),
         ("image/jpeg", 16, 16, None, "u12")),
    ]
    jdf = multimodal.make_asset_df(spark, jrows)
    pairs = [
        (r["aid"], r["bid"])
        for r in multimodal.near_dup_images(
            jdf, max_hamming=8, bands=16, decode_stub=False
        ).collect()
    ]
    assert (10, 11) in pairs and all(12 not in p for p in pairs)


def test_mjpeg_avi_decodes_through_jpeg_codec():
    """MJPEG AVI (r7): '00dc' chunks that are baseline JPEGs decode via
    the in-repo codec — the common compressed AVI payload, hand-built
    here since encode_avi only writes BI_RGB."""
    import struct as _struct

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + _struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    h, w = 16, 16
    frames_px = []
    jpegs = b""
    for shade in (40, 120, 200):
        img = np.full((h, w, 3), shade, np.uint8)
        img[:, : w // 2, 0] = 255 - shade  # structure, not just a solid
        frames_px.append(img)
        jpegs += chunk(b"00dc", encode_jpeg(img, 90))
    avih = chunk(b"avih", _struct.pack("<14I", 40000, 0, 0, 0, 3, 0, 1, 1, w, h, 0, 0, 0, 0))
    movi = lst(b"movi", jpegs)
    avi = b"RIFF" + _struct.pack(
        "<I", 4 + len(lst(b"hdrl", avih)) + len(movi)
    ) + b"AVI " + lst(b"hdrl", avih) + movi

    got = mc.decode_video(avi)
    assert len(got) == 3
    for want, g in zip(frames_px, got):
        assert g.shape == want.shape
        assert np.abs(g.astype(int) - want.astype(int)).mean() < 4  # lossy
    # frame-level features run on the MJPEG frames
    f = mc.video_feature(got, 8)
    assert len(f) == 8


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — r8 (VERDICT r7 #4)
#
# Verification posture: (1) the progressive ENCODER is a round-trip
# oracle — both directions reconstruct the same quantized coefficients,
# so progressive encode must decode BIT-IDENTICALLY to the baseline
# encode of the same image at the same quality; (2) the successive-
# approximation entropy semantics (the part a symmetric bug could hide)
# are pinned by a HAND-BUILT multi-scan stream with test-local Huffman
# tables and hand-computed refinement bits; (3) EOBn runs (which the
# encoder never emits — Annex K tables carry no EOBn symbols) come from
# a second hand-built stream.
# ---------------------------------------------------------------------------

from etl_rust_spark.operators.jpegcodec import (  # noqa: E402
    _idct_blocks,
    encode_jpeg_progressive,
)


def test_progressive_roundtrip_bit_identical_to_baseline():
    rng = np.random.default_rng(5)
    for shape in [(24, 24, 3), (17, 23, 3), (8, 8), (15, 9), (33, 8, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (40, 85, 95):
            base = decode_jpeg(encode_jpeg(img, q))
            prog = decode_jpeg(encode_jpeg_progressive(img, q))
            assert np.array_equal(base, prog), (shape, q)


def test_progressive_custom_scan_scripts():
    """Any legal split of the spectrum across scans reconstructs the
    same coefficients: single-shot, fine-grained bands, deep successive
    approximation."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 85))
    scripts = [
        # no successive approximation, three band scans per component
        [((0, 1, 2), 0, 0, 0, 0)]
        + [((c,), 1, 20, 0, 0) for c in (0, 1, 2)]
        + [((c,), 21, 63, 0, 0) for c in (0, 1, 2)],
        # deep successive approximation on everything
        [((0, 1, 2), 0, 0, 0, 3), ((0, 1, 2), 0, 0, 3, 2),
         ((0, 1, 2), 0, 0, 2, 1), ((0, 1, 2), 0, 0, 1, 0)]
        + [((c,), 1, 63, 0, 3) for c in (0, 1, 2)]
        + [((c,), 1, 63, 3, 2) for c in (0, 1, 2)]
        + [((c,), 1, 63, 2, 1) for c in (0, 1, 2)]
        + [((c,), 1, 63, 1, 0) for c in (0, 1, 2)],
        # 1-coefficient bands
        [((0, 1, 2), 0, 0, 0, 0)]
        + [((c,), k, k, 0, 0) for c in (0, 1, 2) for k in range(1, 64)],
    ]
    for scans in scripts:
        prog = decode_jpeg(encode_jpeg_progressive(img, 85, scans=scans))
        assert np.array_equal(base, prog)


class _PW:
    """Test-local MSB-first bit writer with JPEG byte stuffing —
    independent of the module's _BitWriter."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def bytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _prog_headers(w: int, h: int, nblocks_note: str = "") -> bytes:
    """SOI + all-ones DQT + 1-component SOF2 + the test Huffman tables:
    DC: single length-1 code '0' → category 4;
    AC: length-2 codes '00'→0x01, '01'→0x22, '10'→0x00 (EOB),
        length-3 code '110'→0x10 (EOB2 — the EOBn symbol Annex K
        lacks)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))        # quant: all ones
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dc_bits = [1] + [0] * 15
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes([4]))
    ac_bits = [0, 3, 1] + [0] * 13
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x01, 0x22, 0x00, 0x10]))
    return bytes(out)


def _sos1(ss: int, se: int, ah: int, al: int) -> bytes:
    return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))


def test_progressive_hand_built_refinement_golden():
    """Hand-derived successive-approximation stream for one 8×8 block;
    final coefficients (zigzag) DC=-20, k1=+3, k2=+1, k4=-5.

    Scan bits worked out on paper from spec G.1.2:
      DC first  (Al=1): cat-4 code '0' + mag(-10)='0101'      → 0x2F
      DC refine (Al=0): raw bit 0                              → 0x7F
      AC first  (Al=1): '00'(r0s1) '1'(+1) '01'(r2s2) '01'(-2)
                        '10'(EOB)                              → 0x2B 0x7F
      AC refine (Al=0): '00'(r0s1) '1'(sign +) '1'(corr k1)
                        '10'(EOB) '1'(corr k4)                 → 0x3B
    """
    data = bytearray(_prog_headers(8, 8))
    data += _sos1(0, 0, 0, 1) + bytes([0x2F])
    data += _sos1(0, 0, 1, 0) + bytes([0x7F])
    data += _sos1(1, 63, 0, 1) + bytes([0x2B, 0x7F])
    data += _sos1(1, 63, 1, 0) + bytes([0x3B])
    data += b"\xff\xd9"
    got = decode_jpeg(bytes(data))
    zz = np.zeros(64)
    zz[0], zz[1], zz[2], zz[4] = -20, 3, 1, -5
    nat = np.zeros((1, 8, 8))
    nat[0, ZZ_ROWS, ZZ_COLS] = zz
    want = np.clip(np.rint(_idct_blocks(nat)[0] + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)

    # each successive-approximation PREFIX is also a valid image — the
    # point of progressive rendering.  After the first two scans only
    # DC=-20 is known at full precision:
    partial = bytes(_prog_headers(8, 8)) + _sos1(0, 0, 0, 1) + bytes([0x2F]) \
        + _sos1(0, 0, 1, 0) + bytes([0x7F]) + b"\xff\xd9"
    got_dc = decode_jpeg(partial)
    nat_dc = np.zeros((1, 8, 8))
    nat_dc[0, 0, 0] = -20
    want_dc = np.clip(np.rint(_idct_blocks(nat_dc)[0] + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got_dc, want_dc)


def test_progressive_hand_built_eobn_run():
    """EOBn (run-of-all-done-blocks) semantics the in-repo encoder
    never emits: a 16×8 two-block image where the AC first scan opens
    with EOB2 ('110' + 1 extra bit) covering BOTH blocks, and a
    refinement scan whose EOB2 walks correction bits through the second
    block's band tail.

      DC first (Al=1): block1 cat-4 '0'+mag(-10)='0101',
                       block2 diff +14 (pred -10 → +4): '0'+'1110'  → 0x2B 0xCF
        wait: bits are '0 0101 0 1110' = 0x2B 0b110_11111? worked out
        below in code instead (the test builds the bytes with _PW).
    """
    # DC first scan Al=1: v1=-10 → DC1=-20; v2=+4 → DC2=+8
    wtr = _PW()
    wtr.put(0b0, 1).put(0b0101, 4)        # cat4, mag(-10)
    wtr.put(0b0, 1).put(0b1110, 4)        # cat4, mag(+4) = diff(4-(-10))=14
    dc_first = wtr.bytes()
    # AC first scan (Al=1) comp-wide: block1 carries k1=+1 then EOB2
    # ending block1 AND block2 ('110' r=1 + 1 extra bit 0 → run=2)
    wtr = _PW()
    wtr.put(0b00, 2).put(0b1, 1)          # (r0,s1) +1 at k=1
    wtr.put(0b110, 3).put(0b0, 1)         # EOB2: 1<<1 + 0 - 1 → this + next block
    ac_first = wtr.bytes()
    # AC refine (Ah=1→Al=0): block1: k1 history (2) correction bit 1 →
    # +3 … then EOB2 '110'+bit 0 → correction walk covers block1 tail
    # (no other nonzeros) AND block2's whole band (also no nonzeros)
    wtr = _PW()
    wtr.put(0b110, 3).put(0b0, 1)         # EOB2 first: both blocks
    wtr.put(0b1, 1)                       # correction bit for k1 of block1
    ac_refine = wtr.bytes()
    data = bytearray(_prog_headers(16, 8))
    data += _sos1(0, 0, 0, 1) + dc_first
    data += _sos1(1, 63, 0, 1) + ac_first
    data += _sos1(1, 63, 1, 0) + ac_refine
    data += b"\xff\xd9"
    got = decode_jpeg(bytes(data))
    assert got.shape == (8, 16)
    zz1 = np.zeros(64)
    zz1[0], zz1[1] = -20, 3               # k1: (+1<<1) + correction → +3
    zz2 = np.zeros(64)
    zz2[0] = 8
    nat = np.zeros((2, 8, 8))
    nat[0, ZZ_ROWS, ZZ_COLS] = zz1
    nat[1, ZZ_ROWS, ZZ_COLS] = zz2
    pix = np.clip(np.rint(_idct_blocks(nat) + 128.0), 0, 255).astype(np.uint8)
    want = np.concatenate([pix[0], pix[1]], axis=1)
    assert np.array_equal(got, want)


def test_progressive_multimodal_pipeline_mixed_corpus(spark):
    """near_dup_images runs over a MIXED baseline/progressive corpus
    in-container (the VERDICT r7 'realistic corpus' completion): the
    same image encoded both ways lands in one near-dup bucket."""
    from etl_rust_spark.operators import multimodal

    xx, yy = np.meshgrid(np.linspace(0, 255, 32), np.linspace(0, 255, 32))
    smooth = np.stack([xx, yy, (xx + yy) / 2], axis=2).astype(np.uint8)
    rng = np.random.default_rng(9)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_jpeg(smooth, 90)),
         ("image/jpeg", 32, 32, None, "u1")),
        (2, "image", bytearray(encode_jpeg_progressive(smooth, 90)),
         ("image/jpeg", 32, 32, None, "u2")),
        (3, "image", bytearray(encode_jpeg_progressive(other, 90)),
         ("image/jpeg", 32, 32, None, "u3")),
    ]
    df = multimodal.make_asset_df(spark, rows)
    pairs = [
        (r["aid"], r["bid"])
        for r in multimodal.near_dup_images(
            df, max_hamming=8, bands=16, decode_stub=False
        ).collect()
    ]
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


# ---------------------------------------------------------------------------
# EXIF orientation (r8): phone-camera corpora store sensor-orientation
# pixels + tag 274; decode_jpeg applies the display transpose so a
# rotated re-save hashes near its original.
# ---------------------------------------------------------------------------

def _with_exif(jpg: bytes, orientation: int, bo: str = "<") -> bytes:
    mark = b"II" if bo == "<" else b"MM"
    tiff = (mark + struct.pack(bo + "H", 0x2A) + struct.pack(bo + "I", 8)
            + struct.pack(bo + "H", 1)
            + struct.pack(bo + "HHIHH", 274, 3, 1, orientation, 0)
            + struct.pack(bo + "I", 0))
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
    return jpg[:2] + seg + jpg[2:]


def test_exif_orientation_all_eight():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    base = encode_jpeg(img, 90)
    raw = decode_jpeg(base)
    # display transforms per EXIF 2.3 / TIFF 6.0 (Pillow exif_transpose
    # mapping: 2 mirror, 3 rot180, 4 flip, 5 transpose, 6 rot270,
    # 7 transverse = anti-diagonal flip, 8 rot90)
    exp = {
        1: raw, 2: raw[:, ::-1], 3: np.rot90(raw, 2), 4: raw[::-1],
        5: np.swapaxes(raw, 0, 1), 6: np.rot90(raw, -1),
        7: np.swapaxes(raw, 0, 1)[::-1, ::-1], 8: np.rot90(raw, 1),
    }
    for o in range(1, 9):
        assert np.array_equal(decode_jpeg(_with_exif(base, o)), exp[o]), o
        # opt-out returns sensor-raw pixels
        assert np.array_equal(
            decode_jpeg(_with_exif(base, o), apply_exif_orientation=False), raw
        )
    # big-endian EXIF blocks parse too
    assert np.array_equal(decode_jpeg(_with_exif(base, 6, ">")), exp[6])
    # malformed EXIF is a hint, never fatal
    broken = bytearray(_with_exif(base, 6))
    broken[8] = 0x51  # corrupt the TIFF byte-order mark
    assert np.array_equal(decode_jpeg(bytes(broken)), raw)


def test_exif_rotated_resave_hashes_with_original():
    """The corpus-level point: a 90°-rotated re-save carrying EXIF
    orientation 8 dHash-matches the original through the registry."""
    xx, yy = np.meshgrid(np.linspace(0, 255, 32), np.linspace(0, 255, 32))
    smooth = np.stack([xx, yy, (xx + yy) / 2], axis=2).astype(np.uint8)
    orig = encode_jpeg(smooth, 90)
    rotated_pixels = np.rot90(decode_jpeg(orig), -1).copy()  # sensor 90° CW
    resave = _with_exif(encode_jpeg(rotated_pixels, 90), 8)   # tag: rotate back
    h0 = mc.dhash(mc.decode_image(orig))
    h1 = mc.dhash(mc.decode_image(resave))
    assert bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") <= 8


def test_progressive_with_restart_markers():
    """DRI/RSTn inside progressive scans: segment switch resets DC
    predictions and EOB runs (hand-built: 2-block image, restart
    interval 1, distinct DC per block — each block's diff is from pred
    0, not the previous block)."""
    data = bytearray(_prog_headers(16, 8))
    data += _seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
    wtr = _PW()
    wtr.put(0b0, 1).put(0b0101, 4)            # block1: cat4 mag(-10)
    b1 = wtr.bytes()
    wtr = _PW()
    wtr.put(0b0, 1).put(0b0100, 4)            # block2: cat4 mag(-11), pred RESET
    b2 = wtr.bytes()
    data += _sos1(0, 0, 0, 1) + b1 + b"\xff\xd0" + b2  # RST0 between blocks
    data += b"\xff\xd9"
    got = decode_jpeg(bytes(data))
    nat = np.zeros((2, 8, 8))
    nat[0, 0, 0] = -20  # -10 << 1
    nat[1, 0, 0] = -22  # -11 << 1 (diff from pred 0, not from -10)
    pix = np.clip(np.rint(_idct_blocks(nat) + 128.0), 0, 255).astype(np.uint8)
    want = np.concatenate([pix[0], pix[1]], axis=1)
    assert np.array_equal(got, want)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _scan_scripts(draw):
    """Random LEGAL progressive scan scripts: DC first for all
    components (with an optional successive-approximation chain), then
    per-component AC coverage as random contiguous bands, each with its
    own approximation chain refined down to Al=0."""
    ncomp = 3
    script = []
    dc_al = draw(st.integers(0, 2))
    script.append((tuple(range(ncomp)), 0, 0, 0, dc_al))
    for al in range(dc_al, 0, -1):
        script.append((tuple(range(ncomp)), 0, 0, al, al - 1))
    for c in range(ncomp):
        # random band split of 1..63
        cuts = sorted(draw(st.sets(st.integers(2, 63), max_size=3)))
        bands = []
        lo = 1
        for cut in cuts:
            bands.append((lo, cut - 1))
            lo = cut
        bands.append((lo, 63))
        ac_al = draw(st.integers(0, 2))
        for ss, se in bands:
            script.append(((c,), ss, se, 0, ac_al))
        for al in range(ac_al, 0, -1):
            script.append(((c,), 1, 63, al, al - 1))
    return script


@settings(max_examples=25, deadline=None)
@given(script=_scan_scripts(), seed=st.integers(0, 1000))
def test_progressive_random_scan_scripts_property(script, seed):
    """ANY legal scan script reconstructs the exact coefficients: the
    progressive decode is bit-identical to the baseline decode of the
    same image at the same quality."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 85))
    prog = decode_jpeg(encode_jpeg_progressive(img, 85, scans=script))
    assert np.array_equal(base, prog), script
