"""mediacodec: the pure-stdlib PNG codec + pluggable decoder registry,
and the decode_stub=False paths of the multimodal operators
(VERDICT r5 #4 — the last stub, now real for PNG in-container)."""

from __future__ import annotations

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


def test_extract_features_real_decode_audio_raises(spark):
    from py4j.protocol import Py4JJavaError

    from etl_rust_spark.operators import multimodal

    rows = [(3, "audio", bytearray(b"RIFFxxxx"), ("audio/wav", None, None, 1000, "u3"))]
    df = multimodal.make_asset_df(spark, rows)
    with pytest.raises((Py4JJavaError, Exception)) as ei:
        multimodal.extract_features(df, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or "librosa" in str(ei.value)


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
