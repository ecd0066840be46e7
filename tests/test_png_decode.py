"""Pure-stdlib PNG decode kernel (VERDICT r02 next-round #3).

The forward-filtering encoder below lives test-side only: it produces
PNG streams using every filter type (0-4) so the decoder's per-row
unfiltering is pinned against known pixels, RGB and RGBA, including the
committed tiny.png / tiny_rgba.png fixtures (same pixel content as
tiny.ppm, so the three formats must agree pixelwise).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from medical_ocr_pipeline_spark.multimodal import (
    _PNG_SIG,
    decode_image,
    encode_png,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures_media")


def _fixture(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png_filtered(arr, filters, alpha=None) -> bytes:
    """Test-side encoder: forward-apply the given per-row filter types
    (cycled over rows) so the decoder must exercise every unfilter
    branch.  arr: HxWx3 uint8; alpha: optional HxW uint8 -> RGBA."""
    if alpha is not None:
        arr = np.dstack([arr, alpha])
    h, w, ch = arr.shape
    color = 2 if ch == 3 else 6
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = flat[y]
        line = bytearray()
        for i in range(stride):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            line.append((int(cur[i]) - pred) & 0xFF)
        raw += bytes([ft]) + bytes(line)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _test_pixels(h=13, w=16):
    return np.fromfunction(
        lambda y, x, c: (23 * y + 7 * x + 151 * c + y * x) % 256, (h, w, 3)
    ).astype(np.uint8)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_rgb_roundtrip_every_filter_type(filters):
    px = _test_pixels()
    w, h, got = decode_image(encode_png_filtered(px, filters))
    assert (w, h) == (16, 13)
    assert np.array_equal(got, px), f"filters={filters}"


@pytest.mark.parametrize("filters", [[0], [4], [2, 4, 1, 3, 0]])
def test_rgba_alpha_dropped(filters):
    px = _test_pixels()
    alpha = np.fromfunction(lambda y, x: (5 * y + x) % 256, px.shape[:2]).astype(np.uint8)
    w, h, got = decode_image(encode_png_filtered(px, filters, alpha=alpha))
    assert np.array_equal(got, px)


def test_engine_encoder_roundtrip():
    px = _test_pixels(9, 11)
    w, h, got = decode_image(encode_png(px))
    assert (w, h) == (11, 9)
    assert np.array_equal(got, px)


def test_committed_fixtures_agree_with_ppm():
    """tiny.png / tiny_rgba.png carry the same pixels as tiny.ppm: the
    three decode kernels must agree bit-for-bit."""
    _, _, ppm = decode_image(_fixture("tiny.ppm"))
    w1, h1, png = decode_image(_fixture("tiny.png"))
    w2, h2, rgba = decode_image(_fixture("tiny_rgba.png"))
    assert np.array_equal(png, ppm)
    assert np.array_equal(rgba, ppm)


def test_malformed_and_unsupported_pngs():
    px = _test_pixels(4, 4)
    good = encode_png(px)
    # a corrupted magic is an UNKNOWN format (dispatch falls through to
    # the documented extension point), not a malformed PNG
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\x00" + good[8:])
    with pytest.raises(ValueError):
        decode_image(good[:40])  # truncated mid-chunk
    # corrupt the IDAT payload (flip bytes inside the zlib stream)
    bad = bytearray(good)
    bad[-20:-16] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        decode_image(bytes(bad))
    # palette color type -> documented extension point
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = (_PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
           + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="8-bit RGB/RGBA"):
        decode_image(pal)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    inter = (_PNG_SIG + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
             + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_image(inter)


def test_png_through_media_features_and_thumbnails(spark):
    """End-to-end Spark plumbing: PNG payloads produce real
    pixel-derived features and PPM thumbnails; a corrupt PNG costs its
    row only."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        image_features,
        media_features,
        media_thumbnails,
    )

    png = _fixture("tiny.png")
    rows = [
        ("png_ok", "image", png,
         {"mime": "image/png", "width": 4, "height": 3, "duration_ms": 0}),
        ("png_bad", "image", png[:30],
         {"mime": "image/png", "width": 4, "height": 3, "duration_ms": 0}),
        ("ppm_twin", "image", _fixture("tiny.ppm"),
         {"mime": "image/x-portable-pixmap", "width": 4, "height": 3,
          "duration_ms": 0}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             media_features(media, real_decode=True).collect()}
    assert feats["png_bad"]["features"] is None
    assert feats["png_ok"]["features"] == pytest.approx(
        image_features(png))
    # same pixels -> identical features across formats
    assert feats["png_ok"]["features"] == feats["ppm_twin"]["features"]

    thumbs = {r["media_id"]: r for r in
              media_thumbnails(media, 2, 2).collect()}
    assert set(thumbs) == {"png_ok", "ppm_twin"}
    assert bytes(thumbs["png_ok"]["thumbnail"]) == bytes(
        thumbs["ppm_twin"]["thumbnail"])
