"""Pure-stdlib GIF codec (LZW + palette): encoder/decoder roundtrips
including width growth, the 4096-code clear, interlacing, the KwKwK
code, deferred-clear third-party streams, and pixel parity with the
committed tiny.ppm fixture (tiny.gif carries the same pixels, like
tiny.png / tiny.bmp)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from medical_ocr_pipeline_spark.multimodal import (
    _decode_gif,
    _gif_lzw_decode,
    decode_image,
    encode_gif,
    image_features,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures_media")


def _fixture(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def test_roundtrip_random_palette():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(13, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 13, size=(47, 61))]
    w, h, out = decode_image(encode_gif(img))
    assert (w, h) == (61, 47)
    assert (out == img).all()


def test_roundtrip_through_code_clear():
    """256 colors x 60k noise pixels exhausts the 12-bit code space,
    forcing the encoder's mid-stream CLEAR and the decoder's reset."""
    rng = np.random.default_rng(3)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    img = pal[rng.integers(0, 256, size=(200, 300))]
    assert (decode_image(encode_gif(img))[2] == img).all()


def test_roundtrip_compresses_runs():
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    img = pal[
        (np.repeat(np.arange(100) % 7, 500).reshape(100, 500) * 30
         ).astype(np.uint8)
    ]
    data = encode_gif(img)
    assert (decode_image(data)[2] == img).all()
    assert len(data) < img.size // 20, "LZW should crush long runs"


def test_roundtrip_solid_and_two_color():
    img = np.full((4, 4, 3), 9, np.uint8)
    assert (decode_image(encode_gif(img))[2] == img).all()
    img2 = np.zeros((3, 5, 3), np.uint8)
    img2[1, 2] = [255, 0, 0]
    assert (decode_image(encode_gif(img2))[2] == img2).all()


def test_fixture_parity_with_ppm():
    """tiny.gif carries the same pixels as tiny.ppm — all committed
    image fixtures agree pixelwise, so features agree too."""
    _, _, ppm = decode_image(_fixture("tiny.ppm"))
    w, h, gif = decode_image(_fixture("tiny.gif"))
    assert (w, h) == (4, 3)
    assert (gif == ppm).all()
    assert [round(v, 6) for v in image_features(_fixture("tiny.gif"))] == [
        round(v, 6) for v in image_features(_fixture("tiny.ppm"))
    ]


def test_interlaced_gif_decodes():
    """Forward-interlace the rows of a known image (write pass order,
    set the interlace flag) and check the decoder restores them."""
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 4, size=(13, 6))]
    plain = bytearray(encode_gif(img))
    h = 13
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    interlaced_img = img[order]
    data = bytearray(encode_gif(interlaced_img))
    # set the interlace bit in the image descriptor's packed byte.
    # layout: 6 header + 7 LSD + 3*n_pal GCT, then 0x2C + 9 bytes + packed
    n_pal = 2 << (plain[10] & 0x07)
    desc = 13 + 3 * n_pal
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40
    w, hh, out = decode_image(bytes(data))
    assert (w, hh) == (6, 13)
    assert (out == img).all()


def test_deferred_clear_stream():
    """Third-party encoders may freeze the table at 4096 instead of
    clearing; the decoder must freeze too.  Build such a stream
    directly at the LZW layer: encode with a table that stops growing
    at 4095 new codes and never emits CLEAR."""
    rng = np.random.default_rng(5)
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    data = rng.integers(0, 256, size=30000).astype(np.uint8).tobytes()
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    seq = b""
    for px in data:
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < (1 << 12):  # deferred clear: stop adding, no CLEAR
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        seq = bytes([px])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    assert _gif_lzw_decode(bytes(out), min_code, len(data)) == data


def test_palette_limit_raises():
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError):
        encode_gif(rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8))


def test_malformed_streams_raise_valueerror():
    good = _fixture("tiny.gif")
    bads = [
        b"GIF89a",                      # truncated header
        b"GIF89a" + bytes(20),          # no frame / bad blocks
        good[:len(good) // 2],          # truncated mid-stream
        good[:-1],                      # missing trailer byte is fine...
        b"GIF87a" + good[6:30],         # truncated color table / blocks
    ]
    for b in bads:
        try:
            _decode_gif(b)
        except ValueError:
            continue
        except NotImplementedError:
            raise AssertionError("malformed must be ValueError")
        # good[:-1] may legitimately decode (trailer after frame)
        assert b == good[:-1]


def test_gct_missing_lct_missing_raises():
    """A frame with neither global nor local color table is invalid."""
    # header, no GCT; bare image descriptor; min_code 2; empty data
    raw = (
        b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2]) + b"\x00" + b"\x3b"
    )
    with pytest.raises(ValueError, match="color table"):
        _decode_gif(raw)


def test_animated_gif_first_frame():
    """Two frames concatenated: decode returns the FIRST frame."""
    a = np.full((4, 4, 3), 50, np.uint8)
    b = np.full((4, 4, 3), 200, np.uint8)
    ga, gb = encode_gif(a), encode_gif(b)
    n_pal = 2 << (ga[10] & 0x07)
    frame_b = gb[13 + 3 * n_pal:-1]  # b's descriptor+data, minus trailer
    # splice: a's header+GCT+frame, then b's frame (palette differs but
    # the first frame must win before the second is even parsed)
    combined = ga[:-1] + frame_b + b"\x3b"
    _, _, out = decode_image(bytes(combined))
    assert (out == a).all()


def test_gif_thumbnail_matches_ppm_twin(spark):
    """media_thumbnails over GIF/PPM twins of the same pixels must emit
    byte-identical thumbnails (both decoders are lossless)."""
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        media_thumbnails,
    )

    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 5, size=(9, 7))]
    meta = {"mime": "", "width": 7, "height": 9, "duration_ms": 0}
    media = spark.createDataFrame(
        [("a_gif", "image", encode_gif(img), meta),
         ("b_ppm", "image", encode_ppm(img), meta),
         ("c_bad", "image", b"GIF89a broken", meta)],
        schema=MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in
            media_thumbnails(media, 3, 3).collect()}
    assert set(rows) == {"a_gif", "b_ppm"}  # bad row dropped per-row
    assert rows["a_gif"]["thumbnail"] == rows["b_ppm"]["thumbnail"]


def test_every_truncation_raises_valueerror():
    """Every prefix of a valid GIF must raise ValueError (never
    IndexError etc.), so the per-row tolerance in the media kernels
    always catches truncated payloads instead of failing the task."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    good = encode_gif(pal[rng.integers(0, 6, size=(5, 8))])
    for cut in range(len(good)):
        try:
            _decode_gif(good[:cut])
            # a prefix that still contains the full pixel data decodes
            # fine (only terminator/trailer missing) — that's valid
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001 — the point of the test
            raise AssertionError(
                f"prefix of length {cut} raised {type(e).__name__}"
            ) from e


# ---------------------------------------------------------- animated frames


def _patches():
    f0 = np.zeros((8, 10, 3), dtype=np.uint8)
    f0[:, :, 0] = 200  # red canvas
    f1 = np.zeros((4, 5, 3), dtype=np.uint8)
    f1[:, :, 1] = 150  # green patch
    f2 = np.zeros((2, 3, 3), dtype=np.uint8)
    f2[:, :, 2] = 90  # blue patch
    return f0, f1, f2


def test_animated_roundtrip_composition():
    """Three frames with placement rects and disposal 'leave': each
    decoded snapshot is the composition of everything drawn so far."""
    from medical_ocr_pipeline_spark.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    f0, f1, f2 = _patches()
    payload = encode_gif_animated(
        [f0, f1, f2], delays_cs=[5, 10, 15],
        disposals=[1, 1, 1], rects=[(0, 0), (2, 3), (6, 1)],
    )
    w, h, frames = decode_gif_frames(payload)
    assert (w, h) == (10, 8)
    assert [d for d, _ in frames] == [5, 10, 15]
    want = f0.copy()
    assert np.array_equal(frames[0][1], want)
    want[3:7, 2:7] = f1
    assert np.array_equal(frames[1][1], want)
    want[1:3, 6:9] = f2
    assert np.array_equal(frames[2][1], want)


def test_animated_disposal_background_and_previous():
    """Disposal 2 clears the frame rect to background before the next
    frame; disposal 3 restores the pre-frame canvas."""
    from medical_ocr_pipeline_spark.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    f0, f1, f2 = _patches()
    payload = encode_gif_animated(
        [f0, f1, f2], disposals=[1, 2, 3], rects=[(0, 0), (2, 3), (6, 1)],
    )
    _w, _h, frames = decode_gif_frames(payload)
    base = f0.copy()
    # frame 1 visible while shown...
    shown1 = base.copy()
    shown1[3:7, 2:7] = f1
    assert np.array_equal(frames[1][1], shown1)
    # ...but disposal 2 wipes its rect to background (black) afterwards
    after1 = base.copy()
    after1[3:7, 2:7] = 0
    shown2 = after1.copy()
    shown2[1:3, 6:9] = f2
    assert np.array_equal(frames[2][1], shown2)


def test_animated_first_frame_matches_single_decoder():
    """decode_gif_frames(max_frames=1) agrees with the single-frame
    _decode_gif path on a full-canvas first frame."""
    from medical_ocr_pipeline_spark.multimodal import (
        decode_gif_frames,
        decode_image,
        encode_gif_animated,
    )

    f0, f1, _f2 = _patches()
    payload = encode_gif_animated([f0, f1], rects=[(0, 0), (2, 3)])
    w, h, frames = decode_gif_frames(payload, max_frames=1)
    w1, h1, px1 = decode_image(payload)
    assert (w, h) == (w1, h1) == (10, 8)
    assert np.array_equal(frames[0][1], px1)


def test_animated_truncation_raises():
    from medical_ocr_pipeline_spark.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    f0, f1, f2 = _patches()
    full = encode_gif_animated([f0, f1, f2], rects=[(0, 0), (2, 3), (6, 1)])
    for cut in range(2, len(full) - 1, 3):
        try:
            _w, _h, frames = decode_gif_frames(full[:cut])
        except ValueError:
            continue
        # a prefix ending on a clean frame boundary is a shorter video
        assert 1 <= len(frames) <= 3


def test_video_features_via_media_kernel(spark):
    """kind='video' with an animated-GIF payload decodes natively end
    to end through media_features(real_decode=True); a non-GIF video
    payload still costs one row (None features), never the task."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.multimodal import (
        FEATURE_DIM,
        encode_gif_animated,
        media_features,
        video_features,
    )

    f0, f1, f2 = _patches()
    gif = encode_gif_animated(
        [f0, f1, f2], delays_cs=[10, 20, 30], rects=[(0, 0), (2, 3), (6, 1)]
    )
    feats = video_features(gif)
    assert len(feats) == FEATURE_DIM
    assert feats[2] == pytest.approx(3 / 256.0)      # frame count
    assert feats[3] == pytest.approx(60 / 6000.0)    # duration (cs)
    assert feats[14] > 0.0                           # motion present

    rows = [
        Row(media_id="v1", kind="video", payload=bytearray(gif)),
        Row(media_id="v2", kind="video", payload=bytearray(b"\x00mp4junk")),
    ]
    out = {
        r["media_id"]: r["features"]
        for r in media_features(
            spark.createDataFrame(rows), real_decode=True
        ).collect()
    }
    assert out["v2"] is None
    assert [pytest.approx(x) for x in out["v1"]] == feats
