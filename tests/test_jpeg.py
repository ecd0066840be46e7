"""From-scratch baseline JPEG codec (jpeg.py) — the round-3 closure of
the media family's codec extension point (VERDICT r02 adjudicated PNG;
JPEG is the remaining dominant real format).

Coverage: encode->decode roundtrip fidelity at several qualities /
subsamplings / non-block-multiple sizes, restart-marker resync
invariance, committed-fixture goldens for BOTH directions (encoder
bytes and decoder pixels), malformed-stream rejection as ValueError
(so the media kernels' per-row tolerance catches it), progressive
rejection as NotImplementedError, and the Spark media_features /
media_thumbnails paths over JPEG payloads.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from medical_ocr_pipeline_spark.jpeg import decode_jpeg, encode_jpeg

FIX = os.path.join(os.path.dirname(__file__), "fixtures_media")


def _fixture(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def _synth(h, w, seed):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([
        (xx * 7 + seed * 13) % 256,
        (yy * 11 + seed * 29) % 256,
        (xx * 3 + yy * 5 + seed) % 256,
    ], axis=-1).astype(np.uint8)


def _smooth(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (xx + yy) * 255 // max(w + h - 2, 1),
    ], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("hw", [(8, 8), (24, 33), (13, 7), (37, 61)])
def test_roundtrip_444_smooth(hw):
    img = _smooth(*hw)
    w, h, out = decode_jpeg(encode_jpeg(img, quality=95))
    assert (w, h) == (hw[1], hw[0])
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 2.0


def test_roundtrip_420_and_gray():
    img = _smooth(24, 33)
    w, h, out = decode_jpeg(
        encode_jpeg(img, quality=95, subsampling="420")
    )
    assert (w, h) == (33, 24)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0

    w, h, out = decode_jpeg(
        encode_jpeg(img, quality=95, subsampling="gray")
    )
    assert (w, h) == (33, 24)
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])
    assert (out[..., 0] == out[..., 1]).all()
    assert np.abs(out[..., 0].astype(float) - luma).max() < 4.0


def test_restart_intervals_do_not_change_pixels():
    img = _synth(37, 61, 5)
    base = None
    for dri in (0, 1, 3, 7):
        _, _, out = decode_jpeg(
            encode_jpeg(img, quality=90, subsampling="420",
                        restart_interval=dri)
        )
        if base is None:
            base = out
        assert np.array_equal(out, base), f"dri={dri} changed pixels"


def test_encoder_matches_committed_fixtures():
    """The encoder is fully deterministic: re-encoding the fixture
    sources must reproduce the committed bytes exactly."""
    assert encode_jpeg(_synth(11, 16, 1), quality=90,
                       subsampling="444") == _fixture("tiny.jpg")
    assert encode_jpeg(_synth(14, 20, 2), quality=85, subsampling="420",
                       restart_interval=2) == _fixture("tiny_420.jpg")
    assert encode_jpeg(_synth(7, 9, 3), quality=90,
                       subsampling="gray") == _fixture("tiny_gray.jpg")


def test_decoder_fixture_goldens():
    """Decoded pixels of the committed fixtures are pinned — any
    decoder drift (IDCT, upsampling, color transform) fails here."""
    for name, dims, digest in [
        ("tiny.jpg", (16, 11), "9f06ad922478cb36"),
        ("tiny_420.jpg", (20, 14), "7b0a6b3fe2992334"),
        ("tiny_gray.jpg", (9, 7), "337d7fec62fa56be"),
    ]:
        w, h, rgb = decode_jpeg(_fixture(name))
        assert (w, h) == dims
        assert hashlib.sha256(rgb.tobytes()).hexdigest()[:16] == digest
    # fidelity floor for the 444 fixture
    _, _, rgb = decode_jpeg(_fixture("tiny.jpg"))
    assert np.abs(rgb.astype(int) - _synth(11, 16, 1).astype(int)).max() <= 8


def test_malformed_streams_raise_value_error():
    good = _fixture("tiny.jpg")
    for payload in [
        good[:10], good[: len(good) // 2], b"\xff\xd8" + b"\x00" * 40,
        good[:2] + good[40:], b"\xff\xd8\xff\xe0 not decodable",
    ]:
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_progressive_raises_not_implemented():
    good = bytearray(_fixture("tiny.jpg"))
    i = good.find(b"\xff\xc0")
    assert i > 0
    good[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))


def test_decode_image_dispatches_jpeg():
    from medical_ocr_pipeline_spark.multimodal import decode_image

    w, h, rgb = decode_image(_fixture("tiny.jpg"))
    assert (w, h) == (16, 11) and rgb.shape == (11, 16, 3)


def test_media_features_real_decode_jpeg_and_bad_row(spark):
    """A JPEG payload produces real pixel-derived features through the
    Spark kernel; a corrupt JPEG row degrades to features=None without
    failing the task."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        image_features,
        media_features,
    )

    rows = [
        ("img_jpg", "image", _fixture("tiny.jpg"),
         {"mime": "image/jpeg", "width": 16, "height": 11,
          "duration_ms": 0}),
        ("img_bad", "image", b"\xff\xd8\xff\xe0 truncated",
         {"mime": "image/jpeg", "width": 0, "height": 0,
          "duration_ms": 0}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r["features"]
        for r in media_features(media, real_decode=True).collect()
    }
    assert [round(v, 6) for v in got["img_jpg"]] == [
        round(v, 6) for v in image_features(_fixture("tiny.jpg"))
    ]
    assert got["img_bad"] is None


def test_media_thumbnails_accept_jpeg(spark):
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        media_thumbnails,
    )

    rows = [
        ("img_jpg", "image", _fixture("tiny.jpg"),
         {"mime": "image/jpeg", "width": 16, "height": 11,
          "duration_ms": 0}),
        ("img_bad", "image", b"\xff\xd8\xff\xe0 truncated",
         {"mime": "image/jpeg", "width": 0, "height": 0,
          "duration_ms": 0}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    thumbs = media_thumbnails(media, out_w=4, out_h=4).collect()
    ids = [r["media_id"] for r in thumbs]
    assert ids == ["img_jpg"]  # bad row dropped per-row, not fatally
    assert thumbs[0]["thumbnail"][:2] == b"P6"  # PPM re-encode
    assert (thumbs[0]["width"], thumbs[0]["height"]) == (16, 11)
