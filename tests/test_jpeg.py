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
import struct

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
        ("tiny.jpg", (16, 11), "6fc0c448a22b23c7"),
        ("tiny_420.jpg", (20, 14), "fbee3e617efbc4c6"),
        ("tiny_gray.jpg", (9, 7), "53e3a79059a832c4"),
    ]:
        w, h, rgb = decode_jpeg(_fixture(name))
        assert (w, h) == dims
        assert hashlib.sha256(rgb.tobytes()).hexdigest()[:16] == digest
    # fidelity floor for the 444 fixture (tightened from 8 to 4 by the
    # natural-vs-zigzag quant-table ordering fix)
    _, _, rgb = decode_jpeg(_fixture("tiny.jpg"))
    assert np.abs(rgb.astype(int) - _synth(11, 16, 1).astype(int)).max() <= 4


def test_malformed_streams_raise_value_error():
    good = _fixture("tiny.jpg")
    for payload in [
        good[:10], good[: len(good) // 2], b"\xff\xd8" + b"\x00" * 40,
        good[:2] + good[40:], b"\xff\xd8\xff\xe0 not decodable",
    ]:
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_effective_quant_table_is_annex_k():
    """Regression: the encoder's effective natural-order luma table at
    quality 50 must be exactly Annex K — a zigzag/natural ordering mixup
    scrambles low/high-frequency quantization while still roundtripping
    (decoder reads the same scrambled DQT), so only this pins it."""
    good = _fixture("tiny.jpg")
    i = good.find(b"\xff\xdb")
    assert i > 0
    # fixture is quality 90: Annex-K base scaled by (200-2*90)/100
    vals = good[i + 5:i + 5 + 64]  # DQT payload after len+id byte
    from medical_ocr_pipeline_spark.jpeg import ZIGZAG, _QUANT_LUMA
    natural = [0] * 64
    for k, z in enumerate(ZIGZAG):
        natural[z] = vals[k]
    expect = [min(255, max(1, (t * 20 + 50) // 100)) for t in _QUANT_LUMA]
    assert natural == expect


def test_huge_sof_dims_raise_value_error_before_allocating():
    """Regression: a tiny payload declaring a 60000x60000 frame must be
    rejected as ValueError (payload-size sanity bound), not attempt a
    multi-GB plane allocation that MemoryErrors the whole Spark task."""
    good = bytearray(_fixture("tiny.jpg"))
    i = good.find(b"\xff\xc0")
    struct_at = i + 5  # skip marker(2) + len(2) + precision(1)
    good[struct_at:struct_at + 4] = (60000).to_bytes(2, "big") * 2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_zero_sof_dims_raise_value_error():
    """Regression: width=0 or height=0 must raise, not return an empty
    array that IndexErrors downstream in resize_rgb/media_thumbnails."""
    good = bytearray(_fixture("tiny.jpg"))
    i = good.find(b"\xff\xc0")
    good[i + 5:i + 9] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_fill_bytes_before_markers_are_skipped():
    """Regression: T.81 B.1.1.2 allows any number of 0xFF fill bytes
    before a marker; inserting one must not derail header parsing."""
    good = _fixture("tiny.jpg")
    i = good.find(b"\xff\xdb")
    padded = good[:i] + b"\xff" + good[i:]
    w, h, rgb = decode_jpeg(padded)
    _, _, base = decode_jpeg(good)
    assert (w, h) == (16, 11) and np.array_equal(rgb, base)


def test_multi_scan_sos_raises_not_implemented():
    """Regression: a scan covering fewer components than the frame
    (legal non-interleaved baseline) must raise NotImplementedError,
    not silently interleave-decode garbage pixels."""
    good = bytearray(_fixture("tiny.jpg"))
    i = good.find(b"\xff\xda")
    assert i > 0
    # rewrite SOS to cover only component 1: len=8, ns=1, (cid=1,tt=0),
    # spectral 0..63, ah/al 0
    new_sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    old_len = struct.unpack(">H", good[i + 2:i + 4])[0]
    patched = bytes(good[:i]) + new_sos + bytes(good[i + 2 + old_len:])
    with pytest.raises(NotImplementedError):
        decode_jpeg(patched)


def test_grayscale_with_221_sampling_decodes_non_interleaved():
    """Regression: T.81 A.2.2 — a single-component scan is
    non-interleaved (one data unit per MCU, sampling factors ignored).
    A grayscale stream whose SOF declares h=v=2 must decode to the
    same pixels as the h=v=1 encoding of the same image."""
    img = _smooth(24, 33)
    enc = bytearray(encode_jpeg(img, quality=95, subsampling="gray"))
    _, _, base = decode_jpeg(bytes(enc))
    i = enc.find(b"\xff\xc0")
    # SOF comp spec starts at marker+2(len)+1(prec)+4(dims)+1(nc):
    # [cid, hv, tq] — patch hv from 0x11 to 0x22
    hv_at = i + 2 + 2 + 1 + 4 + 1 + 1
    assert enc[hv_at] == 0x11
    enc[hv_at] = 0x22
    _, _, out = decode_jpeg(bytes(enc))
    assert np.array_equal(out, base)


def test_baseline_scan_under_sof2_marker_is_malformed():
    """A baseline stream whose SOF0 marker is flipped to SOF2 is NOT a
    valid progressive file (its single scan declares Ss=0, Se=63 —
    illegal progressive spectral selection) — round 4's progressive
    decoder rejects it as ValueError so the per-row media tolerance
    catches it, where round 3 raised NotImplementedError."""
    good = bytearray(_fixture("tiny.jpg"))
    i = good.find(b"\xff\xc0")
    assert i > 0
    good[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


# ------------------------------------------------------------- progressive


def test_progressive_decodes_identical_to_baseline():
    """THE progressive invariant: encode_jpeg_progressive emits the
    same quantized coefficients as encode_jpeg in a six-phase scan
    script (DC Al=1, per-component AC bands at Al=2, two AC refinement
    passes, DC refinement), so both decode to bit-identical pixels —
    every successive-approximation bit must land exactly."""
    from medical_ocr_pipeline_spark.jpeg import encode_jpeg_progressive

    cases = [
        ((24, 33), "444"), ((21, 18), "420"), ((16, 16), "gray"),
        ((8, 8), "444"), ((40, 25), "420"), ((13, 7), "444"),
    ]
    for (h, w), sub in cases:
        img = _synth(h, w, h + w)
        for q in (85, 50):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsampling=sub))
            assert base[0] == prog[0] and base[1] == prog[1]
            assert np.array_equal(base[2], prog[2]), (h, w, sub, q)


def test_progressive_eobn_runs_roundtrip():
    """A constant image zeroes every AC band, so each AC scan is one
    EOBn run covering all blocks — the run-length decode path the
    standard Annex-K tables can never produce (they lack EOBn symbols;
    the progressive encoder ships a flat stream-embedded table)."""
    from medical_ocr_pipeline_spark.jpeg import encode_jpeg_progressive

    img = np.full((96, 144, 3), 137, dtype=np.uint8)
    p = encode_jpeg_progressive(img, quality=85)
    b = encode_jpeg(img, quality=85)
    assert np.array_equal(decode_jpeg(p)[2], decode_jpeg(b)[2])
    # all-zero AC blocks collapse into EOBn runs: at a size where the
    # fixed header overhead (flat DHT + 6 scan headers) is amortized,
    # the progressive stream undercuts baseline's one-EOB-per-block cost
    assert len(p) < len(b)


def test_progressive_fixture_goldens():
    """Committed progressive fixture pins BOTH directions — and its
    decoded pixels hash-match the baseline tiny_420.jpg golden (same
    source, quality, and subsampling => same pixels by the invariant)."""
    from medical_ocr_pipeline_spark.jpeg import encode_jpeg_progressive

    assert encode_jpeg_progressive(
        _synth(14, 20, 2), quality=85, subsampling="420"
    ) == _fixture("tiny_prog.jpg")
    w, h, rgb = decode_jpeg(_fixture("tiny_prog.jpg"))
    assert (w, h) == (20, 14)
    assert hashlib.sha256(rgb.tobytes()).hexdigest()[:16] == \
        "fbee3e617efbc4c6"  # == tiny_420.jpg's pinned decode golden


def test_progressive_truncation_prefix_fuzz():
    """Every strict prefix of the progressive fixture either raises
    ValueError or (when it ends on a complete scan boundary) decodes a
    partial-precision image of the right shape — never crashes, never
    returns garbage shapes (the per-row tolerance contract)."""
    full = _fixture("tiny_prog.jpg")
    for cut in range(2, len(full) - 1, 7):
        try:
            w, h, rgb = decode_jpeg(full[:cut])
        except (ValueError, NotImplementedError):
            continue
        # a prefix ending exactly after a full scan is a legal
        # progressive stream at reduced precision
        assert (w, h) == (20, 14) and rgb.shape == (14, 20, 3)


def test_progressive_decode_image_dispatch():
    from medical_ocr_pipeline_spark.multimodal import decode_image

    w, h, rgb = decode_image(_fixture("tiny_prog.jpg"))
    assert (w, h) == (20, 14) and rgb.shape == (14, 20, 3)


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
