"""Matroska/WebM EBML container parsing (webm.py): writer->parser
roundtrip on real element layouts, varint rules (RFC 8794), block
timelines and keyframe flags, and the failure split (ValueError for
malformed streams, NotImplementedError for well-formed-but-unsupported
structure)."""

import struct

import pytest

from medical_ocr_pipeline_spark.webm import (
    EBML_HEADER,
    SEGMENT,
    encode_webm_skeleton,
    parse_webm_tracks,
    read_vint,
    walk_elements,
    webm_container_features,
)

SIZES = [500, 120, 130, 140, 600, 110, 115, 125, 580, 100]


def test_skeleton_roundtrip_fields():
    p = encode_webm_skeleton(640, 360, SIZES, fps=5, keyframe_every=5)
    info = parse_webm_tracks(p)
    assert info["doctype"] == "webm"
    assert info["timestamp_scale_ns"] == 1_000_000
    assert info["duration_s"] == pytest.approx(2.0)
    (trk,) = info["tracks"]
    assert trk["kind"] == "video"
    assert trk["codec"] == "V_VP9"
    assert (trk["width"], trk["height"]) == (640, 360)
    assert len(info["blocks"]) == 10


def test_block_timeline_and_keyframes():
    p = encode_webm_skeleton(64, 48, SIZES, fps=5, keyframe_every=5,
                             blocks_per_cluster=4)
    info = parse_webm_tracks(p)
    blocks = info["blocks"]
    # absolute timestamps survive the cluster split (cluster ts + rel)
    assert [b[1] for b in blocks] == pytest.approx(
        [200.0 * i for i in range(10)])
    assert [b[2] for b in blocks] == SIZES
    assert [b[3] for b in blocks] == [i % 5 == 0 for i in range(10)]
    assert all(b[0] == 1 for b in blocks)


def test_read_vint_rules():
    # 1-byte id keeps marker; 1-byte size strips it
    assert read_vint(b"\xae", 0, keep_marker=True) == (0xAE, 1)
    assert read_vint(b"\x85", 0, keep_marker=False) == (5, 1)
    # 2-byte size 0x4282 -> 0x282 stripped
    assert read_vint(b"\x42\x82", 0, keep_marker=False) == (0x282, 2)
    # all-ones size == unknown (-1)
    assert read_vint(b"\xff", 0, keep_marker=False) == (-1, 1)
    with pytest.raises(ValueError):
        read_vint(b"\x00\x01", 0, keep_marker=True)  # >8-byte varint
    with pytest.raises(ValueError):
        read_vint(b"\x41", 0, keep_marker=False)  # truncated body


def test_unknown_size_master_extends_to_parent_end():
    # Segment with unknown size (streamed matroska) parses to EOF
    p = encode_webm_skeleton(32, 32, [50, 60], fps=10)
    segs = list(walk_elements(p))
    assert [e for e, _s, _e in segs] == [EBML_HEADER, SEGMENT]
    hdr_end = segs[0][2]  # Segment's wire start
    _eid, body_s, _body_e = segs[1]
    streamed = p[:hdr_end] + b"\x18\x53\x80\x67\xff" + p[body_s:]
    info = parse_webm_tracks(streamed)
    assert len(info["blocks"]) == 2


def test_container_features_shape_and_values():
    p = encode_webm_skeleton(640, 360, SIZES, fps=5, keyframe_every=5)
    f = webm_container_features(p)
    assert len(f) == 16
    assert f[0] == pytest.approx(640 / 4096.0, rel=1e-5)
    assert f[1] == pytest.approx(360 / 4096.0, rel=1e-5)
    assert f[2] == pytest.approx(10 / 65536.0, rel=1e-5)
    assert f[3] == pytest.approx(2.0 / 60.0, rel=1e-5)   # duration
    assert f[4] == pytest.approx(5.0 / 120.0, rel=1e-5)  # fps
    assert f[5] == pytest.approx(0.2, rel=1e-5)          # keyframe ratio
    assert sum(f[6:14]) == pytest.approx(1.0, rel=1e-4)  # byte-rate profile
    assert all(v == v for v in f)


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        parse_webm_tracks(b"\x1aE")  # truncated magic
    with pytest.raises(ValueError):
        parse_webm_tracks(b"\x42\x82\x81x")  # no EBML header first
    p = encode_webm_skeleton(32, 32, [10], doctype="webm")
    with pytest.raises(ValueError):
        parse_webm_tracks(p[:-3])  # truncated final element
    with pytest.raises(NotImplementedError):
        parse_webm_tracks(
            encode_webm_skeleton(32, 32, [10], doctype="tank"))
    # header-only stream (no Segment)
    hdr = list(walk_elements(p))[0]
    with pytest.raises(ValueError):
        parse_webm_tracks(p[: hdr[2]])


def test_truncation_fuzz_every_prefix_raises_or_parses():
    """Per-row failure tolerance depends on malformed payloads raising
    (ValueError/NotImplementedError), never hanging or succeeding with
    garbage: check every prefix length."""
    p = encode_webm_skeleton(48, 32, [40, 50, 60], fps=10)
    for cut in range(len(p)):
        try:
            parse_webm_tracks(p[:cut])
        except (ValueError, NotImplementedError):
            continue


def test_real_decode_dispatch_webm_and_failure_tolerance(spark):
    """kind='video' WebM rows flow through media_features(real_decode=
    True) Arrow batches; a truncated stream costs its own row only."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        media_features,
        real_decode_features,
    )

    p = encode_webm_skeleton(256, 144, [200 + 9 * i for i in range(12)],
                             fps=6)
    assert real_decode_features("video", p) == webm_container_features(p)
    rows = [
        ("w_ok", "video", p,
         {"mime": "video/webm", "width": 256, "height": 144,
          "duration_ms": 2000}),
        ("w_bad", "video", p[:30],
         {"mime": "video/webm", "width": 0, "height": 0,
          "duration_ms": 0}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r["features"]
        for r in media_features(media, real_decode=True).collect()
    }
    assert got["w_bad"] is None
    assert [round(v, 6) for v in got["w_ok"]] == [
        round(v, 6) for v in webm_container_features(p)
    ]
