"""MP4 / ISO-BMFF container parsing (mp4.py): writer->parser roundtrip
on real box layouts, sample-table timelines, largesize/degenerate box
handling, and the failure split (ValueError for malformed containers,
NotImplementedError for well-formed-but-unsupported structure)."""

import struct

import pytest

from medical_ocr_pipeline_spark.mp4 import (
    encode_mp4_skeleton,
    mp4_container_features,
    parse_mp4_tracks,
    sample_timeline,
    walk_boxes,
)

SIZES = [500, 120, 130, 140, 600, 110, 115, 125, 580, 100]


def test_skeleton_roundtrip_fields():
    p = encode_mp4_skeleton(320, 240, SIZES, fps=5, keyframe_every=5)
    info = parse_mp4_tracks(p)
    assert info["brand"] == "isom"
    assert info["duration_s"] == pytest.approx(2.0)
    (trk,) = info["tracks"]
    assert trk["kind"] == "video"
    assert trk["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (320.0, 240.0)
    assert trk["n_samples"] == 10
    assert trk["sizes"] == SIZES
    assert trk["keyframes"] == [1, 6]
    assert trk["duration_s"] == pytest.approx(2.0)


def test_chunk_offset_points_at_sample_bytes():
    p = encode_mp4_skeleton(64, 48, SIZES, fps=5)
    (trk,) = parse_mp4_tracks(p)["tracks"]
    off = trk["chunk_offsets"][0]
    # sample 0's deterministic filler: (0*31 + j*7) % 256
    assert p[off: off + 4] == bytes((j * 7) % 256 for j in range(4))
    assert off + sum(SIZES) == len(p)  # single chunk runs to EOF


def test_sample_timeline():
    p = encode_mp4_skeleton(64, 48, SIZES, fps=5, timescale=1000)
    (trk,) = parse_mp4_tracks(p)["tracks"]
    tl = sample_timeline(trk)
    assert [t for t, _s in tl] == pytest.approx(
        [0.2 * i for i in range(10)]
    )
    assert [s for _t, s in tl] == SIZES


def test_container_features_shape_and_values():
    p = encode_mp4_skeleton(320, 240, SIZES, fps=5, keyframe_every=5)
    f = mp4_container_features(p)
    assert len(f) == 16
    assert f[0] == pytest.approx(320 / 4096.0, rel=1e-5)
    assert f[1] == pytest.approx(240 / 4096.0, rel=1e-5)
    assert f[2] == pytest.approx(10 / 65536.0, rel=1e-5)
    assert f[3] == pytest.approx(2.0 / 60.0, rel=1e-5)   # duration
    assert f[4] == pytest.approx(5.0 / 120.0, rel=1e-5)  # fps
    assert f[5] == pytest.approx(0.2, rel=1e-5)          # keyframe ratio
    assert sum(f[6:14]) == pytest.approx(1.0, rel=1e-4)  # bitrate profile
    assert all(v == v for v in f)


def test_walk_boxes_largesize_and_to_eof():
    inner = struct.pack(">I", 8) + b"free"
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 4) + b"abcd"
    toeof = struct.pack(">I", 0) + b"skip" + b"xyz"
    buf = inner + large + toeof
    boxes = list(walk_boxes(buf))
    assert [b[0] for b in boxes] == [b"free", b"mdat", b"skip"]
    t, s, e = boxes[1]
    assert buf[s:e] == b"abcd"
    t, s, e = boxes[2]
    assert buf[s:e] == b"xyz" and e == len(buf)


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        parse_mp4_tracks(b"\x00\x00\x00\x08ftyp"[:6])  # truncated
    with pytest.raises(ValueError):
        list(walk_boxes(struct.pack(">I", 4096) + b"moov"))  # size OOB
    with pytest.raises(ValueError):
        parse_mp4_tracks(struct.pack(">I", 8) + b"mdat")  # no ftyp
    # ftyp but no moov (fragmented-only): unsupported, not malformed
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    with pytest.raises(NotImplementedError):
        parse_mp4_tracks(ftyp)


def test_real_decode_dispatch_mp4_and_failure_tolerance(spark):
    """kind='video' MP4 rows flow through media_features(real_decode=
    True) Arrow batches; a truncated MP4 costs its own row only."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        media_features,
        real_decode_features,
    )

    p = encode_mp4_skeleton(128, 96, [200 + 9 * i for i in range(12)], fps=6)
    assert real_decode_features("video", p) == mp4_container_features(p)
    rows = [
        ("v_ok", "video", p,
         {"mime": "video/mp4", "width": 128, "height": 96,
          "duration_ms": 2000}),
        ("v_bad", "video", p[:40],
         {"mime": "video/mp4", "width": 0, "height": 0, "duration_ms": 0}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r["features"]
        for r in media_features(media, real_decode=True).collect()
    }
    assert got["v_bad"] is None
    assert [round(v, 6) for v in got["v_ok"]] == [
        round(v, 6) for v in mp4_container_features(p)
    ]
