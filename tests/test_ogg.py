"""Ogg container triage (ogg.py): page walk with verified CRCs,
Vorbis/Opus identification headers, granule-position duration (Opus
pre-skip honored), lacing >255-byte packets, and the corrupt-page
guard."""

import struct

import pytest

from medical_ocr_pipeline_spark.ogg import (
    encode_ogg_skeleton,
    ogg_container_features,
    ogg_crc,
    ogg_info,
)


def test_opus_duration_honors_pre_skip():
    pl = encode_ogg_skeleton("opus", samples=96000, pre_skip=312)
    info = ogg_info(pl)
    assert info["codec"] == "opus"
    assert info["sample_rate"] == 48000  # granule clock, always
    assert info["duration_ms"] == (96000 - 312) * 1000 // 48000


def test_vorbis_duration_uses_stream_rate():
    pl = encode_ogg_skeleton("vorbis", samples=88200, sample_rate=44100,
                             channels=1)
    info = ogg_info(pl)
    assert info["codec"] == "vorbis"
    assert info["channels"] == 1
    assert info["duration_ms"] == 2000


def test_large_packet_lacing():
    """A packet over 255 bytes spans multiple lacing values (0xFF
    continuation) — the walker must sum them."""
    from medical_ocr_pipeline_spark.ogg import _page

    ident = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
             + struct.pack("<I", 48000) + b"\x00\x00\x00")
    pages = [_page(7, 0, 0, 0x02, [ident]),
             _page(7, 1, 48000, 0x04, [b"\xab" * 700])]
    info = ogg_info(b"".join(pages))
    assert info["n_pages"] == 2
    assert info["body_bytes"] == len(ident) + 700
    assert info["duration_ms"] == 1000


def test_crc_is_the_spec_vector():
    """CRC-32 poly 0x04c11db7, no reflection, ZERO init and xor-out —
    Ogg's variant (NOT CRC-32/MPEG-2, whose init is all-ones):
    '123456789' -> 0x89A1897F, the widely published Ogg check value."""
    assert ogg_crc(b"123456789") == 0x89A1897F


def test_corrupt_page_raises():
    pl = bytearray(encode_ogg_skeleton("opus"))
    pl[40] ^= 0xFF  # flip a body byte: CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        ogg_info(bytes(pl))
    with pytest.raises(ValueError):
        ogg_info(b"not an ogg stream")


def test_features_shape_and_dispatch():
    from medical_ocr_pipeline_spark.multimodal import real_decode_features

    pl = encode_ogg_skeleton("opus", samples=48000)
    feats = ogg_container_features(pl)
    assert len(feats) == 16
    assert feats[3] == 1.0  # opus flag
    assert real_decode_features("audio", pl) == feats
