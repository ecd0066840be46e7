"""Ogg container triage (RFC 3533) with Vorbis/Opus identification
headers — the last member of the audio container-triage family
(mp3.py frame walk, mp4.py boxes, webm.py EBML).

A physical Ogg stream is a sequence of pages: capture "OggS", version,
header-type flags (continuation/BOS/EOS), a 64-bit granule position,
stream serial, page sequence, CRC, and a lacing table.  The BOS page
carries the codec identification packet — "\\x01vorbis" (channels +
sample rate inline) or "OpusHead" (channels, pre-skip, 48 kHz granule
clock) — and the LAST page's granule position gives the total PCM
sample count, so duration falls out of a pure page walk with zero DSP.
The per-page CRC (CRC-32, polynomial 0x04c11db7, no reflection, zero
init/xor, computed with the CRC field zeroed) is VERIFIED — a corrupt
page costs the row a ValueError, which media_features' per-row catch
absorbs.  Packet-level audio decode (Vorbis floor/residue, Opus
SILK/CELT) stays the documented external-codec extension point.
"""

from __future__ import annotations

import struct

# CRC-32/MPEG-2 style table: poly 0x04c11db7, MSB-first, no reflection
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def _parse_page(payload: bytes, pos: int):
    """One page at pos -> (next_pos, header_type, granule, serial,
    body_bytes, first_packet_prefix) with CRC verified."""
    if payload[pos:pos + 4] != b"OggS":
        raise ValueError("Ogg capture pattern missing")
    if payload[pos + 4] != 0:
        raise ValueError("unsupported Ogg version")
    htype = payload[pos + 5]
    granule, serial = struct.unpack_from("<qI", payload, pos + 6)
    crc_stored = struct.unpack_from("<I", payload, pos + 22)[0]
    n_seg = payload[pos + 26]
    lacing = payload[pos + 27:pos + 27 + n_seg]
    if len(lacing) < n_seg:
        raise ValueError("truncated Ogg lacing table")
    body_len = sum(lacing)
    end = pos + 27 + n_seg + body_len
    if end > len(payload):
        raise ValueError("truncated Ogg page body")
    page = bytearray(payload[pos:end])
    page[22:26] = b"\x00\x00\x00\x00"
    if ogg_crc(bytes(page)) != crc_stored:
        raise ValueError("Ogg page CRC mismatch")
    body = payload[pos + 27 + n_seg:end]
    return end, htype, granule, serial, body


def ogg_info(payload: bytes) -> dict:
    """Page-walk summary: {codec, channels, sample_rate, pre_skip,
    n_pages, duration_ms, body_bytes}.  Raises ValueError on a
    malformed/corrupt stream."""
    pos = 0
    codec = None
    channels = sample_rate = pre_skip = 0
    n_pages = 0
    body_bytes = 0
    last_granule = 0
    audio_serial = None
    while pos + 27 <= len(payload):
        pos, htype, granule, serial, body = _parse_page(payload, pos)
        n_pages += 1
        body_bytes += len(body)
        if htype & 0x02:  # BOS: identification packet
            if body.startswith(b"\x01vorbis"):
                codec = "vorbis"
                audio_serial = serial
                channels = body[11]
                sample_rate = struct.unpack_from("<I", body, 12)[0]
            elif body.startswith(b"OpusHead"):
                codec = "opus"
                audio_serial = serial
                channels = body[9]
                pre_skip = struct.unpack_from("<H", body, 10)[0]
                sample_rate = 48000  # Opus granules tick at 48 kHz
        if serial == audio_serial and granule >= 0:
            last_granule = max(last_granule, granule)
    if n_pages == 0 or codec is None:
        raise ValueError("no Ogg Vorbis/Opus stream found")
    samples = max(0, last_granule - (pre_skip if codec == "opus" else 0))
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": sample_rate,
        "pre_skip": pre_skip,
        "n_pages": n_pages,
        "duration_ms": samples * 1000 // sample_rate if sample_rate else 0,
        "body_bytes": body_bytes,
    }


def ogg_container_features(payload: bytes) -> list[float]:
    """16 triage floats (mp3/mp4/webm conventions): duration, rate,
    channels, codec flag, page count, mean page body, bitrate estimate,
    pre-skip, and an 8-point page-size-over-time profile."""
    info = ogg_info(payload)
    sizes = []
    pos = 0
    while pos + 27 <= len(payload):
        pos, _h, _g, _s, body = _parse_page(payload, pos)
        sizes.append(len(body))
    prof = []
    for i in range(8):
        seg = sizes[i * len(sizes) // 8:(i + 1) * len(sizes) // 8] or [0]
        prof.append(sum(seg) / len(seg) / 65536.0)
    dur_s = info["duration_ms"] / 1000.0
    out = [
        dur_s / 60.0,
        info["sample_rate"] / 48000.0,
        info["channels"] / 2.0,
        1.0 if info["codec"] == "opus" else 0.0,
        info["n_pages"] / 4096.0,
        (info["body_bytes"] / info["n_pages"]) / 65536.0,
        (info["body_bytes"] * 8 / dur_s / 1e6) if dur_s > 0 else 0.0,
        info["pre_skip"] / 48000.0,
        *prof,
    ]
    import numpy as np

    return [float(np.float32(v)) for v in out]


def _page(serial: int, seq: int, granule: int, htype: int,
          packets: list[bytes]) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pk in packets:
        q, r = divmod(len(pk), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pk
    head = (
        b"OggS" + bytes([0, htype])
        + struct.pack("<qI", granule, serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)]) + bytes(lacing)
    )
    page = bytearray(head + body)
    page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
    return bytes(page)


def encode_ogg_skeleton(codec: str = "opus", n_pages: int = 6,
                        samples: int = 96000, channels: int = 2,
                        sample_rate: int = 44100,
                        pre_skip: int = 312) -> bytes:
    """Valid Ogg page chain with real CRCs and a genuine Vorbis/Opus
    identification header; audio packets are opaque filler (a page
    walker never decodes them) — the fixture builder for triage
    tests."""
    serial = 0x1234
    if codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate) + b"\x00\x00\x00"
        )
    else:
        ident = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", sample_rate)
            + struct.pack("<iii", -1, 128000, -1) + b"\xb8\x01"
        )
    out = [_page(serial, 0, 0, 0x02, [ident])]
    for i in range(1, n_pages):
        gran = samples * i // (n_pages - 1) if n_pages > 1 else samples
        htype = 0x04 if i == n_pages - 1 else 0x00
        out.append(_page(serial, i, gran, htype,
                         [b"\x5a" * (40 + 13 * i)]))
    return b"".join(out)
