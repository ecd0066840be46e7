"""Baseline TIFF codec: encode/decode round trip, both byte orders,
strip assembly, PackBits (the classic Apple test vector), bilevel
photometric handling, and the documented unsupported-format guards."""

import struct

import numpy as np
import pytest

from medical_ocr_pipeline_spark.multimodal import (
    _decode_tiff,
    _packbits,
    decode_image,
    encode_tiff,
)


def _rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _build_tiff(e, entries, tail, pixel, first_strip_off=None):
    """Hand-assemble a single-IFD TIFF: header, pixel data at offset 8,
    IFD after it, `tail` bytes appended after the IFD (out-of-line
    values referenced by the entries)."""
    ifd_off = 8 + len(pixel)
    head = (b"II" if e == "<" else b"MM") + struct.pack(e + "H", 42)
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            ifd += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack(e + "HHII", tag, typ, cnt, val)
    ifd += struct.pack(e + "I", 0)
    return head + struct.pack(e + "I", ifd_off) + pixel + ifd + tail


def test_round_trip_rgb():
    arr = _rgb(13, 7)
    w, h, out = decode_image(encode_tiff(arr))
    assert (w, h) == (7, 13)
    assert np.array_equal(out, arr)


def test_packbits_apple_vector():
    # the canonical PackBits vector from the TIFF 6.0 spec:
    # FE AA | 02 80 00 2A | FD AA | 03 80 00 2A 22 | F7 AA
    # -> AA*3, literals 80 00 2A, AA*4, literals 80 00 2A 22, AA*10
    data = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert _packbits(data, len(want)) == want


def test_gray_big_endian_multistrip_packbits():
    # 4x6 gray gradient, 2 rows/strip, PackBits per strip, MM order
    px = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10

    def pb(row_bytes):  # all-literal encoding
        return bytes([len(row_bytes) - 1]) + row_bytes

    strips = [
        pb(px[0:2].tobytes()),
        pb(px[2:4].tobytes()),
    ]
    pixel = b"".join(strips)
    offs = [8, 8 + len(strips[0])]
    e = ">"
    ifd_off = 8 + len(pixel)
    # out-of-line arrays (StripOffsets/ByteCounts, 2 LONGs each) follow
    # the IFD: 8 entries, 2 + 8*12 + 4 bytes
    arr_off = ifd_off + 2 + 8 * 12 + 4
    entries = [
        (256, 4, 1, 6),
        (257, 4, 1, 4),
        (258, 3, 1, 8),
        (259, 3, 1, 32773),
        (262, 3, 1, 1),
        (273, 4, 2, arr_off),
        (278, 4, 1, 2),
        (279, 4, 2, arr_off + 8),
    ]
    tail = struct.pack(e + "II", *offs) + struct.pack(
        e + "II", len(strips[0]), len(strips[1])
    )
    payload = _build_tiff(e, entries, tail, pixel)
    w, h, out = _decode_tiff(payload)
    assert (w, h) == (6, 4)
    assert np.array_equal(out[:, :, 0], px)
    assert np.array_equal(out[:, :, 1], px)  # gray replicated


def test_bilevel_photometric_inversion():
    # 2x10 bilevel: row 0 = 1010..., row 1 = all ones; 2-byte rows
    rows = bytes([0b10101010, 0b10000000, 0b11111111, 0b11000000])
    for photo, one_val in ((1, 255), (0, 0)):
        entries = [
            (256, 4, 1, 10),
            (257, 4, 1, 2),
            (258, 3, 1, 1),
            (259, 3, 1, 1),
            (262, 3, 1, photo),
            (273, 4, 1, 8),
            (279, 4, 1, len(rows)),
        ]
        payload = _build_tiff("<", entries, b"", rows)
        w, h, out = _decode_tiff(payload)
        assert (w, h) == (10, 2)
        want0 = [one_val if i % 2 == 0 else 255 - one_val for i in range(10)]
        assert list(out[0, :, 0]) == want0
        assert set(out[1, :, 0].tolist()) == {one_val}


def test_unsupported_guards():
    arr = _rgb(4, 4)
    good = encode_tiff(arr)
    # flip Compression (tag 259) to old-style JPEG-in-TIFF (6), still
    # the documented extension point: NotImplementedError.  (G3 (3)
    # and G4 (4) are real codecs since round 5 — on this RGB file they
    # raise ValueError instead, because CCITT requires bilevel.)
    ifd_off = struct.unpack("<I", good[4:8])[0]
    n = struct.unpack("<H", good[ifd_off:ifd_off + 2])[0]

    def with_compression(comp: int) -> bytes:
        bad = bytearray(good)
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            if struct.unpack("<H", good[off:off + 2])[0] == 259:
                bad[off + 8:off + 10] = struct.pack("<H", comp)
        return bytes(bad)

    with pytest.raises(NotImplementedError):
        _decode_tiff(with_compression(6))
    for ccitt_comp in (3, 4):
        with pytest.raises(ValueError, match="bilevel"):
            _decode_tiff(with_compression(ccitt_comp))
    with pytest.raises(ValueError):
        _decode_tiff(b"II\x00\x00" + good[4:])  # bad magic
    with pytest.raises(ValueError):
        _decode_tiff(good[:20])  # truncated


def test_decode_image_dispatch_and_features():
    from medical_ocr_pipeline_spark.multimodal import image_features

    arr = _rgb(9, 9, seed=11)
    payload = encode_tiff(arr)
    w, h, out = decode_image(payload)
    assert (w, h) == (9, 9) and np.array_equal(out, arr)
    feats = image_features(payload)
    assert len(feats) > 0


def test_zero_count_ifd_entry_raises_valueerror_not_indexerror():
    """A malformed IFD whose required tag has count=0 must surface as
    ValueError (in media_features' per-row catch tuple), never
    IndexError (which would kill the whole task)."""
    # tag 256 with cnt=0 -> skipped -> missing required tag
    entries = [(256, 4, 0, 0), (257, 4, 1, 2)]
    payload = _build_tiff("<", entries, b"", b"\x00" * 4)
    with pytest.raises(ValueError):
        _decode_tiff(payload)


def test_padded_uncompressed_strip_does_not_shift_rows():
    """Writers may pad StripByteCounts past the row payload; the pad
    byte must be trimmed or every subsequent row shifts silently."""
    px = np.arange(12, dtype=np.uint8).reshape(2, 6) * 9
    strips = [px[0:1].tobytes() + b"\xee", px[1:2].tobytes()]  # padded
    pixel = b"".join(strips)
    ifd_off = 8 + len(pixel)
    arr_off = ifd_off + 2 + 8 * 12 + 4
    entries = [
        (256, 4, 1, 6),
        (257, 4, 1, 2),
        (258, 3, 1, 8),
        (259, 3, 1, 1),
        (262, 3, 1, 1),
        (273, 4, 2, arr_off),
        (278, 4, 1, 1),
        (279, 4, 2, arr_off + 8),
    ]
    tail = struct.pack("<II", 8, 8 + len(strips[0])) + struct.pack(
        "<II", len(strips[0]), len(strips[1])
    )
    payload = _build_tiff("<", entries, tail, pixel)
    w, h, out = _decode_tiff(payload)
    assert (w, h) == (6, 2)
    assert np.array_equal(out[:, :, 0], px)


def test_lzw_round_trip_small():
    from medical_ocr_pipeline_spark.multimodal import (
        _tiff_lzw,
        _tiff_lzw_encode,
    )

    for data in (b"", b"A", b"TOBEORNOTTOBEORTOBEORNOT" * 3,
                 bytes(range(256)) * 2, b"\x00" * 500):
        enc = _tiff_lzw_encode(data)
        assert _tiff_lzw(enc, len(data)) == data


def test_lzw_round_trip_wide_codes_and_clear():
    """Enough distinct material to grow the code width to 12 bits and
    force the mid-stream Clear at table size 4094 — plus the KwKwK
    chain from long constant runs."""
    from medical_ocr_pipeline_spark.multimodal import (
        _tiff_lzw,
        _tiff_lzw_encode,
    )

    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size=40000, dtype=np.uint8).tobytes()
    data += b"\xaa" * 1000
    enc = _tiff_lzw_encode(data)
    assert _tiff_lzw(enc, len(data)) == data
    # random bytes are incompressible: 12-bit codes over ~1.2-byte
    # strings cap the expansion at ~1.5x
    assert len(enc) < len(data) * 1.55


def test_tiff_lzw_integration_with_and_without_predictor():
    arr = _rgb(21, 17, seed=5)
    for pred in (1, 2):
        payload = encode_tiff(arr, compression=5, predictor=pred)
        w, h, out = decode_image(payload)
        assert (w, h) == (17, 21)
        assert np.array_equal(out, arr)
    # predictor 2 helps smooth gradients (the reason scanners use it)
    grad = np.zeros((32, 64, 3), dtype=np.uint8)
    grad[:] = np.arange(64, dtype=np.uint8)[None, :, None] * 3
    assert len(encode_tiff(grad, 5, 2)) < len(encode_tiff(grad, 5, 1))


def test_tiff_lzw_truncated_raises():
    arr = _rgb(9, 9, seed=6)
    payload = encode_tiff(arr, compression=5)
    # chop bytes out of the strip: ValueError (per-row catch tuple)
    bad = payload[:40] + payload[60:]
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(bad)


def test_fuzz_lzw_round_trip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from medical_ocr_pipeline_spark.multimodal import (
        _tiff_lzw,
        _tiff_lzw_encode,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=3000))
    def inner(data):
        assert _tiff_lzw(_tiff_lzw_encode(data), len(data)) == data

    inner()


def _smooth(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    base = (40 + 14 * np.sin(y / 3 + seed) + 11 * np.cos(x / 4)) % 256
    return np.stack([base, base + 30, base + 60], axis=2).astype(np.uint8)


def test_jpeg_in_tiff_single_strip_exact_vs_direct():
    """Compression 7, self-contained strip: pixel-identical to decoding
    the same JFIF stream directly (same codec, same bytes)."""
    from medical_ocr_pipeline_spark.jpeg import decode_jpeg, encode_jpeg
    from medical_ocr_pipeline_spark.multimodal import encode_tiff_jpeg

    arr = _smooth(24, 16)
    w, h, out = decode_image(encode_tiff_jpeg(arr))
    assert (w, h) == (16, 24)
    ref = decode_jpeg(encode_jpeg(arr, quality=90))[2]
    assert np.array_equal(out, ref)


def test_jpeg_in_tiff_multistrip():
    from medical_ocr_pipeline_spark.multimodal import encode_tiff_jpeg

    arr = _smooth(24, 16, seed=2)
    w, h, out = decode_image(encode_tiff_jpeg(arr, rows_per_strip=8))
    assert (w, h, out.shape) == (16, 24, (24, 16, 3))
    # strips decode independently; content stays close to the source
    assert float(np.abs(out.astype(int) - arr.astype(int)).mean()) < 12


def test_jpeg_in_tiff_abbreviated_streams_with_jpegtables():
    """The JPEGTables (347) variant: DQT/DHT segments move into the
    tag payload, strips keep only SOF/SOS — the decoder splices the
    tables back after each strip's SOI.  Result must equal the
    self-contained form bit for bit."""
    from medical_ocr_pipeline_spark.jpeg import encode_jpeg
    from medical_ocr_pipeline_spark.multimodal import encode_tiff_jpeg

    arr = _smooth(16, 16, seed=5)
    full = encode_jpeg(arr, quality=90)

    # split the JFIF stream: DQT (FFDB) + DHT (FFC4) -> tables
    tables, rest = bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(full):
        marker = full[pos:pos + 2]
        if marker == b"\xff\xd9":
            rest += marker
            break
        seg_len = struct.unpack(">H", full[pos + 2:pos + 4])[0]
        seg = full[pos:pos + 2 + seg_len]
        if marker in (b"\xff\xdb", b"\xff\xc4"):
            tables += seg
        else:
            rest += seg
        pos += 2 + seg_len
        if marker == b"\xff\xda":  # SOS: rest of stream is entropy data
            rest += full[pos:]
            break
    tables += b"\xff\xd9"

    strip = bytes(rest)
    ifd_off = 8 + len(strip)
    entries = [
        (256, 4, 1, 16), (257, 4, 1, 16), (258, 3, 1, 8),
        (259, 3, 1, 7), (262, 3, 1, 6), (273, 4, 1, 8),
        (277, 3, 1, 3), (279, 4, 1, len(strip)),
        (347, 7, len(tables), ifd_off + 2 + 9 * 12 + 4),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    ifd += bytes(tables)
    payload = b"II*\x00" + struct.pack("<I", ifd_off) + strip + ifd
    w, h, out = decode_image(payload)
    _, _, want = decode_image(encode_tiff_jpeg(arr))
    assert (w, h) == (16, 16)
    assert np.array_equal(out, want)


def test_jpeg_in_tiff_bad_strip_raises():
    from medical_ocr_pipeline_spark.multimodal import encode_tiff_jpeg

    arr = _smooth(8, 8)
    payload = bytearray(encode_tiff_jpeg(arr))
    payload[8] = 0x00  # clobber the strip's SOI
    with pytest.raises(ValueError, match="SOI"):
        decode_image(bytes(payload))
