"""CCITT G4 (T.6) / MH (T.4 1-D) codecs: hand-computed bit-stream
vectors (a transposed table code fails HERE, not just symmetrically in
encode+decode), mode coverage (vertical/horizontal/pass, makeups,
extended makeups), strip independence, TIFF integration, and the
corrupt-stream guards."""

import struct

import numpy as np
import pytest

from medical_ocr_pipeline_spark.ccitt import (
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)
from medical_ocr_pipeline_spark.multimodal import (
    decode_image,
    encode_tiff_ccitt,
)


def _bits_of(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


EOFB = "000000000001" * 2


def test_g4_all_white_hand_vector():
    """Two all-white lines: each is one V0 ('1' — a1 = b1 = line end),
    then EOFB, zero-padded to a byte."""
    img = np.zeros((2, 8), dtype=np.uint8)
    enc = encode_g4(img)
    want = ("11" + EOFB).ljust(-(-len("11" + EOFB) // 8) * 8, "0")
    assert _bits_of(enc) == want
    assert np.array_equal(decode_g4(enc, 8, 2), img)


def test_g4_vertical_hand_vector():
    """Row 0110 (w=4): the imaginary white reference puts b1 at 4, so
    the transition at 1 is within +/-3 -> VL3 ('0000010'), the
    transition at 3 is VL1 ('010'), line end is V0 ('1')."""
    img = np.array([[0, 1, 1, 0]], dtype=np.uint8)
    enc = encode_g4(img)
    core = "0000010" + "010" + "1" + EOFB
    assert _bits_of(enc) == core.ljust(-(-len(core) // 8) * 8, "0")
    assert np.array_equal(decode_g4(enc, 4, 1), img)


def test_g4_horizontal_hand_vector():
    """w=16 row, black run [1, 3): the first transition is 15 left of
    b1 = 16, beyond the vertical window -> horizontal mode 001 +
    white-run-1 (000111) + black-run-2 (11); then a0 = 3 white,
    a1 = b1 = 16 -> V0 ('1').  The exact stream pins the white-1 and
    black-2 table entries."""
    img = np.zeros((1, 16), dtype=np.uint8)
    img[0, 1:3] = 1
    enc = encode_g4(img)
    core = "001" + "000111" + "11" + "1" + EOFB
    assert _bits_of(enc) == core.ljust(-(-len(core) // 8) * 8, "0")
    assert np.array_equal(decode_g4(enc, 16, 1), img)


def test_g4_vertical_and_pass_modes():
    """Line 2 shifts line 1's run by one (vertical modes); line 3 drops
    it entirely (pass mode consumes the orphaned reference run)."""
    img = np.zeros((3, 16), dtype=np.uint8)
    img[0, 4:8] = 1
    img[1, 5:9] = 1  # VR1 twice
    # line 3 all white -> pass over the [5,9) reference run
    enc = encode_g4(img)
    assert np.array_equal(decode_g4(enc, 16, 3), img)
    bits = _bits_of(enc)
    assert "0001" in bits  # pass mode present somewhere in the stream


def test_mh_hand_vector():
    """w=8 row: 4 white ('1011'), 3 black ('10'), 1 white ('000111'),
    byte-aligned."""
    img = np.array([[0, 0, 0, 0, 1, 1, 1, 0]], dtype=np.uint8)
    enc = encode_mh(img)
    core = "1011" + "10" + "000111"
    assert _bits_of(enc) == core.ljust(-(-len(core) // 8) * 8, "0")
    assert np.array_equal(decode_mh(enc, 8, 1), img)


def test_mh_leading_black_needs_white_zero():
    """A row starting black must emit the white-0 code ('00110101')
    first — T.4 lines always start with a white run."""
    img = np.array([[1, 1, 0, 0]], dtype=np.uint8)
    enc = encode_mh(img)
    assert _bits_of(enc).startswith("00110101" + "11")
    assert np.array_equal(decode_mh(enc, 4, 1), img)


@pytest.mark.parametrize("codec", ["g4", "mh"])
@pytest.mark.parametrize("shape,density,seed", [
    ((1, 1), 0.5, 0), ((3, 7), 0.5, 1), ((13, 64), 0.3, 2),
    ((8, 200), 0.05, 3),        # long white runs -> white makeups
    ((8, 200), 0.95, 4),        # long black runs -> black makeups
    ((2, 3000), 0.001, 5),      # >2560 runs -> extended makeups
    ((40, 100), 0.5, 6),        # dense noise: worst-case mode mixing
])
def test_round_trip_random(codec, shape, density, seed):
    rng = np.random.default_rng(seed)
    img = (rng.random(shape) < density).astype(np.uint8)
    if codec == "g4":
        assert np.array_equal(
            decode_g4(encode_g4(img), shape[1], shape[0]), img
        )
    else:
        assert np.array_equal(
            decode_mh(encode_mh(img), shape[1], shape[0]), img
        )


def test_round_trip_text_like():
    """Structured text-like pattern (the realistic scanned-page shape:
    high line-to-line coherence -> mostly vertical codes)."""
    img = np.zeros((30, 120), dtype=np.uint8)
    for y in range(30):
        if y % 5 == 4:
            continue  # blank inter-line gap
        for s in range(6):
            x0 = 3 + 19 * s + (y % 5)
            img[y, x0:x0 + 7 + (s % 3)] = 1
    enc = encode_g4(img)
    assert np.array_equal(decode_g4(enc, 120, 30), img)
    # G4 beats MH on coherent content (the reason fax archives use it)
    assert len(enc) < len(encode_mh(img))


def test_tiff_g4_integration():
    bil = np.zeros((6, 20), dtype=np.uint8)
    bil[1:5, 3:9] = 1
    bil[2, 12:19] = 1
    w, h, px = decode_image(encode_tiff_ccitt(bil, g4=True))
    assert (w, h) == (20, 6)
    # WhiteIsZero fax polarity: black (1) -> 0, white -> 255
    assert np.array_equal(px[:, :, 0], (1 - bil) * np.uint8(255))
    assert np.array_equal(px[:, :, 0], px[:, :, 2])


def test_tiff_mh_integration():
    bil = (np.arange(48).reshape(4, 12) % 3 == 0).astype(np.uint8)
    w, h, px = decode_image(encode_tiff_ccitt(bil, g4=False))
    assert (w, h) == (12, 4)
    assert np.array_equal(px[:, :, 1], (1 - bil) * np.uint8(255))


def test_tiff_g4_multistrip_reference_reset():
    """Each TIFF strip is an independent G4 stream: the reference line
    resets to all-white at every strip boundary (TIFF 6.0 §11)."""
    bil = np.zeros((6, 16), dtype=np.uint8)
    bil[0:6, 2:14] = 1  # a block crossing the strip boundary
    top, bot = encode_g4(bil[:3]), encode_g4(bil[3:])
    pixel = top + bot
    ifd_off = 8 + len(pixel)
    arr_off = ifd_off + 2 + 9 * 12 + 4
    entries = [
        (256, 4, 1, 16), (257, 4, 1, 6), (258, 3, 1, 1),
        (259, 3, 1, 4), (262, 3, 1, 0), (273, 4, 2, arr_off),
        (277, 3, 1, 1), (278, 4, 1, 3), (279, 4, 2, arr_off + 8),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    ifd += struct.pack("<II", 8, 8 + len(top))
    ifd += struct.pack("<II", len(top), len(bot))
    payload = b"II*\x00" + struct.pack("<I", ifd_off) + pixel + ifd
    w, h, px = decode_image(payload)
    assert (w, h) == (16, 6)
    assert np.array_equal(px[:, :, 0], (1 - bil) * np.uint8(255))


def test_corrupt_stream_raises_value_error():
    """Garbage must raise ValueError (in media_features' per-row catch
    tuple), never an uncatchable index error."""
    with pytest.raises(ValueError):
        decode_g4(b"\x00\x00\x00\x00\x00\x00", 16, 4)
    with pytest.raises(ValueError):
        decode_mh(b"\xff\xff\xff\xff", 16, 4)
    img = np.zeros((4, 16), dtype=np.uint8)
    img[:, 5:11] = 1
    enc = encode_g4(img)
    with pytest.raises(ValueError):
        decode_g4(enc[: len(enc) // 2], 16, 8)  # truncated + too tall


def test_fill_order_2_guarded():
    """FillOrder 2 (LSB-first) raises NotImplementedError, the
    documented extension point."""
    bil = np.zeros((2, 8), dtype=np.uint8)
    payload = bytearray(encode_tiff_ccitt(bil))
    # append FillOrder=2 by rewriting the IFD is overkill: patch the
    # existing 258 BitsPerSample tag id (3rd entry) is wrong — instead
    # just decode a hand-variant: reuse the multistrip builder shape
    pixel = encode_g4(bil)
    ifd_off = 8 + len(pixel)
    entries = [
        (256, 4, 1, 8), (257, 4, 1, 2), (258, 3, 1, 1),
        (259, 3, 1, 4), (262, 3, 1, 0), (266, 3, 1, 2),  # FillOrder 2
        (273, 4, 1, 8), (277, 3, 1, 1), (279, 4, 1, len(pixel)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    bad = b"II*\x00" + struct.pack("<I", ifd_off) + pixel + ifd
    with pytest.raises(NotImplementedError, match="FillOrder"):
        decode_image(bad)
    assert payload  # the unpatched G4 file itself stays decodable


def test_g3_1d_round_trip_and_tiff():
    from medical_ocr_pipeline_spark.ccitt import decode_g3_1d, encode_g3_1d

    rng = np.random.default_rng(11)
    img = (rng.random((9, 33)) < 0.35).astype(np.uint8)
    assert np.array_equal(decode_g3_1d(encode_g3_1d(img), 33, 9), img)
    w, h, px = decode_image(encode_tiff_ccitt(img, mode="g3"))
    assert (w, h) == (33, 9)
    assert np.array_equal(px[:, :, 0], (1 - img) * np.uint8(255))


def test_g3_2d_option_guarded():
    """T4Options bit 0 (2-D G3) raises the documented guard."""
    bil = np.zeros((2, 8), dtype=np.uint8)
    payload = bytearray(encode_tiff_ccitt(bil, mode="g3"))
    # patch in a T4Options (292) = 1 entry is intrusive; easier to
    # hand-build via the multistrip builder pattern
    from medical_ocr_pipeline_spark.ccitt import encode_g3_1d

    pixel = encode_g3_1d(bil)
    ifd_off = 8 + len(pixel)
    entries = [
        (256, 4, 1, 8), (257, 4, 1, 2), (258, 3, 1, 1),
        (259, 3, 1, 3), (262, 3, 1, 0), (273, 4, 1, 8),
        (277, 3, 1, 1), (279, 4, 1, len(pixel)),
        (292, 4, 1, 1),  # T4Options: 2-D
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    bad = b"II*\x00" + struct.pack("<I", ifd_off) + pixel + ifd
    with pytest.raises(NotImplementedError, match="2-D G3"):
        decode_image(bad)
    assert payload


# ---------------------------------------------------------------- fuzz


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _bilevel(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 80))
    density = draw(st.sampled_from([0.02, 0.3, 0.5, 0.8, 0.98]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return (rng.random((h, w)) < density).astype(np.uint8)


@settings(max_examples=60, deadline=None)
@given(_bilevel())
def test_fuzz_g4_round_trip(img):
    assert np.array_equal(
        decode_g4(encode_g4(img), img.shape[1], img.shape[0]), img
    )


@settings(max_examples=40, deadline=None)
@given(_bilevel())
def test_fuzz_mh_and_g3_round_trip(img):
    from medical_ocr_pipeline_spark.ccitt import decode_g3_1d, encode_g3_1d

    h, w = img.shape
    assert np.array_equal(decode_mh(encode_mh(img), w, h), img)
    assert np.array_equal(decode_g3_1d(encode_g3_1d(img), w, h), img)
