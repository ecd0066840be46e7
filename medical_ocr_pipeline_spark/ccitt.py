"""CCITT Group 4 (ITU-T T.6, TIFF compression 4) and Modified Huffman
(ITU-T T.4 1-D, TIFF compression 2) bilevel codecs — both directions,
stdlib + numpy only.

G4 is THE archival scanned-page compression: medical scan TIFFs (the
reference pipeline's input rasters, notebooks/02_ocr_verifier.py) ship
as bilevel G4 strips.  Round 4 left it as the documented
NotImplementedError extension point in multimodal._decode_tiff; this
module closes it (VERDICT r04 item #7).

Model: a line is its list of CHANGING ELEMENTS (positions where the
color flips; lines start white).  G4 codes each line against the
previous (reference) line with three modes — vertical (new transition
within +/-3 of the reference transition b1), pass (reference runs b1/b2
have no counterpart, skip to b2), horizontal (two explicit T.4
run-lengths) — and the T.4 Huffman tables encode horizontal-mode runs:
per-color terminating codes (0..63) + makeup codes (64..1728) and the
shared extended makeups (1792..2560, repeatable for very wide pages).
MH (compression 2) is the degenerate form: every line is horizontal
runs against an imaginary all-white reference, each row starts
byte-aligned.

Table integrity is guarded three ways: a prefix-free/completeness
self-check at import, hand-computed bit-stream vectors in
tests/test_ccitt.py (so a transposed code fails loudly, not just
symmetrically in encode+decode), and encode->decode round trips over
random images.
"""

from __future__ import annotations

# --- ITU-T T.4 code tables ---------------------------------------------------
# {run_length: bit-string}.  Bit strings, not ints, so code length is
# explicit (leading zeros are significant).

WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}

BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeups (T.4 §2 table 3): shared by both colors
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

EOL = "000000000001"


def _check_tables() -> None:
    """Prefix-freeness + expected cardinality of each decode alphabet —
    a transposed bit in any entry collides or breaks the count."""
    for name, tab in (
        ("white", {**WHITE_TERM, **WHITE_MAKEUP, **EXT_MAKEUP}),
        ("black", {**BLACK_TERM, **BLACK_MAKEUP, **EXT_MAKEUP}),
    ):
        codes = sorted(tab.values())
        if len(set(codes)) != len(codes):
            raise AssertionError(f"duplicate {name} code")
        for i, c in enumerate(codes):
            for d in codes[i + 1:]:
                if d.startswith(c):
                    # EOL shares the 000000000001 prefix space with
                    # nothing else by construction; any other prefix
                    # relation is a table typo
                    raise AssertionError(
                        f"{name} code {c} is a prefix of {d}"
                    )
    assert len(WHITE_TERM) == 64 and len(BLACK_TERM) == 64
    assert len(WHITE_MAKEUP) == 27 and len(BLACK_MAKEUP) == 27
    assert len(EXT_MAKEUP) == 13


_check_tables()

# decode maps: {(n_bits, int_value): run}
_DEC_WHITE = {
    (len(c), int(c, 2)): run
    for run, c in {**WHITE_TERM, **WHITE_MAKEUP, **EXT_MAKEUP}.items()
}
_DEC_BLACK = {
    (len(c), int(c, 2)): run
    for run, c in {**BLACK_TERM, **BLACK_MAKEUP, **EXT_MAKEUP}.items()
}
_MAX_CODE_LEN = 14


class _BitReader:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def read_bit(self) -> int:
        i = self.pos
        if i >= len(self.data) * 8:
            raise ValueError("CCITT stream exhausted")
        self.pos = i + 1
        return (self.data[i >> 3] >> (7 - (i & 7))) & 1

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(br: _BitReader, color: int) -> int:
    """One T.4 run length: zero or more makeup codes then a terminating
    code; values accumulate (2560 makeups repeat for very wide rows)."""
    table = _DEC_BLACK if color else _DEC_WHITE
    total = 0
    while True:
        acc = 0
        n = 0
        run = None
        while n < _MAX_CODE_LEN:
            acc = (acc << 1) | br.read_bit()
            n += 1
            run = table.get((n, acc))
            if run is not None:
                break
        if run is None:
            raise ValueError(f"bad T.4 {'black' if color else 'white'} code")
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _emit_run(out: list[str], run: int, color: int) -> None:
    term = BLACK_TERM if color else WHITE_TERM
    makeup = BLACK_MAKEUP if color else WHITE_MAKEUP
    while run >= 2624:  # repeatable top extended makeup
        out.append(EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        out.append(EXT_MAKEUP[m] if m >= 1792 else makeup[m])
        run -= m
    out.append(term[run])


def _transitions(row) -> list[int]:
    """Changing-element positions of a 0/1 row (0 = white)."""
    out = []
    prev = 0
    for i, v in enumerate(row):
        if v != prev:
            out.append(i)
            prev = v
    return out


def _row_from_transitions(tr: list[int], w: int, row) -> None:
    """Fill a length-w 0/1 buffer from transition positions."""
    color = 0
    prev = 0
    for t in tr:
        if color:
            row[prev:t] = 1
        prev = t
        color ^= 1
    if color:
        row[prev:w] = 1


def _b1_b2(ref: list[int], a0: int, color: int) -> tuple[int, int, int]:
    """b1 = first changing element of the reference line strictly right
    of a0 whose pixel color is opposite to the current color (even
    indices flip white->black, odd black->white); b2 = the next one."""
    from bisect import bisect_right

    i = bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    w = 1 << 30
    b1 = ref[i] if i < len(ref) else None
    b2 = ref[i + 1] if i + 1 < len(ref) else None
    return i, (b1 if b1 is not None else w), (b2 if b2 is not None else w)


def decode_g4(data: bytes, width: int, height: int):
    """T.6 (G4) decode -> (height, width) uint8 array, 1 = black."""
    import numpy as np

    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    ref: list[int] = []  # imaginary all-white line above the first
    for y in range(height):
        cur: list[int] = []
        a0 = -1
        color = 0
        while a0 < width:
            _, b1, b2 = _b1_b2(ref, a0, color)
            b1 = min(b1, width)
            b2 = min(b2, width)
            # mode tree (T.6 table 4): V0=1 VR1=011 VL1=010 H=001
            # P=0001 VR2=000011 VL2=000010 VR3=0000011 VL3=0000010
            if br.read_bit():  # 1 -> V0
                a1 = b1
            elif br.read_bit():  # 01x
                a1 = b1 + 1 if br.read_bit() else b1 - 1
            elif br.read_bit():  # 001 -> horizontal
                base = a0 if a0 > 0 else 0
                r1 = _read_run(br, color)
                r2 = _read_run(br, 1 - color)
                a1 = base + r1
                a2 = a1 + r2
                if a1 < width:
                    cur.append(a1)
                if a2 < width:
                    cur.append(a2)
                a0 = a2
                continue
            elif br.read_bit():  # 0001 -> pass
                a0 = b2
                continue
            elif br.read_bit():  # 00001x
                a1 = b1 + 2 if br.read_bit() else b1 - 2
            elif br.read_bit():  # 000001x
                a1 = b1 + 3 if br.read_bit() else b1 - 3
            else:
                # 0000000...: EOL/EOFB or extension — with a correct
                # stream this only appears after the last line
                raise ValueError(
                    "unexpected G4 EOL/extension mid-image "
                    f"(line {y}, a0={a0})"
                )
            if a1 < 0 or (cur and a1 < cur[-1]):
                raise ValueError(
                    f"corrupt G4 stream: non-monotone a1={a1} line {y}"
                )
            if a1 < width:
                cur.append(a1)
            a0 = a1
            color ^= 1
        _row_from_transitions(cur, width, out[y])
        ref = cur
    return out


def encode_g4(bits) -> bytes:
    """(h, w) 0/1 array -> T.6 stream (EOFB-terminated, byte-padded)."""
    h, w = bits.shape
    out: list[str] = []
    ref: list[int] = []
    big = 1 << 30
    for y in range(h):
        cur = _transitions(bits[y])
        a0 = -1
        color = 0
        while a0 < w:
            _, b1, b2 = _b1_b2(ref, a0, color)
            b1 = min(b1, w)
            b2 = min(b2, w)
            from bisect import bisect_right

            j = bisect_right(cur, a0)
            a1 = cur[j] if j < len(cur) else w
            a2 = cur[j + 1] if j + 1 < len(cur) else w
            if b2 < a1:
                out.append("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3 and b1 < big:
                out.append({
                    0: "1", 1: "011", -1: "010", 2: "000011",
                    -2: "000010", 3: "0000011", -3: "0000010",
                }[a1 - b1])
                a0 = a1
                color ^= 1
            else:
                out.append("001")  # horizontal: two explicit runs
                base = a0 if a0 > 0 else 0
                _emit_run(out, a1 - base, color)
                _emit_run(out, a2 - a1, 1 - color)
                a0 = a2
        ref = cur
    out.append(EOL + EOL)  # EOFB
    s = "".join(out)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def decode_mh(data: bytes, width: int, height: int):
    """T.4 1-D Modified Huffman (TIFF compression 2, 'CCITT RLE'):
    alternating white/black runs per line, each line starting white and
    byte-aligned (no EOL codes)."""
    import numpy as np

    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        x = 0
        color = 0
        while x < width:
            run = _read_run(br, color)
            if x + run > width:
                raise ValueError("MH run overflows row")
            if color:
                out[y, x:x + run] = 1
            x += run
            color ^= 1
        br.align_byte()
    return out


def decode_g3_1d(data: bytes, width: int, height: int):
    """T.4 Group 3 one-dimensional with EOL codes (TIFF compression 3,
    T4Options bit0 = 0): every line is preceded by an EOL
    (000000000001), possibly with fill zeros before it for byte
    alignment; runs are the same MH alphabet.  2-D G3 (EOL + tag bit)
    is not emitted by this family — the tag-bit variant raises."""
    import numpy as np

    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)

    def expect_eol():
        # consume fill zeros then the 12-bit EOL: scan for 11+ zeros
        # followed by a one
        zeros = 0
        while True:
            b = br.read_bit()
            if b == 0:
                zeros += 1
                continue
            if zeros < 11:
                raise ValueError(
                    f"G3 expected EOL, got a 1 after {zeros} zeros"
                )
            return

    for y in range(height):
        expect_eol()
        x = 0
        color = 0
        while x < width:
            run = _read_run(br, color)
            if x + run > width:
                raise ValueError("G3 run overflows row")
            if color:
                out[y, x:x + run] = 1
            x += run
            color ^= 1
    return out


def encode_g3_1d(bits) -> bytes:
    """T.4 G3 1-D encoder twin: EOL before every line, then MH runs;
    RTC (6 EOLs) appended, byte-padded."""
    h, w = bits.shape
    out: list[str] = []
    for y in range(h):
        out.append(EOL)
        x = 0
        color = 0
        row = bits[y]
        while x < w:
            run = x
            while run < w and row[run] == color:
                run += 1
            _emit_run(out, run - x, color)
            x = run
            color ^= 1
    out.append(EOL * 6)  # return-to-control
    s = "".join(out)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def encode_mh(bits) -> bytes:
    """(h, w) 0/1 array -> TIFF compression-2 stream (byte-aligned
    rows)."""
    h, w = bits.shape
    chunks: list[bytes] = []
    for y in range(h):
        out: list[str] = []
        x = 0
        color = 0
        row = bits[y]
        while x < w:
            run = x
            while run < w and row[run] == color:
                run += 1
            _emit_run(out, run - x, color)
            x = run
            color ^= 1
        s = "".join(out)
        s += "0" * (-len(s) % 8)
        chunks.append(int(s, 2).to_bytes(len(s) // 8, "big") if s else b"")
    return b"".join(chunks)
