"""Pure-stdlib(+numpy) JPEG codec — the codec extension point of the
media family (multimodal.py) closed for the dominant real-world format,
with zero new dependencies.

Scope (ITU-T T.81, JFIF):
  decode: SOI/APPn/COM/DQT/SOF0/1/DHT/DRI/SOS/RSTn/EOI marker parse,
          stream-embedded Huffman tables, dequant, separable float
          IDCT, nearest-neighbour chroma upsampling for any (h,v) in
          {1,2}, restart-interval resync, 1- or 3-component frames;
          PLUS progressive DCT (SOF2): multi-scan spectral selection
          and successive approximation — DC first/refine, AC
          first/refine with EOBn runs, ZRL, buffered correction bits,
          interleaved DC and single-component AC scan geometry, restart
          resync per scan (T.81 G.2 / the IJG decode_mcu_* semantics).
  encode: baseline 4:4:4, 4:2:0 or grayscale (Annex-K-style quant
          tables scaled by an IJG-style quality knob, fixed Huffman
          tables written into DHT), and a progressive encoder
          (encode_jpeg_progressive) emitting a six-phase scan script
          (DC Al=1 -> per-component AC bands Al=2 -> two AC refinement
          passes -> DC refinement) over the SAME quantized
          coefficients, so progressive and baseline decode to
          bit-identical pixels by construction — the fixture invariant.
Arithmetic coding, 12-bit precision, and hierarchical mode raise
NotImplementedError — per-row tolerated by media_features/thumbnails
like every other unsupported-format case.

Reference parity note: the reference pipeline shells out to external
rasterizers/codecs (e.g. mcp_ocr_docling.py's image handling); this
repo keeps S2 in-executor, so the codec must be a deterministic
library function — hence a from-scratch baseline implementation rather
than an external binary.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Huffman table spec: (BITS[1..16], HUFFVAL).  These are written into
# the DHT segments by the encoder and read back by the decoder, so
# their exact values only affect compression ratio, never correctness.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix (float64 => bit-identical everywhere)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = math.sqrt(1.0 / 8) if _u == 0 else math.sqrt(2.0 / 8)
    for _x in range(8):
        _T[_u, _x] = _c * math.cos((2 * _x + 1) * _u * math.pi / 16)


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for bitwise decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _scale_quant(base, quality: int):
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (t * scale + 50) // 100)) for t in base]


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int):
    """JPEG magnitude category + appended bits for a DC diff / AC coef."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _fdct_quant(block, qtab):
    """8x8 spatial block (uint8-ish floats) -> quantized zigzag list."""
    coef = _T @ (block - 128.0) @ _T.T
    q = np.floor(coef / qtab + 0.5).astype(np.int32)
    flat = q.ravel()
    return [int(flat[z]) for z in ZIGZAG]


def _encode_block(zz, pred_dc, dc_codes, ac_codes, w: _BitWriter):
    diff = zz[0] - pred_dc
    s, bits = _magnitude(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s, bits = _magnitude(zz[i])
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, spec) -> bytes:
    bits, values = spec
    return bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)


def _encode_prep(arr, quality: int, subsampling: str):
    """Shared encoder front half: color convert, component layout,
    quant tables, MCU-padded planes.  Returns
    (h, w, comps, planes, qy, qc, qy_tab, qc_tab, hmax, vmax,
    mcux, mcuy)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = subsampling == "gray"
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    # Base tables are in natural raster order (Annex K layout); the
    # quantizer uses them as-is and DQT emission converts to zigzag.
    qy = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)
    qy_tab = np.array(qy, dtype=np.float64).reshape(8, 8)
    qc_tab = np.array(qc, dtype=np.float64).reshape(8, 8)

    if gray:
        comps = [(1, 1, 1, 0)]
    elif subsampling == "444":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    elif subsampling == "420":
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def plane_for(idx, hi, vi):
        p = (y, cb, cr)[idx]
        if (hi, vi) != (hmax, vmax):
            # box-average downsample by integer factors
            fx, fy = hmax // hi, vmax // vi
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th = mcuy * 8 * vi
        tw = mcux * 8 * hi
        return np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )

    planes = [plane_for(i, hi, vi) for i, (_cid, hi, vi, _tq) in
              enumerate(comps)]
    return h, w, comps, planes, qy, qc, qy_tab, qc_tab, hmax, vmax, \
        mcux, mcuy


def encode_jpeg(arr, quality: int = 85, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """HxWx3 (or HxW for grayscale source) uint8 -> baseline JFIF bytes.

    subsampling: '444' (no chroma subsampling), '420' (2x2 chroma), or
    'gray' (single-component luma-only frame).  restart_interval > 0
    emits a DRI segment and RSTn markers every that-many MCUs (DC
    predictors reset per segment) — real-world encoders do this for
    error resilience, so the decoder's resync path needs coverage."""
    (h, w, comps, planes, qy, qc, qy_tab, qc_tab, hmax, vmax,
     mcux, mcuy) = _encode_prep(arr, quality, subsampling)
    gray = subsampling == "gray"

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    wtr = _BitWriter()
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                )
                preds = [0] * len(comps)
            mcu += 1
            for ci, (_cid, hi, vi, tq) in enumerate(comps):
                qtab = qy_tab if tq == 0 else qc_tab
                dc = dc_l if tq == 0 else dc_c
                ac = ac_l if tq == 0 else ac_c
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        zz = _fdct_quant(block, qtab)
                        preds[ci] = _encode_block(zz, preds[ci], dc, ac,
                                                  wtr)
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qy[z] for z in ZIGZAG))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[z] for z in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, hi << 4 | vi, tq])
    out += _seg(0xC0, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHROMA))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_CHROMA))
    sos = bytes([len(comps)])
    for cid, _hi, _vi, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # dc/ac table id == tq id
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------- encode (progressive)

# Flat 8-bit AC table for progressive scans: every symbol 0x00-0xFE at
# code length 8 (the all-ones length-8 code stays unused, as T.81's
# BITS construction requires).  Progressive AC scans emit EOBn symbols
# (r<<4 | 0 for r in 1..14) that the standard Annex-K tables do not
# contain; a flat table trades compression for full symbol coverage —
# correctness-neutral because the decoder reads tables from the stream.
_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0],
            list(range(255)))


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.2 — DC uses an arithmetic shift instead)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _ProgAC:
    """Per-scan progressive AC encoder state: EOB-run accumulation and
    (for refinement scans) the correction bits buffered behind it."""

    def __init__(self, wtr: _BitWriter, ac_codes):
        self.w = wtr
        self.ac = ac_codes
        self.eobrun = 0
        self.pending = []  # correction bits owed after the EOB symbol

    def flush_eob(self):
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            code, length = self.ac[n << 4]
            self.w.write(code, length)
            if n:
                self.w.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []

    def bump_eob(self, correction_bits=()):
        self.eobrun += 1
        self.pending.extend(correction_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _encode_ac_first(blk, ss, se, al, st: _ProgAC):
    vals = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
    last = -1
    for j, v in enumerate(vals):
        if v:
            last = j
    if last < 0:
        st.bump_eob()
        return
    st.flush_eob()
    run = 0
    for v in vals[: last + 1]:
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = st.ac[0xF0]
            st.w.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = st.ac[(run << 4) | s]
        st.w.write(code, length)
        st.w.write(bits, s)
        run = 0
    if last < se - ss:
        st.bump_eob()


def _encode_ac_refine(blk, ss, se, al, st: _ProgAC):
    """IJG encode_mcu_AC_refine semantics: history-nonzero coefficients
    contribute one correction bit each, newly-visible (|v|>>Al == 1)
    coefficients are coded as (run, 1) + sign, ZRL only before the last
    new coefficient, and blocks with no new coefficient fold into the
    EOB run carrying their correction bits behind it."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eobpos = -1
    for j, t in enumerate(absv):
        if t == 1:
            eobpos = j
    run = 0
    br: list[int] = []
    for j, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and j <= eobpos:
            st.flush_eob()
            code, length = st.ac[0xF0]
            st.w.write(code, length)
            run -= 16
            for b in br:
                st.w.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush_eob()
        code, length = st.ac[(run << 4) | 1]
        st.w.write(code, length)
        st.w.write(1 if blk[ss + j] > 0 else 0, 1)
        for b in br:
            st.w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.bump_eob(br)


def encode_jpeg_progressive(arr, quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """HxWx3 (or HxW) uint8 -> progressive (SOF2) JFIF bytes.

    Six-phase scan script exercising every progressive decode path:
      1. DC first, interleaved, Al=1          (successive approx on DC)
      2. per component: AC band 1-5,  Ah=0 Al=2   (spectral selection)
      3. per component: AC band 6-63, Ah=0 Al=2   (EOBn runs, ZRL)
      4. per component: AC 1-63, Ah=2 Al=1        (refinement pass 1)
      5. per component: AC 1-63, Ah=1 Al=0        (refinement pass 2)
      6. DC refine, interleaved, Ah=1 Al=0
    The quantized coefficients are identical to encode_jpeg's at the
    same (quality, subsampling), so baseline and progressive decode to
    bit-identical pixels — the invariant the tests pin."""
    (h, w, comps, planes, qy, qc, qy_tab, qc_tab, hmax, vmax,
     mcux, mcuy) = _encode_prep(arr, quality, subsampling)
    gray = subsampling == "gray"

    # all DCT coefficients up front, zigzag order, full MCU grid
    coefs = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        qtab = qy_tab if tq == 0 else qc_tab
        bh, bw = mcuy * vi, mcux * hi
        blocks = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                block = planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                blocks[by, bx] = _fdct_quant(block, qtab)
        coefs.append(blocks)

    dc_l = _canonical_codes(*_DC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_flat = _canonical_codes(*_AC_FLAT)

    def nonint_dims(hi, vi):
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        return -(-ch // 8), -(-cw // 8)

    def sos(scan_comps, ss, se, ah, al) -> bytes:
        p = bytes([len(scan_comps)])
        for ci in scan_comps:
            cid, _hi, _vi, tq = comps[ci]
            p += bytes([cid, (tq << 4) | 0])  # DC table id=tq, AC id=0
        return _seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qy[z] for z in ZIGZAG))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[z] for z in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, hi << 4 | vi, tq])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHROMA))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_FLAT))

    all_ci = list(range(len(comps)))

    # scan 1: DC first (interleaved), Al=1 — arithmetic-shift domain
    wtr = _BitWriter()
    preds = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (_cid, hi, vi, tq) in enumerate(comps):
            dc = dc_l if tq == 0 else dc_c
            for by in range(vi):
                for bx in range(hi):
                    v = int(coefs[ci][my * vi + by, mx * hi + bx, 0]) >> 1
                    s, bits = _magnitude(v - preds[ci])
                    preds[ci] = v
                    code, length = dc[s]
                    wtr.write(code, length)
                    if s:
                        wtr.write(bits, s)
    wtr.flush()
    out += sos(all_ci, 0, 0, 0, 1) + wtr.out

    # scans 2-5: AC bands + refinements, one component per scan
    for phase in (("first", 1, 5, 0, 2), ("first", 6, 63, 0, 2),
                  ("refine", 1, 63, 2, 1), ("refine", 1, 63, 1, 0)):
        kind, ss, se, ah, al = phase
        for ci, (_cid, hi, vi, _tq) in enumerate(comps):
            bh, bw = nonint_dims(hi, vi)
            wtr = _BitWriter()
            st = _ProgAC(wtr, ac_flat)
            for by in range(bh):
                for bx in range(bw):
                    blk = coefs[ci][by, bx]
                    if kind == "first":
                        _encode_ac_first(blk, ss, se, al, st)
                    else:
                        _encode_ac_refine(blk, ss, se, al, st)
            st.flush_eob()
            wtr.flush()
            out += sos([ci], ss, se, ah, al) + wtr.out

    # scan 6: DC refine (interleaved), Ah=1 Al=0 — one bit per block
    wtr = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (_cid, hi, vi, _tq) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    wtr.write(
                        int(coefs[ci][my * vi + by, mx * hi + bx, 0]) & 1, 1
                    )
    wtr.flush()
    out += sos(all_ci, 0, 0, 1, 0) + wtr.out

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decode


class _Bits:
    """MSB-first bit reader over unstuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read1(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan data")
        v = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read1()
        return v


def _huff_decode(bits: _Bits, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read1()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _split_scan(data: bytes, start: int):
    """Entropy-coded bytes from `start`, unstuffed, split at RSTn.
    Returns (segments, pos_after_scan)."""
    segments = []
    cur = bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nb = data[i + 1] if i + 1 < len(data) else 0xD9
            if nb == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nb <= 0xD7:  # restart marker
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next segment
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(payload: bytes):
    """Baseline or progressive JFIF bytes -> (width, height, HxWx3
    uint8 array).

    Huffman/quant tables are read from the stream; restart intervals
    resync DC predictors (and EOB runs) per segment; chroma planes
    upsample by pixel replication and crop to the frame size.  Any
    malformed-stream parse error surfaces as ValueError so the media
    kernels' per-row failure tolerance (multimodal.media_features)
    catches it."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed JPEG stream: {e}") from e


def _ac_first_block(bits, tab, blk, ss, se, al, eobrun):
    """Progressive AC initial-scan decode for one block (zigzag-order
    coefficient view).  Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(bits, tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += bits.read(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overflow")
        blk[k] = _extend(bits.read(s), s) * (1 << al)
        k += 1
    return eobrun


def _ac_refine_block(bits, tab, blk, ss, se, al, eobrun):
    """Progressive AC refinement decode for one block — the IJG
    decode_mcu_AC_refine semantics: newly-visible coefficients arrive
    as (run, 1) + sign, every already-nonzero coefficient traversed
    costs one correction bit, ZRL skips 16 zero-history positions, and
    an EOB run still consumes correction bits for the remainder of the
    band in every covered block."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement symbol")
                val = p1 if bits.read1() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += bits.read(r)
                break
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if bits.read1() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and bits.read1() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_units(sels, comps, mcux, mcuy, w, h, hmax, vmax):
    """Yield (restart_unit, ci, by, bx) in scan order: MCU-interleaved
    when the scan carries several components (restart unit = MCU),
    component-raster over the NON-INTERLEAVED block dims when it
    carries one (restart unit = block) — T.81 A.2."""
    if len(sels) > 1:
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for ci, _td, _ta in sels:
                _cid, hi, vi = comps[ci][0], comps[ci][1], comps[ci][2]
                for by in range(vi):
                    for bx in range(hi):
                        yield mcu, ci, my * vi + by, mx * hi + bx
    else:
        ci = sels[0][0]
        hi, vi = comps[ci][1], comps[ci][2]
        bw = -(-(-(-(w * hi) // hmax)) // 8)
        bh = -(-(-(-(h * vi) // vmax)) // 8)
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                yield unit, ci, by, bx
                unit += 1


def _decode_prog_scan(scan, sels, ss, se, ah, al, comps, coefs, htabs,
                      dri, mcux, mcuy, w, h, hmax, vmax):
    """Apply one progressive scan's entropy segments to the coefficient
    buffers.  sels: [(ci, dc_table_id, ac_table_id)]."""
    bits = None
    seg_idx = -1
    preds = {ci: 0 for ci, _td, _ta in sels}
    tids = {ci: (td, ta) for ci, td, ta in sels}
    eobrun = 0
    for unit, ci, by, bx in _prog_units(
            sels, comps, mcux, mcuy, w, h, hmax, vmax):
        want = unit // dri if dri else 0
        if want != seg_idx:
            seg_idx = want
            if seg_idx >= len(scan):
                raise ValueError("JPEG scan missing restart segment")
            bits = _Bits(scan[seg_idx])
            preds = {c: 0 for c in preds}
            eobrun = 0
        blk = coefs[ci][by, bx]
        if ss == 0:  # DC scan
            if ah == 0:
                tab = htabs.get((0, tids[ci][0]))
                if tab is None:
                    raise ValueError("JPEG missing Huffman table")
                s = _huff_decode(bits, tab)
                diff = _extend(bits.read(s), s) if s else 0
                preds[ci] += diff
                blk[0] = preds[ci] * (1 << al)
            elif bits.read1():
                blk[0] |= 1 << al
        else:  # AC scan (single component)
            tab = htabs.get((1, tids[ci][1]))
            if tab is None:
                raise ValueError("JPEG missing Huffman table")
            if ah == 0:
                eobrun = _ac_first_block(bits, tab, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(bits, tab, blk, ss, se, al, eobrun)


def _decode_jpeg(payload: bytes):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG SOI")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, dict] = {}  # (class, id) -> decode table
    comps = None
    h = w = 0
    dri = 0
    scan = None
    progressive = False
    coefs = None  # progressive: per-component (bh, bw, 64) zigzag int32
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them all, then read the code byte.
        while i < n and payload[i] == 0xFF:
            i += 1
        if i >= n:
            raise ValueError("truncated JPEG segment")
        marker = payload[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if i + 2 > n:
            raise ValueError("truncated JPEG segment")
        seglen = struct.unpack(">H", payload[i:i + 2])[0]
        seg = payload[i + 2:i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                if prec:
                    vals = struct.unpack(f">{64}H", seg[p:p + 128])
                    p += 128
                else:
                    vals = seg[p:p + 64]
                    p += 64
                tab = np.empty(64)
                for k, z in enumerate(ZIGZAG):
                    tab[z] = vals[k]
                qtabs[tid] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                bits16 = list(seg[p:p + 16])
                p += 16
                cnt = sum(bits16)
                vals = list(seg[p:p + cnt])
                p += cnt
                htabs[(cls, tid)] = _decode_table(bits16, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append([cid, hv >> 4, hv & 0x0F, tq, 0, 0])
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA and progressive:  # progressive SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sels = []
            p = 1
            for _ in range(ns):
                cid, tt = seg[p], seg[p + 1]
                p += 2
                ci = next(
                    (j for j, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    raise ValueError("JPEG scan references unknown component")
                sels.append((ci, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[p], seg[p + 1], seg[p + 2]
            ah, al = ahal >> 4, ahal & 0x0F
            if se > 63 or ss > se or (ss == 0) != (se == 0):
                raise ValueError("invalid progressive spectral selection")
            if ss > 0 and ns != 1:
                raise ValueError("interleaved progressive AC scan")
            if coefs is None:
                for comp in comps:
                    if comp[1] not in (1, 2) or comp[2] not in (1, 2):
                        raise NotImplementedError(
                            f"sampling factors {comp[1]}x{comp[2]} "
                            "not supported"
                        )
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                total = mcux * mcuy * sum(c[1] * c[2] for c in comps)
                if h == 0 or w == 0:
                    raise ValueError("JPEG zero frame dimension")
                if total > (1 << 20):
                    raise ValueError(
                        "progressive JPEG frame too large for the "
                        "in-memory coefficient buffer"
                    )
                coefs = [
                    np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int32)
                    for c in comps
                ]
            scan, i = _split_scan(payload, i)
            _decode_prog_scan(
                scan, sels, ss, se, ah, al, comps, coefs, htabs, dri,
                mcux, mcuy, w, h, hmax, vmax,
            )
            continue
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                # T.81 allows baseline multi-scan (one SOS per
                # component); this decoder handles only the single
                # interleaved scan every mainstream encoder emits.
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG "
                    "not supported"
                )
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp[0] == cid:
                        comp[4] = tt >> 4   # DC table id
                        comp[5] = tt & 0x0F  # AC table id
            scan, i = _split_scan(payload, i)
            break
        # APPn / COM / others: skipped
    if progressive:
        if comps is None or coefs is None:
            raise ValueError("progressive JPEG without a decoded scan")
        planes = []
        for ci, comp in enumerate(comps):
            tq = comp[3]
            if tq not in qtabs:
                raise ValueError(f"JPEG missing quant table {tq}")
            q = qtabs[tq]
            bh, bw = coefs[ci].shape[:2]
            plane = np.zeros((bh * 8, bw * 8))
            for by in range(bh):
                for bx in range(bw):
                    flat = np.zeros(64)
                    blk = coefs[ci][by, bx]
                    for kk, z in enumerate(ZIGZAG):
                        flat[z] = blk[kk]
                    block = flat.reshape(8, 8) * q
                    plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        _T.T @ block @ _T + 128.0
                    )
            planes.append(plane)
        return w, h, _planes_to_rgb(comps, planes, hmax, vmax, h, w)

    if scan is None or comps is None:
        raise ValueError("JPEG missing SOS/SOF")
    if h == 0 or w == 0:
        raise ValueError("JPEG zero frame dimension")
    for comp in comps:
        if comp[1] not in (1, 2) or comp[2] not in (1, 2):
            raise NotImplementedError(
                f"sampling factors {comp[1]}x{comp[2]} not supported"
            )
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is non-interleaved —
        # one 8x8 data unit per MCU in raster order, sampling factors
        # ignored.  Normalize to 1x1 so the MCU loop matches.
        comps[0][1] = comps[0][2] = 1

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcus = mcux * mcuy
    # Sanity-bound the frame against the payload BEFORE allocating
    # full-frame planes: every data unit costs >= 2 entropy bits
    # (1-bit DC code + 1-bit EOB minimum), so a valid stream has at
    # most 4 blocks per scan byte.  An 8x margin keeps every real
    # file while rejecting tiny payloads that declare huge SOF
    # dimensions (which would otherwise force a multi-GB allocation
    # the media kernels' per-row ValueError tolerance can't catch).
    n_blocks = n_mcus * sum(c[1] * c[2] for c in comps)
    if n_blocks > 8 * len(payload) + 64:
        raise ValueError(
            "JPEG frame dimensions inconsistent with payload size"
        )
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi))
        for _cid, hi, vi, _tq, _td, _ta in comps
    ]

    preds = [0] * len(comps)
    bits = None
    seg_idx = -1
    for mcu in range(n_mcus):
        want_seg = mcu // dri if dri else 0
        if want_seg != seg_idx:
            seg_idx = want_seg
            if seg_idx >= len(scan):
                raise ValueError("JPEG scan missing restart segment")
            bits = _Bits(scan[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (_cid, hi, vi, tq, td, ta) in enumerate(comps):
            if tq not in qtabs:
                raise ValueError(f"JPEG missing quant table {tq}")
            dc_tab = htabs.get((0, td))
            ac_tab = htabs.get((1, ta))
            if dc_tab is None or ac_tab is None:
                raise ValueError("JPEG missing Huffman table")
            for by in range(vi):
                for bx in range(hi):
                    s = _huff_decode(bits, dc_tab)
                    diff = _extend(bits.read(s), s) if s else 0
                    preds[ci] += diff
                    coef = np.zeros(64)
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, ac_tab)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0x0F
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[k] = _extend(bits.read(size), size)
                        k += 1
                    block = np.empty((8, 8))
                    flat = block.ravel()
                    for kk, z in enumerate(ZIGZAG):
                        flat[z] = coef[kk]
                    block = flat.reshape(8, 8) * qtabs[tq]
                    pix = _T.T @ block @ _T + 128.0
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = pix

    return w, h, _planes_to_rgb(comps, planes, hmax, vmax, h, w)


def _planes_to_rgb(comps, planes, hmax, vmax, h, w):
    """Shared decode tail (baseline + progressive): upsample each
    component plane to full resolution by pixel replication, crop to
    the frame, and color-convert."""
    full = []
    for ci, comp in enumerate(comps):
        hi, vi = comp[1], comp[2]
        p = planes[ci]
        if (hi, vi) != (hmax, vmax):
            p = np.repeat(np.repeat(p, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        yy = full[0]
        rgb = np.stack([yy, yy, yy], axis=-1)
    elif len(full) == 3:
        yy, cb, cr = full
        r = yy + 1.402 * (cr - 128.0)
        g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = yy + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
    else:
        raise NotImplementedError(
            f"{len(full)}-component JPEG not supported"
        )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
