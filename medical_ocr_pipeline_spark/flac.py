"""FLAC codec from scratch (pure python + numpy) — the lossless
compressed-audio format, completing the native audio set alongside PCM
WAV and the G.711 / IMA ADPCM codecs in audio.py.

Decoder: full subframe coverage — CONSTANT, VERBATIM, FIXED (orders
0-4) and LPC (any order) predictors, Rice/Rice2 residuals with
arbitrary partition orders and the escape (raw-bitlength) code, wasted
bits, all four stereo assignments (independent, left/side, right/side,
mid/side), UTF-8-coded frame numbers, CRC-8 header and CRC-16 frame
checks, and the STREAMINFO MD5 signature over the decoded stream.

Encoder (the fixture/writer twin): fixed-blocksize streams with
selectable subframe strategy (constant / verbatim / fixed / LPC),
channel mode, Rice partition order, forced escape coding, and
wasted-bits packing — enough dials to exercise every decoder path
with EXACT roundtrips, which lossless compression uniquely allows
(decode(encode(x)) == x bit-for-bit, the strongest codec test there
is; see tests/test_flac.py).

Format: the public FLAC bitstream specification (xiph.org / RFC 9639).
Failure discipline matches the other codecs: malformed/truncated
streams raise ValueError (per-row tolerance in media_features);
NotImplementedError is reserved for valid-but-unsupported shapes.
"""

from __future__ import annotations

import hashlib
import struct

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8 + x^2 + x + 1 (0x07), init 0 — frame headers."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16 + x^15 + x^2 + 1 (0x8005), init 0 — frames."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.byte >= len(self.buf):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.buf[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_number(r: _BitReader) -> int:
    """FLAC's UTF-8-style coded number (extended to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("bad UTF-8-coded number in frame header")
    val = b0 & (0x3F >> n)
    for _ in range(n):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame header")
        val = (val << 6) | (b & 0x3F)
    return val


def _encode_utf8_number(w: _BitWriter, val: int):
    if val < 0x80:
        w.write(val, 8)
        return
    # n continuation bytes hold 6n bits; the lead byte holds 6 - n more
    n = 1
    while val >= (1 << (5 * n + 6)):
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF
    w.write(lead | (val >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        w.write(0x80 | ((val >> (6 * i)) & 0x3F), 8)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(x: int) -> int:
    return (x << 1) ^ (x >> 63) if x < 0 else (x << 1)


def _read_residual(r: _BitReader, blocksize: int, order: int):
    """Rice/Rice2-partitioned residual -> list of ints."""
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition count does not divide blocksize")
    out = []
    for p in range(nparts):
        count = blocksize >> porder
        if p == 0:
            count -= order
        if count < 0:
            raise ValueError("predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(count):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out.append(_zigzag_decode(v))
    return out


def _predict(warmup: list[int], residual: list[int], coeffs: list[int],
             shift: int) -> list[int]:
    out = list(warmup)
    o = len(coeffs)
    for res in residual:
        pred = sum(c * out[-1 - i] for i, c in enumerate(coeffs)) >> shift
        out.append(res + pred)
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int):
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        samples = [r.read_signed(eff)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        samples = _predict(warm, res, FIXED_COEFFS[order], 0)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        samples = _predict(warm, res, coeffs, shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


def parse_streaminfo(payload: bytes) -> dict:
    """STREAMINFO + the offset of the first audio frame."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1: pos + 4], "big")
        body = payload[pos + 4: pos + 4 + size]
        if len(body) < size:
            raise ValueError("truncated metadata block")
        if hdr & 0x7F == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("STREAMINFO too short")
            r = _BitReader(body)
            info = {
                "min_blocksize": r.read(16),
                "max_blocksize": r.read(16),
                "min_framesize": r.read(24),
                "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "n_channels": r.read(3) + 1,
                "bps": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": body[18:34],
            }
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    info["frames_offset"] = pos
    return info


def decode_flac(payload: bytes, verify_md5: bool = True):
    """Decode a FLAC payload -> (sample_rate, n_channels, interleaved
    int16/int32 numpy array, n_frames) — the decode_audio contract.
    CRC-8 / CRC-16 are enforced per frame; the STREAMINFO MD5 over the
    decoded stream is verified when present (all-zero = unset)."""
    import numpy as np

    info = parse_streaminfo(payload)
    n_ch, bps = info["n_channels"], info["bps"]
    pos = info["frames_offset"]
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    total = info["total_samples"]
    while pos < len(payload) and (
        not total or len(channels[0]) < total
    ):
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        if r.read(1):
            raise ValueError("reserved bit set in frame header")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_asgn = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved bit set in frame header")
        _num = _utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            pass  # from STREAMINFO
        elif rate_code in _RATE_CODES:
            pass
        elif rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("invalid sample-rate code 15")
        # frame sample size codes: 0 -> STREAMINFO; only matching
        # streams are produced here, so size_code is informational
        del size_code
        hdr_end = r.byte + (1 if r.bit else 0)
        if _crc8(payload[pos:hdr_end]) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        if ch_asgn < 8:
            if ch_asgn + 1 != n_ch:
                raise ValueError("frame/stream channel count mismatch")
            subs = [
                _read_subframe(r, blocksize, bps) for _ in range(n_ch)
            ]
        elif ch_asgn in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_asgn == 8:  # left/side
                left = _read_subframe(r, blocksize, bps)
                side = _read_subframe(r, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_asgn == 9:  # right/side (side first)
                side = _read_subframe(r, blocksize, bps + 1)
                right = _read_subframe(r, blocksize, bps)
                subs = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(r, blocksize, bps)
                side = _read_subframe(r, blocksize, bps + 1)
                lefts, rights = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    lefts.append((m2 + s) >> 1)
                    rights.append((m2 - s) >> 1)
                subs = [lefts, rights]
        else:
            raise ValueError(f"reserved channel assignment {ch_asgn}")
        r.align()
        if _crc16(payload[pos: r.byte]) != r.read(16):
            raise ValueError("frame CRC-16 mismatch")
        for c in range(n_ch):
            channels[c].extend(subs[c])
        pos = r.byte
    n_frames = total or len(channels[0])
    if len(channels[0]) < n_frames:
        raise ValueError("stream ended before total_samples")
    dtype = np.int16 if bps <= 16 else np.int32
    inter = np.empty(n_frames * n_ch, dtype=dtype)
    for c in range(n_ch):
        inter[c::n_ch] = np.array(channels[c][:n_frames], dtype=dtype)
    if verify_md5 and info["md5"] != b"\x00" * 16:
        width = 2 if bps <= 16 else 4
        raw = inter.astype(f"<i{width}").tobytes()
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("decoded stream fails STREAMINFO MD5")
    return info["sample_rate"], n_ch, inter, n_frames


# --- encoder (fixture/writer twin) ---------------------------------------------


def _best_rice_param(residual: list[int], pbits: int) -> int:
    """Cheap optimal-enough parameter: smallest k whose total code
    length is minimal (scan 0..escape-1 on the zigzagged values)."""
    zz = [_zigzag_encode(x) for x in residual]
    best_k, best_len = 0, None
    for k in range((1 << pbits) - 1):
        total = sum((v >> k) + 1 + k for v in zz)
        if best_len is None or total < best_len:
            best_k, best_len = k, total
    return best_k


def _write_residual(w: _BitWriter, residual: list[int], order: int,
                    blocksize: int, porder: int, escape: bool):
    w.write(0, 2)  # 4-bit rice params
    w.write(porder, 4)
    nparts = 1 << porder
    start = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = residual[start: start + count]
        start += count
        if escape:
            raw = max(
                (x.bit_length() + 1 for x in part), default=1
            )
            w.write(0xF, 4)
            w.write(raw, 5)
            for x in part:
                w.write(x & ((1 << raw) - 1), raw)
        else:
            k = _best_rice_param(part, 4)
            w.write(k, 4)
            for x in part:
                v = _zigzag_encode(x)
                w.write_unary(v >> k)
                if k:
                    w.write(v & ((1 << k) - 1), k)


def _write_subframe(w: _BitWriter, samples: list[int], bps: int,
                    strategy: str, fixed_order: int, porder: int,
                    escape: bool, use_wasted: bool):
    wasted = 0
    if use_wasted and any(samples):
        wasted = min(
            (s & -s).bit_length() - 1 for s in samples if s
        )
        wasted = max(0, min(wasted, bps - 1))
    eff = bps - wasted
    vals = [s >> wasted for s in samples]
    if strategy == "auto":
        if all(v == vals[0] for v in vals):
            strategy = "constant"
        else:
            strategy = "fixed"
    w.write(0, 1)
    if strategy == "constant":
        w.write(0, 6)
        _write_wasted(w, wasted)
        w.write(vals[0] & ((1 << eff) - 1), eff)
        return
    if strategy == "verbatim":
        w.write(1, 6)
        _write_wasted(w, wasted)
        for v in vals:
            w.write(v & ((1 << eff) - 1), eff)
        return
    order = min(fixed_order, len(vals) - 1) if len(vals) > 1 else 0
    coeffs = FIXED_COEFFS[order]
    residual = [
        vals[i] - (
            sum(c * vals[i - 1 - j] for j, c in enumerate(coeffs))
        )
        for i in range(order, len(vals))
    ]
    if strategy == "fixed":
        w.write(8 + order, 6)
        _write_wasted(w, wasted)
        for v in vals[:order]:
            w.write(v & ((1 << eff) - 1), eff)
        _write_residual(w, residual, order, len(vals), porder, escape)
        return
    if strategy == "lpc":
        # an LPC subframe carrying the fixed-predictor coefficients
        # (shift 0) — a valid, decodable LPC stream that exercises the
        # quantized-coefficient path
        if order == 0:
            raise ValueError("lpc strategy needs fixed_order >= 1")
        w.write(32 + (order - 1), 6)
        _write_wasted(w, wasted)
        for v in vals[:order]:
            w.write(v & ((1 << eff) - 1), eff)
        precision = 5
        w.write(precision - 1, 4)
        w.write(0, 5)  # shift 0
        for c in coeffs:
            w.write(c & ((1 << precision) - 1), precision)
        _write_residual(w, residual, order, len(vals), porder, escape)
        return
    raise ValueError(f"unknown subframe strategy {strategy!r}")


def _write_wasted(w: _BitWriter, wasted: int):
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)  # unary: (wasted-1) zeros then a 1
    else:
        w.write(0, 1)


def encode_flac(samples, sample_rate: int, n_channels: int = 1,
                bps: int = 16, blocksize: int = 1024,
                channel_mode: str = "independent",
                strategy: str = "auto", fixed_order: int = 2,
                partition_order: int = 0, escape: bool = False,
                use_wasted: bool = False) -> bytes:
    """Author a valid fixed-blocksize FLAC stream from interleaved int
    samples.  Every dial exists to exercise a decoder path; roundtrips
    are exact regardless of settings (lossless)."""
    samples = [int(s) for s in samples]
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    n_frames = len(samples) // n_channels
    chans = [samples[c::n_channels] for c in range(n_channels)]
    if channel_mode != "independent" and n_channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    width = 2 if bps <= 16 else 4
    import numpy as np

    md5 = hashlib.md5(
        np.array(samples, dtype=f"<i{width}").tobytes()
    ).digest()
    body = bytearray()
    for fno, start in enumerate(range(0, n_frames, blocksize)):
        bs = min(blocksize, n_frames - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(0, 4)  # sample rate from STREAMINFO
        asgn = {"independent": n_channels - 1, "left_side": 8,
                "right_side": 9, "mid_side": 10}[channel_mode]
        w.write(asgn, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps, 0), 3)
        w.write(0, 1)
        _encode_utf8_number(w, fno)
        w.write(bs - 1, 16)
        hdr = bytes(w.out) if w.nbits == 0 else None
        assert hdr is not None, "frame header must be byte-aligned here"
        w.write(_crc8(hdr), 8)
        blocks = [ch[start: start + bs] for ch in chans]
        if channel_mode == "independent":
            for blk in blocks:
                _write_subframe(w, blk, bps, strategy, fixed_order,
                                partition_order, escape, use_wasted)
        else:
            left, right = blocks
            side = [l - r for l, r in zip(left, right)]
            if channel_mode == "left_side":
                parts = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                parts = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                parts = [(mid, bps), (side, bps + 1)]
            for blk, b in parts:
                _write_subframe(w, blk, b, strategy, fixed_order,
                                partition_order, escape, use_wasted)
        w.align()
        frame = w.bytes()
        body += frame + struct.pack(">H", _crc16(frame))
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_frames, 36)
    streaminfo = si.bytes() + md5
    return (
        b"fLaC"
        + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        + bytes(body)
    )
