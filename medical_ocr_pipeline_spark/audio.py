"""Compressed-audio codecs from scratch: G.711 mu-law / A-law and IMA
ADPCM inside WAV containers, plus the RIFF chunk walker and writer the
stdlib `wave` module lacks for non-PCM format tags.

These are the three compressed formats that actually appear inside WAV
files in the wild (telephony dumps, speech corpora, game assets); with
them, `multimodal.decode_audio` covers every WAV a curation pipeline is
likely to scan without an external codec.  MP3/OGG/FLAC remain the
documented external-codec extension point (frame-level psychoacoustic
decoders are out of scope for a from-scratch engine).

Correctness anchors (tests/test_audio_codecs.py):
  * both G.711 directions are BIT-EXACT against CPython's `audioop`
    over the full 16-bit domain (cross-checked while audioop exists —
    it leaves the stdlib in 3.13 — and pinned by golden decode tables
    that outlive it);
  * A-law is quantization-idempotent over all 256 codes; mu-law over
    255 (code 0x7F is negative zero, canonically re-encoded as 0xFF);
  * IMA ADPCM follows the IMA/DVI reference algorithm (step + index
    tables from the IMA ADPCM specification, as in the WAV fmt 0x11
    layout), block-seeded predictors, mono and stereo interleave.

Scale note: G.711 decode is a 256-entry numpy LUT gather — vectorized
inside the same Arrow batches as the image kernels.  ADPCM decode is a
sequential per-sample recurrence (inherently so: each step's quantizer
state depends on the previous), looped per BLOCK in python; blocks are
independent, so the corpus parallelizes across rows/blocks, never
within one.

Reference analogue: the reference pipeline never decodes audio (its
payloads are page images); this module exists because a 100 TB
multimodal corpus does carry audio rows.
"""

from __future__ import annotations

import struct

# --- G.711 ---------------------------------------------------------------

_BIAS = 0x84
_SEG_U14 = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
_SEG_A13 = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def ulaw_to_lin(code: int) -> int:
    """One mu-law byte -> int16 (G.711 expansion; max |x| = 32124)."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + _BIAS) << ((u & 0x70) >> 4)
    return (_BIAS - t) if (u & 0x80) else (t - _BIAS)


def lin_to_ulaw(sample: int) -> int:
    """int16 -> mu-law byte, on the 14-bit domain with floor shift —
    bit-exact with audioop.lin2ulaw over the full 16-bit range."""
    s = max(-32768, min(32767, int(sample))) >> 2  # arithmetic: floors
    if s < 0:
        s, mask = -s, 0x7F
    else:
        mask = 0xFF
    s = min(s, 8159) + 33
    for seg, end in enumerate(_SEG_U14):
        if s <= end:
            return ((seg << 4) | ((s >> (seg + 1)) & 0xF)) ^ mask
    return 0x7F ^ mask


def alaw_to_lin(code: int) -> int:
    """One A-law byte -> int16 (G.711 expansion; max |x| = 32256)."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def lin_to_alaw(sample: int) -> int:
    """int16 -> A-law byte, on the 13-bit domain — bit-exact with
    audioop.lin2alaw and quantization-idempotent over all 256 codes."""
    s = max(-32768, min(32767, int(sample))) >> 3
    if s >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        s = -s - 1
    for seg, end in enumerate(_SEG_A13):
        if s <= end:
            aval = seg << 4
            aval |= (s >> 1) & 0xF if seg < 2 else (s >> seg) & 0xF
            return aval ^ mask
    return 0x7F ^ mask


def _g711_tables():
    """(ulaw_lut, alaw_lut) as int16 numpy arrays of length 256 — the
    vectorized decode path (one gather per payload)."""
    import numpy as np

    return (
        np.array([ulaw_to_lin(c) for c in range(256)], dtype=np.int16),
        np.array([alaw_to_lin(c) for c in range(256)], dtype=np.int16),
    )


# --- IMA ADPCM (WAV format tag 0x11) --------------------------------------

IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8,
                   -1, -1, -1, -1, 2, 4, 6, 8]
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]


def _ima_step(pred: int, index: int, nibble: int):
    """One IMA ADPCM decode step: (pred, index, nibble) -> (pred', idx')."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble]))
    return pred, index


def _ima_encode_nibble(sample: int, pred: int, index: int):
    """One IMA ADPCM encode step (IMA reference quantizer):
    returns (nibble, pred', index')."""
    step = IMA_STEP_TABLE[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    pred, index = _ima_step(pred, index, nibble)
    return nibble, pred, index


def ima_adpcm_decode_block(block: bytes, n_channels: int):
    """Decode one IMA ADPCM WAV block -> list of per-channel int16
    lists.  Layout (fmt 0x11): per channel a 4-byte header
    (predictor:int16le, step index:uint8, reserved), then the nibble
    stream in 4-byte per-channel groups (low nibble first); the header
    predictor IS the block's first sample."""
    hdr = 4 * n_channels
    if len(block) < hdr:
        raise ValueError("truncated IMA ADPCM block header")
    chans, preds, idxs = [], [], []
    for c in range(n_channels):
        pred, index, _res = struct.unpack_from("<hBB", block, 4 * c)
        if index > 88:
            raise ValueError(f"IMA ADPCM step index {index} out of range")
        chans.append([pred])
        preds.append(pred)
        idxs.append(index)
    data = block[hdr:]
    if len(data) % (4 * n_channels):
        raise ValueError("IMA ADPCM data not 4-byte-per-channel aligned")
    for group in range(0, len(data), 4 * n_channels):
        for c in range(n_channels):
            word = data[group + 4 * c: group + 4 * c + 4]
            for byte in word:
                for nib in (byte & 0x0F, byte >> 4):
                    preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                    chans[c].append(preds[c])
    return chans


def ima_adpcm_encode(samples, n_channels: int = 1,
                     block_align: int = 256) -> tuple[bytes, int]:
    """Encode interleaved int16 samples as IMA ADPCM WAV blocks.
    Returns (data bytes, samples_per_block).  The step index carries
    across blocks per channel (predictor re-seeds from each block's
    first sample — the fmt 0x11 layout); the tail block zero-pads."""
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    frames = [
        list(samples[i: i + n_channels])
        for i in range(0, len(samples), n_channels)
    ]
    if frames and len(frames[-1]) < n_channels:
        raise ValueError("sample count not a multiple of channel count")
    out = bytearray()
    idxs = [0] * n_channels
    for b0 in range(0, len(frames), spb):
        blk = frames[b0: b0 + spb]
        preds = [int(blk[0][c]) for c in range(n_channels)]
        for c in range(n_channels):
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(n_channels)]
        for frame in blk[1:]:
            for c in range(n_channels):
                nib, preds[c], idxs[c] = _ima_encode_nibble(
                    int(frame[c]), preds[c], idxs[c]
                )
                nibs[c].append(nib)
        want = spb - 1  # nibbles per channel per full block
        for c in range(n_channels):
            nibs[c] += [0] * (want - len(nibs[c]))
        # 4-byte per-channel groups, low nibble first
        for g in range(0, want, 8):
            for c in range(n_channels):
                for k in range(g, g + 8, 2):
                    lo = nibs[c][k] if k < want else 0
                    hi = nibs[c][k + 1] if k + 1 < want else 0
                    out.append(lo | (hi << 4))
    return bytes(out), spb


# --- RIFF/WAVE container ---------------------------------------------------

WAVE_PCM = 0x0001
WAVE_ALAW = 0x0006
WAVE_ULAW = 0x0007
WAVE_IMA_ADPCM = 0x0011

_TAG_NAMES = {WAVE_PCM: "pcm", WAVE_ALAW: "alaw", WAVE_ULAW: "ulaw",
              WAVE_IMA_ADPCM: "ima_adpcm"}


def parse_wav_chunks(payload: bytes) -> dict:
    """Walk a RIFF/WAVE payload into {fmt fields, data bytes, fact
    frames}.  Raises ValueError on malformed/truncated containers (so
    per-row failure tolerance catches them) — NotImplementedError is
    reserved for well-formed but unsupported format tags."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    info: dict = {"fact_frames": None, "data": None}
    while pos + 8 <= n:
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            (tag, ch, sr, _brate, balign, bits) = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            info.update(tag=tag, n_channels=ch, sample_rate=sr,
                        block_align=balign, bits=bits)
            if tag == WAVE_IMA_ADPCM and size >= 20:
                info["samples_per_block"] = struct.unpack_from("<H", body, 18)[0]
        elif cid == b"data":
            info["data"] = body
        elif cid == b"fact" and size >= 4:
            info["fact_frames"] = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if "tag" not in info or info["data"] is None:
        raise ValueError("WAVE payload missing fmt or data chunk")
    return info


def decode_wav_compressed(payload: bytes):
    """Decode a non-PCM WAV payload (mu-law / A-law / IMA ADPCM).
    Returns (sample_rate, n_channels, int16 numpy array of interleaved
    samples, n_frames) — the same contract as multimodal.decode_audio.
    Unknown format tags raise NotImplementedError (the extension
    point); malformed containers raise ValueError."""
    import numpy as np

    info = parse_wav_chunks(payload)
    tag, ch, sr = info["tag"], info["n_channels"], info["sample_rate"]
    if ch < 1:
        raise ValueError("WAVE payload with zero channels")
    data = info["data"]
    if tag in (WAVE_ULAW, WAVE_ALAW):
        ulut, alut = _g711_tables()
        lut = ulut if tag == WAVE_ULAW else alut
        codes = np.frombuffer(data, dtype=np.uint8)
        samples = lut[codes]
        n_frames = len(samples) // ch
        if info["fact_frames"] is not None:
            n_frames = min(n_frames, info["fact_frames"])
        return sr, ch, samples[: n_frames * ch], n_frames
    if tag == WAVE_IMA_ADPCM:
        balign = info["block_align"]
        if balign < 4 * ch or balign % 4:
            raise ValueError(f"bad IMA ADPCM block_align {balign}")
        chans: list[list[int]] = [[] for _ in range(ch)]
        for b0 in range(0, len(data), balign):
            block = data[b0: b0 + balign]
            if len(block) < 4 * ch:
                break  # trailing runt — fact chunk governs length
            got = ima_adpcm_decode_block(block, ch)
            for c in range(ch):
                chans[c].extend(got[c])
        n_frames = len(chans[0])
        if info["fact_frames"] is not None:
            n_frames = min(n_frames, info["fact_frames"])
        inter = np.empty(n_frames * ch, dtype=np.int16)
        for c in range(ch):
            inter[c::ch] = np.array(chans[c][:n_frames], dtype=np.int16)
        return sr, ch, inter, n_frames
    name = _TAG_NAMES.get(tag, hex(tag))
    raise NotImplementedError(
        f"WAVE format tag {name} has no native decoder; plug an external "
        "codec into decode_audio() for it"
    )


def encode_wav(samples, sample_rate: int, n_channels: int = 1,
               codec: str = "pcm16", block_align: int = 256) -> bytes:
    """Author a WAV payload from interleaved int16 samples in any of
    the native codecs — the fixture/writer twin of decode.  Non-PCM
    variants emit the required fact chunk with the true frame count."""
    samples = [int(s) for s in samples]
    n_frames = len(samples) // n_channels
    if codec == "pcm16":
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<HHIIHH", WAVE_PCM, n_channels, sample_rate,
                          sample_rate * 2 * n_channels, 2 * n_channels, 16)
        chunks = [(b"fmt ", fmt), (b"data", data)]
    elif codec in ("ulaw", "alaw"):
        enc = lin_to_ulaw if codec == "ulaw" else lin_to_alaw
        tag = WAVE_ULAW if codec == "ulaw" else WAVE_ALAW
        data = bytes(enc(s) for s in samples)
        fmt = struct.pack("<HHIIHHH", tag, n_channels, sample_rate,
                          sample_rate * n_channels, n_channels, 8, 0)
        chunks = [(b"fmt ", fmt), (b"fact", struct.pack("<I", n_frames)),
                  (b"data", data)]
    elif codec == "ima_adpcm":
        data, spb = ima_adpcm_encode(samples, n_channels, block_align)
        byte_rate = (sample_rate * block_align + spb - 1) // spb
        fmt = struct.pack("<HHIIHHHH", WAVE_IMA_ADPCM, n_channels,
                          sample_rate, byte_rate, block_align, 4, 2, spb)
        chunks = [(b"fmt ", fmt), (b"fact", struct.pack("<I", n_frames)),
                  (b"data", data)]
    else:
        raise ValueError(f"unknown codec {codec!r}")
    body = b"WAVE"
    for cid, cbody in chunks:
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
