"""From-scratch compressed-audio codecs (audio.py): G.711 mu-law /
A-law and IMA ADPCM in WAV containers.

Anchors: bit-exactness against CPython's audioop (skipped gracefully
once audioop leaves the stdlib in 3.13 — the golden decode-table
checksums below outlive it), quantization idempotence, roundtrip SNR,
container roundtrips through decode_audio, stereo interleave, and
malformed-payload behavior (ValueError, so per-row tolerance catches
it; NotImplementedError only for well-formed-but-unsupported tags).
"""

import math
import struct
import zlib

import pytest

from medical_ocr_pipeline_spark.audio import (
    alaw_to_lin,
    decode_wav_compressed,
    encode_wav,
    ima_adpcm_decode_block,
    ima_adpcm_encode,
    lin_to_alaw,
    lin_to_ulaw,
    parse_wav_chunks,
    ulaw_to_lin,
)
from medical_ocr_pipeline_spark.multimodal import audio_features, decode_audio

try:
    import audioop  # removed in Python 3.13
except ImportError:
    audioop = None


def _wave(n, sr=8000, amp=12000, freq=440.0):
    return [
        int(amp * math.sin(2 * math.pi * freq * k / sr)) for k in range(n)
    ]


# --- G.711 -----------------------------------------------------------------


def test_g711_decode_tables_golden():
    """256-entry decode tables pinned by checksum — the anchor that
    outlives audioop."""
    u = struct.pack("<256h", *[ulaw_to_lin(c) for c in range(256)])
    a = struct.pack("<256h", *[alaw_to_lin(c) for c in range(256)])
    assert zlib.crc32(u) == 210008735
    assert zlib.crc32(a) == 2641774167


@pytest.mark.skipif(audioop is None, reason="audioop removed from stdlib")
def test_g711_bit_exact_vs_audioop_full_domain():
    for c in range(256):
        assert ulaw_to_lin(c) == struct.unpack(
            "<h", audioop.ulaw2lin(bytes([c]), 2)
        )[0]
        assert alaw_to_lin(c) == struct.unpack(
            "<h", audioop.alaw2lin(bytes([c]), 2)
        )[0]
    for s in range(-32768, 32768, 7):  # stride keeps the test fast
        pk = struct.pack("<h", s)
        assert lin_to_ulaw(s) == audioop.lin2ulaw(pk, 2)[0]
        assert lin_to_alaw(s) == audioop.lin2alaw(pk, 2)[0]
    # the encode boundary cells where a naive 16-bit-domain mu-law
    # encoder diverges from the 14-bit reference
    for s in (-31611, -31610, -30587, -29563, 31611, 127, -128):
        assert lin_to_ulaw(s) == audioop.lin2ulaw(struct.pack("<h", s), 2)[0]


def test_g711_quantization_idempotence():
    # A-law: all 256 codes; mu-law: all but 0x7F (negative zero, which
    # canonically re-encodes as positive zero 0xFF)
    for c in range(256):
        assert lin_to_alaw(alaw_to_lin(c)) == c
        if c != 0x7F:
            assert lin_to_ulaw(ulaw_to_lin(c)) == c
    assert lin_to_ulaw(ulaw_to_lin(0x7F)) == 0xFF


def test_g711_roundtrip_snr():
    xs = _wave(800)
    for enc, dec in ((lin_to_ulaw, ulaw_to_lin), (lin_to_alaw, alaw_to_lin)):
        ys = [dec(enc(x)) for x in xs]
        sig = sum(x * x for x in xs)
        err = sum((x - y) ** 2 for x, y in zip(xs, ys))
        snr = 10 * math.log10(sig / err)
        assert snr > 30  # G.711 delivers ~37 dB on speech-level sines


# --- IMA ADPCM ---------------------------------------------------------------


def test_ima_adpcm_roundtrip_snr_mono():
    xs = _wave(2000, freq=220.0)
    data, spb = ima_adpcm_encode(xs, n_channels=1, block_align=256)
    assert spb == 505
    sr, ch, samples, n = decode_wav_compressed(
        encode_wav(xs, 8000, 1, codec="ima_adpcm")
    )
    assert (sr, ch, n) == (8000, 1, 2000)
    ys = samples.tolist()
    sig = sum(x * x for x in xs)
    err = sum((x - y) ** 2 for x, y in zip(xs, ys))
    assert 10 * math.log10(sig / err) > 20  # ~4:1 ADPCM on a slow sine


def test_ima_adpcm_block_header_is_first_sample():
    xs = _wave(600)
    data, spb = ima_adpcm_encode(xs, 1, block_align=256)
    pred0 = struct.unpack_from("<h", data, 0)[0]
    assert pred0 == xs[0]
    # second block header re-seeds from sample spb
    pred1 = struct.unpack_from("<h", data, 256)[0]
    assert pred1 == xs[spb]
    # step index carries ACROSS blocks (byte 2 of block 1 header != 0
    # after a full block of activity)
    assert data[256 + 2] > 0


def test_ima_adpcm_stereo_interleave():
    # L = sine, R = negated sine: decoded channels must mirror
    n = 1010
    left = _wave(n, freq=330.0)
    inter = []
    for x in left:
        inter += [x, -x]
    payload = encode_wav(inter, 16000, 2, codec="ima_adpcm")
    sr, ch, samples, frames = decode_audio(payload)
    assert (sr, ch, frames) == (16000, 2, n)
    ls, rs = samples[0::2].tolist(), samples[1::2].tolist()
    # quantizers run independently per channel on exactly-opposite
    # inputs, so the decoded channels are exact negatives frame-for-
    # frame (the nibble math is sign-symmetric)
    for a, b in zip(ls, rs):
        assert abs(a + b) <= 1  # clamp at -32768 breaks exact symmetry
    sig = sum(x * x for x in left)
    err = sum((x - y) ** 2 for x, y in zip(left, ls))
    assert 10 * math.log10(sig / err) > 20


def test_ima_adpcm_malformed_blocks():
    with pytest.raises(ValueError):
        ima_adpcm_decode_block(b"\x00\x01", 1)  # truncated header
    with pytest.raises(ValueError):
        # step index 99 out of range
        ima_adpcm_decode_block(struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4, 1)
    with pytest.raises(ValueError):
        # data not 4-byte aligned
        ima_adpcm_decode_block(struct.pack("<hBB", 0, 0, 0) + b"\x00" * 3, 1)


# --- container + dispatch -----------------------------------------------------


def test_decode_audio_dispatch_all_codecs():
    xs = _wave(400, freq=220.0)
    sig = sum(x * x for x in xs)
    # SNR, not max-error: ADPCM's quantizer starts at step index 0 and
    # pays a slope-overload transient on the first block's attack
    for codec, min_snr in (("ulaw", 30), ("alaw", 30), ("ima_adpcm", 15)):
        sr, ch, samples, n = decode_audio(encode_wav(xs, 8000, 1, codec=codec))
        assert (sr, ch, n) == (8000, 1, 400)
        err = sum(
            (x - int(y)) ** 2 for x, y in zip(xs, samples)
        )
        assert 10 * math.log10(sig / err) > min_snr
        feats = audio_features(encode_wav(xs, 8000, 1, codec=codec))
        assert len(feats) == 16 and all(v == v for v in feats)


def test_fact_chunk_truncates_padded_tail_block():
    xs = _wave(600)  # not a multiple of 505: last block zero-padded
    sr, ch, samples, n = decode_audio(encode_wav(xs, 8000, 1, codec="ima_adpcm"))
    assert n == 600 and len(samples) == 600


def test_wav_container_errors():
    # malformed containers -> ValueError (per-row tolerance catches it)
    with pytest.raises(ValueError):
        parse_wav_chunks(b"RIFF\x10\x00\x00\x00WAVE" + b"fmt \xff\xff\xff\xff")
    with pytest.raises(ValueError):
        decode_wav_compressed(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data
    # well-formed container, unsupported tag -> NotImplementedError
    fmt = struct.pack("<HHIIHH", 0x0055, 1, 8000, 8000, 1, 16)  # MP3 tag
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_audio(payload)
    # non-RIFF stays the original extension-point error
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 not a wav")


def test_g711_wav_via_audio_features_matches_pcm_closely():
    """Features of the mu-law twin of a PCM payload sit within
    quantization distance — the decode path is real expansion, not a
    passthrough of the code bytes."""
    import numpy as np

    xs = _wave(800, amp=9000)
    f_pcm = np.array(audio_features(encode_wav(xs, 8000, 1, "pcm16")))
    f_ul = np.array(audio_features(encode_wav(xs, 8000, 1, codec="ulaw")))
    assert abs(f_pcm[3] - f_ul[3]) < 0.01  # rms
    assert abs(f_pcm[0] - f_ul[0]) < 1e-9  # duration identical


def test_committed_compressed_fixtures_decode():
    """The committed mu-law / A-law / IMA twins of tiny.wav decode to
    the same frame geometry; G.711 within expansion error of the PCM
    original; IMA byte-stream pinned by checksum (a square wave is
    ADPCM's slope-overload worst case, so its fidelity bound is loose
    by design — the container/geometry is what this pins)."""
    import os

    fix = os.path.join(os.path.dirname(__file__), "fixtures_media")

    def load(name):
        with open(os.path.join(fix, name), "rb") as f:
            return f.read()

    sr, ch, base, n = decode_audio(load("tiny.wav"))
    for name, bound in (("tiny_ulaw.wav", 128), ("tiny_alaw.wav", 64)):
        sr2, ch2, s2, n2 = decode_audio(load(name))
        assert (sr2, ch2, n2) == (sr, ch, n)
        assert max(abs(int(a) - int(b)) for a, b in zip(base, s2)) <= bound
    payload = load("tiny_ima.wav")
    assert zlib.crc32(payload) == 3723237657
    sr3, ch3, s3, n3 = decode_audio(payload)
    assert (sr3, ch3, n3) == (sr, ch, n)


def test_media_features_real_includes_compressed_rows(spark):
    """The driver-visible media query carries the compressed-audio
    rows: real G.711/ADPCM decode yields features; the truncated
    payload costs exactly its own row (null feature_sum)."""
    from medical_ocr_pipeline_spark.queries.base import REGISTRY

    df = REGISTRY["media_features_real"].fn(spark, "/root/testdata/sf0.001")
    rows = {r["media_id"]: r for r in df.collect()}
    for mid in ("aud_ulaw", "aud_alaw", "aud_ima_adpcm"):
        assert rows[mid]["feature_sum"] is not None
    assert rows["aud_truncated"]["feature_sum"] is None
    # G.711 twins of the same waveform land within quantization error
    # of each other; ADPCM on a sawtooth-ish ramp is looser
    assert abs(rows["aud_ulaw"]["feature_sum"]
               - rows["aud_alaw"]["feature_sum"]) < 0.05
