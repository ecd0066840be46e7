"""From-scratch FLAC codec (flac.py).  Lossless compression allows the
strongest codec assertion there is — decode(encode(x)) == x exactly —
so the matrix below pins EVERY decoder path with exact roundtrips:
subframe types (constant/verbatim/fixed 0-4/LPC), Rice partitions and
the escape code, wasted bits, all four channel assignments, partial
tail blocks.  Integrity machinery (CRC-8, CRC-16, STREAMINFO MD5) is
proven by tampering; truncation fuzz pins ValueError at every prefix
so per-row tolerance always catches malformed payloads."""

import math
import random

import pytest

from medical_ocr_pipeline_spark.flac import decode_flac, encode_flac
from medical_ocr_pipeline_spark.multimodal import audio_features, decode_audio


def _sine(n, amp=12000, freq=440.0, sr=8000):
    return [int(amp * math.sin(2 * math.pi * freq * k / sr)) for k in range(n)]


def _walk(n, seed=7):
    rng = random.Random(seed)
    out, x = [], 0
    for _ in range(n):
        x = max(-30000, min(30000, x + rng.randint(-400, 400)))
        out.append(x)
    return out


def _roundtrip(samples, n_ch=1, **kw):
    payload = encode_flac(samples, 8000, n_ch, **kw)
    sr, ch, out, n = decode_flac(payload)
    assert (sr, ch) == (8000, n_ch)
    assert n == len(samples) // n_ch
    assert out.tolist() == [int(s) for s in samples]
    return payload


@pytest.mark.parametrize(
    "kw",
    [
        {},  # fixed order 2, auto
        {"strategy": "verbatim"},
        {"strategy": "lpc"},
        {"escape": True},
        {"partition_order": 2},
        {"fixed_order": 0},
        {"fixed_order": 1},
        {"fixed_order": 3},
        {"fixed_order": 4},
    ],
)
def test_exact_roundtrip_mono_matrix(kw):
    _roundtrip(_walk(3000), **kw)


def test_constant_and_wasted_bits():
    p = _roundtrip([123] * 500)
    assert len(p) < 100  # constant subframes collapse
    _roundtrip([s & ~7 for s in _sine(2000)], use_wasted=True)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_exact_roundtrip_stereo_assignments(mode):
    left, right = _sine(1500), _walk(1500)
    inter = []
    for l, r in zip(left, right):
        inter += [l, r]
    _roundtrip(inter, n_ch=2, channel_mode=mode)


def test_mid_side_odd_sums():
    # mid = (l+r)>>1 floors; the side LSB must reconstruct odd sums
    inter = [3, 0, -3, 0, 5, -2, -7, 4, 1, 1]
    _roundtrip(inter, n_ch=2, channel_mode="mid_side")


def test_partial_tail_block_and_multiframe():
    _roundtrip(_sine(1537), blocksize=512)  # 3 full frames + 1 runt


def test_compression_is_real():
    smooth = _sine(4000, freq=55.0)
    p = encode_flac(smooth, 8000, 1)
    assert len(p) < 2 * len(smooth) * 0.75  # beats raw 16-bit PCM


def test_crc_and_md5_tamper_detection():
    p = bytearray(encode_flac(_sine(1000), 8000, 1))
    # flip one bit inside the last frame's audio data
    p[-40] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(p))
    # corrupt only the STREAMINFO MD5: frames are CRC-clean, the
    # stream-level signature must still catch it
    q = bytearray(encode_flac(_sine(1000), 8000, 1))
    q[8 + 18] ^= 0xFF  # first md5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(q))
    decode_flac(bytes(q), verify_md5=False)  # the dial works


def test_truncation_fuzz_every_prefix_raises():
    p = encode_flac(_walk(600), 8000, 1, blocksize=256)
    for cut in range(4, len(p), 13):
        with pytest.raises(ValueError):
            decode_flac(p[:cut])


def test_not_flac_raises_value_error():
    with pytest.raises(ValueError):
        decode_flac(b"fLaX nope")
    with pytest.raises(ValueError):
        decode_flac(b"")


def test_decode_audio_dispatch_and_features():
    xs = _sine(800)
    p = encode_flac(xs, 8000, 1)
    sr, ch, samples, n = decode_audio(p)
    assert (sr, ch, n) == (8000, 1, 800)
    assert samples.tolist() == xs
    feats = audio_features(p)
    assert len(feats) == 16 and all(v == v for v in feats)
    # identical features to the PCM WAV twin of the same samples
    from medical_ocr_pipeline_spark.audio import encode_wav

    assert feats == audio_features(encode_wav(xs, 8000, 1, codec="pcm16"))


def test_committed_fixture_decodes_to_tiny_wav_samples():
    import os

    fix = os.path.join(os.path.dirname(__file__), "fixtures_media")
    with open(os.path.join(fix, "tiny.wav"), "rb") as f:
        wav = f.read()
    with open(os.path.join(fix, "tiny.flac"), "rb") as f:
        fl = f.read()
    sr, ch, base, n = decode_audio(wav)
    sr2, ch2, got, n2 = decode_audio(fl)
    assert (sr2, ch2, n2) == (sr, ch, n)
    assert got.tolist() == base.tolist()  # lossless twin, sample-exact
