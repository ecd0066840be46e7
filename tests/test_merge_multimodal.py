"""Unit tests for A7 deep merge, F15 CER/WER (pure python) and the
multimodal binary-column plumbing (Spark)."""

import pytest

from medical_ocr_pipeline_spark.core.merge import (
    cer,
    merge_dict,
    merge_pieces,
    unigram_overlap,
    wer,
)
from medical_ocr_pipeline_spark.multimodal import (
    FEATURE_DIM,
    deterministic_fake_decode,
    frame_sample_plan,
    media_features,
    synthetic_media,
)


class TestDeepMerge:
    def test_scalar_first_non_empty_wins(self):
        assert merge_dict({"a": "x"}, {"a": "y"}) == {"a": "x"}
        assert merge_dict({"a": ""}, {"a": "y"}) == {"a": "y"}
        assert merge_dict({}, {"a": "y"}) == {"a": "y"}

    def test_recursive_dict(self):
        out = merge_dict({"p": {"name": ""}}, {"p": {"name": "bob", "age": 3}})
        assert out == {"p": {"name": "bob", "age": 3}}

    def test_list_concat_exact_dedup(self):
        out = merge_dict(
            {"meds": [{"n": "a"}, {"n": "b"}]},
            {"meds": [{"n": "b"}, {"n": "c"}]},
        )
        assert out["meds"] == [{"n": "a"}, {"n": "b"}, {"n": "c"}]

    def test_metadata_skipped(self):
        assert merge_dict({}, {"metadata": {"x": 1}}) == {}

    def test_merge_pieces_order(self):
        out = merge_pieces([{"a": "first"}, {"a": "second", "b": 1}])
        assert out == {"a": "first", "b": 1}


class TestCerWer:
    def test_identical(self):
        assert cer("abc", "abc") == 0.0
        assert wer("a b c", "a b c") == 0.0

    def test_empty_ref(self):
        assert cer("", "") == 0.0
        assert cer("", "x") == 1.0

    def test_known_value(self):
        # SequenceMatcher ratio("abcd","abcx") = 2*3/8 = 0.75
        assert abs(cer("abcd", "abcx") - 0.25) < 1e-9

    def test_wer_words(self):
        # 3 common of 4+4 words -> ratio .75 -> wer .25
        assert abs(wer("a b c d", "a b c x") - 0.25) < 1e-9

    def test_unigram(self):
        assert unigram_overlap("a b c", "a c d") == 2 / 3


class TestMultimodal:
    def test_fake_decode_deterministic(self):
        a = deterministic_fake_decode(b"payload")
        assert a == deterministic_fake_decode(b"payload")
        assert len(a) == FEATURE_DIM
        assert all(0 <= v < 1 for v in a)
        assert a != deterministic_fake_decode(b"other")

    def test_media_features_plumbing(self, spark):
        media = synthetic_media(spark, 24)
        feats = media_features(media).toPandas()
        assert len(feats) == 24
        assert all(len(f) == FEATURE_DIM for f in feats["features"])
        assert (feats["n_bytes"] > 0).all()
        # deterministic across runs
        again = media_features(synthetic_media(spark, 24)).toPandas()
        assert list(feats.sort_values("media_id")["checksum"]) == list(
            again.sort_values("media_id")["checksum"]
        )

    def test_frame_sample_plan(self, spark):
        media = synthetic_media(spark, 9)
        plan = frame_sample_plan(media, every_ms=1000).toPandas()
        assert set(plan.columns) == {"media_id", "frame_idx", "ts_ms"}
        assert (plan.groupby("media_id")["frame_idx"].min() == 0).all()
        one = plan[plan["media_id"] == plan["media_id"].iloc[0]]
        assert list(one["ts_ms"]) == list(range(0, one["ts_ms"].max() + 1, 1000))

    def test_real_decode_is_stubbed(self, spark):
        from medical_ocr_pipeline_spark.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"x")


class TestAudioChunkPlan:
    def test_overlapping_windows(self, spark):
        from medical_ocr_pipeline_spark.multimodal import (
            audio_chunk_plan,
            synthetic_media,
        )

        media = synthetic_media(spark, 12)
        chunks = audio_chunk_plan(media, chunk_ms=2000, overlap_ms=500)
        pdf = chunks.toPandas()
        assert (pdf.end_ms - pdf.start_ms <= 2000).all()
        assert (pdf.end_ms <= pdf.duration_ms if "duration_ms" in pdf
                else True)
        one = pdf[pdf.media_id == pdf.media_id.iloc[0]].sort_values(
            "chunk_idx"
        )
        starts = one.start_ms.tolist()
        # stride 1500, consecutive chunks overlap by 500
        assert all(b - a == 1500 for a, b in zip(starts, starts[1:]))
        # plan is pure Catalyst: no python eval node
        plan = chunks._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "MapInArrow" not in plan

    def test_overlap_validation(self, spark):
        import pytest as _pytest

        from medical_ocr_pipeline_spark.multimodal import (
            audio_chunk_plan,
            synthetic_media,
        )

        with _pytest.raises(ValueError):
            audio_chunk_plan(synthetic_media(spark, 3), 1000, 1000)


# --- real decode kernels (round 2) ------------------------------------------

import os

FIX = os.path.join(os.path.dirname(__file__), "fixtures_media")


def _fixture(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def test_decode_ppm_and_bmp_agree_pixelwise():
    from medical_ocr_pipeline_spark.multimodal import decode_image

    w1, h1, a = decode_image(_fixture("tiny.ppm"))
    w2, h2, b = decode_image(_fixture("tiny.bmp"))
    assert (w1, h1) == (w2, h2) == (4, 3)
    assert (a == b).all()
    # spot-check pixel content: top-left is the red-ish gradient start
    assert list(a[0, 0]) == [200, 0, 10]
    assert list(a[2, 3]) == [10, 20, 200]


def test_decode_wav_header_and_samples():
    from medical_ocr_pipeline_spark.multimodal import decode_audio

    sr, ch, samples, n = decode_audio(_fixture("tiny.wav"))
    assert (sr, ch, n) == (8000, 1, 400)
    assert samples[0] == 12000 and samples[5] == -12000


def test_image_features_golden():
    from medical_ocr_pipeline_spark.multimodal import image_features

    got = [round(v, 6) for v in image_features(_fixture("tiny.ppm"))]
    assert got == [
        0.000977, 0.000732, 0.333333, 0.068627, 0.392157, 0.055641,
        0.0, 0.833333, 0.166667, 0.0, 0.0, 0.0, 0.0, 0.0,
        0.062497, 0.025686,
    ]
    # BMP round-trips to the same features (identical pixels)
    assert [round(v, 6) for v in image_features(_fixture("tiny.bmp"))] == got


def test_audio_features_golden():
    from medical_ocr_pipeline_spark.multimodal import audio_features

    got = [round(v, 6) for v in audio_features(_fixture("tiny.wav"))]
    assert got == [
        0.000833, 0.166667, 0.5, 0.366211, 0.366211, 0.197995,
        0.125, 0.125, 0.125, 0.125, 0.125, 0.125, 0.125, 0.125,
        0.0, 0.366211,
    ]


def test_unsupported_formats_raise_not_implemented():
    import pytest

    from medical_ocr_pipeline_spark.multimodal import (
        decode_audio,
        decode_image,
        real_decode_features,
    )

    # PNG and JPEG now decode natively (round 3): a magic number with a
    # garbage body is a MALFORMED stream, not an unsupported format
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg garbage")
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 not a wav")
    with pytest.raises(NotImplementedError):
        real_decode_features("video", b"whatever")


def test_media_features_real_decode_spark_parity(spark):
    """media_features(real_decode=True) over a Spark frame of real
    PPM/BMP/WAV payloads equals the single-process kernels — the S2
    decode step is no longer a stub."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        image_features,
        media_features,
    )

    rows = [
        ("img_ppm", "image", _fixture("tiny.ppm"),
         {"mime": "image/x-portable-pixmap", "width": 4, "height": 3,
          "duration_ms": 0}),
        ("img_bmp", "image", _fixture("tiny.bmp"),
         {"mime": "image/bmp", "width": 4, "height": 3, "duration_ms": 0}),
        ("aud_wav", "audio", _fixture("tiny.wav"),
         {"mime": "audio/wav", "width": 0, "height": 0, "duration_ms": 50}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r["features"]
        for r in media_features(media, real_decode=True).collect()
    }
    assert [round(v, 6) for v in got["img_ppm"]] == [
        round(v, 6) for v in image_features(_fixture("tiny.ppm"))
    ]
    assert got["img_ppm"] == got["img_bmp"]
    assert [round(v, 6) for v in got["aud_wav"]] == [
        round(v, 6) for v in audio_features(_fixture("tiny.wav"))
    ]


def test_ppm_bmp_roundtrip_property():
    """Property: encode random small RGB images as PPM and BMP in the
    test, decode with the kernels, recover the exact pixels — both
    formats, including non-4-multiple widths (BMP row padding)."""
    import random
    import struct

    import numpy as np

    from medical_ocr_pipeline_spark.multimodal import decode_image

    rng = random.Random(42)
    for _ in range(12):
        w, h = rng.randrange(1, 9), rng.randrange(1, 7)
        px = np.frombuffer(
            bytes(rng.randrange(256) for _ in range(w * h * 3)), dtype=np.uint8
        ).reshape(h, w, 3)

        ppm = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
        pw, ph, pa = decode_image(ppm)
        assert (pw, ph) == (w, h) and (pa == px).all()

        stride = (w * 3 + 3) & ~3
        rows = b"".join(
            px[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
            for y in range(h - 1, -1, -1)
        )
        bmp = (
            b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                          2835, 2835, 0, 0)
            + rows
        )
        bw, bh, ba = decode_image(bmp)
        assert (bw, bh) == (w, h) and (ba == px).all()


def test_wav_roundtrip_property():
    """Property: write random 16-bit PCM through stdlib wave, decode,
    recover samples/rate/channels exactly."""
    import io
    import random
    import wave as wave_mod

    import numpy as np

    from medical_ocr_pipeline_spark.multimodal import decode_audio

    rng = random.Random(7)
    for _ in range(8):
        sr = rng.choice([8000, 16000, 44100])
        ch = rng.choice([1, 2])
        n = rng.randrange(1, 300)
        samples = np.array(
            [rng.randrange(-32768, 32768) for _ in range(n * ch)], dtype="<i2"
        )
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as wf:
            wf.setnchannels(ch)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(samples.tobytes())
        got_sr, got_ch, got, got_n = decode_audio(buf.getvalue())
        assert (got_sr, got_ch, got_n) == (sr, ch, n)
        assert (got == samples).all()


def test_resize_rgb_nearest_neighbor_golden():
    import numpy as np

    from medical_ocr_pipeline_spark.multimodal import (
        decode_image,
        encode_ppm,
        resize_rgb,
    )

    w, h, arr = decode_image(_fixture("tiny.ppm"))
    # identity resize
    assert (resize_rgb(arr, w, h) == arr).all()
    # 4x3 -> 2x2 nearest: rows 0,1 and cols 0,2
    small = resize_rgb(arr, 2, 2)
    assert small.shape == (2, 2, 3)
    assert (small[0, 0] == arr[0, 0]).all()
    assert (small[0, 1] == arr[0, 2]).all()
    assert (small[1, 0] == arr[1, 0]).all()
    # upscale replicates pixels
    big = resize_rgb(arr, 8, 6)
    assert (big[0, 0] == arr[0, 0]).all() and (big[5, 7] == arr[2, 3]).all()
    # encode round-trips through the decoder
    w2, h2, back = decode_image(encode_ppm(small))
    assert (w2, h2) == (2, 2) and (back == small).all()


def test_media_thumbnails_spark(spark):
    """decode -> resize -> re-encode end-to-end over a Spark frame;
    non-decodable payloads are skipped, not fatal."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        media_thumbnails,
    )

    rows = [
        ("ok_ppm", "image", _fixture("tiny.ppm"),
         {"mime": "image/x-portable-pixmap", "width": 4, "height": 3,
          "duration_ms": 0}),
        ("ok_bmp", "image", _fixture("tiny.bmp"),
         {"mime": "image/bmp", "width": 4, "height": 3, "duration_ms": 0}),
        ("bad_png", "image", b"\x89PNG....",
         {"mime": "image/png", "width": 9, "height": 9, "duration_ms": 0}),
        ("not_img", "audio", _fixture("tiny.wav"),
         {"mime": "audio/wav", "width": 0, "height": 0, "duration_ms": 50}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in media_thumbnails(media, 2, 2).collect()}
    assert set(got) == {"ok_ppm", "ok_bmp"}  # png skipped, audio filtered
    w, h, arr = decode_image(bytes(got["ok_ppm"]["thumbnail"]))
    assert (w, h) == (2, 2)
    assert bytes(got["ok_ppm"]["thumbnail"]) == bytes(got["ok_bmp"]["thumbnail"])


def test_null_payload_and_duration_tolerance(spark):
    """NULL payloads are skipped (thumbnails) / feature-nulled
    (features); NULL durations emit one probe frame/chunk instead of
    vanishing; zero durations emit none."""
    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        audio_chunk_plan,
        frame_sample_plan,
        media_features,
        media_thumbnails,
    )

    rows = [
        ("img_null", "image", None,
         {"mime": "image/bmp", "width": 1, "height": 1, "duration_ms": 0}),
        ("img_ok", "image", _fixture("tiny.ppm"),
         {"mime": "image/x-portable-pixmap", "width": 4, "height": 3,
          "duration_ms": 0}),
        ("vid_null_dur", "video", b"x",
         {"mime": "video/x", "width": 0, "height": 0, "duration_ms": None}),
        ("vid_zero_dur", "video", b"x",
         {"mime": "video/x", "width": 0, "height": 0, "duration_ms": 0}),
        ("aud_null_dur", "audio", _fixture("tiny.wav"),
         {"mime": "audio/wav", "width": 0, "height": 0, "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    thumbs = media_thumbnails(media, 2, 2).collect()
    assert [r["media_id"] for r in thumbs] == ["img_ok"]

    feats = {r["media_id"]: r for r in
             media_features(media, real_decode=True).collect()}
    assert len(feats) == 5  # row count preserved
    assert feats["img_null"]["features"] is None
    assert feats["img_ok"]["features"] is not None
    assert feats["vid_null_dur"]["features"] is None  # video: no codec

    frames = frame_sample_plan(media).collect()
    assert [(r["media_id"], r["ts_ms"]) for r in frames] == [
        ("vid_null_dur", 0)
    ]
    chunks = audio_chunk_plan(media).collect()
    null_dur = [r for r in chunks if r["media_id"] == "aud_null_dur"]
    assert len(null_dur) == 1
    assert null_dur[0]["start_ms"] == 0 and null_dur[0]["end_ms"] == 2000


def test_truncated_wav_is_row_failure_not_task_failure(spark):
    """ADVICE r02 #1: stdlib wave raises EOFError on a truncated header
    (b'RIFF' alone); that must cost the row its features, never the
    task.  decode_audio itself surfaces it as ValueError."""
    import pytest

    from medical_ocr_pipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        decode_audio,
        media_features,
    )

    with pytest.raises(ValueError, match="malformed/truncated WAV"):
        decode_audio(b"RIFF")
    # a RIFF/WAVE container whose fmt chunk is cut short exercises the
    # struct.error path inside chunk parsing
    with pytest.raises((ValueError, NotImplementedError)):
        decode_audio(b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01")

    rows = [
        ("aud_trunc", "audio", b"RIFF",
         {"mime": "audio/wav", "width": 0, "height": 0, "duration_ms": 10}),
        ("aud_short", "audio", b"RIFF\x24\x00\x00\x00WAVEfmt \x10",
         {"mime": "audio/wav", "width": 0, "height": 0, "duration_ms": 10}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             media_features(media, real_decode=True).collect()}
    assert len(feats) == 2  # both rows survive
    assert feats["aud_trunc"]["features"] is None
    assert feats["aud_short"]["features"] is None
    assert feats["aud_trunc"]["n_bytes"] == 4
