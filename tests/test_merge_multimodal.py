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
