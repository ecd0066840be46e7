"""Streaming fixed-k sample == the batch sample_fixed_k over the same
rows, with the backlog forced through multiple micro-batches (the
mergeability of rank-by-hash sampling is what's under test)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_streamed_sample_equals_batch_sample(spark, tmp_path):
    from medical_ocr_pipeline_spark.queries.stats import sample_frame
    from medical_ocr_pipeline_spark.streaming.sample import (
        stream_fixed_k_sample,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feed = f"{tmp_path}/feed"
    # 4 files -> 4 micro-batches at maxFilesPerTrigger=1: the cross-
    # batch top-k merge is the machinery under test
    docs.repartition(4).write.parquet(feed)
    out = f"{tmp_path}/out"
    stream_fixed_k_sample(spark, feed, out, f"{tmp_path}/ckpt")

    got = sorted(
        (r.lang, r.rk, r.doc_id)
        for r in spark.read.parquet(f"{out}/sample").collect()
    )
    want = sorted(
        (r.lang, r.rk, r.doc_id) for r in sample_frame(docs).collect()
    )
    assert got == want


def test_state_is_bounded_to_k_per_lang(spark, tmp_path):
    from medical_ocr_pipeline_spark.queries.stats import SAMPLE_K
    from medical_ocr_pipeline_spark.streaming.sample import (
        stream_fixed_k_sample,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feed = f"{tmp_path}/feed"
    docs.repartition(3).write.parquet(feed)
    out = f"{tmp_path}/out"
    stream_fixed_k_sample(spark, feed, out, f"{tmp_path}/ckpt")
    state = spark.read.parquet(f"{out}/state")
    per_lang = {
        r.lang: r.n
        for r in state.groupBy("lang").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert per_lang
    assert all(n <= SAMPLE_K for n in per_lang.values())
