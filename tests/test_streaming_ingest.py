"""Streaming ingest dedup == batch dedup_incremental on the same data,
and the checkpoint suppresses reprocessing on rerun."""

from __future__ import annotations

from pyspark.sql import functions as F


def _frames(spark, sf_dir="/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


def test_ingest_verdicts_matches_batch_path(spark):
    """The stateless-join formulation must reproduce the batch
    semi-join formulation row for row."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        incremental_verdicts,
    )
    from medical_ocr_pipeline_spark.streaming.ingest_dedup import (
        corpus_index,
        ingest_verdicts,
    )

    existing, incoming = _frames(spark)
    old_h, old_b = corpus_index(existing)
    got = sorted(
        tuple(r) for r in ingest_verdicts(incoming, old_h, old_b).collect()
    )
    want = sorted(
        tuple(r) for r in incremental_verdicts(existing, incoming).collect()
    )
    assert got == want
    assert any(r[1] or r[2] for r in want), "fixture must contain dups"


def test_stream_ingest_dedup_end_to_end(spark, tmp_path):
    """AvailableNow run over a file backlog: output equals the batch
    verdicts; a second run with the same checkpoint adds nothing."""
    from medical_ocr_pipeline_spark.queries.dedup import (
        incremental_verdicts,
    )
    from medical_ocr_pipeline_spark.streaming.ingest_dedup import (
        stream_ingest_dedup,
    )

    existing, incoming = _frames(spark)
    corpus = f"{tmp_path}/corpus"
    feed = f"{tmp_path}/feed"
    out = f"{tmp_path}/out"
    ckpt = f"{tmp_path}/ckpt"
    existing.write.parquet(corpus)
    incoming.write.parquet(feed)

    stream_ingest_dedup(spark, corpus, feed, out, ckpt)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r) for r in incremental_verdicts(existing, incoming).collect()
    )
    assert got == want

    # rerun: the checkpoint has seen every feed file -> no new rows
    stream_ingest_dedup(spark, corpus, feed, out, ckpt)
    assert spark.read.parquet(out).count() == len(want)


def test_with_band_buckets_matches_banded(spark):
    """The per-row (streaming) banding and the exploded (batch) banding
    must be the same function: exploding the buckets array of the
    long-doc rows reproduces _banded exactly, and short docs get NULL
    buckets (never a shared md5('') bucket)."""
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.queries.dedup import (
        _banded,
        with_band_buckets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in _banded(docs).collect())
    b = sorted(
        tuple(r)
        for r in with_band_buckets(docs)
        .where(F.col("buckets").isNotNull())
        .select("doc_id", F.posexplode("buckets").alias("band", "bucket"))
        .collect()
    )
    assert a == b and len(a) > 0

    short = spark.createDataFrame(
        [Row(doc_id=1, text="two words"), Row(doc_id=2, text=None)])
    got = with_band_buckets(short).select("doc_id", "buckets").collect()
    assert all(r.buckets is None for r in got)
