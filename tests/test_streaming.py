"""Structured Streaming: incremental extraction with checkpoint/resume
(exactly-once over an append-only transcripts table) and event-time
session windows."""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.oracle import golden_pandas
from medical_ocr_pipeline_spark.streaming.extraction import (
    session_window_events,
    stream_extract,
)
from medical_ocr_pipeline_spark.synth import spark_transcripts


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_extract_exactly_once(spark, tmpdirs):
    inp = f"{tmpdirs}/in"
    out = f"{tmpdirs}/out"
    ckpt = f"{tmpdirs}/ckpt"

    # batch 1: conversations 0..9
    all_tr = spark_transcripts(spark, 20, partitions=4).cache()
    b1 = all_tr.where(F.col("conv_id") < "conv_000010")
    b1.write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == b1.count()

    # batch 2 appended: remaining conversations; resume processes ONLY new
    b2 = all_tr.where(F.col("conv_id") >= "conv_000010")
    b2.write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    total = spark.read.parquet(out)
    assert total.count() == all_tr.count()
    # no duplicates: one row per (conv_id, turn_idx)
    assert total.select("conv_id", "turn_idx").distinct().count() == all_tr.count()

    # rerun with NO new input: output unchanged (idempotent resume)
    stream_extract(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == all_tr.count()
    all_tr.unpersist()


def test_streaming_output_matches_golden(spark, tmpdirs):
    inp = f"{tmpdirs}/in"
    out = f"{tmpdirs}/out"
    spark_transcripts(spark, 10, partitions=2).write.parquet(inp)
    stream_extract(spark, inp, out, f"{tmpdirs}/ckpt")
    got = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "text_final")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = golden_pandas(10)[["conv_id", "turn_idx", "text_final"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_window_matches_batch_sessionize(spark):
    """F.session_window on a static frame == the lag/cumsum batch
    sessionization (same gap)."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sw = session_window_events(events).toPandas()
    from medical_ocr_pipeline_spark.queries.relational import w4_sessionize

    batch = w4_sessionize(spark, "/root/testdata/sf0.001").toPandas()
    # same number of sessions per user and same total value
    a = sw.groupby("user_id").agg(n=("n_events", "count"),
                                  v=("session_value", "sum"))
    b = batch.groupby("user_id").agg(n=("session_id", "count"),
                                     v=("session_value", "sum"))
    pd.testing.assert_frame_equal(a.sort_index(), b.sort_index(),
                                  check_dtype=False, atol=1e-6)


def test_stateful_rollup_accumulates_across_restarts(spark, tmpdirs):
    """applyInPandasWithState: per-conversation counters accumulate across
    two AvailableNow runs (state restored from the checkpoint)."""
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.streaming.stateful import (
        conversation_rollup_stream,
    )

    inp = f"{tmpdirs}/sin"
    out = f"{tmpdirs}/sout"
    ckpt = f"{tmpdirs}/sckpt"
    all_tr = spark_transcripts(spark, 12, partitions=2).cache()
    half = all_tr.where(F.col("turn_idx") % 2 == 0)

    half.write.mode("append").parquet(inp)
    conversation_rollup_stream(spark, inp, out, ckpt)
    first = (
        spark.read.parquet(out).groupBy("conv_id")
        .agg(F.max("n_turns").alias("n")).toPandas().set_index("conv_id")["n"]
    )

    all_tr.where(F.col("turn_idx") % 2 == 1).write.mode("append").parquet(inp)
    conversation_rollup_stream(spark, inp, out, ckpt)
    latest = (
        spark.read.parquet(out).groupBy("conv_id")
        .agg(F.max("n_turns").alias("n")).toPandas().set_index("conv_id")["n"]
    )

    totals = (
        all_tr.groupBy("conv_id").count().toPandas()
        .set_index("conv_id")["count"]
    )
    for conv, total in totals.items():
        assert latest[conv] == total, conv       # state accumulated
        assert first[conv] <= total
    assert (first < latest).any()                # second batch added turns
    all_tr.unpersist()


def test_stream_dedup_within_watermark(spark, tmpdirs):
    """Duplicated turn deliveries (same conv_id/turn_idx, same event
    time) collapse to one row; distinct turns all survive."""
    from medical_ocr_pipeline_spark.streaming.extraction import (
        stream_dedup_turns,
    )

    inp = f"{tmpdirs}/din"
    out = f"{tmpdirs}/dout"
    ckpt = f"{tmpdirs}/dckpt"

    tr = spark_transcripts(spark, 6, partitions=2).cache()
    n_unique = tr.count()
    # simulate an at-least-once feed: every row delivered twice, a third
    # of them a third time
    dup = tr.unionByName(tr).unionByName(tr.sample(0.33, seed=7))
    dup.write.mode("append").parquet(inp)

    stream_dedup_turns(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == n_unique
    assert got.select("conv_id", "turn_idx").distinct().count() == n_unique


def test_streaming_turn_metrics_composes_with_extraction(spark, tmpdirs):
    """The advertised composition works end-to-end: stream_extract's
    output carries ts (event-time passthrough), and streaming_turn_metrics
    windows it under a watermark — verified as a real stream into a
    memory sink, with totals reconciling against the batch counts."""
    from medical_ocr_pipeline_spark.pipeline import EXTRACT_SCHEMA
    from medical_ocr_pipeline_spark.streaming.extraction import (
        streaming_turn_metrics,
    )
    from pyspark.sql import types as T

    inp = f"{tmpdirs}/in"
    out = f"{tmpdirs}/out"
    spark_transcripts(spark, 10, partitions=2).write.parquet(inp)
    stream_extract(spark, inp, out, f"{tmpdirs}/ckpt")

    extracted = spark.read.parquet(out)
    assert "ts" in extracted.columns  # event time survives extraction

    schema = T.StructType(
        EXTRACT_SCHEMA.fields[:3]
        + [T.StructField("ts", T.TimestampNTZType())]
        + EXTRACT_SCHEMA.fields[3:]
    )
    stream = spark.readStream.schema(schema).parquet(out)
    q = (
        streaming_turn_metrics(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("turn_metrics")
        # complete mode: append would withhold windows the watermark has
        # not yet closed (the tail of the data), understating the totals
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("turn_metrics").toPandas()
    assert got["turns_processed"].sum() == extracted.count()
    assert got["bytes_stripped"].sum() == (
        extracted.agg(F.sum("bytes_stripped")).collect()[0][0]
    )
    assert len(got) >= 1
