"""Watermarked stream-stream interval join (streaming/joins.py):
stream == batch on the same backlog, checkpointed rerun adds nothing,
and the watermark actually expires late rows (the state-bound
semantic)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return (
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )


def test_stream_equals_batch(spark, tmp_path):
    """AvailableNow over the whole backlog with a watermark wider than
    the data span: pair-for-pair equal to the batch twin (which is the
    oracle-checked registry query interval_join_view_purchase)."""
    from medical_ocr_pipeline_spark.streaming.joins import (
        interval_pairs,
        stream_interval_join,
    )

    feed = f"{tmp_path}/feed"
    out = f"{tmp_path}/out"
    ckpt = f"{tmp_path}/ckpt"
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.write.parquet(feed)
    # data spans days; "3650 days" makes every backlog row on-time so
    # the equivalence is exact (production uses tight watermarks and
    # accepts the documented late-drop semantics, tested below)
    stream_interval_join(spark, feed, out, ckpt, watermark="3650 days")
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    views, purchases = _sides(spark)
    want = sorted(
        tuple(r) for r in interval_pairs(views, purchases).collect()
    )
    assert got == want and len(want) > 0

    # rerun with the same checkpoint: nothing reprocessed
    stream_interval_join(spark, feed, out, ckpt, watermark="3650 days")
    again = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert again == got


def test_watermark_expires_late_rows(spark, tmp_path):
    """A view arriving after the watermark has passed its window must
    NOT produce a pair: run 1 advances the watermark past the old
    view's expiry, run 2 delivers the late view."""
    from medical_ocr_pipeline_spark.streaming.joins import (
        stream_interval_join,
    )

    feed = f"{tmp_path}/feed"
    out = f"{tmp_path}/out"
    ckpt = f"{tmp_path}/ckpt"
    rows1 = [
        # recent on-time traffic that drags the watermark forward
        (1, 900, "view", "2026-01-10 12:00:00"),
        (1, 901, "purchase", "2026-01-10 12:30:00"),
        (2, 910, "purchase", "2026-01-10 12:45:00"),
    ]
    rows2 = [
        # a view 10 days late: its join window [ts, ts+1h] is far
        # behind the checkpointed watermark -> state never admits it
        (2, 800, "view", "2026-01-01 00:00:00"),
        (2, 801, "purchase", "2026-01-01 00:10:00"),
    ]

    def write(rows, path):
        spark.createDataFrame(
            [(u, e, t, ts) for u, e, t, ts in rows],
            "user_id long, event_id long, event_type string, ts_s string",
        ).select(
            "user_id", "event_id", "event_type",
            F.to_timestamp("ts_s").alias("ts"),
        ).coalesce(1).write.mode("append").parquet(path)

    write(rows1, feed)
    stream_interval_join(spark, feed, out, ckpt, watermark="1 hour")
    write(rows2, feed)
    stream_interval_join(spark, feed, out, ckpt, watermark="1 hour")
    got = {
        (r["purchase_id"], r["view_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert (901, 900) in got          # on-time pair joined
    assert (801, 800) not in got      # late pair expired by watermark


def test_outer_join_emits_unattributed_after_watermark(spark, tmp_path):
    """how='left_outer': a purchase with no view in its window emits a
    null-matched row — but only once the view-side watermark proves no
    match can arrive (run 2's newer traffic advances it)."""
    from medical_ocr_pipeline_spark.streaming.joins import (
        stream_interval_join,
    )

    feed = f"{tmp_path}/feed"
    out = f"{tmp_path}/out"
    ckpt = f"{tmp_path}/ckpt"

    def write(rows):
        spark.createDataFrame(
            rows,
            "user_id long, event_id long, event_type string, ts_s string",
        ).select(
            "user_id", "event_id", "event_type",
            F.to_timestamp("ts_s").alias("ts"),
        ).coalesce(1).write.mode("append").parquet(feed)

    write([
        (1, 100, "view", "2026-01-10 12:00:00"),
        (1, 101, "purchase", "2026-01-10 12:30:00"),   # attributed
        (2, 200, "purchase", "2026-01-10 12:40:00"),   # no view at all
    ])
    stream_interval_join(spark, feed, out, ckpt, watermark="10 minutes",
                         how="left_outer")
    first = {
        (r["purchase_id"], r["view_id"])
        for r in spark.read.parquet(out).collect()
    }
    # the unattributed purchase may not have emitted yet: the watermark
    # has not passed its timestamp within run 1
    assert (101, 100) in first

    # newer traffic on BOTH sides pushes the GLOBAL watermark (Spark
    # takes the MINIMUM across the two inputs) well past purchase 200;
    # a third batch then flushes the expired outer row (outer results
    # emit in a batch AFTER the watermark passes, not the same one)
    write([(3, 300, "view", "2026-01-11 09:00:00"),
           (3, 301, "purchase", "2026-01-11 09:05:00")])
    stream_interval_join(spark, feed, out, ckpt, watermark="10 minutes",
                         how="left_outer")
    write([(3, 310, "view", "2026-01-11 10:00:00"),
           (3, 311, "purchase", "2026-01-11 10:05:00")])
    stream_interval_join(spark, feed, out, ckpt, watermark="10 minutes",
                         how="left_outer")
    final = {
        (r["purchase_id"], r["view_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert (101, 100) in final
    assert (200, None) in final, final
