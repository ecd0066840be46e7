"""Watermarked stream-stream interval join — the streaming sibling of
the batch as-of/range-join family (queries/temporal.py).

The batch as-of join answers "which view preceded this purchase";
live attribution needs the same answer while BOTH sides are unbounded
streams.  Structured Streaming's stream-stream inner join handles it
when the join condition carries (a) an equi key and (b) a two-sided
event-time bound, so the state store can expire rows: with watermarks
W on both inputs and `p.ts BETWEEN v.ts AND v.ts + window`, a buffered
view is droppable once the purchase-side watermark passes
`view.ts + window`, and state stays O(events inside the window), not
O(stream).

The SAME frame function serves batch and streaming (one definition, so
the two paths cannot drift — the ingest_dedup discipline); the batch
form carries the full DuckDB oracle (queries/temporal.py::
interval_join_view_purchase) and the streaming form is pinned
stream == batch by tests/test_streaming_joins.py.

Interval join, not as-of, by design: a streaming "latest view only"
reduction would need an aggregation after the join (another watermark
hop) — downstream consumers pick max_by(view_id) per purchase exactly
as the batch asof query does; the pair table is the reusable core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INTERVAL_JOIN_WINDOW_S = 3600  # attribute purchases to views <= 1 h old


def interval_pairs(views: DataFrame, purchases: DataFrame,
                   window_s: int = INTERVAL_JOIN_WINDOW_S,
                   how: str = "inner") -> DataFrame:
    """(user_id, purchase_id, view_id, gap_sec) for every view whose
    timestamp is within [p.ts - window_s, p.ts].  Works unchanged on
    batch OR streaming frames; streaming callers must put watermarks on
    both inputs first (stream_interval_join does).

    how='left_outer' preserves UNATTRIBUTED purchases (view_id and
    gap_sec null) — in streaming, the null-matched row is emitted only
    once the view-side watermark passes purchase.ts (a match is then
    provably impossible), the outer-join semantic Structured Streaming
    requires the watermark + range bound for."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (
            F.col("p_ts")
            <= F.col("v_ts") + F.expr(f"interval {window_s} seconds")
        ),
        how,
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        (
            F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")
        ).alias("gap_sec"),
    )


def stream_interval_join(
    spark: SparkSession,
    feed_path: str,
    out_path: str,
    checkpoint: str,
    window_s: int = INTERVAL_JOIN_WINDOW_S,
    watermark: str = "2 hours",
    how: str = "inner",
) -> None:
    """AvailableNow end-to-end: read an events parquet feed as a
    stream, split it into the two sides, interval-join with watermarks
    on BOTH (the state-expiry requirement for stream-stream joins),
    append pairs to parquet.  Rerunning with the same checkpoint
    reprocesses nothing."""
    ev = (
        spark.readStream.schema(
            spark.read.parquet(feed_path).schema
        ).parquet(feed_path)
        # watermarks require TIMESTAMP (tz-aware); the testdata feed
        # stores TIMESTAMP_NTZ — value-identical under the session's
        # fixed UTC timezone (session.py), same interpretation the
        # batch twin's unix_timestamp uses
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    views = ev.where(F.col("event_type") == "view").withWatermark(
        "ts", watermark
    )
    purchases = ev.where(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    q = (
        interval_pairs(views, purchases, window_s, how)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
