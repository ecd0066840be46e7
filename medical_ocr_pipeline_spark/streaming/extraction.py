"""Structured Streaming: incremental per-turn extraction with exactly-once
file sinks and checkpoint/resume.

The reference's resumability story is stage directories + newest-stage
fallback discovery (S9, notebooks/04_json_extraction.ipynb cell 2:18-27):
a crashed run resumes from the last completed stage folder.  Here the
same guarantee comes from Structured Streaming checkpoints: the
transcripts table is treated as an append-only source, each
Trigger.AvailableNow run extracts only the files not yet recorded in the
checkpoint, and the parquet sink commits atomically — kill/rerun
converges to the identical output set with no reprocessing.

Also provided: watermarked event-time metrics (the streaming analogue of
the per-stage metrics CSVs, S7) and gap-based session windows over the
events table (the reference's y-gap sessionization A1-A3 transplanted to
event time via F.session_window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.pipeline import extract_transcripts
from medical_ocr_pipeline_spark.schemas import TRANSCRIPT

# single source of truth (schemas.py) — a local copy could drift and
# silently null out columns on the streaming readers
TRANSCRIPT_SCHEMA = TRANSCRIPT


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    enable_fuzzy: bool = True,
):
    """Incrementally extract all not-yet-processed transcript files.

    Returns the finished StreamingQuery (AvailableNow: runs to completion
    over the current backlog, then stops — the batch/streaming unification
    point; a production deployment swaps the trigger for a continuous one).
    """
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    extracted = extract_transcripts(src, enable_fuzzy=enable_fuzzy)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_turn_metrics(extracted_with_ts: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window extraction metrics: late rows beyond the
    watermark are dropped, state is bounded — the 10^12-turn-safe way to
    keep running counts.  ts is cast to TIMESTAMP up front (watermarks
    reject TIMESTAMP_NTZ, which is what the transcript source carries;
    the session tz is UTC so the cast is exact)."""
    return (
        extracted_with_ts.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("turns_processed"),
            F.sum("bytes_stripped").alias("bytes_stripped"),
            F.sum("parse_failures").alias("parse_failures"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "turns_processed",
            "bytes_stripped",
            "parse_failures",
        )
    )


def session_window_events(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows over the events stream (W4's streaming
    twin: F.session_window instead of lag/cumsum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_dedup_turns(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "2 hours",
):
    """Streaming exact dedup of the transcripts feed on (conv_id,
    turn_idx) via dropDuplicatesWithinWatermark: re-delivered turns
    (at-least-once upstream feeds re-send rows) are suppressed while the
    dedup state stays bounded — keys older than the watermark are evicted,
    which is the only formulation that survives 10^12 turns (an unbounded
    dropDuplicates state would OOM).  AvailableNow + checkpoint as in
    stream_extract."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
