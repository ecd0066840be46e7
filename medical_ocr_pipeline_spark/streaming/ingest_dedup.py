"""Streaming incremental ingest dedup: a continuously-arriving document
feed is verdict-ed against a STATIC already-deduped corpus — the
streaming form of the batch dedup_incremental query (same hashes, same
band geometry, shared column cores from queries/dedup.py, so the two
paths cannot drift).

Formulated as 1 + `bands` STATELESS stream-static left-outer equi-joins
(exact content hash, then one join per LSH band against that band's
bucket index) instead of the batch form's semi-join + re-join: a
streaming frame cannot be self-joined and a streaming aggregation would
force watermark/output-mode machinery, but stream-static joins keep no
state at all — every micro-batch row leaves with its verdict attached.
The static index frames are one-column DISTINCT tables, so no join can
fan a stream row out.

Scale notes: the static side is re-evaluated per micro-batch (Spark's
stream-static contract) — at production scale the corpus hash/band
index is a precomputed compact table (the same persisted index the
batch path documents), not a re-scan of the raw corpus; this module
accepts pre-built index paths for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.dedup import (
    _INC_BANDS,
    _banded,
    with_band_buckets,
)


def corpus_index(existing: DataFrame, bands: int = _INC_BANDS):
    """(exact-hash frame, band-bucket frame) for a deduped corpus — the
    two static tables an ingest stream joins against.  Persist these
    between crawls; rebuilding them is the only corpus-side cost."""
    old_h = (
        existing.select(F.md5("text").alias("th"))
        .distinct()
        .withColumn("_ex", F.lit(True))
    )
    old_b = _banded(existing, bands).select("band", "bucket").distinct()
    return old_h, old_b


def ingest_verdicts(
    incoming: DataFrame,
    old_h: DataFrame,
    old_b: DataFrame,
    bands: int = _INC_BANDS,
) -> DataFrame:
    """Per-incoming-doc (exact_dup, near_dup, keep) verdicts via
    stateless joins only — `incoming` may be a streaming OR batch
    frame (parity with the batch path is pinned by
    test_streaming_ingest_dedup)."""
    d = with_band_buckets(
        incoming.select("doc_id", "text"), bands
    ).withColumn("th", F.md5("text"))
    d = d.join(old_h, "th", "left")
    near = F.lit(False)
    for b in range(bands):
        idx_b = (
            old_b.where(F.col("band") == b)
            .select(F.col("bucket").alias(f"_bk{b}"))
            .withColumn(f"_m{b}", F.lit(True))
        )
        d = d.withColumn(f"_bk{b}", F.element_at("buckets", b + 1)).join(
            idx_b, f"_bk{b}", "left"
        )
        near = near | F.coalesce(F.col(f"_m{b}"), F.lit(False))
    return d.select(
        "doc_id",
        F.coalesce(F.col("_ex"), F.lit(False)).alias("exact_dup"),
        near.alias("near_dup"),
    ).withColumn("keep", ~F.col("exact_dup") & ~F.col("near_dup"))


def stream_ingest_dedup(
    spark: SparkSession,
    corpus_path: str,
    incoming_path: str,
    output_path: str,
    checkpoint_path: str,
    bands: int = _INC_BANDS,
):
    """Run the ingest-dedup stream over the current backlog
    (Trigger.AvailableNow, checkpointed: kill/rerun never re-verdicts a
    processed file) and block until done.  Returns the finished query."""
    existing = spark.read.parquet(corpus_path)
    old_h, old_b = corpus_index(existing, bands)
    src = (
        spark.readStream.schema(existing.schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(incoming_path)
    )
    out = ingest_verdicts(src, old_h, old_b, bands)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
