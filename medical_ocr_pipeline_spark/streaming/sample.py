"""Streaming fixed-k deterministic sample: the per-language k-document
eval draw (queries/stats.py::sample_fixed_k) maintained over a document
stream with BOUNDED state.

Why this works: rank-by-salted-md5 sampling is MERGEABLE — the global
k smallest (hash, doc_id) pairs of a union are contained in the union
of each part's k smallest — so the streaming state is exactly the
current k-row-per-language sample, never the stream.  Each micro-batch
folds in via foreachBatch: take the batch's own per-language top-k,
union the (bounded, <= k x |langs| rows) previous sink, keep the
top-k of the union, overwrite the sink.  After the last micro-batch
the sink is BIT-IDENTICAL to the batch sample_fixed_k over the same
rows (pinned by test_streaming_sample.py), because the hash order is a
pure function of doc_id — the same determinism argument as the batch
query, now also invariant to micro-batch boundaries.

This is the streaming-eval-set pattern: a crawl feed keeps a standing
"k docs per language" human-review sample that never re-reads history
and never drifts on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.stats import (
    SAMPLE_K,
    _SAMP_H_SPARK,
)

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _topk(frame: DataFrame, k: int) -> DataFrame:
    """(lang, doc_id, hv) k smallest (hv, doc_id) per lang — plain
    window form: inputs here are always bounded (one micro-batch, or
    the k x |langs| union with the previous sample)."""
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        frame.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("lang", "doc_id", "hv")
    )


def stream_fixed_k_sample(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = SAMPLE_K,
    max_files_per_trigger: int = 1,
) -> None:
    """AvailableNow streaming run over a parquet backlog: after every
    micro-batch, out_dir holds the exact fixed-k sample of everything
    ingested so far (rank column included, matching sample_fixed_k's
    output shape)."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        cand = _topk(
            batch_df.select(
                "lang", "doc_id", F.expr(_SAMP_H_SPARK).alias("hv")
            ),
            k,
        )
        try:
            prev_rows = spark.read.parquet(f"{out_dir}/state").collect()
        except Exception:
            prev_rows = []
        if prev_rows:
            prev = spark.createDataFrame(
                [(r.lang, r.doc_id, r.hv) for r in prev_rows],
                "lang string, doc_id bigint, hv bigint",
            )
            cand = cand.unionByName(prev)
        merged = _topk(cand, k).collect()  # bounded: k x |langs|
        out = spark.createDataFrame(
            [(r.lang, r.doc_id, r.hv) for r in merged],
            "lang string, doc_id bigint, hv bigint",
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/state")
        w = Window.partitionBy("lang").orderBy("hv", "doc_id")
        (
            out.withColumn("rk", F.row_number().over(w).cast("long"))
            .select("lang", "doc_id", "rk")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/sample")
        )

    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(feed_dir)
    )
    (
        stream.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
