"""Streaming HLL register maintenance: the cardinality sketch as a
Structured Streaming aggregation.

This is the whole reason production dashboards run sketches instead of
COUNT(DISTINCT) on streams: the streaming state for an exact distinct
is the distinct set itself (unbounded), while the HLL register table is
a bounded (group, idx) -> max(rho) MAX aggregate — 64 rows per group,
forever, no watermark needed (max is monotone; late data can only raise
a register, never invalidate one).  The registers written after the
last micro-batch are IDENTICAL to a batch sketch over the same rows
(max is associative/commutative — the same mergeability the batch
query sketch_hll_union proves), which is what the parity test pins.

Shape: stateful streaming agg in complete output mode; the register
table is tiny, so foreachBatch overwrites the sink parquet with the
full current registers each micro-batch — the sink is always a valid,
queryable sketch of everything ingested so far.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import (
    MD5_INT48_SPARK,
    words_expr,
)

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def hll_registers(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """(group, idx, rho) register frame — the exact expressions of
    queries/sketches.py::sketch_hll_distinct, shared so the streaming
    and batch sketches cannot drift."""
    words = docs.select(group_col, F.explode(words_expr()).alias("w"))
    h = F.expr(MD5_INT48_SPARK.format(x="w"))
    rho = F.lit(43) - F.length(
        F.regexp_replace(F.bin(F.shiftright(h, 6)), "^0+", "")
    )
    return (
        words.select(
            F.col(group_col).alias("grp"),
            h.bitwiseAND(63).alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("grp", "idx")
        .agg(F.max("rho").alias("rho"))
    )


def stream_hll_sketch(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    group_col: str = "lang",
    max_files_per_trigger: int = 1,
) -> None:
    """AvailableNow streaming run over a parquet file backlog: maintain
    the per-group HLL registers across micro-batches and leave the
    current register table at out_dir after every batch."""
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(feed_dir)
    )
    reg = hll_registers(stream, group_col)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    (
        reg.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# --- streaming Count-Min sketch ----------------------------------------------
# The frequency twin of the HLL registers above: streaming state for
# exact per-word counts is the word table itself (unbounded vocabulary),
# while the CMS cell table is a bounded (r, c) -> SUM aggregate —
# _CMS_D x 64 rows per stream, forever, no watermark needed (sum is
# monotone under append; late data only adds).  The cells after the
# last micro-batch are IDENTICAL to a batch sketch over the same rows
# (sum is associative/commutative — the same mergeability the batch
# query sketch_cms_heavy relies on when its map-side partials combine),
# which is what the parity test pins.  Point queries (min over the d
# row estimates) run against the tiny sink table.


def cms_cells(docs: DataFrame) -> DataFrame:
    """(r, c, cell) Count-Min cell frame over the word stream — the
    cell values of queries/sketches.py::sketch_cms_heavy (there
    aggregated from the exact count table; summing raw occurrences per
    cell is the same number), shared so the streaming and batch
    sketches cannot drift."""
    from medical_ocr_pipeline_spark.queries.sketches import (
        _CMS_D,
        cms_cell_col,
    )

    words = docs.select(F.explode(words_expr()).alias("w"))
    keyed = words.select(
        "w",
        F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("r"),
    ).select("r", cms_cell_col().alias("c"))
    return keyed.groupBy("r", "c").agg(
        F.count("*").cast("long").alias("cell")
    )


def stream_cms_sketch(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """AvailableNow streaming run over a parquet file backlog: maintain
    the CMS cell table across micro-batches and leave the current
    cells at out_dir after every batch (complete-mode aggregate; the
    sink is always a valid, queryable sketch of everything ingested so
    far)."""
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(feed_dir)
    )
    cells = cms_cells(stream)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    (
        cells.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
