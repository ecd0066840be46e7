"""Training-set assembly queries — the last mile between a curated
corpus and a training run:

* ``train_test_split`` — deterministic stratified train/val/test
  assignment: split = f(md5(doc_id)) against exact ppm thresholds, so
  membership is reproducible across engines, runs, partitionings and
  cluster sizes (no RNG), and every language stratum gets the same
  expected ratios.  Reported as the per-(lang, split) audit frame a
  data-governance check reads.
* ``pack_sequences`` — GPT-style concat-and-chunk sequence packing:
  documents are laid end-to-end in a deterministic global order and
  cut into fixed SEQ_LEN token windows; each document reports its
  global token offset and the bin range it lands in.  The global
  running sum is computed with a TWO-PHASE cumulative sum (per-range-
  partition partials + broadcast prefix offsets), never a global
  unpartitioned window — `Window.orderBy` with no partition key moves
  the entire corpus to one task, the canonical 100 TB scale-killer.

Hash-match discipline (base.py): thresholds and offsets are exact
BIGINT; division is floor over nonnegative numerators only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from medical_ocr_pipeline_spark.queries.base import (
    MD5_INT48_DUCK,
    MD5_INT48_SPARK,
    load,
    register,
)
from medical_ocr_pipeline_spark.queries.textstats import _TOKEN_RE

_H_SPARK = MD5_INT48_SPARK.format(x="concat('split', cast(doc_id as string))")
_H_DUCK = MD5_INT48_DUCK.format(x="'split' || CAST(doc_id AS VARCHAR)")

TRAIN_PPM = 960_000  # 96 / 2 / 2 split
VAL_PPM = 980_000

_NT_SPARK = (
    "size(regexp_extract_all(text, '"
    + _TOKEN_RE.replace("\\", "\\\\")
    + "', 0))"
)
_NT_DUCK = f"CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT)"


@register(
    "train_test_split",
    sql=f"""
    WITH d AS (
      SELECT lang,
             CASE WHEN {_H_DUCK} % 1000000 < {TRAIN_PPM} THEN 'train'
                  WHEN {_H_DUCK} % 1000000 < {VAL_PPM} THEN 'val'
                  ELSE 'test' END AS split,
             {_NT_DUCK} AS nt
      FROM documents
    )
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM d GROUP BY lang, split ORDER BY lang, split
    """,
)
def train_test_split(spark, sf_dir):
    """Deterministic stratified train/val/test split: membership is
    md5('split' || doc_id) mod 1e6 against exact ppm thresholds
    (96/2/2) — reproducible across engines, runs and cluster sizes,
    with a salt prefix so this hash is independent of every other
    md5(doc_id)-derived decision in the pipeline (host caps, token
    budgets).  Output is the per-(lang, split) audit frame.

    Scale shape: one scan, pure per-row hashing, one COMBINABLE
    groupBy over (lang, split) — ~15 groups, map-side partials make
    the shuffle a few rows per task.  Assignment itself never
    shuffles; a downstream writer just filters on the split column."""
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.when(
            F.expr(_H_SPARK) % 1_000_000 < TRAIN_PPM, F.lit("train")
        )
        .when(F.expr(_H_SPARK) % 1_000_000 < VAL_PPM, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        F.expr(_NT_SPARK).cast("long").alias("nt"),
    )
    return (
        d.groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
        .orderBy("lang", "split")
    )


SEQ_LEN = 512  # tokens per packed training sequence

_PACK_H_SPARK = MD5_INT48_SPARK.format(x="concat('pack', cast(doc_id as string))")
_PACK_H_DUCK = MD5_INT48_DUCK.format(x="'pack' || CAST(doc_id AS VARCHAR)")


def global_running_offset(d: DataFrame, order_cols=("h", "doc_id"),
                          value_col: str = "nt",
                          n_parts: int = 32) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_cols``
    order WITHOUT an unpartitioned window: range-partition by the order
    key, cumsum locally per partition, then add each partition's
    broadcast prefix (the sum of all earlier partitions).  Appends
    ``offset`` = sum of value_col over all STRICTLY PRECEDING rows.

    The result is a pure function of the global order — partition
    boundaries (which repartitionByRange picks by sampling) cannot
    change it, only how it is computed.  At 100 TB this is the shape
    that works: each task sorts its own range, and the prefix frame is
    one row per partition."""
    cols = list(order_cols)
    ranged = d.repartitionByRange(n_parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_local_cum", F.sum(value_col).over(local_w)
    )
    totals = (
        local.groupBy("_pid")
        .agg(F.sum(value_col).alias("_part_total"))
        .orderBy("_pid")
    )
    prefix_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the ONLY unpartitioned window runs over the tiny per-partition
    # totals frame (one row per partition), then broadcasts back
    prefix = totals.withColumn(
        "_prefix",
        F.sum("_part_total").over(prefix_w) - F.col("_part_total"),
    ).select("_pid", "_prefix")
    return (
        local.join(F.broadcast(prefix), "_pid")
        .withColumn(
            "offset",
            (F.col("_prefix") + F.col("_local_cum") - F.col(value_col))
            .cast("long"),
        )
        .drop("_pid", "_local_cum", "_prefix")
    )


@register(
    "pack_sequences",
    sql=f"""
    WITH d AS (
      SELECT doc_id, {_PACK_H_DUCK} AS h, {_NT_DUCK} AS nt
      FROM documents
    ),
    o AS (
      SELECT doc_id, h, nt,
             CAST(COALESCE(SUM(nt) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS "offset"
      FROM d
    )
    SELECT doc_id, nt, "offset",
           "offset" // {SEQ_LEN} AS first_bin,
           CASE WHEN nt > 0 THEN ("offset" + nt - 1) // {SEQ_LEN}
                ELSE "offset" // {SEQ_LEN} END AS last_bin
    FROM o ORDER BY doc_id
    """,
)
def pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (the GPT pretraining layout):
    documents laid end-to-end in deterministic md5 order and cut into
    SEQ_LEN-token bins; each doc reports its global token offset and
    the [first_bin, last_bin] range it spans, which is exactly what a
    sharded example writer needs.  The order key is a salted md5 so
    packing is reproducible AND decorrelated from doc_id locality.

    Scale shape: the global running sum uses the two-phase
    range-partition cumsum (global_running_offset) — per-partition
    local window + one-row-per-partition broadcast prefix — never an
    unpartitioned window over the corpus.  The oracle uses the plain
    SQL window (same math, single-node engine).  Plan-asserted: no
    unpartitioned Window over the full frame
    (tests/test_training_ops.py)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_PACK_H_SPARK).alias("h"),
        F.expr(_NT_SPARK).cast("long").alias("nt"),
    )
    o = global_running_offset(d)
    return o.select(
        "doc_id",
        "nt",
        "offset",
        F.expr(f"offset DIV {SEQ_LEN}").alias("first_bin"),
        F.expr(
            f"CASE WHEN nt > 0 THEN (offset + nt - 1) DIV {SEQ_LEN} "
            f"ELSE offset DIV {SEQ_LEN} END"
        ).alias("last_bin"),
    ).orderBy("doc_id")
