"""A1/A2 line+paragraph regrouping as pure Catalyst windows — the
distributed restatement of core/lineify.py, for when blocks arrive as an
exploded cluster-wide table rather than per-turn arrays.

The in-batch core remains the extraction hot path (one shuffle-free
mapInPandas pass); this form exists because the same operator is needed
over a blocks TABLE (e.g. re-grouping after a cross-stage join), where
the lag/cumsum pattern runs JVM-side with whole-stage codegen:

  new_line = abs(y0 - lag(y0)) > line_gap          (chain-to-previous,
  line_id  = running sum of new_line                exactly the reference
  ... then the same at paragraph level on lag(y1)   loop semantics)

Equivalence with core.lineify.regroup_lines is pytest-asserted on the
same synthetic blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.constants import LINE_JOIN_PX, PARA_JOIN_PX

_TURN = ["conv_id", "turn_idx"]


def _merged(df: DataFrame, group_cols: list[str], x_sort: bool) -> DataFrame:
    order_key = (
        F.struct(F.col("x0"), F.col("y0")) if x_sort
        else F.struct(F.round("y0", 1).alias("ry"), F.round("x0", 1).alias("rx"))
    )
    collected = df.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    order_key.alias("k"),
                    F.col("text"),
                    F.col("confidence"),
                    F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"),
                    F.col("source"),
                )
            )
        ).alias("parts")
    )
    nonempty = F.filter("parts", lambda p: p["text"] != F.lit(""))
    srcs = F.array_sort(
        F.array_distinct(
            F.flatten(F.transform("parts", lambda p: F.split(p["source"], "[+,]")))
        )
    )
    return collected.select(
        *group_cols,
        F.trim(
            F.concat_ws(" ", F.transform(nonempty, lambda p: p["text"]))
        ).alias("text"),
        F.aggregate(
            "parts", F.lit(0.0), lambda acc, p: acc + p["confidence"],
            lambda acc: acc / F.size("parts"),
        ).alias("confidence"),
        F.array_min(F.transform("parts", lambda p: p["x0"])).alias("x0"),
        F.array_min(F.transform("parts", lambda p: p["y0"])).alias("y0"),
        F.array_max(F.transform("parts", lambda p: p["x1"])).alias("x1"),
        F.array_max(F.transform("parts", lambda p: p["y1"])).alias("y1"),
        F.array_join(F.filter(srcs, lambda s: s != F.lit("")), "+").alias("source"),
    )


def regroup_lines_catalyst(
    blocks: DataFrame,
    line_gap: float = LINE_JOIN_PX,
    para_gap: float = PARA_JOIN_PX,
) -> DataFrame:
    """Input: exploded blocks (conv_id, turn_idx, text, confidence,
    x0, y0, x1, y1, source).  Output: paragraph blocks, same columns plus
    para_id, in reading order.

    The reading-order window carries exact-coordinate + text tiebreakers
    after the rounded keys: without a TOTAL order, tied rounded (y0, x0)
    rows would enumerate arbitrarily per run and the lag/cumsum line
    assignment could differ between executions.  (The in-batch core
    breaks such ties by input order, which a distributed table does not
    have — equivalence with core.lineify is asserted on inputs whose
    rounded keys are tie-free.)"""
    w_read = W.partitionBy(*_TURN).orderBy(
        F.round("y0", 1), F.round("x0", 1), "y0", "x0", "text"
    )
    w_run = w_read.rowsBetween(W.unboundedPreceding, W.currentRow)

    lines = (
        blocks.withColumn("prev_y0", F.lag("y0").over(w_read))
        .withColumn(
            "new_line",
            F.when(
                F.col("prev_y0").isNull()
                | (F.abs(F.col("y0") - F.col("prev_y0")) > line_gap),
                1,
            ).otherwise(0),
        )
        .withColumn("line_id", F.sum("new_line").over(w_run))
    )
    line_blocks = _merged(lines, _TURN + ["line_id"], x_sort=True)

    w_line = W.partitionBy(*_TURN).orderBy("line_id")
    w_line_run = w_line.rowsBetween(W.unboundedPreceding, W.currentRow)
    paras = (
        line_blocks.withColumn("prev_y1", F.lag("y1").over(w_line))
        .withColumn(
            "new_para",
            F.when(
                F.col("prev_y1").isNull()
                | (F.abs(F.col("y0") - F.col("prev_y1")) > para_gap),
                1,
            ).otherwise(0),
        )
        .withColumn("para_id", F.sum("new_para").over(w_line_run))
    )
    return _merged(paras, _TURN + ["para_id"], x_sort=False).orderBy(
        *_TURN, "para_id"
    )
