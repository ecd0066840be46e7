"""Weighted PageRank power iteration over a SYMMETRIC edge frame —
the TextRank core (Mihalcea & Tarau 2004): rank words by random-walk
centrality in the word co-occurrence graph, weights = co-occurrence
counts.  The simpler sibling of operators/pagerank.py: a symmetrized
graph has no dangling vertices (every vertex with an in-edge has the
reverse out-edge), so the per-iteration dangling aggregate disappears
and each round is exactly one equi-join (rank flows along edges,
shuffled on src) plus one combinable weighted-inflow groupBy.

Lineage truncation and the small-graph AQE policy go through
operators/iterloop (pass `checkpoint_dir` for cluster-safe reliable
checkpoints with round rotation), as in operators/pagerank.py;
determinism note there applies too (IEEE double
inflow sums carry ~1e-14 partition-order noise after 10 iterations —
callers round well above it; the registry query rounds to 8 decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.operators.iterloop import (
    RoundCheckpointer,
    aqe_disabled,
)


def textrank(edges: DataFrame, n_iters: int = 10,
             damping: float = 0.85, aqe: str = "auto",
             checkpoint_dir: str | None = None) -> DataFrame:
    """edges: (src, dst, w) — MUST be symmetric (both directions
    present with equal weight) and self-loop-free; build it with a
    union of both directions + groupBy sum, as the registry query
    does.  Returns (vertex, rank) with ranks summing to 1:

        rank'(v) = (1-d)/N + d * sum_{u~v} w_uv / W_u * rank(u)

    with W_u = sum of u's edge weights — the weighted PageRank
    recurrence of TextRank.  No dangling term: symmetry guarantees
    every vertex has out-weight."""
    verts = (
        edges.select(F.col("src").alias("vertex")).distinct().persist()
    )
    n = verts.count()
    if n == 0:
        verts.unpersist()  # the finally below is never reached
        return edges.select(
            F.col("src").alias("vertex"), F.lit(0.0).alias("rank")
        )
    wsum = edges.groupBy("src").agg(F.sum("w").alias("wu"))
    flow = edges.join(wsum, "src").persist()
    flow.count()
    spark = edges.sparkSession
    turn_off = aqe == "off" or (aqe == "auto" and n < 1_000_000)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="textrank_rounds")
    try:
        with aqe_disabled(spark, turn_off):
            ranks = ckpt.truncate(verts.withColumn("rank", F.lit(1.0 / n)))
            for _ in range(n_iters):
                inflow = (
                    flow.join(ranks, flow["src"] == ranks["vertex"])
                    .select(
                        F.col("dst").alias("vertex"),
                        (F.col("rank") * F.col("w") / F.col("wu")).alias(
                            "contrib"
                        ),
                    )
                    .groupBy("vertex")
                    .agg(F.sum("contrib").alias("inflow"))
                )
                ranks = ckpt.truncate(
                    verts.join(inflow, "vertex", "left")
                    .select(
                        "vertex",
                        (
                            F.lit((1.0 - damping) / n)
                            + F.lit(damping)
                            * F.coalesce("inflow", F.lit(0.0))
                        ).alias("rank"),
                    )
                )
        ckpt.finish(keep=1)
    finally:
        ckpt.restore()
        flow.unpersist()
        verts.unpersist()
    return ranks
