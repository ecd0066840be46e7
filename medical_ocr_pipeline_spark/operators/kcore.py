"""Distributed k-core decomposition (fixed k) by synchronous peeling —
the graph-curation counterpart of pagerank/HITS ranking and LPA
communities: the k-core is the maximal subgraph where every vertex
keeps >= k neighbours, the standard "dense, well-linked hub set"
selector crawl pipelines use to separate interconnected content hubs
from peripheral link chaff.

Shape per round: one combinable degree groupBy + two LEFT SEMI joins
filtering the adjacency list to surviving endpoints — no windows, no
cartesian, state bounded by the (shrinking) edge list.  Per-round
lineage truncation and the small-graph AQE policy go through
operators/iterloop (pass `checkpoint_dir` for cluster-safe reliable
checkpoints with round rotation); the loop early-exits at the fixpoint (peeling is
monotone: once a round removes nothing, no later round can), which is
what lets a bounded unrolled-CTE oracle replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.operators.iterloop import (
    RoundCheckpointer,
    aqe_disabled,
)


def kcore(edges: DataFrame, k: int, max_rounds: int = 16,
          aqe: str = "auto", checkpoint_dir: str | None = None) -> DataFrame:
    """edges: (src, dst) directed; symmetrized and de-duplicated here,
    so multi-edges and direction never inflate degrees.  Returns
    (vertex, core_deg:long) for every vertex of the k-core reached
    within max_rounds synchronous peel rounds, with core_deg its degree
    INSIDE the core.

    Synchronous peeling removes ALL vertices of degree < k each round
    (not one at a time), so the result is a pure function of the input
    graph — independent of partitioning, visit order, and cluster size
    — and each round is one combinable aggregate plus two semi-joins.
    Early exit at the fixpoint returns the same frame as running the
    full max_rounds (removed-nothing rounds are no-ops), keeping the
    operator exactly replayable by an R-round unrolled oracle."""
    adj = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        .union(edges.select(F.col("dst").alias("v"), F.col("src").alias("w")))
        .where(F.col("v") != F.col("w"))
        .distinct()
    )
    spark = edges.sparkSession
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="kcore_rounds")
    try:
        # checkpoint BEFORE counting: the count and the first peel round
        # both consume the symmetrize+distinct shuffle, and an eager
        # truncation after a separate count() would run that most
        # expensive stage twice (the flow.persist(); flow.count()
        # discipline of operators/textrank.py)
        adj = ckpt.truncate(adj)
        n_edges = adj.count()
        turn_off = aqe == "off" or (aqe == "auto" and n_edges < 1_000_000)
        with aqe_disabled(spark, turn_off):
            for _ in range(max_rounds):
                keep = (
                    adj.groupBy("v")
                    .agg(F.count("*").alias("deg"))
                    .where(F.col("deg") >= k)
                    .select("v")
                )
                nxt = ckpt.truncate(
                    adj.join(keep, "v", "left_semi")
                    .join(
                        keep.select(F.col("v").alias("w")), "w", "left_semi"
                    )
                    .select("v", "w")
                )
                n_next = nxt.count()
                adj = nxt
                if n_next == n_edges:
                    break  # fixpoint: later rounds are no-ops
                n_edges = n_next
            ckpt.finish(keep=1)
            return (
                adj.groupBy("v")
                .agg(F.count("*").cast("long").alias("core_deg"))
                .select(F.col("v").alias("vertex"), "core_deg")
            )
    finally:
        ckpt.restore()
