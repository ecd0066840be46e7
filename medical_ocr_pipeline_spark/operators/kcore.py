"""Distributed k-core decomposition (fixed k) by synchronous peeling —
the graph-curation counterpart of pagerank/HITS ranking and LPA
communities: the k-core is the maximal subgraph where every vertex
keeps >= k neighbours, the standard "dense, well-linked hub set"
selector crawl pipelines use to separate interconnected content hubs
from peripheral link chaff.

Shape per round: one combinable degree groupBy + two LEFT SEMI joins
filtering the adjacency list to surviving endpoints — no windows, no
cartesian, state bounded by the (shrinking) edge list.  Per-round
lineage truncation and the small-graph AQE policy follow
operators/bfs.py; the loop early-exits at the fixpoint (peeling is
monotone: once a round removes nothing, no later round can), which is
what lets a bounded unrolled-CTE oracle replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(edges: DataFrame, k: int, max_rounds: int = 16,
          aqe: str = "auto") -> DataFrame:
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
    aqe_conf = "spark.sql.adaptive.enabled"
    old_aqe = spark.conf.get(aqe_conf)
    # checkpoint BEFORE counting: the count and the first peel round
    # both consume the symmetrize+distinct shuffle, and an eager
    # localCheckpoint after a separate count() would run that most
    # expensive stage twice (the flow.persist(); flow.count()
    # discipline of operators/textrank.py)
    adj = adj.localCheckpoint()
    n_edges = adj.count()
    if aqe == "off" or (aqe == "auto" and n_edges < 1_000_000):
        spark.conf.set(aqe_conf, "false")
    try:
        for _ in range(max_rounds):
            keep = (
                adj.groupBy("v")
                .agg(F.count("*").alias("deg"))
                .where(F.col("deg") >= k)
                .select("v")
            )
            nxt = (
                adj.join(keep, "v", "left_semi")
                .join(
                    keep.select(F.col("v").alias("w")), "w", "left_semi"
                )
                .select("v", "w")
                .localCheckpoint()
            )
            n_next = nxt.count()
            adj = nxt
            if n_next == n_edges:
                break  # fixpoint: later rounds are no-ops
            n_edges = n_next
        return (
            adj.groupBy("v")
            .agg(F.count("*").cast("long").alias("core_deg"))
            .select(F.col("v").alias("vertex"), "core_deg")
        )
    finally:
        spark.conf.set(aqe_conf, old_aqe)
