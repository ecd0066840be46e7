"""Distributed PageRank power iteration over an edge frame — the
link-graph ranking component a web-corpus pipeline uses for host/URL
quality (Common Crawl publishes harmonic-centrality and PageRank host
rankings; CCNet/RefinedWeb-class pipelines consume them as priors).

Shape per iteration: one equi-join (rank flows along edges, shuffled on
src) + one combinable groupBy (sum of inbound contributions) + one tiny
dangling-mass aggregate broadcast back — no windows, no cartesian.
Per-round lineage truncation goes through
operators/iterloop.RoundCheckpointer: pass `checkpoint_dir` for
cluster-safe RELIABLE checkpoints with round rotation (an executor
loss mid-iteration recomputes from cluster storage instead of killing
the job); without it the single-JVM localCheckpoint fallback applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.operators.iterloop import (
    RoundCheckpointer,
    aqe_disabled,
)


def pagerank(edges: DataFrame, n_iters: int = 10,
             damping: float = 0.85, checkpoint_every: int = 1,
             aqe: str = "auto",
             checkpoint_dir: str | None = None) -> DataFrame:
    """edges: (src, dst) — directed.  Returns (vertex, rank) for every
    vertex appearing as src or dst; ranks sum to 1.

    Dangling vertices (no out-edges) redistribute their mass uniformly
    over ALL vertices each iteration, the standard PageRank completion:
    rank' = (1-d)/N + d * (inflow + dangling_mass/N).

    Determinism note: ranks are IEEE doubles accumulated in partition
    order, so the last few ulps (~1e-14 after 10 iterations) can differ
    across partitionings AND engines — callers that need stable or
    oracle-comparable output must round with a wide margin over that
    noise (the registry query rounds to 8 decimals, ~5e5 margin, and
    tie-breaks sorts by vertex id; 10 decimals was too tight for a
    cross-engine hash).  The structure (which vertex ranks where) is
    stable far above that noise.

    `aqe` ('auto' | 'on' | 'off'): adaptive execution is the WRONG tool
    inside a small fixed-point loop — each of AQE's per-query-stage
    materialize/re-optimize rounds costs real driver latency that a
    tiny graph pays 10x over (measured at the sf0.01 gate: 50.5 s with
    AQE on vs 8.6 s off, identical ranks), while on a billion-edge
    graph the same re-planning (skew split, coalesce) is worth every
    round.  'auto' disables AQE for the loop when the graph is small
    (< 1e6 vertices) and leaves the session setting alone otherwise;
    the conf is restored either way (thread-safely — the toggle is the
    shared refcounted iterloop.aqe_disabled guard, so concurrent
    registry queries on one session compose instead of racing the
    restore).  `checkpoint_every` keeps lineage truncation per-round by
    default — deferring it makes the lazy dangling aggregate re-execute
    the whole chain since the last checkpoint once per round (measured
    quadratic blow-up, 58 s).  `checkpoint_dir` switches truncation to
    reliable checkpoints (see module docstring); the caller owns
    deleting the dir after consuming the result."""
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        return verts.select("vertex", F.lit(0.0).alias("rank"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    # (src, dst, deg) — static across iterations; persist once
    flow = edges.join(out_deg, "src").persist()
    flow.count()
    spark = edges.sparkSession
    turn_off = aqe == "off" or (aqe == "auto" and n < 1_000_000)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="pagerank_rounds")
    try:
        with aqe_disabled(spark, turn_off):
            ranks = ckpt.truncate(verts.withColumn("rank", F.lit(1.0 / n)))
            for it in range(n_iters):
                # dangling mass stays a LAZY 1-row frame folded back in via a
                # broadcast cross join — no per-iteration driver collect(),
                # so each round is exactly one job (the eager localCheckpoint
                # below), not two.  The anti-join is rank rows whose vertex
                # has no out-edges.
                dangling = (
                    ranks.join(
                        out_deg, ranks["vertex"] == out_deg["src"], "left_anti"
                    )
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
                )
                inflow = (
                    flow.join(ranks, flow["src"] == ranks["vertex"])
                    .select(
                        F.col("dst").alias("vertex"),
                        (F.col("rank") / F.col("deg")).alias("contrib"),
                    )
                    .groupBy("vertex")
                    .agg(F.sum("contrib").alias("inflow"))
                )
                nxt = (
                    verts.join(inflow, "vertex", "left")
                    .crossJoin(F.broadcast(dangling))
                    .select(
                        "vertex",
                        (
                            F.lit((1.0 - damping) / n)
                            + F.lit(damping) * F.col("dm") / n
                            + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                        ).alias("rank"),
                    )
                )
                if (it + 1) % checkpoint_every == 0 or it + 1 == n_iters:
                    nxt = ckpt.truncate(nxt)
                ranks = nxt
            ckpt.finish(keep=1)
    finally:
        ckpt.restore()
        flow.unpersist()
        out_deg.unpersist()
        verts.unpersist()
    return ranks
