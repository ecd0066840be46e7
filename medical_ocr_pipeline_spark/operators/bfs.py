"""Distributed multi-round BFS (hop distance from a seed vertex) over an
edge frame — the shortest-path primitive next to pagerank (quality
prior) and connected components (dedup clusters): crawl pipelines use
hop-from-seed as a frontier/depth feature and link-spam heuristic.

Shape per round: one equi-join (current frontier rank flows along
edges, shuffled on src) + one combinable groupBy MIN — no windows, no
cartesian.  Per-round lineage truncation and the small-graph AQE policy
go through operators/iterloop (AQE's per-stage re-plan rounds cost a
tiny graph far more than they save; on a billion-edge graph they're
worth it) — pass `checkpoint_dir` for cluster-safe reliable
checkpoints with round rotation, as in operators/pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.operators.iterloop import (
    RoundCheckpointer,
    aqe_disabled,
)


def bfs_hops(edges: DataFrame, seed: DataFrame, max_hops: int = 8,
             aqe: str = "auto", checkpoint_dir: str | None = None) -> DataFrame:
    """edges: (src, dst), directed — pass a symmetrized frame for
    undirected semantics.  seed: 1-column 1-row frame (vertex) holding
    the start vertex.  Returns (vertex, hops:long) for every vertex
    reached within max_hops; callers left-join their full vertex
    universe to tag unreachable vertices.

    BFS is layered-monotone: a vertex's hop count is final the round it
    first appears, so the loop early-exits as soon as a round adds no
    new vertex — the result is the fixpoint whether or not max_hops was
    exhausted, which is what lets a bounded recursive-CTE oracle
    replay it exactly."""
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    spark = edges.sparkSession
    turn_off = aqe == "off" or (aqe == "auto" and n < 1_000_000)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="bfs_rounds")
    try:
        with aqe_disabled(spark, turn_off):
            dist = ckpt.truncate(
                seed.select(F.col(seed.columns[0]).alias("vertex"))
                .withColumn("hops", F.lit(0).cast("long"))
            )
            n_reached = dist.count()
            for _ in range(max_hops):
                nxt = (
                    dist.join(edges, dist["vertex"] == edges["src"])
                    .select(
                        edges["dst"].alias("vertex"),
                        (dist["hops"] + 1).alias("hops"),
                    )
                )
                dist = ckpt.truncate(  # eager: truncates per-round lineage
                    dist.unionByName(nxt)
                    .groupBy("vertex")
                    .agg(F.min("hops").alias("hops"))
                )
                now = dist.count()
                if now == n_reached:  # frontier empty -> fixpoint
                    break
                n_reached = now
            ckpt.finish(keep=1)
    finally:
        ckpt.restore()
        verts.unpersist()
    return dist


def multi_source_bfs_hops(edges: DataFrame, seeds: DataFrame,
                          max_hops: int = 8, aqe: str = "auto",
                          checkpoint_dir: str | None = None) -> DataFrame:
    """All-sources BFS: seeds is a 1-column frame of start vertices and
    the result is (seed, vertex, hops) for every (seed, vertex) pair
    reachable within max_hops.  The state frame carries the seed as a
    key column, so ALL searches advance in the same per-round
    join+MIN — one Spark job per round regardless of seed count, the
    shape that computes harmonic/closeness centrality over a host
    graph without |V| separate traversals.

    At web scale the state is O(reached pairs); full all-pairs is only
    run on the contracted host graph (millions of vertices), while
    sampled-seed variants bound it on the page graph."""
    spark = edges.sparkSession
    n_verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    turn_off = aqe == "off" or (aqe == "auto" and n_verts < 1_000_000)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="msbfs_rounds")
    try:
        with aqe_disabled(spark, turn_off):
            dist = ckpt.truncate(
                seeds.select(F.col(seeds.columns[0]).alias("seed"))
                .distinct()
                .select("seed", F.col("seed").alias("vertex"),
                        F.lit(0).cast("long").alias("hops"))
            )
            n_pairs = dist.count()
            for _ in range(max_hops):
                nxt = (
                    dist.join(edges, dist["vertex"] == edges["src"])
                    .select(
                        dist["seed"].alias("seed"),
                        edges["dst"].alias("vertex"),
                        (dist["hops"] + 1).alias("hops"),
                    )
                )
                dist = ckpt.truncate(
                    dist.unionByName(nxt)
                    .groupBy("seed", "vertex")
                    .agg(F.min("hops").alias("hops"))
                )
                now = dist.count()
                if now == n_pairs:
                    break
                n_pairs = now
            ckpt.finish(keep=1)
    finally:
        ckpt.restore()
    return dist
