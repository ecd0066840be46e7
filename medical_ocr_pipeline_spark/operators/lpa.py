"""Synchronous label propagation (Raghavan et al. 2007) over an edge
frame — the cheap community-detection pass web-corpus pipelines run on
the host graph to group mirror farms / site families before host-level
dedup and sampling (a PageRank/HITS score ranks hosts; LPA CLUSTERS
them, which is what mirror detection actually needs).

Deterministic variant: synchronous updates (every vertex updates from
the PREVIOUS round's labels, so the result is independent of visit
order, unlike the asynchronous original) and a total tie-break — the
new label is the neighbor label with the greatest edge-weight support,
ties broken by the SMALLEST label.  Determinism is what makes a full
cross-engine oracle possible (queries/webcur.py unrolls the rounds into
chained CTEs) and what a resumable production job needs.

Shape per round: one equi-join of the label frame onto the weighted
edge list (shuffled on the join key), one combinable (vertex, label)
weight sum, one combinable per-vertex min_by argmax — NO windows, no
cartesian, no per-round driver collect.  Small-graph AQE policy and
per-round lineage truncation go through operators/iterloop (pass
`checkpoint_dir` for cluster-safe reliable checkpoints with round
rotation), as in operators/pagerank.py.

Reference analogue: the repo-wide link-analysis family (see
SURVEY.md §2 graph notes); the reference pipeline has no graph stage —
this is part of the beyond-reference web-curation suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.operators.iterloop import (
    RoundCheckpointer,
    aqe_disabled,
)


def label_propagation(
    edges: DataFrame, n_iters: int = 5, aqe: str = "auto",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges: (src, dst) directed; treated as UNDIRECTED with
    multiplicity (each directed edge contributes weight 1 in both
    directions, so a host pair cited 3 times binds 3x as strongly).
    Self-loops are ignored (they would only vote for the incumbent
    label and slow convergence).  Returns (vertex, label) — label is
    the community id, the label-space minimum of each converged group
    under the min-tie-break rule.

    Fully integer/string-exact: weights are BIGINT counts and the
    argmax tie-break is total, so output is bit-stable across partition
    counts, engines, and reruns (pinned by test)."""
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .persist()
    )
    verts = und.select(F.col("src").alias("vertex")).distinct().persist()
    n = verts.count()
    spark = edges.sparkSession
    turn_off = aqe == "off" or (aqe == "auto" and n < 1_000_000)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="lpa_rounds")
    try:
        with aqe_disabled(spark, turn_off):
            labels = ckpt.truncate(
                verts.withColumn("label", F.col("vertex"))
            )
            for _ in range(n_iters):
                # support(v, L) = sum of edge weights from neighbors holding L
                support = (
                    und.join(
                        labels.select(
                            F.col("vertex").alias("src"), "label"
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("vertex"), "label")
                    .agg(F.sum("w").alias("wt"))
                )
                # argmax by weight, ties -> smallest label: a combinable
                # min_by over (-wt, label) — no window, partial-aggregates
                # map-side even when one vertex has millions of neighbor
                # labels.
                labels = ckpt.truncate(
                    support.groupBy("vertex")
                    .agg(
                        F.expr(
                            "min_by(label, struct(-wt, label))"
                        ).alias("label")
                    )
                )
        ckpt.finish(keep=1)
    finally:
        ckpt.restore()
        und.unpersist()
        verts.unpersist()
    return labels
