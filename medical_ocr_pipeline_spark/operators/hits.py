"""HITS (Kleinberg 1999) hubs-and-authorities power iteration over an
edge frame — the second classic link-analysis ranking next to PageRank:
authorities are pages good hubs point AT, hubs are pages that point at
good authorities.  Web-corpus pipelines use the authority score as a
quality prior complementary to PageRank (it separates link directories
from content pages, which a single eigenvector can't).

Shape per iteration: two equi-joins (scores flow along edges, shuffled
on the join key) + two combinable groupBy sums + two 1-row L1-norm
aggregates folded back via broadcast cross joins — no windows, no
cartesian, no per-round driver collect.  Small-graph AQE policy
(thread-safe refcounted guard) and per-round lineage truncation go
through operators/iterloop — pass `checkpoint_dir` for cluster-safe
reliable checkpoints with round rotation, as in operators/pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.operators.iterloop import (
    RoundCheckpointer,
    aqe_disabled,
)


def hits(edges: DataFrame, n_iters: int = 8, aqe: str = "auto",
         checkpoint_dir: str | None = None) -> DataFrame:
    """edges: (src, dst) directed (multi-edges count with multiplicity,
    matching operators/pagerank.py).  Returns (vertex, auth, hub) for
    every vertex appearing as src or dst; each vector is L1-normalized
    every iteration (the standard normalization, which also keeps the
    doubles bounded).

    Determinism note: like pagerank, the scores are IEEE doubles summed
    in partition order — callers needing cross-engine-stable output
    round with a wide margin (the registry query rounds to 8 decimals)
    and tie-break sorts by vertex id."""
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        return verts.select(
            "vertex", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub")
        )
    e = edges.persist()
    e.count()
    spark = edges.sparkSession
    turn_off = aqe == "off" or (aqe == "auto" and n < 1_000_000)
    # keep_last=2: the returned frame joins the LAST auth and hub
    # checkpoints, so both must stay on storage (no finish-prune to 1)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, name="hits_rounds",
                             keep_last=2)
    auth = None
    try:
        with aqe_disabled(spark, turn_off):
            hub = ckpt.truncate(verts.withColumn("hub", F.lit(1.0 / n)))
            for _ in range(n_iters):
                # authority update: a(v) = sum_{u->v} h(u), then L1 norm
                a_raw = (
                    verts.join(
                        e.join(hub, e["src"] == hub["vertex"])
                        .groupBy(e["dst"].alias("vertex"))
                        .agg(F.sum("hub").alias("s")),
                        "vertex",
                        "left",
                    )
                    .select("vertex", F.coalesce("s", F.lit(0.0)).alias("s"))
                )
                a_norm = a_raw.agg(F.sum("s").alias("norm"))
                auth = (
                    a_raw.crossJoin(F.broadcast(a_norm))
                    .select(
                        "vertex", (F.col("s") / F.col("norm")).alias("auth")
                    )
                )
                auth = ckpt.truncate(auth)
                # hub update: h(u) = sum_{u->v} a(v), then L1 norm
                h_raw = (
                    verts.join(
                        e.join(auth, e["dst"] == auth["vertex"])
                        .groupBy(e["src"].alias("vertex"))
                        .agg(F.sum("auth").alias("s")),
                        "vertex",
                        "left",
                    )
                    .select("vertex", F.coalesce("s", F.lit(0.0)).alias("s"))
                )
                h_norm = h_raw.agg(F.sum("s").alias("norm"))
                hub = (
                    h_raw.crossJoin(F.broadcast(h_norm))
                    .select(
                        "vertex", (F.col("s") / F.col("norm")).alias("hub")
                    )
                )
                hub = ckpt.truncate(hub)
    finally:
        ckpt.restore()
        verts.unpersist()
        e.unpersist()
    return auth.join(hub, "vertex").select("vertex", "auth", "hub")
