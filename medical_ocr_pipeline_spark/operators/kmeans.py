"""Distributed Lloyd's k-means over an embedding frame — the centroid
TRAINING step the similarity family was missing.

SemDeDup (Abbas et al. 2023 §3) and every IVF-style ANN index start by
clustering the corpus embeddings with k-means; the registry's IVF and
SemDeDup queries seed their coarse quantizers with a deterministic
stride so the DuckDB oracle can replay them, but a production pipeline
trains the quantizer.  This operator is that trainer, shaped for the
cluster: per iteration the ASSIGNMENT is a pure map (the k centroids
travel inside the plan as a literal array — a compile-time broadcast;
zero shuffle, zero join) and the UPDATE is one combinable groupBy
(posexplode -> per-(cluster, dim) BIGINT sum) followed by a bounded
k x dim driver collect — the exact treeAggregate-to-driver round Spark
MLlib's own KMeans runs (mllib/clustering/KMeans.scala, runAlgorithm),
and the same bounded-scalar-collect budget the repo grants pagerank's
dangling mass.  Nothing grows with the corpus except the one map +
combinable-agg pass per iteration.

Determinism discipline (the reason this carries a FULL DuckDB oracle
while textbook k-means cannot): centroid components use base.py's
integer-exact mean — floor(v * 1e8) per row, BIGINT sum
(order-independent under partial aggregation, unlike a double avg),
ONE double division by the count — so every iteration's centroids are
bit-identical across engines, partitionings, and runs; distances fold
in index order on both sides (Spark F.aggregate over zip_with ==
DuckDB list_aggregate over list_transform, the agreement every
embedding oracle in queries/similarity.py already relies on); argmin
tie-breaks on cluster id via lexicographic struct min.

Seeding: the k vectors with the smallest md5('km:' || id) — a
deterministic uniform sample, reproducible in SQL (Spark and DuckDB
emit identical lowercase-hex md5 strings).  k-means++ would need a
sequential distance-weighted draw per seed; the hash sample is the
standard at-scale substitute (MLlib defaults to k-means|| for the same
reason) and keeps the oracle exact.

Reference analogue: the reference clusters nothing (its similarity
pass is brute-force per page pair); this operator exists for the
100 TB corpus the reference never faces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEAN_SCALE = 100_000_000  # floor(v * 1e8): base.py integer-exact mean


def _sq_dist(vec_col, cent_col):
    """Squared L2 as an in-index-order left fold — the op-for-op mirror
    of the oracle's list_aggregate(list_transform(...), 'sum')."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col, lambda v, c: (v - c) * (v - c)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def _seed_centroids(emb: DataFrame, k: int, id_col: str, vec_col: str):
    """k seeds = vectors with the k smallest md5('km:' || id), cluster
    ids 0..k-1 in that hash order.  Bounded collect: k rows."""
    rows = (
        emb.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .orderBy(
            F.md5(
                F.encode(
                    F.concat(F.lit("km:"), F.col("_id").cast("string")),
                    "utf-8",
                )
            ),
            F.col("_id"),
        )
        .limit(k)
        .collect()
    )
    return {cid: [float(x) for x in r["_v"]] for cid, r in enumerate(rows)}


def _centroid_literal(cents: dict[int, list[float]]):
    """The k centroids as a literal array<struct<cid, c>> column — a
    compile-time broadcast, so assignment is a pure map stage."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(v) for v in vec]).alias("c"),
            )
            for cid, vec in sorted(cents.items())
        ]
    )


def assign_clusters(emb: DataFrame, cents: dict[int, list[float]],
                    id_col: str = "vec_id", vec_col: str = "e",
                    via: str = "auto") -> DataFrame:
    """Nearest-centroid assignment: adds (cluster_id, dist) to `emb`.

    Two physically different plans with identical results (pinned equal
    by test):
      * 'literal' — the k centroids ride the plan as a literal array;
        per row, transform into (dist, cid) structs and take the
        lexicographic array_min, which IS argmin-with-cid-tie-break.
        Pure map: no shuffle, no join, no window.  The plan itself
        grows with k*dim, so this is the small-k path.
      * 'join' — centroids become a real broadcast frame; assignment is
        a broadcast crossJoin (k-way row fanout) + a combinable
        min(struct(dist, cid)) groupBy on the vector id.  The plan is
        O(1) in k; the fanout is the standard price of a big quantizer
        (MLlib pays the same).  This is the path for SemDeDup-scale k
        (tens of thousands of lists).
    'auto' switches to 'join' past ~64k literal cells (k * dim)."""
    if via == "auto":
        dim = len(next(iter(cents.values()))) if cents else 0
        via = "join" if len(cents) * dim > 65536 else "literal"
    if via == "join":
        spark = emb.sparkSession
        cent_df = spark.createDataFrame(
            sorted(cents.items()), "cid int, c array<double>"
        )
        scored = emb.crossJoin(F.broadcast(cent_df)).select(
            *emb.columns,
            F.struct(
                _sq_dist(F.col(vec_col), F.col("c")).alias("d"),
                F.col("cid").alias("cid"),
            ).alias("cand"),
        )
        other = [c for c in emb.columns if c != id_col]
        return (
            scored.groupBy(id_col)
            .agg(
                *[F.first(c).alias(c) for c in other],
                F.min("cand").alias("best"),
            )
            .select(
                *emb.columns,
                F.col("best")["cid"].alias("cluster_id"),
                F.col("best")["d"].alias("dist"),
            )
        )
    scored = F.transform(
        _centroid_literal(cents),
        lambda c: F.struct(
            _sq_dist(F.col(vec_col), c["c"]).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.array_min(scored)
    return emb.select(
        "*",
        best["cid"].alias("cluster_id"),
        best["d"].alias("dist"),
    )


def lloyd_kmeans(emb: DataFrame, k: int, n_iters: int = 4,
                 id_col: str = "vec_id", vec_col: str = "e",
                 aqe: str = "auto", assign_via: str = "auto"):
    """Run `n_iters` Lloyd iterations over emb(id_col, vec_col:
    array<double>).  Returns (assignments DataFrame with cluster_id +
    dist columns, final centroid dict {cid: [double]*dim}).

    Scale shape per iteration: one map-only assignment pass + one
    combinable (cluster, dim)-keyed BIGINT-sum groupBy + a k x dim
    collect.  A cluster that goes empty keeps its previous centroid
    (LEFT-join-coalesce semantics, mirrored in the oracle).  For k
    beyond a few thousand, swap the literal for an explicit
    F.broadcast join — the literal keeps the toy-scale plan join-free
    and the oracle replay trivial.

    `aqe` ('auto' | 'on' | 'off'): same policy as operators/pagerank.py
    — AQE's per-query-stage re-optimization is pure driver latency
    inside a small fixed-iteration loop (the plan is one map + one
    combinable agg; there is nothing to re-plan), while on a
    billion-row corpus its coalescing is worth keeping.  'auto'
    disables AQE for the loop when the input is small (< 1e6 rows) and
    restores the conf either way — via the shared refcounted
    iterloop.aqe_disabled guard, so concurrent queries on one session
    compose instead of racing the restore.

    No checkpoint_dir here by design: the only cross-iteration state
    is the driver-side centroid dict (the emb frame is static and
    persisted), so lineage never grows and executor loss just
    recomputes the static input — nothing to checkpoint."""
    from medical_ocr_pipeline_spark.operators.iterloop import aqe_disabled

    emb = emb.persist()
    spark = emb.sparkSession
    turn_off = aqe == "off" or (aqe == "auto" and emb.count() < 1_000_000)
    cents = _seed_centroids(emb, k, id_col, vec_col)
    try:
        with aqe_disabled(spark, turn_off):
            for _ in range(n_iters):
                assigned = assign_clusters(emb, cents, id_col, vec_col,
                                           via=assign_via)
                # integer-exact per-(cluster, dim) mean: BIGINT sum of
                # floor(v * 1e8), ONE double division — partial-aggregation
                # order cannot move a bit, so the collected centroids are
                # exactly the oracle's
                rows = (
                    assigned.select(
                        "cluster_id", F.posexplode(F.col(vec_col))
                    )
                    .groupBy("cluster_id", "pos")
                    .agg(
                        (
                            F.sum(
                                F.floor(F.col("col") * MEAN_SCALE).cast("long")
                            ).cast("double")
                            / F.count("*")
                        ).alias("v")
                    )
                    .collect()
                )
                nxt: dict[int, dict[int, float]] = {}
                for r in rows:
                    nxt.setdefault(r["cluster_id"], {})[r["pos"]] = (
                        r["v"] / MEAN_SCALE
                    )
                cents = {
                    cid: (
                        [by_pos[p] for p in sorted(by_pos)]
                        if (by_pos := nxt.get(cid))
                        else prev  # empty cluster keeps its centroid
                    )
                    for cid, prev in cents.items()
                }
            return (
                assign_clusters(emb, cents, id_col, vec_col, via=assign_via),
                cents,
            )
    finally:
        emb.unpersist()
