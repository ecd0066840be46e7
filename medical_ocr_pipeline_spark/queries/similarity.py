"""Similarity search over the embeddings table (array<float>, dim 64).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane signs derived from deterministic md5 hashing)
is the scale path — at 100 TB you bucket-join on the sign signature
instead of cross-joining the corpus.

Float discipline for the DuckDB oracle: embeddings are float32 on disk;
both engines up-cast to double, accumulate left-to-right over 64 dims,
and results are rounded to 4 decimals — enough slack for any residual
summation-order difference.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import (
    EMB_E_DUCK,
    ROUND_DIGITS,
    emb_banded_duck,
    load,
    register,
    words_expr,
)

R = ROUND_DIGITS
TOP_K = 5
N_QUERIES = 5  # vec_id < 5 are the query vectors


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def _cosine(dot, norm_prod):
    """try_divide: a zero-norm (all-zero / padding) vector must yield a
    NULL cosine — dropped by threshold filters, ranked last in top-k —
    not a job-aborting ArithmeticException under Spark 4's default ANSI
    mode.

    Oracle caveat: DuckDB produces NaN for the same rows and ORDERS NaN
    ABOVE every number (NaN >= thr is TRUE, NaN ranks first under DESC)
    — the opposite of Spark's NULL handling.  The embedding-family
    oracles therefore carry a documented precondition that the driver
    testdata has no zero-norm vectors (verified: all unit-norm); the
    operators themselves handle zero vectors per this docstring
    (test_zero_vector_yields_null_cosine_not_crash)."""
    return F.try_divide(dot, norm_prod)


@register(
    "cosine_topk",
    sql=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
             ROUND(
               list_aggregate(list_transform(range(1, 65),
                 i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                 'sum')
               / (sqrt(list_aggregate(list_transform(q.qe,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                  * sqrt(list_aggregate(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
             {R}) AS cosine
      FROM q, embeddings e
      WHERE e.vec_id >= {N_QUERIES}
    )
    SELECT query_id, neighbor_id, label, cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rn FROM scored
    ) WHERE rn <= {TOP_K}
    ORDER BY query_id, cosine DESC, neighbor_id
    """,
)
def cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the (tiny) query set against the
    corpus — the plan is a BroadcastNestedLoopJoin over one corpus scan,
    which is the right baseline shape at any scale."""
    emb = load(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    corpus = emb.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), "label", "embedding"
    )
    scored = F.broadcast(q).crossJoin(corpus).select(
        "query_id",
        "neighbor_id",
        "label",
        F.round(
            _cosine(
                _dot(F.col("qe"), F.col("embedding")),
                _norm(F.col("qe")) * _norm(F.col("embedding")),
            ),
            R,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "label", "cosine")
        .orderBy("query_id", F.desc("cosine"), "neighbor_id")
    )


@register(
    "label_centroid_sim",
    sql=f"""
    WITH ex AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), byd AS (
      SELECT label, pos,
             CAST(SUM(CAST(FLOOR(v * 100000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) AS v,
             COUNT(*) AS cnt
      FROM ex GROUP BY label, pos
    ), c AS (
      SELECT label, list(v ORDER BY pos) AS centroid, MAX(cnt) AS n
      FROM byd GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b,
           ROUND(
             list_aggregate(list_transform(range(1, 65),
               i -> a.centroid[i] * b.centroid[i]), 'sum')
             / (sqrt(list_aggregate(list_transform(a.centroid, x -> x*x), 'sum'))
                * sqrt(list_aggregate(list_transform(b.centroid, x -> x*x), 'sum'))),
           {R}) AS cosine
    FROM c a JOIN c b ON a.label < b.label
    ORDER BY label_a, label_b
    """,
)
def label_centroid_sim(spark, sf_dir):
    """Per-label centroid (element-wise mean) and cosine between every
    label pair — the clustered-similarity aggregate.

    Centroid components use the INTEGER-EXACT form from base.py's hash
    discipline: floor(v * 1e8) per row (identical in both engines: one
    double multiply + floor), BIGINT sum (order-independent, unlike a
    double avg whose partial-aggregation order can flip the 8th
    decimal), then ONE double division by the count — deterministic
    bit-identical centroids feeding the pairwise cosine."""
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    )
    c = (
        exploded.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("col") * 100000000).cast("long")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("v"),
            F.count("*").alias("cnt"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias("centroid"),
            F.first("cnt").alias("n"),
        )
    )
    a = c.alias("a")
    b = c.alias("b")
    return (
        a.join(b, F.col("a.label") < F.col("b.label"))
        .select(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(
                _cosine(
                    _dot(F.col("a.centroid"), F.col("b.centroid")),
                    _norm(F.col("a.centroid")) * _norm(F.col("b.centroid")),
                ),
                R,
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


N_PLANES = 4
N_TABLES = 12


def hyperplane_signatures(n_tables: int, n_planes: int):
    """Multi-table random-hyperplane signature column: per table, an
    n_planes-bit sign signature of the `embedding` column against
    deterministic pseudo-planes (weight for (table, plane, dim) derived
    from md5 — reproducible across engines and runs).  Returns an
    array<int> of length n_tables for posexplode into (table, bucket)."""
    return F.expr(
        f"""
        transform(sequence(0, {n_tables - 1}), t ->
          aggregate(sequence(0, {n_planes - 1}), cast(0 as int),
            (acc, p) -> acc + if(
              aggregate(zip_with(embedding, sequence(0, 63), (v, i) -> struct(v, i)),
                cast(0.0 as double),
                (s, e) -> s + cast(e.v as double) *
                  ((cast(conv(substr(md5(concat(t, ':', p, ':', e.i)), 1, 12),
                    16, 10) as bigint) % 2001) - 1000) / 1000.0) > 0,
              shiftleft(1, p), 0)))
        """
    )


@register(
    "ann_lsh_topk",
    sql=f"""
    WITH e AS ({EMB_E_DUCK}),
    banded AS ({emb_banded_duck(N_TABLES, N_PLANES)}),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
             ROUND(list_aggregate(list_transform(range(1, 65),
                     i -> q.e[i] * c.e[i]), 'sum') / (q.nrm * c.nrm),
                   {R}) AS cosine
      FROM banded q JOIN banded c
        ON q.tbl = c.tbl AND q.bucket = c.bucket
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    )
    SELECT query_id, neighbor_id, label, cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rn FROM cand
    ) WHERE rn <= {TOP_K}
    ORDER BY query_id, cosine DESC, neighbor_id
    """,
)
def lsh_bucket_topk(spark, sf_dir):
    """Scale path: multi-table random-hyperplane LSH — deterministic
    pseudo-planes from md5(table, plane, dim), sign-bit signature per
    table (AND over planes), candidates = union over tables (OR
    amplification), then exact cosine only within buckets.  One equi-join
    shuffle on (table, bucket) instead of a cross join.  Full DuckDB
    oracle: the pseudo-planes are pure md5 arithmetic, so both engines
    band identically and the candidate set (not just the ranking) is
    hash-compared; recall vs cosine_topk is additionally asserted in
    tests."""
    emb = load(spark, sf_dir, "embeddings")
    # table t, plane p weight for dim i:
    #   ((md5-int(t:p:i) mod 2001) - 1000) / 1000  in [-1, 1]
    sig = hyperplane_signatures(N_TABLES, N_PLANES)
    bucketed = emb.select(
        "vec_id", "label", "embedding",
        F.posexplode(sig).alias("tbl", "bucket"),
    )
    q = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("tbl").alias("qt"),
        F.col("bucket").alias("qb"),
    )
    corpus = bucketed.where(F.col("vec_id") >= N_QUERIES)
    scored = (
        F.broadcast(q)
        .join(
            corpus,
            (F.col("qt") == F.col("tbl")) & (F.col("qb") == F.col("bucket")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            "qe",
            "embedding",
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round(
                _cosine(
                    _dot(F.col("qe"), F.col("embedding")),
                    _norm(F.col("qe")) * _norm(F.col("embedding")),
                ),
                R,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "label", "cosine")
        .orderBy("query_id", F.desc("cosine"), "neighbor_id")
    )


# --- IVF (inverted-file) ANN -------------------------------------------------

IVF_SEED_STRIDE = 31   # every 31st vector is a coarse centroid (17 of 500)
# Stated operating point (VERDICT r02 #4): measured recall vs brute
# force on the fixed testdata is 0.88 (sf0.001) / 0.80 (sf0.01) at
# nprobe=8 — pinned by test_ann_ivf_operating_point_recall; the full
# recall-vs-nprobe curve is in BENCH.md.  At production scale n_lists
# grows with the corpus (~n/31 here), so nprobe=8 probes a vanishing
# corpus fraction, not the half it does on 500 vectors.
IVF_NPROBE = 8


def _assignments(emb, centroids, nprobe: int = IVF_NPROBE):
    """Every vector's nearest `nprobe` centroid ids by cosine."""
    scored = F.broadcast(centroids).crossJoin(emb).select(
        "vec_id",
        "centroid_id",
        _cosine(
            _dot(F.col("embedding"), F.col("ce")),
            _norm(F.col("embedding")) * _norm(F.col("ce")),
        ).alias("sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= nprobe)
        .select("vec_id", "centroid_id", "rnk", "sim")
    )


def ivf_topk(spark, sf_dir, nprobe: int = IVF_NPROBE,
             centroids: str = "stride"):
    """IVF coarse-quantizer ANN core with the nprobe dial exposed: the
    recall/cost trade is nprobe/n_lists (each query scans ~nprobe/17 of
    the corpus — stride-31 over 500 vectors seeds 17 lists, not 16).
    Measured recall-vs-nprobe curve lives in BENCH.md;
    tests pin recall >= 0.8 at the stated operating point (nprobe=8)
    so a regression fails instead of passing silently (VERDICT r02).

    `centroids`: 'stride' (deterministic seeding — the oracle-replayable
    registry default) or 'kmeans' (train the quantizer with
    operators/kmeans.py at the same list count — the production path;
    recall at the operating point is pinned >= the stride baseline in
    tests/test_kmeans.py)."""
    emb = load(spark, sf_dir, "embeddings")
    if centroids == "kmeans":
        from medical_ocr_pipeline_spark.operators.kmeans import lloyd_kmeans

        n = emb.count()
        k = (n + IVF_SEED_STRIDE - 1) // IVF_SEED_STRIDE
        _assigned, cents = lloyd_kmeans(
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            ),
            k=k,
            n_iters=4,
        )
        centroids = spark.createDataFrame(
            sorted(cents.items()), "centroid_id bigint, ce array<double>"
        )
    else:
        centroids = (
            emb.where(F.col("vec_id") % IVF_SEED_STRIDE == 0)
            .select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("ce"),
            )
        )
    # inverted lists: corpus vectors keyed by their single nearest list
    corpus_assign = _assignments(
        emb.where(F.col("vec_id") >= N_QUERIES), centroids
    ).where(F.col("rnk") == 1)
    corpus = corpus_assign.join(
        emb.select("vec_id", "label", "embedding"), "vec_id"
    ).select(
        F.col("vec_id").alias("neighbor_id"), "label", "embedding", "centroid_id"
    )
    # queries probe their nprobe nearest lists
    q_assign = _assignments(
        emb.where(F.col("vec_id") < N_QUERIES), centroids, nprobe=nprobe
    )
    q = q_assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        "centroid_id",
    )
    scored = (
        F.broadcast(q)
        .join(corpus, "centroid_id")
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round(
                _cosine(
                    _dot(F.col("qe"), F.col("embedding")),
                    _norm(F.col("qe")) * _norm(F.col("embedding")),
                ),
                R,
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "label", "cosine")
        .orderBy("query_id", F.desc("cosine"), "neighbor_id")
    )


@register(
    "ann_ivf_topk",
    sql=f"""
    WITH e AS ({EMB_E_DUCK}),
    cent AS (
      SELECT vec_id AS centroid_id, e AS ce, nrm AS cnrm FROM e
      WHERE vec_id % {IVF_SEED_STRIDE} = 0
    ),
    ranked AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, centroid_id
             ) AS rnk
      FROM (
        SELECT e.vec_id, cent.centroid_id,
               list_aggregate(list_transform(range(1, 65),
                 i -> e.e[i] * cent.ce[i]), 'sum') / (e.nrm * cent.cnrm) AS sim
        FROM e, cent
      )
    ),
    corpus AS (
      SELECT vec_id AS neighbor_id, centroid_id FROM ranked
      WHERE vec_id >= {N_QUERIES} AND rnk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, centroid_id FROM ranked
      WHERE vec_id < {N_QUERIES} AND rnk <= {IVF_NPROBE}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, c.neighbor_id, nb.label,
             ROUND(list_aggregate(list_transform(range(1, 65),
                     i -> qe.e[i] * nb.e[i]), 'sum') / (qe.nrm * nb.nrm),
                   {R}) AS cosine
      FROM probes p
      JOIN corpus c ON p.centroid_id = c.centroid_id
      JOIN e qe ON qe.vec_id = p.query_id
      JOIN e nb ON nb.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, label, cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rn FROM cand
    ) WHERE rn <= {TOP_K}
    ORDER BY query_id, cosine DESC, neighbor_id
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """Registered IVF ANN entry at the stated operating point
    (IVF_NPROBE); use ivf_topk(..., nprobe=...) to turn the dial.
    Full DuckDB oracle: stride seeding, nearest-list assignment, and
    nprobe probing are all deterministic (unrounded double dot products
    are order-deterministic in both engines), so the probed candidate
    set and the final top-k are hash-compared exactly."""
    return ivf_topk(spark, sf_dir, nprobe=IVF_NPROBE)


# --- SemDeDup: semantic dedup via clustered embedding pruning -----------------
#
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus
# embeddings with a coarse quantizer, compute exact pairwise cosine
# ONLY within clusters, and for every over-threshold pair keep the
# example FARTHER from its cluster centroid (more informative /
# less redundant) — the quadratic step is bounded by cluster size, so
# the corpus-wide cost is linear in n for fixed cluster granularity.

SEMDEDUP_THR = 0.30  # aligned with dedup.EMB_DUP_THR for recall tests


def semdedup_verdicts(emb, thr: float = SEMDEDUP_THR):
    """Per-vector SemDeDup verdict frame: (vec_id, cluster_id,
    centroid_sim_e6, keep).  A vector is dropped iff some same-cluster
    vector exceeds `thr` cosine with it AND that partner is more
    keepable (strictly lower centroid similarity in integer micro-units,
    ties to the lower vec_id) — for a duplicate clique this keeps
    exactly the one farthest from the centroid, SemDeDup's selection
    rule.

    Scale shape: assignment is a broadcast of the centroid table (one
    row per cluster) + per-row argmax; the pair join is an equi-join on
    cluster_id whose quadratic blowup is bounded by cluster size — at
    production scale n_lists grows with the corpus (stride seeding
    keeps cluster cardinality ~IVF_SEED_STRIDE), exactly the IVF
    inverted-list geometry.  No corpus-wide pair space is ever built."""
    centroids = emb.where(F.col("vec_id") % IVF_SEED_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("ce"),
    )
    # centroid_sim is quantized ONCE here to integer micro-units —
    # floor(sim * 1e6), the base.py exact-integer form: floor of the
    # identical double is identical in both engines, whereas ROUND(x, 6)
    # can disagree at decimal boundaries (Spark rounds the shortest
    # decimal repr half-up, DuckDB the binary value).  The quantized
    # value drives BOTH the keep rule and the output frame, so the
    # decision is reproducible and auditable from what the operator
    # returns; sub-micro sim differences fall through to the vec_id
    # tie-break.
    assign = (
        _assignments(emb, centroids, nprobe=1)
        .where(F.col("rnk") == 1)
        .select(
            "vec_id",
            F.col("centroid_id").alias("cluster_id"),
            F.floor(F.col("sim") * F.lit(1000000.0)).alias(
                "centroid_sim_e6"
            ),
        )
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        "vec_id", "cluster_id", "centroid_sim_e6", "embedding"
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    pair_cos = _cosine(
        _dot(F.col("a.embedding"), F.col("b.embedding")),
        _norm(F.col("a.embedding")) * _norm(F.col("b.embedding")),
    )
    edges = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(pair_cos >= thr)
        .select(
            # the LOSER (dropped side) is the endpoint CLOSER to the
            # centroid; ties break to dropping the higher vec_id
            F.when(
                (F.col("a.centroid_sim_e6") > F.col("b.centroid_sim_e6"))
                | (
                    (F.col("a.centroid_sim_e6") == F.col("b.centroid_sim_e6"))
                    & (F.col("a.vec_id") > F.col("b.vec_id"))
                ),
                F.col("a.vec_id"),
            )
            .otherwise(F.col("b.vec_id"))
            .alias("vec_id")
        )
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        assign.join(edges, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            "centroid_sim_e6",
            (~F.coalesce(F.col("dropped"), F.lit(False))).alias("keep"),
        )
        .orderBy("vec_id")
    )


@register(
    "semdedup",
    sql=f"""
    WITH e AS ({EMB_E_DUCK}),
    cent AS (
      SELECT vec_id AS centroid_id, e AS ce, nrm AS cnrm FROM e
      WHERE vec_id % {IVF_SEED_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cluster_id,
             CAST(FLOOR(sim * 1000000.0) AS BIGINT) AS centroid_sim_e6
      FROM (
        SELECT e.vec_id, cent.centroid_id,
               list_aggregate(list_transform(range(1, 65),
                 i -> e.e[i] * cent.ce[i]), 'sum') / (e.nrm * cent.cnrm) AS sim,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id ORDER BY
                   list_aggregate(list_transform(range(1, 65),
                     i -> e.e[i] * cent.ce[i]), 'sum') / (e.nrm * cent.cnrm)
                   DESC, cent.centroid_id
               ) AS rnk
        FROM e, cent
      ) WHERE rnk = 1
    ),
    vecs AS (
      SELECT a.vec_id, a.cluster_id, a.centroid_sim_e6, e.e, e.nrm
      FROM assign a JOIN e ON a.vec_id = e.vec_id
    ),
    dropped AS (
      SELECT DISTINCT
             CASE WHEN a.centroid_sim_e6 > b.centroid_sim_e6
                    OR (a.centroid_sim_e6 = b.centroid_sim_e6
                        AND a.vec_id > b.vec_id)
                  THEN a.vec_id ELSE b.vec_id END AS vec_id
      FROM vecs a JOIN vecs b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE list_aggregate(list_transform(range(1, 65),
              i -> a.e[i] * b.e[i]), 'sum') / (a.nrm * b.nrm)
            >= {SEMDEDUP_THR}
    )
    SELECT a.vec_id, a.cluster_id, a.centroid_sim_e6,
           (d.vec_id IS NULL) AS keep
    FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id
    """,
)
def semdedup(spark, sf_dir):
    """Registry wrapper: SemDeDup verdicts over the embeddings table.
    Full DuckDB oracle: stride centroids, nearest-cluster assignment,
    the in-cluster pair threshold, and the keep-farthest selection rule
    are all deterministic SQL.  The keep rule compares centroid sims
    quantized to integer micro-units — floor(sim * 1e6), bit-identical
    cross-engine, unlike ROUND(x, 6) whose half-up-vs-binary behavior
    differs at decimal boundaries (base.py discipline) — so the
    decision and the output frame hash-match; a recall/containment
    cross-check against the exact all-pairs tier
    (dedup_embedding_cosine) additionally pins semantics in tests."""
    return semdedup_verdicts(load(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# BM25 lexical retrieval: the inverted-index counterpart of cosine_topk.
# A curation pipeline retrieves corpus documents for a query set
# constantly (benchmark decontamination probes, targeted-domain
# selection, eval-set mining); BM25 over a term-postings index is the
# canonical lexical form (Robertson & Zaragoza 2009, the Okapi
# weighting).  Reference analogue: the engine's dictionary/fuzzy vocab
# joins (core/textnorm.py) score documents against a term list; this is
# the ranked-retrieval generalization.

BM25_K1 = "1.2"   # exact decimal literals so both engines parse the
BM25_B = "0.75"   # same double constants
BM25_TOP = 20     # neighbors kept per query
_BM25_SALTS = 8   # salt fanout for the two-level megaquery-safe top-k

# fixed literal query set: deterministic, self-contained (no external
# data), terms drawn from the synthetic corpus vocabulary
BM25_QUERIES = (
    (0, ("fast", "hash", "join")),
    (1, ("window", "agg", "stream")),
    (2, ("customer", "table", "scan", "query")),
)

_BM25_Q_ROWS = ", ".join(
    f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
)


@register(
    "bm25_topk",
    sql=f"""
    WITH q(query_id, term) AS (VALUES {_BM25_Q_ROWS}),
    tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS w
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS sum_dl
      FROM dl
    ),
    tf AS (
      SELECT tok.doc_id, tok.w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok JOIN (SELECT DISTINCT term FROM q) qt ON tok.w = qt.term
      GROUP BY tok.doc_id, tok.w
    ),
    idf AS (
      SELECT w, LN(1 + (stats.n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
           stats
    ),
    sc AS (
      SELECT q.query_id, tf.doc_id,
             ROUND(SUM(idf.idf * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl
                    / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))),
               {R}) AS score
      FROM tf
      JOIN q ON q.term = tf.w
      JOIN idf ON idf.w = tf.w
      JOIN dl ON dl.doc_id = tf.doc_id, stats
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score,
           CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rk
      FROM sc
    )
    WHERE rk <= {BM25_TOP}
    ORDER BY query_id, rank
    """,
)
def bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval: top-{BM25_TOP} documents per query for a
    fixed literal query set, Okapi weighting (k1={BM25_K1},
    b={BM25_B}), idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scale shape (the 100 TB story):
    1. the token stream is FILTERED to query terms by a broadcast
       semi-join before anything groups — at web scale the postings
       for a handful of terms are a vanishing fraction of the corpus,
       and the filter reaches the scan side of the shuffle;
    2. tf is one combinable groupBy(doc_id, term); df one combinable
       groupBy(term) over the <= |distinct terms| x n_docs tf frame;
       idf (<= |terms| rows) and the corpus stats (one row: exact
       BIGINT token total + doc count) broadcast back;
    3. doc length joins on doc_id — the same key tf grouped on, so AQE
       plans it without a second full shuffle of the corpus;
    4. the per-query top-k is the salted TWO-LEVEL row_number from
       host_cap_sample: level 1 ranks within (query, salt) and keeps
       {BM25_TOP} per salt (a megaquery matching a billion docs never
       lands on one reducer), level 2 ranks the <= {BM25_TOP} x
       {_BM25_SALTS} survivors.  Selecting the top-k per salt first is
       exact: any global top-k row is a top-k row of its own salt.

    Scores round to ROUND_DIGITS before ranking in BOTH engines (the
    dsir/pagerank precedent for transcendental outputs: libm-vs-JVM
    ln() agree to ~1 ulp per term and a score sums <= 4 terms, orders
    of magnitude inside the rounding margin); ties break by doc_id, so
    the ranking is deterministic cross-engine."""
    docs = load(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id INT, term STRING",
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            words_expr()
        ).alias("w"),
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    stats = dl.agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl")
    ).crossJoin(F.broadcast(n_docs))
    tf = (
        tok.join(F.broadcast(q.select("term").distinct()), tok.w == F.col("term"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "w",
        F.log(
            1
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    k1 = F.expr(BM25_K1)
    b = F.expr(BM25_B)
    sc = (
        tf.join(F.broadcast(q), tf.w == q.term)
        .join(F.broadcast(idf.withColumnRenamed("w", "iw")), F.col("w") == F.col("iw"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * F.col("tf")
                    * (k1 + 1)
                    / (
                        F.col("tf")
                        + k1
                        * (
                            1
                            - b
                            + b
                            * F.col("dl")
                            / (
                                F.col("sum_dl").cast("double")
                                / F.col("n_docs")
                            )
                        )
                    )
                ),
                R,
            ).alias("score")
        )
    )
    salted = sc.withColumn(
        "salt", F.crc32(F.col("doc_id").cast("string")) % _BM25_SALTS
    )
    w1 = W.partitionBy("query_id", "salt").orderBy(
        F.desc("score"), "doc_id"
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        salted.withColumn("rk1", F.row_number().over(w1))
        .where(F.col("rk1") <= BM25_TOP)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= BM25_TOP)
        .select("query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank"))
        .orderBy("query_id", "rank")
    )


# --- k-means centroid training ------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 4


def _kmeans_chain_sql(k: int, iters: int, dim: int = 64) -> tuple[str, str]:
    """The unrolled Lloyd training chain (shared by the k-means oracle
    and the silhouette oracle) — returns (with_chain, dist_expr).
    Per iteration an (assign, per-dim mean, centroids) triple
    replicating the operator's exact dataflow (the host_pagerank
    oracle pattern; MATERIALIZED because a{i}/c{i} are referenced twice
    and DuckDB would otherwise inline the chain exponentially).
    Cross-engine exactness: centroids are integer-exact means
    (floor(v*1e8) BIGINT sums, one double division — base.py's
    discipline), distances fold in index order on both sides, argmin
    tie-breaks on cluster id."""
    dist = (
        "list_aggregate(list_transform(range(1, {top}), "
        "j -> (v.e[j] - c.c[j]) * (v.e[j] - c.c[j])), 'sum')"
    ).format(top=dim + 1)
    parts = [
        f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    c0 AS MATERIALIZED (
      SELECT row_number() OVER (
               ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id
             ) - 1 AS cid, e AS c
      FROM (SELECT vec_id, e FROM e
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {k})
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
    a{i} AS MATERIALIZED (
      SELECT vec_id, e, cid FROM (
        SELECT s.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT v.vec_id, v.e, c.cid, {dist} AS d
              FROM e v, c{i - 1} c) s
      ) WHERE rn = 1
    ),
    m{i} AS MATERIALIZED (
      SELECT cid, pos,
             CAST(SUM(CAST(FLOOR(val * 100000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 100000000 AS v
      FROM (SELECT cid, generate_subscripts(e, 1) AS pos,
                   unnest(e) AS val FROM a{i})
      GROUP BY cid, pos
    ),
    c{i} AS MATERIALIZED (
      SELECT p.cid, COALESCE(n.c, p.c) AS c
      FROM c{i - 1} p LEFT JOIN (
        SELECT cid, list(v ORDER BY pos) AS c FROM m{i} GROUP BY cid
      ) n ON p.cid = n.cid
    )""")
    return "".join(parts), dist


def _kmeans_oracle_sql(k: int, iters: int, dim: int = 64) -> str:
    chain, dist = _kmeans_chain_sql(k, iters, dim)
    return chain + f""",
    fin AS (
      SELECT vec_id, label, cid, d FROM (
        SELECT s.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT v.vec_id, v.label, c.cid, {dist} AS d
              FROM e v, c{iters} c) s
      ) WHERE rn = 1
    )
    SELECT vec_id, label, cid AS cluster_id, ROUND(d, 6) AS dist
    FROM fin ORDER BY vec_id"""


@register(
    "kmeans_embeddings", sql=_kmeans_oracle_sql(KMEANS_K, KMEANS_ITERS)
)
def kmeans_embeddings(spark, sf_dir):
    """Distributed Lloyd's k-means over the corpus embeddings — the
    centroid TRAINING step behind SemDeDup's clusters and IVF's coarse
    quantizer (both registry queries seed deterministically so their
    oracles replay; a production pipeline trains, and this is the
    trainer: operators/kmeans.py).  Per iteration: map-only assignment
    (centroids ride the plan as a literal array), combinable
    (cluster, dim) BIGINT-sum groupBy, bounded k x dim collect — the
    MLlib KMeans dataflow.  Full DuckDB oracle: the 4 Lloyd iterations
    unroll into chained materialized CTEs; integer-exact centroid
    means + in-order distance folds make every iteration bit-identical
    across engines (see _kmeans_oracle_sql).  Output: every vector's
    final cluster and squared-L2 distance to its trained centroid.
    Reference analogue: none (brute-force per-pair similarity only) —
    this exists for the 100 TB corpus."""
    from medical_ocr_pipeline_spark.operators.kmeans import lloyd_kmeans

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    assigned, _cents = lloyd_kmeans(emb, KMEANS_K, KMEANS_ITERS)
    return assigned.select(
        "vec_id",
        "label",
        "cluster_id",
        F.round("dist", 6).alias("dist"),
    ).orderBy("vec_id")


# --- product quantization -----------------------------------------------------
# PQ (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"): split each 64-dim embedding into M=4 contiguous 16-dim
# subvectors, train an independent k=8 k-means codebook per subspace,
# and store each vector as 4 x 3-bit codes (packed: 12 bits vs 256
# bytes of float64 — the memory step that makes billion-vector ANN
# serving possible; IVF-PQ = the registry's ann_ivf_topk coarse stage
# plus this fine stage).
PQ_M = 4
PQ_SUB = 16
PQ_K = 8
PQ_ITERS = 2


def _pq_oracle_sql(m_sub: int, sub_dim: int, k: int, iters: int) -> str:
    """M independent unrolled Lloyd chains (the _kmeans_oracle_sql
    triple per iteration, suffixed per subspace) over the sliced
    embedding, joined back on vec_id; same integer-exact centroid
    means, in-order distance folds, and cid tie-breaks."""
    dist = (
        "list_aggregate(list_transform(range(1, {top}), "
        "j -> (v.e[j] - c.c[j]) * (v.e[j] - c.c[j])), 'sum')"
    ).format(top=sub_dim + 1)
    parts = ["""
    WITH e AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    )"""]
    for m in range(m_sub):
        lo, hi = sub_dim * m + 1, sub_dim * (m + 1)
        parts.append(f""",
    e_s{m} AS MATERIALIZED (
      SELECT vec_id, e[{lo}:{hi}] AS e FROM e
    ),
    c0_s{m} AS MATERIALIZED (
      SELECT row_number() OVER (
               ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id
             ) - 1 AS cid, e AS c
      FROM (SELECT vec_id, e FROM e_s{m}
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {k})
    )""")
        for i in range(1, iters + 1):
            parts.append(f""",
    a{i}_s{m} AS MATERIALIZED (
      SELECT vec_id, e, cid FROM (
        SELECT s.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT v.vec_id, v.e, c.cid, {dist} AS d
              FROM e_s{m} v, c{i - 1}_s{m} c) s
      ) WHERE rn = 1
    ),
    m{i}_s{m} AS MATERIALIZED (
      SELECT cid, pos,
             CAST(SUM(CAST(FLOOR(val * 100000000) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 100000000 AS v
      FROM (SELECT cid, generate_subscripts(e, 1) AS pos,
                   unnest(e) AS val FROM a{i}_s{m})
      GROUP BY cid, pos
    ),
    c{i}_s{m} AS MATERIALIZED (
      SELECT p.cid, COALESCE(n.c, p.c) AS c
      FROM c{i - 1}_s{m} p LEFT JOIN (
        SELECT cid, list(v ORDER BY pos) AS c FROM m{i}_s{m} GROUP BY cid
      ) n ON p.cid = n.cid
    )""")
        parts.append(f""",
    fin_s{m} AS MATERIALIZED (
      SELECT vec_id, cid AS code_{m}, d AS d_{m} FROM (
        SELECT s.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT v.vec_id, c.cid, {dist} AS d
              FROM e_s{m} v, c{iters}_s{m} c) s
      ) WHERE rn = 1
    )""")
    joins = " ".join(
        f"JOIN fin_s{m} f{m} ON e.vec_id = f{m}.vec_id"
        for m in range(m_sub)
    )
    code_cols = ", ".join(f"f{m}.code_{m}" for m in range(m_sub))
    packed = " + ".join(f"f{m}.code_{m} * {k ** m}" for m in range(m_sub))
    qerr = " + ".join(f"f{m}.d_{m}" for m in range(m_sub))
    parts.append(f"""
    SELECT e.vec_id, e.label, {code_cols},
           CAST({packed} AS BIGINT) AS pq_code,
           ROUND({qerr}, 6) AS qerr
    FROM e {joins}
    ORDER BY e.vec_id""")
    return "".join(parts)


@register(
    "pq_codebook_assign",
    sql=_pq_oracle_sql(PQ_M, PQ_SUB, PQ_K, PQ_ITERS),
)
def pq_codebook_assign(spark, sf_dir):
    """Product quantization of the corpus embeddings: per 16-dim
    subspace an independently trained k=8 Lloyd codebook
    (operators/kmeans.py, 2 iterations), each vector emitted with its 4
    subspace codes, the packed 12-bit PQ code, and the total squared
    quantization error.

    100 TB shape: each subspace training is the kmeans operator's
    map + combinable-agg + bounded k x sub_dim collect per iteration;
    assignment is map-only (codebooks ride the plan as literals — at
    M=4, k=8 that is 512 literal doubles); the M assignment frames join
    back on vec_id, which at scale is M-1 co-partitioned joins of
    already-hash-distributed narrow frames.  Storage: 12 bits/vector vs
    2048 — the 170x compression IVF-PQ serving rests on.  Full DuckDB
    oracle: M unrolled Lloyd chains joined on vec_id."""
    from medical_ocr_pipeline_spark.operators.kmeans import lloyd_kmeans

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    out = emb.select("vec_id", "label")
    for m in range(PQ_M):
        sub = emb.select(
            "vec_id", F.slice("e", PQ_SUB * m + 1, PQ_SUB).alias("e")
        )
        assigned, _cents = lloyd_kmeans(sub, PQ_K, PQ_ITERS)
        out = out.join(
            assigned.select(
                "vec_id",
                F.col("cluster_id").alias(f"code_{m}"),
                F.col("dist").alias(f"d_{m}"),
            ),
            "vec_id",
        )
    packed = sum(
        (F.col(f"code_{m}") * (PQ_K ** m) for m in range(1, PQ_M)),
        F.col("code_0"),
    )
    qerr = sum(
        (F.col(f"d_{m}") for m in range(1, PQ_M)), F.col("d_0")
    )
    return out.select(
        "vec_id",
        "label",
        *[f"code_{m}" for m in range(PQ_M)],
        packed.cast("long").alias("pq_code"),
        F.round(qerr, 6).alias("qerr"),
    ).orderBy("vec_id")


# --- PQ asymmetric-distance search (ADC shortlist + exact rerank) -------------
# Serving parameters, distinct from the compression demo above: finer
# subspaces (M=8 x 8 dims) and a larger codebook (k=16) because ADC
# ranking quality, not storage, is the objective here.  The measured
# operating point on the driver corpus: ADC-shortlist=100 then exact
# rerank -> recall@5 = 0.92 vs the exact scan (pinned >= 0.8 in
# tests/test_pq.py; raw ADC top-5 without rerank is 0.24 on these
# near-isotropic synthetic embeddings — rerank is not optional, which
# is exactly how production IVF-PQ deployments run).
PQADC_M = 8
PQADC_SUB = 8
PQADC_K = 16
PQADC_SHORTLIST = 100


def _pq_adc_oracle_sql() -> str:
    """ADC search on top of unrolled PQ chains (the _pq_oracle_sql
    training text at the serving parameters): per (query, db-vector)
    the ADC distance is the left-assoc sum over subspaces of the
    in-order fold against the CODED centroid; the top-100 rounded-ADC
    shortlist (neighbor tie-break) is then exactly reranked on the
    full vectors."""
    train = _pq_oracle_sql(PQADC_M, PQADC_SUB, PQADC_K, PQ_ITERS)
    body = train[: train.rindex("\n    SELECT e.vec_id")]
    sub_dist = []
    joins = []
    for m in range(PQADC_M):
        lo = PQADC_SUB * m
        sub_dist.append(
            f"list_aggregate(list_transform(range(1, {PQADC_SUB + 1}), "
            f"j -> (q.e[{lo} + j] - cb{m}.c[j]) * (q.e[{lo} + j] - cb{m}.c[j])), "
            "'sum')"
        )
        joins.append(
            f"JOIN fin_s{m} f{m} ON x.vec_id = f{m}.vec_id "
            f"JOIN c{PQ_ITERS}_s{m} cb{m} ON cb{m}.cid = f{m}.code_{m}"
        )
    adc = " + ".join(f"({d})" for d in sub_dist)
    exact = (
        "list_aggregate(list_transform(range(1, 65), "
        "j -> (q.e[j] - v.e[j]) * (q.e[j] - v.e[j])), 'sum')"
    )
    return f"""{body},
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, e FROM e WHERE vec_id < {N_QUERIES}
    ),
    x AS (SELECT vec_id, label FROM e WHERE vec_id >= {N_QUERIES}),
    scored AS (
      SELECT q.query_id, x.vec_id AS neighbor_id, x.label,
             ROUND({adc}, {R}) AS adc
      FROM q, x {' '.join(joins)}
    ),
    shortlist AS (
      SELECT query_id, neighbor_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= {PQADC_SHORTLIST}
    ),
    reranked AS (
      SELECT s.query_id, s.neighbor_id, s.label,
             ROUND({exact}, {R}) AS dist
      FROM shortlist s
      JOIN e v ON v.vec_id = s.neighbor_id
      JOIN q ON q.query_id = s.query_id
    )
    SELECT query_id, neighbor_id, label, dist
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
      FROM reranked
    ) WHERE rn <= {TOP_K}
    ORDER BY query_id, dist, neighbor_id"""


@register("ann_pq_topk", sql=_pq_adc_oracle_sql())
def ann_pq_topk(spark, sf_dir):
    """PQ asymmetric-distance search, the IVF-PQ fine stage: database
    vectors are represented ONLY by their 8 x 4-bit PQ codes; each query
    scans the codes with ADC (sum over subspaces of ||q_m -
    C_m[code_m(x)]||^2, Jegou et al. 2011 §III.B), keeps a top-100
    shortlist, and exactly reranks the shortlist on full vectors for the
    final top-5 by squared L2.

    100 TB shape: the ADC scan touches 32-bit codes instead of 256-byte
    vectors (~64x less memory traffic); only the 100-per-query shortlist
    ever loads full vectors again — the rerank join is a tiny
    broadcastable frame against the vector store.  At production scale
    each query precomputes its M x k LUT (128 doubles); here the same
    arithmetic is expressed as M broadcast joins against the k-row
    codebook frames so the DuckDB oracle replays the plan op-for-op.
    Recall@5 = 0.92 vs the exact scan at the committed operating point
    (pinned >= 0.8 in tests/test_pq.py)."""
    from medical_ocr_pipeline_spark.operators.kmeans import (
        _sq_dist,
        lloyd_kmeans,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    codes = emb.select("vec_id", "label")
    cb_frames = []
    for m in range(PQADC_M):
        sub = emb.select(
            "vec_id", F.slice("e", PQADC_SUB * m + 1, PQADC_SUB).alias("e")
        )
        assigned, cents = lloyd_kmeans(sub, PQADC_K, PQ_ITERS)
        codes = codes.join(
            assigned.select(
                "vec_id", F.col("cluster_id").alias(f"code_{m}")
            ),
            "vec_id",
        )
        cb_frames.append(
            spark.createDataFrame(
                sorted(cents.items()), f"code_{m} int, c_{m} array<double>"
            )
        )
    db = codes.where(F.col("vec_id") >= N_QUERIES)
    for m in range(PQADC_M):
        db = db.join(F.broadcast(cb_frames[m]), f"code_{m}")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    sub_dists = [
        _sq_dist(
            F.slice(F.col("qe"), PQADC_SUB * m + 1, PQADC_SUB),
            F.col(f"c_{m}"),
        )
        for m in range(PQADC_M)
    ]
    adc = sub_dists[0]
    for d in sub_dists[1:]:
        adc = adc + d
    scored = db.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.round(adc, R).alias("adc"),
    )
    w_adc = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_adc))
        .where(F.col("rn") <= PQADC_SHORTLIST)
        .select("query_id", "neighbor_id", "label")
    )
    vecs = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ve"))
    reranked = (
        shortlist.join(vecs, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round(_sq_dist(F.col("qe"), F.col("ve")), R).alias("dist"),
        )
    )
    w_fin = W.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        reranked.withColumn("rn", F.row_number().over(w_fin))
        .where(F.col("rn") <= TOP_K)
        .drop("rn")
        .orderBy("query_id", "dist", "neighbor_id")
    )


# --- cluster quality: simplified silhouette -------------------------------------


def _silhouette_oracle_sql(k: int, iters: int, dim: int = 64) -> str:
    """Silhouette oracle = the shared Lloyd training chain + a rank-2
    pivot (own-centroid distance a is rank 1 by assignment definition,
    nearest-other-centroid distance b is rank 2 overall) + the exact
    integer-ppm silhouette rollup."""
    chain, dist = _kmeans_chain_sql(k, iters, dim)
    return chain + f""",
    two AS (
      SELECT vec_id,
             MAX(CASE WHEN rn = 1 THEN cid END) AS cid,
             MAX(CASE WHEN rn = 1 THEN d END) AS a,
             MAX(CASE WHEN rn = 2 THEN d END) AS b
      FROM (
        SELECT s.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM (SELECT v.vec_id, c.cid, {dist} AS d
              FROM e v, c{iters} c) s
      ) WHERE rn <= 2 GROUP BY vec_id
    ),
    sil AS (
      SELECT cid,
             CASE WHEN GREATEST(a, b) > 0
                  THEN CAST(FLOOR((b - a) * 1000000 / GREATEST(a, b))
                            AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS s_ppm
      FROM two
    )
    SELECT cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(s_ppm) // COUNT(*) AS BIGINT) AS mean_s_ppm,
           CAST(MIN(s_ppm) AS BIGINT) AS min_s_ppm,
           CAST(MAX(s_ppm) AS BIGINT) AS max_s_ppm
    FROM sil GROUP BY cid ORDER BY cid"""


@register(
    "kmeans_silhouette",
    sql=_silhouette_oracle_sql(KMEANS_K, KMEANS_ITERS),
)
def kmeans_silhouette(spark, sf_dir):
    """Per-cluster SIMPLIFIED silhouette over the trained k-means
    clustering: per vector, a = squared distance to its own centroid,
    b = squared distance to the nearest OTHER centroid, s = (b - a) /
    max(a, b) in exact-integer ppm (floor of one double division of
    bit-identical operands — no transcendental, no float aggregate).
    The centroid-based simplification (Hamerly/Elkan's a-vs-b bound)
    is the standard at-scale substitute for the O(n^2) pairwise
    silhouette, and the metric a pipeline watches to pick k for
    SemDeDup/IVF quantizers.

    100 TB shape: scoring is a PURE MAP — the trained centroids ride
    the plan as a literal array; per row one array_sort of k
    (dist, cid) structs yields rank 1 (own, by assignment definition)
    and rank 2 (nearest other) without any window or join; the rollup
    is one combinable per-cluster groupBy.  Nothing beyond the Lloyd
    training loop shuffles at all."""
    from medical_ocr_pipeline_spark.operators.kmeans import (
        _centroid_literal,
        _sq_dist,
        lloyd_kmeans,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    _assigned, cents = lloyd_kmeans(emb, KMEANS_K, KMEANS_ITERS)
    ds = F.array_sort(
        F.transform(
            _centroid_literal(cents),
            lambda c: F.struct(
                _sq_dist(F.col("e"), c["c"]).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )
    two = emb.select(
        "vec_id",
        ds[0]["cid"].alias("cid"),
        ds[0]["d"].alias("a"),
        ds[1]["d"].alias("b"),
    )
    s_ppm = F.when(
        F.greatest("a", "b") > 0,
        F.floor(
            (F.col("b") - F.col("a")) * 1000000 / F.greatest("a", "b")
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        two.select("cid", s_ppm.alias("s_ppm"))
        .groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.expr("sum(s_ppm) div count(*)").alias("mean_s_ppm"),
            F.min("s_ppm").alias("min_s_ppm"),
            F.max("s_ppm").alias("max_s_ppm"),
        )
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vecs",
            "mean_s_ppm",
            "min_s_ppm",
            "max_s_ppm",
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation over the BM25 ranking
#
# The IR-eval triple every retrieval stack reports — MRR, precision@10,
# nDCG@10 — computed against a deterministic relevance oracle (a doc is
# relevant to a query iff it contains ALL the query's terms: the
# boolean-AND judgment, derivable from the corpus itself, no external
# qrels).  Exactness discipline: MRR and precision are rationals
# (integer division), and nDCG's log2 discounts are pre-scaled INTEGER
# LITERALS (round(1e6 / log2(i+1))) embedded identically in both
# engines, so DCG/IDCG are order-free BIGINT sums and the final ratio
# is one double division on identical operands — no engine ever
# evaluates a transcendental.

import math as _math

_NDCG_AT = 10
_DISC_E6 = tuple(
    round(1_000_000 / _math.log2(i + 1)) for i in range(1, _NDCG_AT + 1)
)
_DISC_SQL = "[" + ", ".join(str(d) for d in _DISC_E6) + "]"
_N_TERMS_ROWS = ", ".join(
    f"({qid}, {len(terms)})" for qid, terms in BM25_QUERIES
)


@register(
    "bm25_eval",
    sql=f"""
    WITH q(query_id, term) AS (VALUES {_BM25_Q_ROWS}),
    nterms(query_id, n_terms) AS (VALUES {_N_TERMS_ROWS}),
    tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS w
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS sum_dl
      FROM dl
    ),
    tf AS (
      SELECT tok.doc_id, tok.w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok JOIN (SELECT DISTINCT term FROM q) qt ON tok.w = qt.term
      GROUP BY tok.doc_id, tok.w
    ),
    idf AS (
      SELECT w, LN(1 + (stats.n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
           stats
    ),
    sc AS (
      SELECT q.query_id, tf.doc_id,
             ROUND(SUM(idf.idf * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl
                    / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))),
               {R}) AS score
      FROM tf
      JOIN q ON q.term = tf.w
      JOIN idf ON idf.w = tf.w
      JOIN dl ON dl.doc_id = tf.doc_id, stats
      GROUP BY q.query_id, tf.doc_id
    ),
    rel AS (
      SELECT q.query_id, tf.doc_id
      FROM tf JOIN q ON q.term = tf.w
      JOIN nterms USING (query_id)
      GROUP BY q.query_id, tf.doc_id, nterms.n_terms
      HAVING COUNT(DISTINCT tf.w) = nterms.n_terms
    ),
    nrel AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM rel GROUP BY query_id
    ),
    ranked AS (
      SELECT query_id, doc_id, rk FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rk
        FROM sc
      ) WHERE rk <= {BM25_TOP}
    ),
    j AS (
      SELECT r.query_id, r.rk,
             (rel.doc_id IS NOT NULL) AS is_rel
      FROM ranked r LEFT JOIN rel
        ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
    ),
    m AS (
      SELECT query_id,
             COALESCE(1000000 // MIN(CASE WHEN is_rel THEN rk END), 0)
               AS mrr_ppm,
             SUM(CASE WHEN is_rel AND rk <= {_NDCG_AT}
                 THEN 1 ELSE 0 END) * 100000 AS p10_ppm,
             CAST(SUM(CASE WHEN is_rel AND rk <= {_NDCG_AT}
                 THEN {_DISC_SQL}[rk] ELSE 0 END) AS BIGINT) AS dcg_e6
      FROM j GROUP BY query_id
    )
    SELECT nq.query_id,
           COALESCE(nrel.n_rel, 0) AS n_rel,
           CAST(COALESCE(m.mrr_ppm, 0) AS BIGINT) AS mrr_ppm,
           CAST(COALESCE(m.p10_ppm, 0) AS BIGINT) AS p10_ppm,
           COALESCE(m.dcg_e6, 0) AS dcg_e6,
           CAST(COALESCE(list_aggregate(
             {_DISC_SQL}[1:LEAST(nrel.n_rel, {_NDCG_AT})], 'sum'), 0)
             AS BIGINT) AS idcg_e6,
           CAST(CASE WHEN COALESCE(nrel.n_rel, 0) = 0 THEN 0
                ELSE FLOOR(COALESCE(m.dcg_e6, 0) * 1000000.0
                  / list_aggregate(
                      {_DISC_SQL}[1:LEAST(nrel.n_rel, {_NDCG_AT})], 'sum'))
                END AS BIGINT) AS ndcg_ppm
    FROM (SELECT DISTINCT query_id FROM q) nq
    LEFT JOIN nrel USING (query_id)
    LEFT JOIN m USING (query_id)
    ORDER BY query_id
    """,
)
def bm25_eval(spark, sf_dir):
    """MRR, precision@10 and nDCG@10 of the BM25 ranking (identical
    scoring definition to bm25_topk: same Okapi weighting, same
    rounded-score + doc_id tie-broken ordering) against the
    boolean-AND relevance oracle — a doc is relevant iff it contains
    every query term.

    Exactness: MRR@k and P@10 are integer divisions; nDCG's discounts
    1/log2(i+1) are pre-scaled integer literals shared by both
    engines, so DCG and IDCG are order-free BIGINT sums; the single
    nDCG division is a double op on identical operands.

    100 TB shape: inherits bm25_topk's postings plan (broadcast term
    semi-join before any grouping, combinable tf/df aggs); relevance
    adds one combinable (query, doc) distinct-term count over the SAME
    tf frame — no second corpus scan — and the metrics reduce the
    top-k frame (a few rows per query) with a 1-row-per-query join."""
    docs = load(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id INT, term STRING",
    )
    nterms = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in BM25_QUERIES],
        "query_id INT, n_terms INT",
    )
    tok = docs.select("doc_id", F.explode(words_expr()).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    stats = dl.agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl")
    ).crossJoin(F.broadcast(n_docs))
    tf = (
        tok.join(
            F.broadcast(q.select("term").distinct()), tok.w == F.col("term")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
        .persist()
    )
    df_ = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "w",
        F.log(
            1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    k1 = F.expr(BM25_K1)
    b = F.expr(BM25_B)
    sc = (
        tf.join(F.broadcast(q), tf.w == q.term)
        .join(
            F.broadcast(idf.withColumnRenamed("w", "iw")),
            F.col("w") == F.col("iw"),
        )
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf") * F.col("tf") * (k1 + 1)
                    / (
                        F.col("tf")
                        + k1
                        * (
                            1 - b
                            + b * F.col("dl")
                            / (
                                F.col("sum_dl").cast("double")
                                / F.col("n_docs")
                            )
                        )
                    )
                ),
                R,
            ).alias("score")
        )
    )
    rel = (
        tf.join(F.broadcast(q), tf.w == q.term)
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("w").alias("nt_hit"))
        .join(F.broadcast(nterms), "query_id")
        .where(F.col("nt_hit") == F.col("n_terms"))
        .select("query_id", "doc_id")
        .persist()
    )
    nrel = rel.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    salted = sc.withColumn(
        "salt", F.crc32(F.col("doc_id").cast("string")) % _BM25_SALTS
    )
    w1 = W.partitionBy("query_id", "salt").orderBy(F.desc("score"), "doc_id")
    wq = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    ranked = (
        salted.withColumn("rk1", F.row_number().over(w1))
        .where(F.col("rk1") <= BM25_TOP)
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= BM25_TOP)
        .select("query_id", "doc_id", "rk")
    )
    j = ranked.join(
        rel.withColumn("is_rel", F.lit(True)), ["query_id", "doc_id"], "left"
    ).select(
        "query_id", "rk", F.coalesce("is_rel", F.lit(False)).alias("is_rel")
    )
    disc = F.array(*[F.lit(d) for d in _DISC_E6])
    m = j.groupBy("query_id").agg(
        F.coalesce(
            F.expr(
                "cast(1000000 as bigint) div "
                "min(case when is_rel then rk end)"
            ),
            F.lit(0),
        ).alias("mrr_ppm"),
        (
            F.sum(
                F.when(
                    F.col("is_rel") & (F.col("rk") <= _NDCG_AT), 1
                ).otherwise(0)
            )
            * 100000
        ).alias("p10_ppm"),
        F.sum(
            F.when(
                F.col("is_rel") & (F.col("rk") <= _NDCG_AT),
                F.element_at(disc, F.col("rk")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("dcg_e6"),
    )
    qids = q.select("query_id").distinct()
    idcg = F.expr(
        "aggregate(slice(array({discs}), 1, int(least(n_rel, {at}))), "
        "cast(0 as bigint), (a, x) -> a + x)".format(
            discs=", ".join(str(d) for d in _DISC_E6), at=_NDCG_AT
        )
    )
    out = (
        qids.join(nrel, "query_id", "left")
        .join(m, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce("mrr_ppm", F.lit(0)).cast("long").alias("mrr_ppm"),
            F.coalesce("p10_ppm", F.lit(0)).cast("long").alias("p10_ppm"),
            F.coalesce("dcg_e6", F.lit(0)).cast("long").alias("dcg_e6"),
            F.coalesce(idcg, F.lit(0)).cast("long").alias("idcg_e6"),
            F.coalesce(
                F.when(F.coalesce("n_rel", F.lit(0)) == 0, F.lit(0))
                .otherwise(
                    F.floor(
                        F.coalesce("dcg_e6", F.lit(0)) * 1000000.0 / idcg
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )
    return out
