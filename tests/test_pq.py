"""Product quantization (queries/similarity.py pq_codebook_assign):
independent numpy recompute of the subspace argmin + packing/error
invariants (cross-engine parity is covered by test_queries_oracle.py)."""

import numpy as np

from medical_ocr_pipeline_spark.queries.base import REGISTRY, load
from medical_ocr_pipeline_spark.queries.similarity import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_SUB,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pq_codes_match_numpy_argmin_over_trained_codebooks(spark):
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.operators.kmeans import lloyd_kmeans

    got = {
        r["vec_id"]: r.asDict()
        for r in REGISTRY["pq_codebook_assign"].fn(spark, SF_DIR).collect()
    }
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    vecs = {r["vec_id"]: np.array(r["e"]) for r in emb.collect()}

    # retrain each subspace codebook through the same operator, then
    # recompute assignment independently in numpy (different argmin
    # evaluation order and float accumulation than the Spark fold)
    books = []
    for m in range(PQ_M):
        sub = emb.select(
            "vec_id", F.slice("e", PQ_SUB * m + 1, PQ_SUB).alias("e")
        )
        _a, cents = lloyd_kmeans(sub, PQ_K, PQ_ITERS)
        books.append(np.array([cents[c] for c in sorted(cents)]))

    sample = sorted(vecs)[:25]
    for vid in sample:
        row = got[vid]
        total = 0.0
        packed = 0
        for m in range(PQ_M):
            sub = vecs[vid][PQ_SUB * m : PQ_SUB * (m + 1)]
            d = ((books[m] - sub) ** 2).sum(axis=1)
            code = int(d.argmin())  # numpy breaks ties on first == min cid
            assert row[f"code_{m}"] == code, (vid, m)
            total += d[code]
            packed += code * PQ_K**m
        assert row["pq_code"] == packed
        assert abs(row["qerr"] - total) < 1e-5
        assert 0 <= row["pq_code"] < PQ_K**PQ_M


def test_pq_codes_are_in_range_and_packing_is_bijective(spark):
    rows = REGISTRY["pq_codebook_assign"].fn(spark, SF_DIR).collect()
    for r in rows:
        codes = [r[f"code_{m}"] for m in range(PQ_M)]
        assert all(0 <= c < PQ_K for c in codes)
        assert r["pq_code"] == sum(c * PQ_K**m for m, c in enumerate(codes))
        assert r["qerr"] >= 0.0
    # the quantizer must actually use more than one cell per subspace
    for m in range(PQ_M):
        assert len({r[f"code_{m}"] for r in rows}) > 1


def test_ann_pq_shortlist_rerank_recall_at_operating_point(spark):
    """The committed ADC operating point (M=8, k=16, shortlist=100,
    exact rerank) must keep recall@5 >= 0.8 vs the exact scan at
    sf0.01 (measured 0.92; raw ADC top-5 without rerank is 0.24 on
    these near-isotropic embeddings, which is WHY the rerank stage is
    part of the committed query)."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["ann_pq_topk"].fn(spark, sf).collect()
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    emb = {
        v: np.array(e)
        for v, e in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }
    recalls = []
    for q in sorted(got):
        exact = sorted(
            (float(((emb[x] - emb[q]) ** 2).sum()), x)
            for x in emb
            if x >= 5
        )[:5]
        want = {x for _, x in exact}
        recalls.append(len(want & got[q]) / 5)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
