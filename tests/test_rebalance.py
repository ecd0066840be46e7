"""Stratified rebalance: seeded sampleBy is deterministic and lands
near the per-language target rates."""

SF_DIR = "/root/testdata/sf0.01"


def test_rebalance_deterministic_and_on_target(spark):
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.queries.textstats import (
        REBALANCE_CAP,
        corpus_rebalance,
    )

    a = {r.lang: r.n_docs for r in corpus_rebalance(spark, SF_DIR).collect()}
    b = {r.lang: r.n_docs for r in corpus_rebalance(spark, SF_DIR).collect()}
    assert a == b  # same seed -> identical sample
    full = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in full.items():
        got = a.get(lang, 0)
        if n <= REBALANCE_CAP:
            assert got == n  # under-represented strata kept whole
        else:
            # Bernoulli: expect cap +- 4*sqrt(cap) (generous CLT bound)
            assert abs(got - REBALANCE_CAP) <= 4 * REBALANCE_CAP ** 0.5, (
                lang, n, got,
            )
