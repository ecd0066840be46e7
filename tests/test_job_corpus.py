"""The corpus-curation job's per-document verdicts must aggregate to
exactly the oracle-checked corpus_keep_drop query output."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_curate_documents_matches_registry_query(spark):
    from medical_ocr_pipeline_spark.job_corpus import curate_documents
    from medical_ocr_pipeline_spark.queries.textstats import corpus_keep_drop

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_doc = (
        curate_documents(docs)
        .groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_words"), 4).alias("avg_words"),
        )
        .orderBy("reason")
        .collect()
    )
    agg = corpus_keep_drop(spark, SF_DIR).collect()
    assert [tuple(r) for r in per_doc] == [tuple(r) for r in agg]


def test_near_dup_pairs_matches_registry_query(spark):
    from medical_ocr_pipeline_spark.job_corpus import near_dup_pairs
    from medical_ocr_pipeline_spark.queries.dedup import dedup_ngram_jaccard

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(tuple(r) for r in near_dup_pairs(docs).collect())
    want = sorted(tuple(r) for r in dedup_ngram_jaccard(spark, SF_DIR).collect())
    assert got == want


def test_rewrite_kept_matches_registry_core_on_survivors(spark):
    """--line-dedup's rewrite stage must be exactly the oracle-checked
    line_dedup_rewrite core applied to the gate-surviving documents:
    one row per KEPT doc, and identical values to calling the core
    directly on the same filtered frame."""
    from medical_ocr_pipeline_spark.job_corpus import (
        curate_documents,
        rewrite_kept,
    )
    from medical_ocr_pipeline_spark.queries.curation import (
        line_dedup_rewrite,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_documents(docs)
    got = sorted(tuple(r) for r in rewrite_kept(docs, curated).collect())
    kept_ids = {r["doc_id"] for r in curated.where("keep").collect()}
    want = sorted(
        tuple(r)
        for r in line_dedup_rewrite(
            docs.where(F.col("doc_id").isin(kept_ids))
        ).collect()
    )
    assert got == want
    assert {t[0] for t in got} == kept_ids


def test_decontam_kept_matches_registry_core_on_survivors(spark):
    """--decontaminate's stage must be exactly the oracle-checked
    decontaminate_rewrite_frame core applied to the gate-surviving
    documents (non-benchmark survivors only, identical values)."""
    from medical_ocr_pipeline_spark.job_corpus import (
        curate_documents,
        decontam_kept,
    )
    from medical_ocr_pipeline_spark.queries.dedup import (
        decontaminate_rewrite_frame,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_documents(docs)
    got = sorted(tuple(r) for r in decontam_kept(docs, curated).collect())
    kept_ids = {r["doc_id"] for r in curated.where("keep").collect()}
    want = sorted(
        tuple(r)
        for r in decontaminate_rewrite_frame(
            docs.where(F.col("doc_id").isin(kept_ids)),
            bench_docs=docs,  # reference side is NEVER gated
        ).collect()
    )
    assert got == want
    assert {t[0] for t in got} <= kept_ids  # benchmark members excluded


def test_decontam_bench_side_survives_the_gate(spark):
    """A benchmark doc the curation gate drops must still scrub its
    copies: the reference shingle side is built from the FULL input,
    only the probe side is gated.  (Passing the gated frame as the
    bench side too — the bug this pins — leaves the copy untouched.)"""
    from medical_ocr_pipeline_spark.queries.dedup import (
        decontaminate_rewrite_frame,
    )

    bench_text = "b1 b2 b3 b4 b5"
    rows = [
        (3, bench_text, "en", "s", len(bench_text)),   # benchmark member
        (1, f"x1 {bench_text} x2", "en", "s", 20),     # kept copy
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    )
    gated = docs.where("doc_id <> 3")  # the gate dropped the bench doc
    [r] = decontaminate_rewrite_frame(gated, bench_docs=docs).collect()
    assert r["doc_id"] == 1
    assert r["clean_text"] == "x1 x2" and r["n_removed"] == 5
    # without the full bench side the contamination survives — the
    # exact failure the bench_docs parameter exists to prevent
    [r2] = decontaminate_rewrite_frame(gated).collect()
    assert r2["n_removed"] == 0


def test_span_dedup_kept_matches_registry_core_on_survivors(spark):
    """--span-dedup's stage must be exactly the oracle-checked
    span_dedup_rewrite_frame core applied to the gate-surviving
    documents: one row per KEPT doc, identical values to calling the
    core directly on the same filtered frame."""
    from medical_ocr_pipeline_spark.job_corpus import (
        curate_documents,
        span_dedup_kept,
    )
    from medical_ocr_pipeline_spark.queries.dedup import (
        span_dedup_rewrite_frame,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_documents(docs)
    got = sorted(tuple(r) for r in span_dedup_kept(docs, curated).collect())
    kept_ids = {r["doc_id"] for r in curated.where("keep").collect()}
    want = sorted(
        tuple(r)
        for r in span_dedup_rewrite_frame(
            docs.where(F.col("doc_id").isin(kept_ids))
        ).collect()
    )
    assert got == want
    assert {t[0] for t in got} == kept_ids
