"""spark-submit entry point for the corpus-curation pipeline over a
documents table — the training-data companion to job.py's transcript
extraction.

    spark-submit --py-files dist/medical_ocr_pipeline_spark.zip \
        medical_ocr_pipeline_spark/job_corpus.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/corpus_run [--master local[32]]

Writes:
  <out>/docs_curated/   one row per document: gate verdict with
                        first-failing reason (prefix-dup / too_short /
                        repetitive), exact-dup fingerprint, token count,
                        dup rank — the per-doc form of the
                        corpus_keep_drop registry query — plus the
                        near-dup cluster id (connected components over
                        the Jaccard pairs) and is_representative;
                        final keep = gate verdict AND representative.
  <out>/dup_pairs/      exact n-gram Jaccard near-dup pairs (the
                        inverted-index join from dedup_ngram_jaccard).
  <out>/metrics/        one row per curation reason (counts, avg words).

Prints one RESULT line: docs, kept, dropped, dup_pairs, secs.

All heavy lifting is pure Catalyst (no Python nodes): the curation
gates are column expressions, the dup candidates an equi-join on the
shingle key.  Scale notes as in queries/textstats.py::corpus_keep_drop
and queries/dedup.py.
"""

from __future__ import annotations

import argparse
import time


from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.dedup import (
    JACCARD_THR,
    _shingles_spark,
)
from medical_ocr_pipeline_spark.queries.textstats import (
    CURATE_MAX_REP,
    CURATE_MIN_WORDS,
    CURATE_PFX_WORDS,
)

_WORD_SPLIT = "[^a-z0-9]+"


def curate_documents(docs):
    """Per-document keep/drop verdict frame (see corpus_keep_drop for
    the aggregated oracle-checked form of the same gates)."""
    words = F.filter(
        F.split(F.lower("text"), _WORD_SPLIT), lambda w: w != F.lit("")
    )
    s = (
        docs.select("doc_id", "lang", "source", words.alias("words"),
                    F.col("text"))
        .select(
            "doc_id", "lang", "source",
            F.size("words").alias("n_words"),
            (
                F.size("words").cast("double")
                / F.nullif(F.size(F.array_distinct("words")), F.lit(0))
            ).alias("rep"),
            F.array_join(
                F.slice("words", 1, CURATE_PFX_WORDS), " "
            ).alias("pfx"),
            F.md5(
                F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
            ).alias("fp"),
        )
    )
    # two-phase prefix dedup (combinable min, no hot-key window sort) —
    # same skew-safe shape as corpus_keep_drop; eqNullSafe keeps
    # NULL-text docs (NULL pfx) in the frame as their own group
    firsts = s.groupBy("pfx").agg(F.min("doc_id").alias("first_doc"))
    s = s.join(
        firsts.withColumnRenamed("pfx", "pfx_f"),
        F.col("pfx").eqNullSafe(F.col("pfx_f")),
    ).drop("pfx_f")
    reason = (
        F.when(F.col("doc_id") != F.col("first_doc"), "dup")
        .when(F.col("n_words") < CURATE_MIN_WORDS, "too_short")
        .when(F.col("rep") >= CURATE_MAX_REP, "repetitive")
        .otherwise("keep")
    )
    return s.withColumn("reason", reason).withColumn(
        "keep", F.col("reason") == "keep"
    ).drop("pfx", "first_doc")


def near_dup_pairs(docs):
    """Exact n-gram Jaccard pairs via the shingle inverted-index join."""
    sh = _shingles_spark(docs).persist()
    ex = sh.select(
        "doc_id", F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("s"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("common"),
            F.first("a.n_sh").alias("na"),
            F.first("b.n_sh").alias("nb"),
        )
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return pairs.where(jac >= JACCARD_THR).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text, lang, source, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--run-id", default="corpus_run")
    args = ap.parse_args()

    from medical_ocr_pipeline_spark.pipeline import write_stage
    from medical_ocr_pipeline_spark.session import get_spark

    spark = get_spark(app=f"corpus:{args.run_id}", master=args.master)
    t0 = time.time()

    docs = spark.read.parquet(args.input)

    pairs = near_dup_pairs(docs)
    write_stage(pairs, f"{args.out}/dup_pairs")
    pairs = spark.read.parquet(f"{args.out}/dup_pairs")

    # near-dup clusters: component = min doc_id of each Jaccard cluster;
    # final keep = gate verdict AND cluster representative
    from medical_ocr_pipeline_spark.operators.components import (
        dedup_keep_representatives,
    )

    curated = dedup_keep_representatives(curate_documents(docs), pairs)
    # gate-passing docs that lose the cluster-representative race get a
    # distinct reason so metrics counts reconcile with RESULT kept/dropped
    # (ADVICE r01: 'keep'-reason count used to exceed kept)
    curated = curated.withColumn(
        "reason",
        F.when(
            F.col("keep") & ~F.col("is_representative"), F.lit("near_dup")
        ).otherwise(F.col("reason")),
    ).withColumn("keep", F.col("keep") & F.col("is_representative"))
    write_stage(curated, f"{args.out}/docs_curated")
    curated = spark.read.parquet(f"{args.out}/docs_curated")

    metrics = (
        curated.groupBy("reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_words"), 4).alias("avg_words"),
        )
        .withColumn("run_id", F.lit(args.run_id))
        .withColumn("ts", F.current_timestamp())
    )
    write_stage(metrics, f"{args.out}/metrics", mode="append")

    n = curated.count()
    kept = curated.where("keep").count()
    n_pairs = spark.read.parquet(f"{args.out}/dup_pairs").count()
    dt = time.time() - t0
    print(
        f"RESULT docs={n} kept={kept} dropped={n - kept} "
        f"dup_pairs={n_pairs} secs={dt:.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
