"""Extraction-path queries for the driver registry.

The per-turn extraction pipeline is not SQL-expressible (difflib
similarity, greedy per-turn dedup), so these entries are rows-only driver
checks; their real correctness gate is the golden-oracle parity suite in
tests/test_pipeline_parity.py (per-turn text equality under stable turn
ordering at local[8] == local[32]).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.pipeline import conversation_text, extract_transcripts
from medical_ocr_pipeline_spark.queries.base import load, register
from medical_ocr_pipeline_spark.synth import spark_transcripts

FLAGSHIP_CONVS = 120


@register("extract_turns")
def extract_turns(spark, sf_dir):
    """Flagship: per-turn main-content extraction over the deterministic
    transcripts table, in stable turn order."""
    df = spark_transcripts(spark, FLAGSHIP_CONVS, partitions=16)
    return (
        extract_transcripts(df)
        .select(
            "conv_id", "turn_idx", "text_final", "n_blocks",
            F.round("mean_conf", 4).alias("mean_conf"),
            "bytes_stripped", "parse_failures", "variant",
        )
        .orderBy("conv_id", "turn_idx")
    )


@register("extract_conversations")
def extract_conversations(spark, sf_dir):
    """Skew-safe ordered conversation assembly on top of extract_turns.
    bucket_size is pinned (not auto): the auto probe is an action over
    its input, which HERE is the un-materialized extraction UDF — the
    probe would execute the whole extraction once just to pick a regime
    (job.py probes the written stage parquet instead, one cheap column
    scan)."""
    df = spark_transcripts(spark, FLAGSHIP_CONVS, partitions=16)
    return (
        conversation_text(extract_transcripts(df), bucket_size=64)
        .select("conv_id", F.length("conv_text").alias("conv_chars"), "n_turns")
        .orderBy("conv_id")
    )


@register("extract_documents")
def extract_documents(spark, sf_dir):
    """Extraction pipeline applied to the driver documents table (text
    payloads treated as turns of synthetic single-turn conversations)."""
    docs = load(spark, sf_dir, "documents")
    transcripts = docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
    )
    return (
        extract_transcripts(transcripts)
        .select(
            "conv_id", "n_blocks",
            F.round("mean_conf", 4).alias("mean_conf"),
            "bytes_stripped", "parse_failures",
        )
        .orderBy("conv_id")
    )


@register("catalyst_regroup_lines")
def catalyst_regroup_lines_query(spark, sf_dir):
    """A1/A2 as pure Catalyst windows over an exploded cluster-wide blocks
    table (operators/sessionize.py), equivalence-tested against the
    in-batch core in tests/test_sessionize_catalyst.py.  Rows-only.
    The explode goes through pipeline.explode_blocks (the canonical
    exploded form) so a BLOCK schema change has one place to land."""
    from medical_ocr_pipeline_spark.operators.sessionize import (
        regroup_lines_catalyst,
    )
    from medical_ocr_pipeline_spark.pipeline import (
        explode_blocks,
        extract_blocks_table,
    )

    tr = spark_transcripts(spark, 60, partitions=8)
    blocks = explode_blocks(extract_blocks_table(tr)).select(
        "conv_id", "turn_idx", "text", "confidence",
        F.col("bbox")[0].alias("x0"),
        F.col("bbox")[1].alias("y0"),
        F.col("bbox")[2].alias("x1"),
        F.col("bbox")[3].alias("y1"),
        "source",
    )
    return (
        regroup_lines_catalyst(blocks)
        .select(
            "conv_id", "turn_idx", "para_id", "text",
            F.round("confidence", 4).alias("confidence"),
        )
        .orderBy("conv_id", "turn_idx", "para_id")
    )


@register("ensemble_engine_metrics")
def ensemble_engine_metrics(spark, sf_dir):
    """K-way parallel engine ensemble (U1/S3 full form, reference
    merge_ensemble 01_extract_blocks cell 4:388-400,430-450): every
    healthy extractor family runs over the SAME payload; this query
    returns the per-engine A5-style traceability metrics with the J8
    argmax is_best flag, plus the merged turn's block count and variant
    tag.  Rows-only (difflib dedup inside the merge); exact union/dedup
    semantics are golden-pinned in tests/test_ensemble.py.

    Shares the job surface's exact core (job.py --ensemble):
    extract_transcripts(ensemble=True, with_engine_metrics=True) emits
    the engines array in the same Arrow pass as the merged turn, and
    engine_metrics_table explodes it — so the driver row checks the
    code path spark-submit runs, not a query-local twin."""
    from medical_ocr_pipeline_spark.pipeline import engine_metrics_table

    df = spark_transcripts(spark, 40, partitions=8)
    ext = extract_transcripts(df, ensemble=True, with_engine_metrics=True)
    return (
        engine_metrics_table(ext)
        .withColumn("mean_conf", F.round("mean_conf", 4))
        .orderBy("conv_id", "turn_idx", "engine")
    )
