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
    semantics are golden-pinned in tests/test_ensemble.py."""
    import pandas as pd

    from pyspark.sql import types as T

    from medical_ocr_pipeline_spark.core.ensemble import extract_turn_ensemble

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("engine", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_chars_kept", T.LongType()),
        T.StructField("mean_conf", T.DoubleType()),
        T.StructField("gated_out", T.BooleanType()),
        T.StructField("is_best", T.BooleanType()),
        T.StructField("merged_blocks", T.IntegerType()),
        T.StructField("variant", T.StringType()),
    ])

    def run(pdfs):
        for pdf in pdfs:
            rows = []
            for conv_id, turn_idx, payload in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                res, metrics = extract_turn_ensemble(payload)
                for m in metrics:
                    rows.append((
                        conv_id, int(turn_idx), m["engine"], m["n_blocks"],
                        m["n_chars"], m["n_chars_kept"],
                        round(m["mean_conf"], 4),
                        m["gated_out"], m["is_best"], res.n_blocks,
                        res.variant,
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    df = spark_transcripts(spark, 40, partitions=8)
    return (
        df.select("conv_id", "turn_idx", "text")
        .mapInPandas(run, schema=schema)
        .orderBy("conv_id", "turn_idx", "engine")
    )
