"""Skew handling: an extreme megaconversation (10k turns, dwarfing every
other conversation) must flow through salted repartition, extraction, and
two-phase ordered assembly without a straggler partition and with exact
ordering preserved."""

import pandas as pd
from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.pipeline import (
    conversation_text,
    extract_transcripts,
    repartition_by_conv,
)

MEGA_TURNS = 10_000
SMALL_CONVS = 40


def _skewed_frame(spark):
    mega = spark.range(MEGA_TURNS).select(
        F.lit("conv_mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("turn text payload number "), F.col("id")).alias("text"),
    )
    small = spark.range(SMALL_CONVS * 3).select(
        F.concat(F.lit("conv_s"), (F.col("id") % SMALL_CONVS)).alias("conv_id"),
        (F.col("id") / SMALL_CONVS).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("small conv text "), F.col("id")).alias("text"),
    )
    return mega.unionByName(small)


def test_salted_repartition_spreads_megaconv(spark):
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=8)
    sizes = (
        df.where(F.col("conv_id") == "conv_mega")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .toPandas()
    )
    # the megaconversation spans many partitions, none holding most of it
    assert len(sizes) >= 6
    assert sizes["count"].max() < MEGA_TURNS * 0.5


def test_unsalted_repartition_colocates(spark):
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=0)
    parts = (
        df.where(F.col("conv_id") == "conv_mega")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts == 1


def test_megaconv_assembly_exact_order(spark):
    """Two-phase assembly reproduces the exact turn order for a 10k-turn
    conversation even when the input is salted across partitions."""
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=8)
    extracted = extract_transcripts(df)
    conv = (
        conversation_text(extracted, bucket_size=128)
        .where(F.col("conv_id") == "conv_mega")
        .toPandas()
    )
    assert len(conv) == 1
    assert int(conv["n_turns"].iloc[0]) == MEGA_TURNS
    texts = conv["conv_text"].iloc[0].split("\n\n")
    assert len(texts) == MEGA_TURNS
    expected = [f"turn text payload number {i}" for i in range(MEGA_TURNS)]
    assert texts == expected


def test_extraction_row_count_under_skew(spark):
    df = repartition_by_conv(_skewed_frame(spark), 16, salt_buckets=8)
    got = extract_transcripts(df).groupBy("conv_id").count().toPandas()
    got = got.set_index("conv_id")["count"]
    assert got["conv_mega"] == MEGA_TURNS
    assert (got.drop("conv_mega") == 3).all()
