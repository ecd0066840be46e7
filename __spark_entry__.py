"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship per-turn extraction over sf0.001 documents +
                 deterministic synthetic transcripts.
queries()      — one entry per implemented operator family from
                 SURVEY.md §2 (see medical_ocr_pipeline_spark/queries/).
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible query;
                 extraction-path entries are rows-only (their gate is the
                 golden-oracle parity pytest suite).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medical_ocr_pipeline_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-turn main-content
    extraction over the documents payloads (loaded from the testdata
    parquet), plus the deterministic synthetic transcripts — the M1 spine
    (parse -> regroup -> dedup -> normalize -> cleanup -> segment ->
    materialize) in stable turn order."""
    sf_dir = "/root/testdata/sf0.001"
    docs = REGISTRY["extract_documents"].fn(spark, sf_dir)
    turns = REGISTRY["extract_turns"].fn(spark, sf_dir)
    return turns.select(
        "conv_id", "turn_idx", "n_blocks", "mean_conf",
        "bytes_stripped", "parse_failures",
    ).unionByName(
        docs.withColumn("turn_idx", F.lit(0)).select(
            "conv_id", "turn_idx", "n_blocks", "mean_conf",
            "bytes_stripped", "parse_failures",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None
    }
