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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medical_ocr_pipeline_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["extract_turns"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None
    }
