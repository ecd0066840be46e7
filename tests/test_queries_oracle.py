"""Every registered query with an oracle must match DuckDB at sf0.001
(the driver runs the same comparison at sf0.01)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from medical_ocr_pipeline_spark.queries import REGISTRY  # noqa: E402
from scripts.check_oracle import TABLES, dtype_kinds, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.sql is not None)
ROWS_ONLY = sorted(
    n for n, s in REGISTRY.items()
    if s.sql is None and not n.startswith("extract_")
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    got = spec.fn(spark, SF_DIR).toPandas()
    want = duck.execute(spec.sql).df()
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert sorted(got.columns) == sorted(want.columns)
    gk, wk = dtype_kinds(got), dtype_kinds(want)
    mism = {c: (gk[c], wk[c]) for c in gk if gk[c] != wk[c]}
    assert not mism, f"{name}: dtype kinds differ (driver hash is type-aware): {mism}"
    assert value_hash(got) == value_hash(want), f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    got = REGISTRY[name].fn(spark, SF_DIR)
    assert got.count() > 0


def test_percentile_approx_within_tolerance(spark):
    """The 100 TB path swaps exact percentile for percentile_approx;
    assert the approximation stays within 2% relative error of the exact
    interpolated value on the driver events table."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("exact"),
            F.expr("percentile_approx(value, 0.5, 10000)").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= 0.02 * max(1.0, abs(r.exact)), r


def test_approx_count_distinct_within_tolerance(spark):
    """The 100 TB path uses approx_count_distinct (HLL++) where exact
    distinct counts don't fit; assert <=5% relative error vs exact."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r = docs.agg(
        F.countDistinct("text").alias("exact"),
        F.approx_count_distinct("text", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact), r
