"""Spark pipeline vs single-process golden oracle: per-turn text equality
under stable turn ordering (the north-rule invariant)."""

import pandas as pd
import pytest

from medical_ocr_pipeline_spark.oracle import GOLDEN_COLUMNS, golden_pandas
from medical_ocr_pipeline_spark.pipeline import (
    conversation_text,
    extract_transcripts,
    partition_metrics,
    repartition_by_conv,
)
from medical_ocr_pipeline_spark.synth import iter_turns, spark_transcripts, total_turns

N_CONVS = 30


@pytest.fixture(scope="module")
def golden():
    return golden_pandas(N_CONVS)


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark_transcripts(spark, N_CONVS, partitions=8)
    out = extract_transcripts(df).cache()
    out.count()
    yield out
    out.unpersist()


def test_generator_spark_matches_local(spark):
    got = (
        spark_transcripts(spark, N_CONVS, partitions=8)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = pd.DataFrame(
        sorted(iter_turns(N_CONVS), key=lambda r: (r[0], r[1])),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    got["ts"] = got["ts"].dt.tz_localize(None)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_per_turn_text_equality(extracted, golden):
    got = (
        extracted.select(*GOLDEN_COLUMNS)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_row_count(extracted):
    assert extracted.count() == total_turns(N_CONVS)


def test_equality_survives_salted_repartition(spark, golden):
    """Skewed-key splitting must not change per-turn results or ordering."""
    df = spark_transcripts(spark, N_CONVS, partitions=8)
    salted = repartition_by_conv(df, 16, salt_buckets=4)
    got = (
        extract_transcripts(salted)
        .select(*GOLDEN_COLUMNS)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_conversation_text_ordered(extracted, golden):
    """Two-phase skew-safe assembly == oracle-side ordered concat."""
    got = conversation_text(extracted, bucket_size=16).orderBy("conv_id").toPandas()
    want = (
        golden.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text_final"]
        .apply(lambda s: "\n\n".join(s))
    )
    assert list(got["conv_id"]) == list(want.index)
    assert list(got["conv_text"]) == list(want.values)


def test_partition_metrics_totals(extracted, golden):
    m = partition_metrics(extracted, run_id="t", stage="extract").toPandas()
    assert m["turns_processed"].sum() == len(golden)
    assert m["bytes_stripped"].sum() == golden["bytes_stripped"].sum()
    assert m["parse_failures"].sum() == golden["parse_failures"].sum()
    assert (m["run_id"] == "t").all()


def test_null_payloads_survive_extraction(spark):
    """Real transcript tables contain NULL text/tool and even NULL
    conv_id rows; the Arrow path must pass them through without raising:
    null text -> empty extraction (not a parse failure), null conv_id
    -> its own assembly group."""
    import datetime as dt

    from medical_ocr_pipeline_spark.pipeline import (
        conversation_text,
        extract_transcripts,
    )

    rows = [
        ("c1", 0, "user", None, None, dt.datetime(2026, 1, 1)),
        ("c1", 1, "assistant", "hello world", None, dt.datetime(2026, 1, 1)),
        (None, 2, "user", "orphan", None, dt.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r.turn_idx: r for r in extract_transcripts(df).collect()}
    assert got[0].text_final == "" and got[0].parse_failures == 0
    assert got[1].text_final == "hello world"
    assert got[2].conv_id is None
    convs = conversation_text(
        extract_transcripts(df), allow_unmaterialized=True
    ).collect()
    assert len(convs) == 2
