"""job.py --ensemble stage parity: the spark-submit ensemble surface
(extract_transcripts(ensemble=True, with_engine_metrics=True) +
engine_metrics_table) must match per-turn extract_turn_ensemble exactly
— same merged text under stable turn ordering, same per-engine metrics,
one is_best argmax per turn with contributing engines.

Reference analogue: the Prefect flow runs the ensemble as THE pipeline
(prefect_pipeline.py:157-233); this pins our job surface to the same
execution shape end-to-end.
"""

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.core.ensemble import extract_turn_ensemble
from medical_ocr_pipeline_spark.pipeline import (
    engine_metrics_table,
    extract_transcripts,
)
from medical_ocr_pipeline_spark.synth import spark_transcripts

N_CONVS = 30


def _ensemble_frame(spark):
    df = spark_transcripts(spark, N_CONVS, partitions=8)
    return df, extract_transcripts(df, ensemble=True, with_engine_metrics=True)


def test_stage_matches_extract_turn_ensemble_per_turn(spark):
    """Per-turn text equality under stable turn ordering: the job stage
    vs driver-side extract_turn_ensemble on the same payloads."""
    df, ext = _ensemble_frame(spark)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text_final"], r["variant"], r["n_blocks"])
        for r in ext.collect()
    }
    payloads = df.select("conv_id", "turn_idx", "text").collect()
    assert len(got) == len(payloads)
    for r in payloads:
        res, _ = extract_turn_ensemble(r["text"])
        assert got[(r["conv_id"], r["turn_idx"])] == (
            res.text_final, res.variant, res.n_blocks,
        ), f"turn {(r['conv_id'], r['turn_idx'])} diverged"


def test_engine_metrics_match_core(spark):
    """The exploded 01_engine_metrics stage rows equal the metric dicts
    merge_ensemble returns for every turn/engine."""
    df, ext = _ensemble_frame(spark)
    got = {
        (r["conv_id"], r["turn_idx"], r["engine"]): r
        for r in engine_metrics_table(ext).collect()
    }
    n_rows = 0
    for r in df.select("conv_id", "turn_idx", "text").collect():
        res, metrics = extract_turn_ensemble(r["text"])
        for m in metrics:
            n_rows += 1
            row = got[(r["conv_id"], r["turn_idx"], m["engine"])]
            assert (
                row["n_blocks"], row["n_chars"], row["n_chars_kept"],
                row["gated_out"], row["is_best"],
            ) == (
                m["n_blocks"], m["n_chars"], m["n_chars_kept"],
                m["gated_out"], m["is_best"],
            )
            assert abs(row["mean_conf"] - m["mean_conf"]) < 1e-12
            assert (row["merged_blocks"], row["variant"]) == (
                res.n_blocks, res.variant,
            )
    assert n_rows == len(got)


def test_is_best_argmax_invariants(spark):
    """Every turn with a contributing engine has exactly one is_best row,
    and it is never a gated-out engine; kept chars never exceed raw."""
    _, ext = _ensemble_frame(spark)
    m = engine_metrics_table(ext).persist()
    try:
        bad = m.where("is_best and gated_out").count()
        assert bad == 0
        over = m.where("n_chars_kept > n_chars").count()
        assert over == 0
        per_turn = (
            m.groupBy("conv_id", "turn_idx")
            .agg(
                F.sum(F.col("is_best").cast("int")).alias("n_best"),
                F.max(F.col("n_blocks") * (1 - F.col("gated_out").cast("int")))
                .alias("max_live_blocks"),
            )
        )
        assert per_turn.where(
            "(max_live_blocks > 0 and n_best != 1)"
            " or (max_live_blocks = 0 and n_best != 0)"
        ).count() == 0
    finally:
        m.unpersist()


def test_engines_column_gated_behind_flag(spark):
    """with_engine_metrics without ensemble is a contract error, and the
    default path's schema is unchanged (no engines column)."""
    import pytest

    df = spark_transcripts(spark, 2, partitions=2)
    with pytest.raises(ValueError, match="requires ensemble"):
        extract_transcripts(df, with_engine_metrics=True)
    assert "engines" not in extract_transcripts(df).columns
