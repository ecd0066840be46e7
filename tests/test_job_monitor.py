"""job_monitor.py consistency gate: every stage the job writes must be
row-identical to the oracle-checked registry query over the same input
(the shared-core discipline of test_job_corpus / test_job_training)."""

import argparse

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    from medical_ocr_pipeline_spark.job_monitor import run_monitors

    out = str(tmp_path_factory.mktemp("monitor"))
    args = argparse.Namespace(
        input=f"{SF}/documents.parquet",
        out=out,
        run_id="t",
        resume=False,
    )
    run_monitors(spark, args, out)
    return out


@pytest.mark.parametrize(
    "stage,query",
    [
        ("monitor_corr", "corr_doc_stats"),
        ("monitor_chi2", "chi2_lang_source"),
        ("monitor_gini", "gini_doc_lengths"),
        ("monitor_diversity", "source_diversity"),
        ("monitor_drift", "split_token_drift"),
        ("monitor_oov", "oov_rate"),
        ("monitor_quantiles", "split_length_quantiles"),
        ("monitor_head_coverage", "token_head_coverage"),
        ("monitor_ks", "ks_split_drift"),
        ("monitor_mw", "mannwhitney_split"),
        ("eval_sample", "sample_fixed_k"),
    ],
)
def test_stage_equals_registry_query(spark, run_dir, stage, query):
    from medical_ocr_pipeline_spark.queries import REGISTRY

    got = sorted(
        map(tuple, spark.read.parquet(f"{run_dir}/{stage}").collect())
    )
    want = sorted(map(tuple, REGISTRY[query].fn(spark, SF).collect()))
    assert got == want


def test_metrics_row_reconciles_with_stages(spark, run_dir):
    from pyspark.sql import functions as F

    m = spark.read.parquet(f"{run_dir}/metrics").collect()
    assert len(m) == 1
    row = m[0]
    chi2 = spark.read.parquet(f"{run_dir}/monitor_chi2")
    assert row.chi2_cells == chi2.count()
    assert (
        row.chi2_total_ppm
        == chi2.agg(F.sum("contrib_ppm")).collect()[0][0]
    )
    drift = spark.read.parquet(f"{run_dir}/monitor_drift")
    assert (
        row.max_drift_ppb
        == drift.agg(F.max("contrib_ppb")).collect()[0][0]
    )
    ks = spark.read.parquet(f"{run_dir}/monitor_ks")
    assert row.max_ks_ppm == ks.agg(F.max("ks_ppm")).collect()[0][0]
    assert row.n_sampled == spark.read.parquet(
        f"{run_dir}/eval_sample"
    ).count()


def test_resume_skips_complete_stages(spark, run_dir, capsys):
    from medical_ocr_pipeline_spark.job_monitor import run_monitors

    args = argparse.Namespace(
        input=f"{SF}/documents.parquet",
        out=run_dir,
        run_id="t2",
        resume=True,
    )
    run_monitors(spark, args, run_dir)
    out = capsys.readouterr().out
    assert out.count("resumed") == 11
    # metrics appends: now two run rows
    assert spark.read.parquet(f"{run_dir}/metrics").count() == 2
