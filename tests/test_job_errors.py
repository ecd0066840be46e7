"""Job error paths: bad input must fail fast with the standard Spark
error, not a stack of secondary failures."""

import pytest
from pyspark.errors import AnalysisException


def test_job_missing_input_raises_analysis_exception(spark, tmp_path):
    from medical_ocr_pipeline_spark import job

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        job.main([
            "--input", "/nonexistent/transcripts",
            "--out", str(tmp_path / "out"),
            "--master", "local[2]",
        ])
