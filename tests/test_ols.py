"""ols_chars_vs_words vs numpy polyfit / corrcoef on the same data."""

import math
import re

import duckdb
import numpy as np

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from tests.conftest import SF_DIR

WORD_SPLIT = re.compile("[^a-z0-9]+")


def test_ols_matches_numpy(spark):
    rows = duckdb.sql(
        f"SELECT lang, text, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    groups: dict[str, list] = {}
    for lang, text, n_chars in rows:
        x = len([w for w in WORD_SPLIT.split((text or "").lower()) if w])
        groups.setdefault(lang, []).append((x, int(n_chars)))
    got = {
        r["lang"]: r.asDict()
        for r in REGISTRY["ols_chars_vs_words"].fn(spark, SF_DIR).collect()
    }
    for lang, pts in groups.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        if xs.var() == 0 or ys.var() == 0:
            assert lang not in got
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        r2 = np.corrcoef(xs, ys)[0, 1] ** 2
        row = got[lang]
        assert row["n"] == len(pts)
        # closed-form integer-sum OLS vs numpy least squares: agree to
        # within one ppm-floor step
        assert abs(row["slope_ppm"] - math.floor(slope * 1e6)) <= 1
        assert abs(row["intercept_e6"] - math.floor(intercept * 1e6)) <= 1
        assert abs(row["r2_ppm"] - math.floor(r2 * 1e6)) <= 1
        assert 0 <= row["r2_ppm"] <= 1_000_000
