"""iqr_outliers vs a pure-Python Tukey-fence recomputation."""

import math

import duckdb

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from medical_ocr_pipeline_spark.queries.relational import IQR_K_X10
from tests.conftest import SF_DIR


def test_iqr_outliers_matches_python_reference(spark):
    rows = duckdb.sql(
        f"SELECT event_type, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    groups: dict[str, list] = {}
    for t, v in rows:
        groups.setdefault(t, []).append(math.floor(v * 100))
    got = {
        r["event_type"]: r.asDict()
        for r in REGISTRY["iqr_outliers"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(groups)
    for t, vs in groups.items():
        vs.sort()
        n = len(vs)
        # smallest value whose 1-based rank crosses n/4 and 3n/4
        q1 = vs[(n + 3) // 4 - 1]
        q3 = vs[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        lo_x10, hi_x10 = 10 * q1 - IQR_K_X10 * iqr, 10 * q3 + IQR_K_X10 * iqr
        n_out = sum(1 for v in vs if 10 * v < lo_x10 or 10 * v > hi_x10)
        row = got[t]
        assert row["n"] == n
        assert row["q1_cents"] == q1
        assert row["q3_cents"] == q3
        assert row["iqr_cents"] == iqr
        assert row["n_outliers"] == n_out
