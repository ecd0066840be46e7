"""dq_profile vs pure-Python recomputation of every metric and
expectation over the same parquet, plus single-job plan shape."""

import re
from datetime import date

import duckdb

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from medical_ocr_pipeline_spark.queries.dq import _DMAX, _DMIN
from tests.conftest import SF_DIR


def _rows():
    return duckdb.sql(
        f"SELECT * FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()


def test_dq_profile_matches_python_reference(spark):
    rows = _rows()
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    data = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    got = {
        r["col_name"]: r.asDict()
        for r in REGISTRY["dq_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(cols)
    n = len(rows)
    epoch = date(1970, 1, 1)

    def enc(c, v):
        if c in ("o_orderkey", "o_custkey"):
            return v
        if c == "o_totalprice":
            import math

            return math.floor(v * 100)
        if c == "o_orderdate":
            return (v.date() - epoch).days
        return None

    for c in cols:
        vals = data[c]
        nn = [v for v in vals if v is not None]
        row = got[c]
        assert row["n_rows"] == n
        assert row["n_null"] == n - len(nn)
        assert row["n_distinct"] == len(set(nn))
        if c in ("o_orderstatus", "o_orderpriority"):
            assert row["min_s"] == min(nn) and row["max_s"] == max(nn)
            assert row["min_i64"] is None
        else:
            e = [enc(c, v) for v in nn]
            assert row["min_i64"] == min(e) and row["max_i64"] == max(e)
            assert row["min_s"] is None
        if c == "o_orderkey":
            viol = (n - len(set(nn))) + (n - len(nn))
        elif c == "o_custkey":
            viol = n - len(nn)
        elif c == "o_orderstatus":
            viol = sum(1 for v in vals if v not in ("F", "O", "P"))
        elif c == "o_totalprice":
            viol = sum(1 for v in vals if v is None or v < 0)
        elif c == "o_orderdate":
            viol = sum(
                1
                for v in vals
                if v is None or not (_DMIN <= enc(c, v) <= _DMAX)
            )
        else:
            viol = sum(
                1
                for v in vals
                if v is None or not re.match(r"^[1-5]-", v)
            )
        assert row["n_violations"] == viol, c
        assert row["passed"] == (viol == 0)


def test_dq_profile_is_single_aggregation_plan(spark):
    # one scan + aggregate; the per-column long form must be an explode
    # of the single aggregated row, not a union of per-column scans
    qe = REGISTRY["dq_profile"].fn(spark, SF_DIR)._jdf.queryExecution()
    physical = qe.executedPlan().toString()
    assert physical.count("Scan parquet") == 1, physical
    assert "explode" in physical.lower()
