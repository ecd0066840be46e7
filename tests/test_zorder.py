"""zorder_layout: the Morton fold vs a pure-Python bit interleave, and
the layout claim itself — Z-order buckets must have a smaller mean 2-D
envelope area than natural insert order."""

from datetime import date

import duckdb

from medical_ocr_pipeline_spark.queries.base import REGISTRY
from medical_ocr_pipeline_spark.queries.relational import (
    ZORDER_BUCKETS,
    _Z_BITS,
)
from tests.conftest import SF_DIR


def _morton(x: int, y: int) -> int:
    out = 0
    for i in range(_Z_BITS):
        out += ((x >> i) & 1) << (2 * i)
        out += ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_layout_matches_python_reference(spark):
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_custkey, o_orderdate "
        f"FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    epoch = date(1970, 1, 1)
    pts = [
        (k, c & 65535, (d.date() - epoch).days & 65535)
        for k, c, d in rows
    ]
    n = len(pts)
    want = {}
    for layout, order in (
        ("natural", sorted(pts, key=lambda p: p[0])),
        ("zorder", sorted(pts, key=lambda p: (_morton(p[1], p[2]), p[0]))),
    ):
        for rn, (_, x, y) in enumerate(order):
            b = rn * ZORDER_BUCKETS // n
            key = (layout, b)
            if key not in want:
                want[key] = [0, x, x, y, y]
            w = want[key]
            w[0] += 1
            w[1], w[2] = min(w[1], x), max(w[2], x)
            w[3], w[4] = min(w[3], y), max(w[4], y)
    got = {
        (r["layout"], r["bucket"]): r.asDict()
        for r in REGISTRY["zorder_layout"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for key, (c, xlo, xhi, ylo, yhi) in want.items():
        row = got[key]
        assert (
            row["n_rows"], row["x_lo"], row["x_hi"],
            row["y_lo"], row["y_hi"],
        ) == (c, xlo, xhi, ylo, yhi), key
        assert row["envelope_area"] == (xhi - xlo + 1) * (yhi - ylo + 1)


def test_zorder_shrinks_mean_envelope_area(spark):
    rows = REGISTRY["zorder_layout"].fn(spark, SF_DIR).collect()
    area = {"natural": [], "zorder": []}
    for r in rows:
        area[r["layout"]].append(r["envelope_area"])
    assert len(area["zorder"]) == ZORDER_BUCKETS
    mean_z = sum(area["zorder"]) / len(area["zorder"])
    mean_n = sum(area["natural"]) / len(area["natural"])
    assert mean_z < mean_n, (mean_z, mean_n)
