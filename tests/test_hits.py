"""operators/hits.py vs closed forms and a sequential pure-Python HITS."""

from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.hits import hits


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _python_hits(pairs, n_iters=8):
    verts = sorted({v for e in pairs for v in e})
    h = {v: 1.0 / len(verts) for v in verts}
    a = {}
    for _ in range(n_iters):
        a = {v: 0.0 for v in verts}
        for s, d in pairs:
            a[d] += h[s]
        na = sum(a.values())
        a = {v: x / na for v, x in a.items()}
        h = {v: 0.0 for v in verts}
        for s, d in pairs:
            h[s] += a[d]
        nh = sum(h.values())
        h = {v: x / nh for v, x in h.items()}
    return a, h


def test_star_center_is_the_authority(spark):
    # 1,2,3 all point at 4: 4 is the pure authority, 1-3 equal hubs
    pairs = [(1, 4), (2, 4), (3, 4)]
    rows = {r.vertex: r for r in hits(_edges(spark, pairs)).collect()}
    assert abs(rows[4].auth - 1.0) < 1e-12
    assert abs(rows[4].hub) < 1e-12
    for v in (1, 2, 3):
        assert abs(rows[v].auth) < 1e-12
        assert abs(rows[v].hub - 1.0 / 3) < 1e-12


def test_two_cycle_is_uniform(spark):
    pairs = [(1, 2), (2, 1)]
    rows = {r.vertex: r for r in hits(_edges(spark, pairs)).collect()}
    for v in (1, 2):
        assert abs(rows[v].auth - 0.5) < 1e-12
        assert abs(rows[v].hub - 0.5) < 1e-12


def test_matches_sequential_reference(spark):
    pairs = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4), (2, 5),
    ]
    want_a, want_h = _python_hits(pairs)
    rows = {r.vertex: r for r in hits(_edges(spark, pairs)).collect()}
    assert set(rows) == set(want_a)
    for v in want_a:
        assert abs(rows[v].auth - want_a[v]) < 1e-9, v
        assert abs(rows[v].hub - want_h[v]) < 1e-9, v
