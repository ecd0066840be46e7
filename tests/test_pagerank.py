"""PageRank operator: closed-form fixed points, a sequential-reference
cross-check (same math, plain python), dangling-mass handling, and the
sum-to-one invariant."""

from __future__ import annotations

from pyspark.sql import Row


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs])


def _python_pagerank(pairs, n_iters=10, damping=0.85):
    verts = sorted({v for p in pairs for v in p})
    n = len(verts)
    out = {}
    for a, _ in pairs:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in verts}
    for _ in range(n_iters):
        dangling = sum(r for v, r in rank.items() if v not in out)
        inflow = {v: 0.0 for v in verts}
        for a, b in pairs:
            inflow[b] += rank[a] / out[a]
        base = (1.0 - damping) / n + damping * dangling / n
        rank = {v: base + damping * inflow[v] for v in verts}
    return rank


def test_cycle_is_uniform_fixed_point(spark):
    from medical_ocr_pipeline_spark.operators.pagerank import pagerank

    got = {r.vertex: r.rank for r in
           pagerank(_edges(spark, [(1, 2), (2, 1)]), n_iters=5).collect()}
    assert abs(got[1] - 0.5) < 1e-12 and abs(got[2] - 0.5) < 1e-12


def test_triangle_is_uniform_fixed_point(spark):
    from medical_ocr_pipeline_spark.operators.pagerank import pagerank

    got = {r.vertex: r.rank for r in
           pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]),
                    n_iters=5).collect()}
    for v in (1, 2, 3):
        assert abs(got[v] - 1 / 3) < 1e-12


def test_matches_sequential_reference_with_dangling(spark):
    """Star + chain with a dangling sink: the distributed iteration
    must match the identical sequential math to float noise."""
    from medical_ocr_pipeline_spark.operators.pagerank import pagerank

    pairs = [(1, 4), (2, 4), (3, 4), (4, 5), (5, 6), (1, 2)]  # 6 dangling
    want = _python_pagerank(pairs)
    got = {r.vertex: r.rank for r in
           pagerank(_edges(spark, pairs)).collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub everyone cites outranks every leaf
    assert got[4] > got[1] and got[4] > got[2] and got[4] > got[3]


def test_host_pagerank_smoke(spark):
    from medical_ocr_pipeline_spark.queries.webcur import host_pagerank

    rows = host_pagerank(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 1
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-6
    assert rows == sorted(rows, key=lambda r: (-r.rank, r.host))
