"""operators/textrank.py vs closed forms and a sequential python
reference: uniform ranks on regular graphs, mass conservation, weight
sensitivity, and partition-count invariance."""

import pytest
from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.textrank import textrank


def _sym_frame(spark, pairs_w):
    """pairs_w: undirected (a, b, w) — emitted in both directions."""
    rows = []
    for a, b, w in pairs_w:
        rows.append(Row(src=a, dst=b, w=w))
        rows.append(Row(src=b, dst=a, w=w))
    return spark.createDataFrame(rows)


def _py_textrank(pairs_w, n_iters=10, d=0.85):
    adj = {}
    for a, b, w in pairs_w:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    verts = sorted(adj)
    n = len(verts)
    r = {v: 1.0 / n for v in verts}
    for _ in range(n_iters):
        nxt = {}
        for v in verts:
            inflow = sum(
                r[u] * w / sum(adj[u].values()) for u, w in adj[v].items()
            )
            nxt[v] = (1.0 - d) / n + d * inflow
        r = nxt
    return r


def test_regular_graph_is_uniform(spark):
    # unweighted 4-cycle: symmetry forces uniform ranks = 1/4
    pairs = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 1, 1)]
    got = {r.vertex: r.rank for r in textrank(_sym_frame(spark, pairs)).collect()}
    for v in (1, 2, 3, 4):
        assert got[v] == pytest.approx(0.25, abs=1e-12)


def test_mass_conserved(spark):
    pairs = [(1, 2, 3), (2, 3, 1), (1, 3, 2), (3, 4, 5)]
    got = [r.rank for r in textrank(_sym_frame(spark, pairs)).collect()]
    assert sum(got) == pytest.approx(1.0, abs=1e-9)


def test_weights_shift_rank(spark):
    # star with one heavy spoke: the heavy leaf outranks light leaves
    pairs = [(0, 1, 10), (0, 2, 1), (0, 3, 1)]
    got = {r.vertex: r.rank for r in textrank(_sym_frame(spark, pairs)).collect()}
    assert got[1] > got[2] == pytest.approx(got[3], abs=1e-12)
    assert got[0] > got[1]  # hub dominates


def test_matches_sequential_reference(spark):
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    pairs = []
    seen = set()
    for i in range(60):
        a, b = h(f"a{i}") % 12, h(f"b{i}") % 12
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            pairs.append((min(a, b), max(a, b), 1 + h(f"w{i}") % 5))
    got = {r.vertex: r.rank for r in textrank(_sym_frame(spark, pairs)).collect()}
    ref = _py_textrank(pairs)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-10)


def test_partition_count_invariance(spark):
    pairs = [(i, (i * 3 + 1) % 9, 1 + i % 4) for i in range(9)]
    pairs = [(a, b, w) for a, b, w in pairs if a != b]
    df = _sym_frame(spark, pairs)
    base = {
        r.vertex: round(r.rank, 8) for r in textrank(df).collect()
    }
    for n_parts in (1, 5):
        got = {
            r.vertex: round(r.rank, 8)
            for r in textrank(df.repartition(n_parts)).collect()
        }
        assert got == base
