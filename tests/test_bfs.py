"""operators/bfs.py vs a pure-Python BFS: hop distances, early exit at
the fixpoint, the max_hops bound, and unreachable tagging."""

from collections import deque

import duckdb
from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.bfs import bfs_hops
from medical_ocr_pipeline_spark.queries.base import REGISTRY
from tests.conftest import SF_DIR


def _frame(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
    )


def _seed(spark, v):
    return spark.createDataFrame([Row(vertex=v)])


def test_path_graph_hops(spark):
    # directed path 1 -> 2 -> 3 -> 4
    edges = _frame(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r.vertex: r.hops
           for r in bfs_hops(edges, _seed(spark, 1)).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_max_hops_truncates(spark):
    edges = _frame(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r.vertex: r.hops
           for r in bfs_hops(edges, _seed(spark, 1), max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # vertex 4 not reached


def test_unreachable_component_absent(spark):
    edges = _frame(spark, [(1, 2), (3, 4)])
    got = {r.vertex: r.hops
           for r in bfs_hops(edges, _seed(spark, 1)).collect()}
    assert got == {1: 0, 2: 1}


def test_shortcut_keeps_min_distance(spark):
    # two routes to 4: 1-2-3-4 and 1-4 — BFS must report 1
    edges = _frame(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {r.vertex: r.hops
           for r in bfs_hops(edges, _seed(spark, 1)).collect()}
    assert got[4] == 1


def test_host_bfs_matches_python_reference(spark):
    from medical_ocr_pipeline_spark.queries.webcur import BFS_MAX_HOPS

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    src = {d: s for d, s in rows}
    n = len(rows)
    adj: dict[str, set] = {s: set() for s in src.values()}
    for d, s in rows:
        t = src[(d * 7 + 1) % n]
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    seed = min(adj)
    want = {v: -1 for v in adj}
    want[seed] = 0
    q = deque([seed])
    while q:
        v = q.popleft()
        if want[v] >= BFS_MAX_HOPS:
            continue
        for u in sorted(adj[v]):
            if want[u] == -1:
                want[u] = want[v] + 1
                q.append(u)
    got = {
        r["host"]: r["hops"]
        for r in REGISTRY["host_bfs_hops"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_multi_source_bfs_matches_per_seed_python(spark):
    from pyspark.sql import Row

    from medical_ocr_pipeline_spark.operators.bfs import (
        multi_source_bfs_hops,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 6)]
    bidir = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in bidir])
    seeds = spark.createDataFrame([Row(v=v) for v in [1, 2, 3, 4, 5, 6]])
    adj: dict[int, set] = {}
    for a, b in bidir:
        adj.setdefault(a, set()).add(b)
    want = {}
    for s in [1, 2, 3, 4, 5, 6]:
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in dist:
                        dist[u] = dist[v] + 1
                        nxt.append(u)
            frontier = nxt
        for v, d in dist.items():
            want[(s, v)] = d
    got = {
        (r.seed, r.vertex): r.hops
        for r in multi_source_bfs_hops(edges, seeds).collect()
    }
    assert got == want


def test_harmonic_centrality_matches_python_reference(spark):
    from collections import deque

    from medical_ocr_pipeline_spark.queries.webcur import BFS_MAX_HOPS

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    src = {d: s for d, s in rows}
    n = len(rows)
    adj: dict[str, set] = {s: set() for s in src.values()}
    for d, s in rows:
        t = src[(d * 7 + 1) % n]
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    want = {}
    for seed in adj:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            v = q.popleft()
            if dist[v] >= BFS_MAX_HOPS:
                continue
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        reached = [d for d in dist.values() if d > 0]
        want[seed] = (
            len(reached),
            sum(1_000_000 // d for d in reached),
        )
    got = {
        r["host"]: (r["n_reached"], r["harmonic_ppm"])
        for r in REGISTRY["host_harmonic_centrality"].fn(spark, SF_DIR)
        .collect()
    }
    assert got == want
