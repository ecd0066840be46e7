"""operators/kcore.py vs a pure-Python synchronous peel: cascade
removal, clique survival, full peel of sparse graphs, multi-edge /
direction insensitivity, and partition-count invariance."""

from collections import defaultdict

from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.kcore import kcore


def _frame(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _py_kcore(pairs, k, rounds=16):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for _ in range(rounds):
        doomed = {v for v, ns in adj.items() if len(ns) < k}
        if not doomed:
            break
        for v in doomed:
            adj.pop(v)
        for v in adj:
            adj[v] -= doomed
        # removing neighbours can orphan a vertex entirely
        adj = defaultdict(set, {v: ns for v, ns in adj.items() if ns})
    return {v: len(ns) for v, ns in adj.items() if ns}


def _got(spark, pairs, k):
    return {
        r.vertex: r.core_deg
        for r in kcore(_frame(spark, pairs), k=k).collect()
    }


def test_triangle_with_tail_peels_tail(spark):
    # triangle 1-2-3 plus tail 3-4-5: 2-core = the triangle
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _got(spark, pairs, 2) == {1: 2, 2: 2, 3: 2}


def test_cascade_removal(spark):
    # 4 has degree 2 only via the tail chain; peeling 5 drops 4 too
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3)]
    # 3-4-5 form a second triangle with 3 -> everything is in the 2-core
    assert _got(spark, pairs, 2) == {1: 2, 2: 2, 3: 4, 4: 2, 5: 2}
    # but the 3-core is empty: max degree in any peel round's survivor
    # set never reaches 3 for all members
    assert _got(spark, pairs, 3) == {}


def test_clique_survives_its_own_k(spark):
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert _got(spark, k5, 4) == {i: 4 for i in range(5)}
    assert _got(spark, k5, 5) == {}


def test_chain_fully_peels(spark):
    pairs = [(i, i + 1) for i in range(8)]
    assert _got(spark, pairs, 2) == {}


def test_multiedges_and_direction_do_not_inflate_degree(spark):
    # duplicated + reversed edges of a path must still fully peel at k=2
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)]
    assert _got(spark, pairs, 2) == {}


def test_matches_python_reference_on_random_graph(spark):
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    pairs = [(h(f"a{i}") % 40, h(f"b{i}") % 40) for i in range(300)]
    pairs = [(a, b) for a, b in pairs if a != b]
    for k in (3, 8, 12):
        assert _got(spark, pairs, k) == _py_kcore(pairs, k)


def test_partition_count_invariance(spark):
    pairs = [(i % 17, (i * 7 + 3) % 17) for i in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    base = _got(spark, pairs, 4)
    df = _frame(spark, pairs)
    for n_parts in (1, 7):
        got = {
            r.vertex: r.core_deg
            for r in kcore(df.repartition(n_parts), k=4).collect()
        }
        assert got == base
