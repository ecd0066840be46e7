"""operators/lpa.py vs planted communities and a sequential pure-Python
synchronous LPA with the same min-label tie-break."""

from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.lpa import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _python_lpa(pairs, n_iters=5):
    """Sequential reference: synchronous rounds, undirected weights with
    multiplicity, argmax by (weight desc, label asc)."""
    w = {}
    for a, b in pairs:
        if a == b:
            continue
        w[(a, b)] = w.get((a, b), 0) + 1
        w[(b, a)] = w.get((b, a), 0) + 1
    verts = sorted({v for e in w for v in e})
    lab = {v: v for v in verts}
    for _ in range(n_iters):
        nxt = {}
        for v in verts:
            support = {}
            for (s, d), wt in w.items():
                if d == v:
                    support[lab[s]] = support.get(lab[s], 0) + wt
            nxt[v] = min(support, key=lambda L: (-support[L], L))
        lab = nxt
    return lab


def _run(spark, pairs, n_iters=5):
    return {
        r.vertex: r.label
        for r in label_propagation(_edges(spark, pairs), n_iters).collect()
    }


def test_two_planted_cliques_with_a_bridge(spark):
    # two 4-cliques joined by one bridge edge: LPA must find exactly
    # the two cliques; the single bridge edge can't flip anyone (3
    # intra-clique votes vs 1 cross votes)
    c1 = ["a1", "a2", "a3", "a4"]
    c2 = ["b1", "b2", "b3", "b4"]
    pairs = [(x, y) for c in (c1, c2) for x in c for y in c if x < y]
    pairs.append(("a1", "b1"))
    lab = _run(spark, pairs)
    assert len({lab[v] for v in c1}) == 1
    assert len({lab[v] for v in c2}) == 1
    assert lab["a1"] != lab["b1"]
    # min-label convention: each community converges to its smallest id
    assert lab["a1"] == "a1"
    assert lab["b1"] == "b1"


def test_edge_multiplicity_outweighs_single_edges(spark):
    # v is linked once to each of the x-clique but 3x to y: the
    # weighted argmax must side with y's label
    pairs = [("x1", "x2"), ("v", "x1"), ("v", "x2")]
    pairs += [("v", "y")] * 3
    lab = _run(spark, pairs, n_iters=1)
    # after one synchronous round v sees {x-labels: 1+1, y: 3}
    assert lab["v"] == "y"


def test_matches_sequential_reference_on_random_graph(spark):
    # deterministic pseudo-random multigraph, incl. parallel edges
    pairs = []
    x = 7
    for _ in range(60):
        x = (x * 1103515245 + 12345) % (2**31)
        a = f"v{x % 11}"
        x = (x * 1103515245 + 12345) % (2**31)
        b = f"v{x % 11}"
        pairs.append((a, b))
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(spark, pairs, n_iters=5) == _python_lpa(pairs, n_iters=5)


def test_partition_count_invariance(spark):
    # same graph through 1 and 8 input partitions: identical labels
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
             ("f", "d"), ("c", "d")]
    e1 = _edges(spark, pairs).repartition(1)
    e8 = _edges(spark, pairs).repartition(8)
    r1 = {r.vertex: r.label for r in label_propagation(e1).collect()}
    r8 = {r.vertex: r.label for r in label_propagation(e8).collect()}
    assert r1 == r8 == _python_lpa(pairs)


def test_self_loops_ignored(spark):
    # a 2-vertex graph oscillates under synchronous LPA (the known
    # bipartite limitation); the point here is that the self-loop
    # contributes no support and both engines agree at every horizon
    pairs = [("a", "a"), ("a", "b")]
    for n in (1, 2):
        assert _run(spark, pairs, n_iters=n) == _python_lpa(pairs, n)
