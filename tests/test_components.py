"""Connected components over near-dup pairs: Spark label propagation
must match a pure-python union-find on the same edges."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labels
    return {v: find(v) for v in parent}


def test_components_match_union_find(spark):
    from medical_ocr_pipeline_spark.operators.components import (
        connected_components,
    )
    from medical_ocr_pipeline_spark.queries.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b")
    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    assert edges, "fixture should contain near-dup pairs"
    want = _union_find(edges)
    got = {
        r.vertex: r.component
        for r in connected_components(
            pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        ).collect()
    }
    assert got == want


def test_components_synthetic_chain_and_clique(spark):
    """A 5-chain, a triangle, and an isolated edge: labels = min id."""
    from medical_ocr_pipeline_spark.operators.components import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (11, 12), (10, 12),
             (20, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_keep_representatives(spark):
    from medical_ocr_pipeline_spark.operators.components import (
        dedup_keep_representatives,
    )
    from medical_ocr_pipeline_spark.queries.dedup import dedup_ngram_jaccard

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b")
    out = dedup_keep_representatives(docs, pairs)
    n_docs = docs.count()
    assert out.count() == n_docs
    # every component keeps exactly one representative
    reps = out.where("is_representative")
    assert reps.select("component").distinct().count() == reps.count()
    # representative is the component min
    bad = (
        out.groupBy("component").agg(F.min("doc_id").alias("mn"))
        .join(reps.select(F.col("doc_id").alias("rep"), "component"), "component")
        .where("mn != rep")
    )
    assert bad.count() == 0


def test_long_chain_converges_via_pointer_jumping(spark):
    """A 300-hop chain (diameter far beyond the old 15-iteration plain
    propagation) must converge within the default cap: pointer jumping
    makes label distance shrink geometrically per round (ADVICE r01)."""
    from medical_ocr_pipeline_spark.operators.components import (
        connected_components,
    )

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = connected_components(edges).collect()
    assert len(got) == n + 1
    assert all(r.component == 0 for r in got)


def test_nonconvergence_raises_not_silent(spark):
    """With max_iter too small for the diameter, the operator must raise
    instead of returning wrong labels."""
    import pytest

    from medical_ocr_pipeline_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_convergence_on_final_round_does_not_raise(spark):
    """A graph whose labels converge exactly in the last allowed round
    must return correct labels, not raise (the post-loop check verifies
    the fixpoint instead of assuming non-convergence)."""
    from medical_ocr_pipeline_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = connected_components(edges, max_iter=1).collect()
    assert {r.vertex: r.component for r in got} == {0: 0, 1: 0, 2: 0}


def test_representative_is_min_gate_passing_member(spark):
    """A cluster whose min-id member fails the quality gate must still
    keep its best gate-passing member: the representative is min doc_id
    among keep=true members, not the global min."""
    from medical_ocr_pipeline_spark.operators.components import (
        dedup_keep_representatives,
    )

    docs = spark.createDataFrame(
        [(1, False), (2, True), (3, True), (9, True)],
        "doc_id long, keep boolean",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: (r.component, r.is_representative)
        for r in dedup_keep_representatives(docs, pairs).collect()
    }
    # cluster {1,2,3}: 1 fails the gate, so 2 represents it
    assert got[1] == (1, False)
    assert got[2] == (1, True)
    assert got[3] == (1, False)
    # unpaired doc represents itself
    assert got[9] == (9, True)


def test_reliable_checkpoint_dir_variant(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable
    checkpoints under the given directory (the cluster-safe form —
    localCheckpoint blocks die with their executor); results must be
    identical to the default local variant."""
    import os

    from medical_ocr_pipeline_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    ckpt = str(tmp_path / "ckpt")
    reliable = {
        (r["vertex"], r["component"])
        for r in connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    local = {
        (r["vertex"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert reliable == local
    assert reliable == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)}
    # checkpoint files actually landed under the requested dir
    found = [fs for _, _, fs in os.walk(ckpt) if fs]
    assert found, "no reliable checkpoint files written"
    # per-round cleanup: Spark never reclaims reliable checkpoints
    # itself, so the loop must — exactly ONE round snapshot may remain
    # (the one backing the returned frame), not one per iteration
    rounds = sorted(os.listdir(os.path.join(ckpt, "cc_rounds")))
    assert len(rounds) == 1, f"leaked round checkpoints: {rounds}"
