"""Shared iterative-loop infrastructure (operators/iterloop.py):

1. every iterative graph operator accepts `checkpoint_dir` and produces
   IDENTICAL results under reliable checkpointing, with round rotation
   leaving at most keep_last snapshots on disk (VERDICT r04 item #1 —
   the kill-resume-style lineage-truncation guarantee: a reliable
   checkpoint reads from cluster storage, so the frame survives
   executor loss, which localCheckpoint blocks do not);
2. the refcounted AQE guard composes under nesting and concurrency and
   always restores the session's real prior value (VERDICT r04 item
   #3);
3. WordPiece speculative batching returns bit-identical merge lists to
   the classic one-merge-per-pass trainer with strictly fewer driver
   passes (VERDICT r04 item #4).
"""

import os
import threading

import pytest


def _round_dirs(ckpt_root: str, name: str) -> list[str]:
    base = os.path.join(ckpt_root, name)
    if not os.path.isdir(base):
        return []
    return sorted(os.listdir(base))


def _files_under(path: str) -> bool:
    return any(fs for _, _, fs in os.walk(path))


# ---------------------------------------------------------------- graphs


def _edges(spark):
    # two components: a 5-chain (tests multi-round convergence) and a
    # triangle with a dangling tail; plus a self-loop
    rows = [(1, 2), (2, 3), (3, 4), (4, 5),
            (10, 11), (11, 12), (12, 10), (12, 13), (7, 7)]
    return spark.createDataFrame(rows, "src long, dst long")


@pytest.mark.parametrize("opname", [
    "pagerank", "hits", "bfs", "msbfs", "kcore", "lpa", "textrank",
])
def test_checkpoint_dir_matches_local_and_rotates(spark, tmp_path, opname):
    """Each iterative operator: reliable-checkpoint run == local run,
    checkpoint files actually land under the dir, and rotation leaves
    at most keep_last round snapshots (not one per iteration)."""
    from pyspark.sql import functions as F

    e = _edges(spark)
    ckpt = str(tmp_path / "ckpt")

    def run(checkpoint_dir):
        if opname == "pagerank":
            from medical_ocr_pipeline_spark.operators.pagerank import pagerank
            df = pagerank(e, n_iters=6, checkpoint_dir=checkpoint_dir)
            return {(r["vertex"], round(r["rank"], 8)) for r in df.collect()}
        if opname == "hits":
            from medical_ocr_pipeline_spark.operators.hits import hits
            df = hits(e, n_iters=4, checkpoint_dir=checkpoint_dir)
            return {
                (r["vertex"], round(r["auth"], 8), round(r["hub"], 8))
                for r in df.collect()
            }
        if opname == "bfs":
            from medical_ocr_pipeline_spark.operators.bfs import bfs_hops
            seed = spark.createDataFrame([(1,)], "vertex long")
            df = bfs_hops(e, seed, max_hops=8,
                          checkpoint_dir=checkpoint_dir)
            return {(r["vertex"], r["hops"]) for r in df.collect()}
        if opname == "msbfs":
            from medical_ocr_pipeline_spark.operators.bfs import (
                multi_source_bfs_hops,
            )
            seeds = spark.createDataFrame([(1,), (10,)], "vertex long")
            df = multi_source_bfs_hops(e, seeds, max_hops=8,
                                       checkpoint_dir=checkpoint_dir)
            return {(r["seed"], r["vertex"], r["hops"]) for r in df.collect()}
        if opname == "kcore":
            from medical_ocr_pipeline_spark.operators.kcore import kcore
            df = kcore(e, k=2, checkpoint_dir=checkpoint_dir)
            return {(r["vertex"], r["core_deg"]) for r in df.collect()}
        if opname == "lpa":
            from medical_ocr_pipeline_spark.operators.lpa import (
                label_propagation,
            )
            df = label_propagation(e, n_iters=4,
                                   checkpoint_dir=checkpoint_dir)
            return {(r["vertex"], r["label"]) for r in df.collect()}
        if opname == "textrank":
            from medical_ocr_pipeline_spark.operators.textrank import textrank
            sym = (
                e.where(F.col("src") != F.col("dst"))
                .select("src", "dst")
                .unionAll(
                    e.where(F.col("src") != F.col("dst")).select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    )
                )
                .groupBy("src", "dst")
                .agg(F.count("*").cast("double").alias("w"))
            )
            df = textrank(sym, n_iters=6, checkpoint_dir=checkpoint_dir)
            return {(r["vertex"], round(r["rank"], 8)) for r in df.collect()}
        raise AssertionError(opname)

    reliable = run(ckpt)
    local = run(None)
    assert reliable == local and reliable
    # files landed under the requested dir (reliable, not executor-local)
    assert _files_under(ckpt), "no reliable checkpoint files written"
    # rotation: at most keep_last (2) round snapshots remain, not one
    # per iteration — Spark never reclaims reliable checkpoints itself
    name = {
        "pagerank": "pagerank_rounds", "hits": "hits_rounds",
        "bfs": "bfs_rounds", "msbfs": "msbfs_rounds",
        "kcore": "kcore_rounds", "lpa": "lpa_rounds",
        "textrank": "textrank_rounds",
    }[opname]
    rounds = _round_dirs(ckpt, name)
    assert rounds, f"no round dirs under {name}"
    limit = 2 if opname == "hits" else 1
    assert len(rounds) <= limit, f"leaked round checkpoints: {rounds}"


def test_trainer_checkpoint_dir_identical(spark, tmp_path):
    """wp_train / bpe_train with checkpoint_dir: identical merge lists,
    files land, all rounds reclaimed (result is driver-side)."""
    from medical_ocr_pipeline_spark.operators.bpe import bpe_train
    from medical_ocr_pipeline_spark.operators.wordpiece import wp_train

    docs = spark.createDataFrame(
        [("low low low lower lowest newer newest wide wider widest",)],
        "text string",
    )
    ck1 = str(tmp_path / "wp")
    assert wp_train(docs, n_merges=6, checkpoint_dir=ck1) == \
        wp_train(docs, n_merges=6)
    assert os.path.isdir(ck1)
    assert _round_dirs(ck1, "wp_rounds") == [], "trainer rounds leaked"
    ck2 = str(tmp_path / "bpe")
    assert bpe_train(docs, n_merges=6, checkpoint_dir=ck2) == \
        bpe_train(docs, n_merges=6)
    assert _round_dirs(ck2, "bpe_rounds") == [], "trainer rounds leaked"


def test_checkpoint_dir_restored_on_failure(spark, tmp_path):
    """The SparkContext's global checkpoint dir is restored even when
    the loop dies mid-iteration (the components.py guarantee, now owned
    by RoundCheckpointer.__exit__)."""
    from medical_ocr_pipeline_spark.operators.iterloop import (
        RoundCheckpointer,
    )

    sc = spark.sparkContext
    prior_base = str(tmp_path / "prior")
    sc.setCheckpointDir(prior_base)
    prior = sc.getCheckpointDir()
    df = spark.range(10)
    with pytest.raises(RuntimeError, match="boom"):
        with RoundCheckpointer(spark, str(tmp_path / "loop")) as ckpt:
            ckpt.truncate(df)
            raise RuntimeError("boom")
    assert sc.getCheckpointDir() is not None
    assert "loop" not in sc.getCheckpointDir()
    assert sc.getCheckpointDir().startswith(prior)
    assert prior  # sanity: prior dir existed


# ---------------------------------------------------------------- AQE


def test_aqe_guard_nested_and_concurrent(spark):
    """First enter records the real prior value; the last exit restores
    it — under nesting AND under racing threads (the failure mode of
    the old per-operator try/finally: the second enter saved 'false'
    and the restore left AQE permanently off)."""
    from medical_ocr_pipeline_spark.operators.iterloop import aqe_disabled

    conf = "spark.sql.adaptive.enabled"
    spark.conf.set(conf, "true")
    # nesting
    with aqe_disabled(spark):
        assert spark.conf.get(conf) == "false"
        with aqe_disabled(spark):
            assert spark.conf.get(conf) == "false"
        # inner exit must NOT restore while the outer section is live
        assert spark.conf.get(conf) == "false"
    assert spark.conf.get(conf) == "true"
    # disable=False is a no-op passthrough
    with aqe_disabled(spark, disable=False):
        assert spark.conf.get(conf) == "true"

    # concurrency: many threads enter/exit staggered; at the end the
    # ORIGINAL value must be back (old code could restore "false")
    stop = threading.Barrier(9)
    errs = []

    def worker():
        try:
            stop.wait()
            for _ in range(25):
                with aqe_disabled(spark):
                    assert spark.conf.get(conf) == "false"
        except Exception as exc:  # pragma: no cover - diagnostic
            errs.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(9)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert spark.conf.get(conf) == "true"


def test_aqe_guard_concurrent_queries_smoke(spark):
    """Two registry-style iterative operators racing on one session —
    both finish, results correct, session conf restored."""
    from pyspark.sql import functions as F

    from medical_ocr_pipeline_spark.operators.kcore import kcore
    from medical_ocr_pipeline_spark.operators.pagerank import pagerank

    conf = "spark.sql.adaptive.enabled"
    prior = spark.conf.get(conf)
    e = _edges(spark)
    results: dict = {}
    errs: list = []

    def run_pr():
        try:
            results["pr"] = pagerank(e, n_iters=4).agg(
                F.round(F.sum("rank"), 6).alias("s")
            ).collect()[0]["s"]
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    def run_kc():
        try:
            results["kc"] = {
                (r["vertex"], r["core_deg"])
                for r in kcore(e, k=2).collect()
            }
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    t1, t2 = threading.Thread(target=run_pr), threading.Thread(target=run_kc)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert results["pr"] == pytest.approx(1.0)
    assert results["kc"] == {(10, 2), (11, 2), (12, 2)}
    assert spark.conf.get(conf) == prior


# ------------------------------------------------- WordPiece speculation


def test_wordpiece_speculative_batch_equivalence(spark):
    """Speculative batching == classic one-per-pass trainer, merge for
    merge, on corpora engineered to exercise both verify-success and
    rollback — with an asserted pass-count reduction."""
    from medical_ocr_pipeline_spark.operators.wordpiece import wp_train

    corpora = [
        ["low low low lower lowest newer newest wide wider widest"],
        ["hug hug hug hugs pug pug pun pun pun bun hugs hugs un un"],
        ["abcabc abcabd abdabd xyz xyz xyzw aa bb aa cc abab"],
    ]
    for texts in corpora:
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        seq_stats: dict = {}
        bat_stats: dict = {}
        seq = wp_train(docs, n_merges=10, batch_size=1, _stats=seq_stats)
        bat = wp_train(docs, n_merges=10, batch_size=8, _stats=bat_stats)
        assert bat == seq, f"speculation diverged on {texts[0][:30]}"
        assert bat_stats["passes"] < seq_stats["passes"], (
            seq_stats, bat_stats,
        )


def test_wordpiece_speculation_rollback_correct(spark):
    """A corpus where the naive top-2 prefix is NOT sequential-valid:
    the verify step must roll back rather than emit the stale ranking.
    (Construction: after the top merge applies, the shrunken component
    counts reshuffle the ranking — the WordPiece score's signature
    interaction.)  Equivalence to batch_size=1 is the whole assertion:
    if rollback were broken, the lists would differ."""
    from medical_ocr_pipeline_spark.operators.wordpiece import wp_train

    # 'ab' dominates; merging it guts count(##b), boosting pairs that
    # share ##b-adjacent symbols differently than the initial ranking
    docs = spark.createDataFrame(
        [("ab ab ab ab abc abc bc bc bc cd cd ce ce",)], "text string"
    )
    seq = wp_train(docs, n_merges=8, batch_size=1)
    bat = wp_train(docs, n_merges=8, batch_size=4)
    assert bat == seq
