"""Streaming HLL registers == the batch sketch over the same rows, with
the backlog forced through multiple micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streamed_registers_equal_batch_sketch(spark, tmp_path):
    from medical_ocr_pipeline_spark.queries.base import REGISTRY
    from medical_ocr_pipeline_spark.streaming.sketch import (
        hll_registers,
        stream_hll_sketch,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feed = f"{tmp_path}/feed"
    # 4 files -> 4 micro-batches at maxFilesPerTrigger=1: the register
    # merge across batches is what's under test
    docs.repartition(4).write.parquet(feed)
    out = f"{tmp_path}/regs"
    stream_hll_sketch(spark, feed, out, f"{tmp_path}/ckpt")

    got = {
        (r.grp, r.idx): r.rho
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.grp, r.idx): r.rho for r in hll_registers(docs).collect()
    }
    assert got == want

    # and the estimate derived from the streamed registers matches the
    # batch registry query's (v_zero, hll_est) per language
    from medical_ocr_pipeline_spark.queries.sketches import _HLL_NUM

    batch = {
        r["lang"]: (r["v_zero"], r["hll_est"])
        for r in REGISTRY["sketch_hll_distinct"].fn(spark, SF_DIR)
        .collect()
    }
    per_grp: dict[str, dict[int, int]] = {}
    for (g, idx), rho in got.items():
        per_grp.setdefault(g, {})[idx] = rho
    for g, reg in per_grp.items():
        s = sum(1 << (43 - r) for r in reg.values())
        s += (64 - len(reg)) * (1 << 43)
        assert batch[g] == (64 - len(reg), _HLL_NUM // s)


def test_streamed_registers_resume_is_idempotent(spark, tmp_path):
    from medical_ocr_pipeline_spark.streaming.sketch import (
        stream_hll_sketch,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feed = f"{tmp_path}/feed"
    docs.repartition(2).write.parquet(feed)
    out = f"{tmp_path}/regs"
    ckpt = f"{tmp_path}/ckpt"
    stream_hll_sketch(spark, feed, out, ckpt)
    first = {
        (r.grp, r.idx): r.rho for r in spark.read.parquet(out).collect()
    }
    # rerun with the same checkpoint: no new files -> registers unchanged
    stream_hll_sketch(spark, feed, out, ckpt)
    second = {
        (r.grp, r.idx): r.rho for r in spark.read.parquet(out).collect()
    }
    assert first == second


def test_streamed_cms_cells_equal_batch_and_registry(spark, tmp_path):
    """Streaming CMS cells == batch cells over the same rows across
    multiple micro-batches, and point queries from the streamed cells
    reproduce the registry query's estimates."""
    import hashlib

    from medical_ocr_pipeline_spark.queries.base import REGISTRY
    from medical_ocr_pipeline_spark.queries.sketches import _CMS_D
    from medical_ocr_pipeline_spark.streaming.sketch import (
        cms_cells,
        stream_cms_sketch,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feed = f"{tmp_path}/feed"
    docs.repartition(4).write.parquet(feed)
    out = f"{tmp_path}/cells"
    stream_cms_sketch(spark, feed, out, f"{tmp_path}/ckpt")

    got = {
        (r.r, r.c): r.cell for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.r, r.c): r.cell for r in cms_cells(docs).collect()
    }
    assert got == want

    # point queries against the streamed cells reproduce the registry
    # query's cms_est for every reported heavy hitter
    heavy = REGISTRY["sketch_cms_heavy"].fn(spark, SF_DIR).collect()
    assert heavy
    for row in heavy:
        ests = []
        for r in range(_CMS_D):
            c = (
                int(
                    hashlib.md5(f"{r}:{row.word}".encode()).hexdigest()[:12],
                    16,
                )
                & 63
            )
            ests.append(got.get((r, c), 0))
        assert min(ests) == row.cms_est
        assert min(ests) >= row.n_exact  # CMS never undercounts
