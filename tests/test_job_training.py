"""job_training's frames must be exactly the oracle-checked cores:
mixture verdicts aggregate to the mixture_sample query, splits match
the salted md5 recomputed in python, per-split offsets are an exact
prefix sum in (h, doc_id) order, and shard ids are pure functions of
the offset."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_mixture_frame_matches_registry_query(spark):
    from medical_ocr_pipeline_spark.queries.training import (
        mixture_aggregate,
        mixture_doc_frame,
        mixture_sample,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = [tuple(r) for r in
           mixture_aggregate(mixture_doc_frame(docs)).collect()]
    want = [tuple(r) for r in mixture_sample(spark, SF_DIR).collect()]
    assert got == want


def _split_of(doc_id: int) -> str:
    from medical_ocr_pipeline_spark.queries.training import (
        TRAIN_PPM,
        VAL_PPM,
    )

    h = int(hashlib.md5(f"split{doc_id}".encode()).hexdigest()[:12], 16)
    ppm = h % 1_000_000
    return "train" if ppm < TRAIN_PPM else ("val" if ppm < VAL_PPM else "test")


def test_assemble_training_set_invariants(spark):
    from medical_ocr_pipeline_spark.job_training import (
        SEQS_PER_SHARD,
        assemble_training_set,
    )
    from medical_ocr_pipeline_spark.queries.training import SEQ_LEN

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mixed, packed = assemble_training_set(docs)
    mixed_rows = mixed.collect()
    packed_rows = packed.collect()

    input_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    kept_ids = {r.doc_id for r in mixed_rows}
    sampled_ids = {r.doc_id for r in mixed_rows if r.sampled}
    assert kept_ids <= input_ids and sampled_ids <= kept_ids
    assert {r.doc_id for r in packed_rows} == sampled_ids

    # split assignment is the salted md5, bit-for-bit
    for r in packed_rows:
        assert r.split == _split_of(r.doc_id)

    # per split: offsets are the exact prefix sum in (h, doc_id) order
    def pack_h(doc_id: int) -> int:
        return int(
            hashlib.md5(f"pack{doc_id}".encode()).hexdigest()[:12], 16)

    shard_tokens = SEQ_LEN * SEQS_PER_SHARD
    for split in ("train", "val", "test"):
        rows = sorted(
            (r for r in packed_rows if r.split == split),
            key=lambda r: (pack_h(r.doc_id), r.doc_id),
        )
        run = 0
        for r in rows:
            assert r.offset == run
            assert r.first_bin == r.offset // SEQ_LEN
            want_last = (
                (r.offset + r.nt - 1) // SEQ_LEN if r.nt > 0
                else r.offset // SEQ_LEN
            )
            assert r.last_bin == want_last
            assert r.shard_id == r.offset // shard_tokens
            want_last_shard = (
                (r.offset + r.nt - 1) // shard_tokens if r.nt > 0
                else r.shard_id
            )
            assert r.last_shard == want_last_shard
            run += r.nt


def test_assemble_training_set_partition_invariance(spark):
    """The packed frame is a pure function of the input CONTENT: a
    differently-partitioned identical input yields identical rows."""
    from medical_ocr_pipeline_spark.job_training import (
        assemble_training_set,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _, p1 = assemble_training_set(docs)
    _, p2 = assemble_training_set(docs.repartition(97))
    cols = ["doc_id", "split", "offset", "shard_id"]
    a = sorted(tuple(r) for r in p1.select(*cols).collect())
    b = sorted(tuple(r) for r in p2.select(*cols).collect())
    assert a == b


def test_leakage_audit_on_packed_frame(spark):
    """The audit runs the same verdict cores as split_leakage_check but
    scoped to the packed docs: every eval row appears exactly once,
    leak counts are bounded by doc counts."""
    from medical_ocr_pipeline_spark.job_training import (
        assemble_training_set,
        leakage_audit,
    )

    # sf0.1: the smaller tables' handful of eval-hash docs all fall to
    # the gate or the mixture coin (sf0.01 packs train=156/val=0/test=0)
    # -> the audit would be vacuous below this scale
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    _, packed = assemble_training_set(docs)
    packed = packed.cache()
    rows = leakage_audit(docs, packed).collect()
    assert rows, "sf0.1 must produce at least one eval split"
    eval_counts = {
        r["split"]: r["n"]
        for r in packed.where("split <> 'train'")
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert {r.split for r in rows} == set(eval_counts)
    for r in rows:
        assert r.n_docs == eval_counts[r.split]
        assert 0 <= r.n_exact_leaks <= r.n_docs
        assert 0 <= r.n_near_leaks <= r.n_docs


def test_bfd_stage_matches_core_on_sampled_splits(spark):
    """--packing best-fit's stage must be exactly the reference-pinned
    best_fit_pack_items core applied per sampled split: same doc set as
    the sampled mixture, and identical assignments to calling the core
    directly on each split's (doc_id, nt) frame."""
    from medical_ocr_pipeline_spark.job_training import (
        bfd_pack_sampled,
        mixture_verdict_frame,
    )
    from medical_ocr_pipeline_spark.queries.training import (
        best_fit_pack_items,
        split_expr,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mixed = mixture_verdict_frame(docs)
    got = sorted(tuple(r) for r in bfd_pack_sampled(mixed).collect())
    sampled = (
        mixed.where("sampled")
        .select("doc_id", "nt")
        .withColumn("split", split_expr())
    )
    want = []
    for split in ("train", "val", "test"):
        part = best_fit_pack_items(
            sampled.where(F.col("split") == split).select("doc_id", "nt")
        ).withColumn("split", F.lit(split))
        want.extend(tuple(r) for r in part.collect())
    assert got == sorted(want)
    # every sampled doc with nt > 0 is packed exactly once
    n_sampled = sampled.where("nt > 0").count()
    assert len(got) == n_sampled
