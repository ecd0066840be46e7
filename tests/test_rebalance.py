"""Stratified rebalance: the deterministic hash-threshold sampler is
run-stable, exactly reproducible in pure Python, and lands near the
per-language target rates."""

import hashlib

import duckdb

SF_DIR = "/root/testdata/sf0.01"


def _h(doc_id: int) -> int:
    md5 = hashlib.md5(f"rebal:{doc_id}".encode()).hexdigest()
    return int(md5[:12], 16) % 1_000_000


def test_rebalance_deterministic_and_on_target(spark):
    from medical_ocr_pipeline_spark.queries.textstats import (
        REBALANCE_CAP,
        corpus_rebalance,
    )

    a = {r.lang: r.n_docs for r in corpus_rebalance(spark, SF_DIR).collect()}
    b = {r.lang: r.n_docs for r in corpus_rebalance(spark, SF_DIR).collect()}
    assert a == b  # hash threshold -> identical sample, always
    full = {
        lang: n
        for lang, n in duckdb.sql(
            f"SELECT lang, COUNT(*) FROM '{SF_DIR}/documents.parquet' "
            "GROUP BY lang"
        ).fetchall()
    }
    for lang, n in full.items():
        got = a.get(lang, 0)
        if n <= REBALANCE_CAP:
            assert got == n  # under-represented strata kept whole
        else:
            # hash-Bernoulli: expect cap +- 4*sqrt(cap) (generous CLT)
            assert abs(got - REBALANCE_CAP) <= 4 * REBALANCE_CAP ** 0.5, (
                lang, n, got,
            )


def test_rebalance_keep_set_matches_python_hash_reference(spark):
    """The exact keep decision — not just the counts — is replayable
    from the md5 threshold in pure Python."""
    from medical_ocr_pipeline_spark.queries.textstats import (
        REBALANCE_CAP,
        corpus_rebalance,
    )

    rows = duckdb.sql(
        f"SELECT lang, doc_id FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    full: dict[str, list] = {}
    for lang, doc_id in rows:
        full.setdefault(lang, []).append(doc_id)
    want = {}
    for lang, ids in full.items():
        rate = min(1_000_000, REBALANCE_CAP * 1_000_000 // len(ids))
        kept = sum(1 for d in ids if _h(d) < rate)
        want[lang] = (len(ids), rate, kept)
    got = {
        r.lang: (r.n_before, r.rate_ppm, r.n_docs)
        for r in corpus_rebalance(spark, SF_DIR).collect()
    }
    # languages whose sample came out empty emit no row (inner groupBy);
    # drop them from the expectation the same way
    want = {k: v for k, v in want.items() if v[2] > 0}
    assert got == want
