"""Corpus-trained bigram LM scoring + (later in this file) data-mixing
and BPE ops: handcrafted semantics tests — the oracle gate pins engine
parity on the shared testdata; these pin the MATH on frames small enough
to verify by hand.
"""

from __future__ import annotations

from pyspark.sql import Row


def _write_docs(spark, tmp_path, texts):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_lm_score_perfectly_predictable_text(spark, tmp_path):
    """'x y x y x y' alone in the corpus: every bigram occurrence has
    conditional probability 1 -> score exactly 1_000_000 ppm."""
    from medical_ocr_pipeline_spark.queries.textstats import ngram_lm_score

    sf = _write_docs(spark, tmp_path, ["x y x y x y"])
    [r] = ngram_lm_score(spark, sf).collect()
    assert r.n_bigrams == 5
    assert r.lm_score_ppm == 1_000_000


def test_lm_score_split_context_and_degenerate_docs(spark, tmp_path):
    """Context 'p' continues to 'q' and 'r' once each -> both docs score
    500_000; a one-word doc has zero bigrams and scores 0."""
    from medical_ocr_pipeline_spark.queries.textstats import ngram_lm_score

    sf = _write_docs(spark, tmp_path, ["p q", "p r", "solo"])
    got = {r.doc_id: r for r in ngram_lm_score(spark, sf).collect()}
    assert got[0].lm_score_ppm == 500_000
    assert got[1].lm_score_ppm == 500_000
    assert got[2].n_bigrams == 0 and got[2].lm_score_ppm == 0
