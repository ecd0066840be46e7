"""BPE trainer + encoder: the classic Sennrich walkthrough, determinism
across partitionings, and encode/train consistency."""

from __future__ import annotations

from pyspark.sql import Row


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_bpe_train_classic_example(spark):
    """Corpus 'aaab aaab ab': pairs a-a (4), a-b (3) -> first merge
    (a, a); then (aa, ab) adjacency in 'aaab' gives aa-a=2... the fold
    recount drives every following merge; assert the first merge and
    that every merged symbol is a concatenation of its pair."""
    from medical_ocr_pipeline_spark.operators.bpe import bpe_train

    merges = bpe_train(_docs(spark, ["aaab aaab ab"]), n_merges=5)
    assert merges[0] == ("a", "a")
    for a, b in merges:
        assert isinstance(a, str) and isinstance(b, str) and a and b


def test_bpe_train_deterministic_across_partitionings(spark):
    from medical_ocr_pipeline_spark.operators.bpe import bpe_train

    texts = ["the cat sat on the mat", "the bat and the cat", "mat cat"]
    m1 = bpe_train(_docs(spark, texts), n_merges=6)
    m2 = bpe_train(_docs(spark, texts).repartition(13), n_merges=6)
    assert m1 == m2 and len(m1) == 6


def test_bpe_train_stops_when_exhausted(spark):
    """Single 1-char word: no pairs -> empty merge list, no crash."""
    from medical_ocr_pipeline_spark.operators.bpe import bpe_train

    assert bpe_train(_docs(spark, ["a a a"]), n_merges=4) == []


def test_encode_word_greedy_rank_order():
    from medical_ocr_pipeline_spark.operators.bpe import encode_word

    # rank 0 merges first wherever it applies, THEN rank 1
    ranks = {("a", "a"): 0, ("aa", "b"): 1}
    # aaab -> (aa)(ab): rank 0 at pos 0; remaining a,b has no rank ->
    # then (aa,b)? syms = [aa, a, b]: pair (aa,a) unranked, (a,b)
    # unranked -> stop
    assert encode_word("aaab", ranks) == ["aa", "a", "b"]
    # aab -> [aa, b] -> rank 1 -> [aab]
    assert encode_word("aab", ranks) == ["aab"]


def test_bpe_encode_frame_counts(spark):
    """Frame encode agrees with the python encoder word by word, and
    more merges never increase the token count."""
    from medical_ocr_pipeline_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        encode_word,
    )

    texts = ["banana bandana", "ban ban banana", "a banana band"]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        want = sum(len(encode_word(w, ranks)) for w in t.split())
        assert got[i].n_tokens == want
    got0 = {r.doc_id: r.n_tokens
            for r in bpe_encode(docs, []).collect()}
    for i in got:
        assert got[i].n_tokens <= got0[i]
