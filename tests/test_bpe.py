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


def test_bpe_batched_equals_sequential(spark):
    """The batched trainer must produce the IDENTICAL rank-ordered merge
    list as classic one-merge-per-iteration BPE (batch_size=1), on
    corpora chosen to exercise the batch-selection edge rules: shared
    symbols (disjointness stop), count ties (strict truncation), and a
    merge whose concat collides with an already-minted symbol
    (hard-stop)."""
    from medical_ocr_pipeline_spark.operators.bpe import bpe_train

    corpora = [
        # Sennrich et al. walkthrough corpus
        ["low low low low low lower lower newest newest newest "
         "newest newest newest widest widest widest"],
        # heavy symbol sharing: most top pairs conflict
        ["aaab aaab ab aabb abab baba"],
        # concat collision: merging (a,a)->'aa' then later (a,aa) etc.
        ["aaaa aaaaaa aa aaa b ab aab"],
        # ties everywhere
        ["xy xy uv uv pq pq mn mn"],
        ["the cat sat on the mat", "the bat and the cat", "mat cat"],
    ]
    for texts in corpora:
        docs = _docs(spark, texts)
        seq = bpe_train(docs, n_merges=12, batch_size=1)
        for bs in (4, 16):
            got = bpe_train(docs, n_merges=12, batch_size=bs)
            assert got == seq, f"batch_size={bs} diverged on {texts!r}"


def test_bpe_batching_reduces_passes(spark):
    """The whole point: a batched pass learns several merges, so the
    count->select->apply round count drops well below n_merges.

    The corpus has Zipfian counts over symbol-disjoint frequent pairs
    (the realistic large-vocabulary shape — with thousands of distinct
    characters/subwords, consecutive argmax winners rarely share a
    symbol).  Tie-heavy single-alphabet toy corpora (e.g. the Sennrich
    walkthrough) legitimately degrade toward one merge per pass: the
    sequential-equivalence rules refuse any batch extension whose order
    a recount could change — correctness over speed, pinned by
    test_bpe_batched_equals_sequential."""
    from medical_ocr_pipeline_spark.operators.bpe import bpe_train

    # 10 disjoint 2-char words, strictly decreasing Zipf-ish counts
    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st"]
    corpus = " ".join(
        " ".join([w] * (100 - 9 * i)) for i, w in enumerate(words))
    docs = _docs(spark, [corpus])
    seq_stats, bat_stats = {}, {}
    seq = bpe_train(docs, n_merges=10, batch_size=1, _stats=seq_stats)
    bat = bpe_train(docs, n_merges=10, batch_size=16, _stats=bat_stats)
    assert bat == seq and len(seq) == 10
    assert seq_stats["passes"] >= 10
    assert bat_stats["passes"] <= 3  # several merges land per pass


def test_bpe_batched_equals_sequential_random_corpora(spark):
    """Seeded random corpora over a small alphabet — the adversarial
    regime for batching (dense symbol sharing, frequent ties, concat
    collisions) — must still give the identical merge list at every
    batch size."""
    import random

    from medical_ocr_pipeline_spark.operators.bpe import bpe_train

    rng = random.Random(42)
    for trial in range(3):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        texts = [" ".join(rng.choices(words, k=30)) for _ in range(4)]
        docs = _docs(spark, texts)
        seq = bpe_train(docs, n_merges=15, batch_size=1)
        for bs in (3, 16):
            got = bpe_train(docs, n_merges=15, batch_size=bs)
            assert got == seq, (
                f"trial={trial} batch_size={bs} diverged: {got} != {seq}")


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
