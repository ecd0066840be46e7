"""Unigram-LM (SentencePiece-style) tokenizer: distributed trainer ==
sequential reference, partitioning invariance, Viterbi optimality, and
the lattice math on hand-checkable corpora.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.unigram import (
    MAX_PIECE_LEN,
    UNK_COST,
    _estep_word,
    encode_word_unigram,
    unigram_encode,
    unigram_train,
    unigram_train_reference,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a banana and a bandana",
    "banana bandana cabana",
    "internationalization and internationalism",
    "the the the cat cat banana",
]


def _word_counts(texts):
    import re

    counts: dict[str, int] = {}
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items())


def test_distributed_trainer_equals_sequential_reference(spark):
    """The whole point of the integer micro-unit E-step reduction: the
    Spark trainer is BIT-equal to the single-process reference — same
    pieces, same integer costs, same order."""
    got = unigram_train(_docs(spark, CORPUS), vocab_size=48,
                        seed_size=128, em_iters=4)
    ref = unigram_train_reference(_word_counts(CORPUS), vocab_size=48,
                                  seed_size=128, em_iters=4)
    assert got == ref
    assert len(got) >= 48  # vocab_size plus never-pruned single chars


def test_trainer_invariant_to_partitioning(spark):
    docs = _docs(spark, CORPUS)
    a = unigram_train(docs.repartition(1), vocab_size=32, seed_size=96,
                      em_iters=3)
    b = unigram_train(docs.repartition(7), vocab_size=32, seed_size=96,
                      em_iters=3)
    assert a == b


def test_frequent_multichar_piece_survives_and_wins(spark):
    """'banana'-family corpus: 'an' / 'ana' / 'banana' mass concentrates
    on multi-char pieces; the trained vocab must contain a multi-char
    piece covering 'ana', and Viterbi must encode 'banana' in fewer
    tokens than characters."""
    texts = ["banana bandana cabana banana", "banana banana bandana"]
    vocab = unigram_train(_docs(spark, texts), vocab_size=12,
                          seed_size=64, em_iters=4)
    pieces = {p for p, _ in vocab}
    assert any(len(p) > 1 and p in "banana" for p in pieces)
    costs = dict(vocab)
    enc = encode_word_unigram("banana", costs)
    assert "".join(enc) == "banana"
    assert len(enc) < 6


def test_estep_two_path_lattice_math():
    """Word 'ab' with vocab {a, b, ab} all at p=1/4: path a-b has mass
    1/16, path ab has 1/4 -> Z=5/16; expected counts a=b=1/5, ab=4/5."""
    probs = {"a": 0.25, "b": 0.25, "ab": 0.25}
    e = _estep_word("ab", probs)
    assert abs(e["a"] - 0.2) < 1e-12
    assert abs(e["b"] - 0.2) < 1e-12
    assert abs(e["ab"] - 0.8) < 1e-12


def test_viterbi_matches_bruteforce_on_short_words():
    """Enumerate every segmentation of words up to length 7 and check
    the DP returns a minimum-(cost, n_pieces) segmentation."""
    costs = {"a": 300, "b": 500, "ab": 450, "ba": 700, "aba": 800,
             "bab": 650, "abab": 1100}

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            pieces = [word[pos[i]:pos[i + 1]] for i in range(len(pos) - 1)]
            if any(p not in costs and len(p) > 1 for p in pieces):
                continue
            cost = sum(costs.get(p, UNK_COST) for p in pieces)
            key = (cost, len(pieces))
            if best is None or key < best:
                best = key
        return best

    for word in ["ab", "aba", "abab", "ababa", "bababab", "aabb"]:
        enc = encode_word_unigram(word, costs)
        assert "".join(enc) == word
        total = sum(costs.get(p, UNK_COST) for p in enc)
        assert (total, len(enc)) == brute(word)


def test_unknown_chars_fall_back_to_unk_singletons():
    costs = {"a": 100, "ab": 150}
    enc = encode_word_unigram("axb", costs)
    assert enc == ["a", "x", "b"]


def test_encode_stats_bounds(spark):
    """Per-word token count is bounded by [ceil(len / MAX_PIECE_LEN),
    len]; the doc-level frame must respect the summed bounds and cover
    null text."""
    texts = ["the cat sat", "internationalization", None]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    vocab = unigram_train(
        docs.where("text is not null"), vocab_size=24, seed_size=64,
        em_iters=2)
    got = {r.doc_id: r for r in unigram_encode(docs, vocab).collect()}
    assert got[2].n_tokens == 0
    for i, t in enumerate(texts[:2]):
        words = [w for w in t.lower().split() if w]
        lo = sum(-(-len(w) // MAX_PIECE_LEN) for w in words)
        hi = sum(len(w) for w in words)
        assert lo <= got[i].n_tokens <= hi
        assert got[i].n_words == len(words)


def test_registry_queries_run(spark, tmp_path):
    from medical_ocr_pipeline_spark.queries.training import (
        unigram_encode_stats,
        unigram_train_pieces,
    )

    rows = [
        Row(doc_id=i, text=t, lang="en", source=f"s{i % 2}",
            n_chars=len(t))
        for i, t in enumerate(CORPUS)
    ]
    spark.createDataFrame(rows).write.parquet(
        f"{tmp_path}/documents.parquet")
    pieces = unigram_train_pieces(spark, str(tmp_path)).collect()
    assert len(pieces) > 0
    assert [r.rank for r in pieces] == list(range(len(pieces)))
    stats = unigram_encode_stats(spark, str(tmp_path)).collect()
    assert {r.source for r in stats} == {"s0", "s1"}
    assert all(r.n_tokens >= r.n_words for r in stats)
