"""Distributed unigram-LM (SentencePiece-style) tokenizer training +
Arrow-batched Viterbi encoding (Kudo 2018, arXiv:1804.10959) — the
second tokenizer family next to operators/bpe.py.

Training at corpus scale follows the BPE precedent: the corpus
collapses ONCE into the distinct-word frequency table (vocabulary is
orders of magnitude smaller than the token stream), then EM runs with
the piece table as bounded DRIVER state:

  - seed: every substring up to MAX_PIECE_LEN of every distinct word,
    frequency-weighted — ONE combinable groupBy over a bounded
    (len * MAX_PIECE_LEN)-way explode, distributed top-k to the seed
    size (single characters always kept: the coverage guarantee);
  - E-step: forward-backward over each word's segmentation lattice
    (mapInPandas over the word table, piece probabilities shipped in
    the closure — the vocab is seed-size entries, never corpus-sized);
    each word's expected piece counts are floor-scaled to INTEGER
    micro-units BEFORE the distributed SUM, so training is bit-exact
    under any partitioning (float partial sums commute only
    approximately; int64 sums commute exactly);
  - M-step + pruning on the driver from the collected per-piece totals
    (vocab-bounded rows, the bpe_train collect shape): probabilities
    re-normalized, then the vocabulary shrunk to `vocab_size` by
    expected-count rank (ties lexicographic) with single characters
    exempt.

Driver round-trips = EM_ITERS (a constant), not corpus- or
vocab-proportional.  Encoding is per-word Viterbi over INTEGER
micro-nat piece costs (min-plus DP, deterministic tie-break), Arrow
batches, dict-in-closure — the bpe_encode shape.

Reference analogue: the reference normalizes/tokenizes extracted text
per page (notebooks/05_text_cleanup.py); this is the corpus-scale
tokenizer a training pipeline derives from the same text.
"""

from __future__ import annotations

import math
import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from medical_ocr_pipeline_spark.queries.base import WORD_SPLIT, words_expr

MAX_PIECE_LEN = 6
# E-step words are processed in segments of this many characters: the
# forward pass multiplies piece probabilities, and 64 factors of ~1e-4
# sit at 1e-256 — far from the 1e-308 double underflow, while a
# pathological 5000-char "word" would underflow to Z=0.
MAX_WORD_SEG = 64
# Cost of an out-of-vocabulary single character at encode time (a char
# never seen in training).  Large enough that any in-vocab path wins,
# small enough that sums over a word stay far from int64 overflow.
UNK_COST = 10**9
_SCALE = 10**6  # micro-units for expected counts and micro-nats for costs


def word_table(docs) -> DataFrame:
    """(word, cnt) distinct-word frequency table."""
    return (
        docs.select(F.explode(words_expr()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def seed_counts(wc: DataFrame, max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(piece, total) frequency of every substring up to max_len over
    the word table, occurrence-weighted by word count — one bounded
    explode + one combinable groupBy."""
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(
                     sequence(1, least({max_len}, length(word) - i + 1)),
                     l -> substr(word, i, l))))"""
    )
    return (
        wc.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("total"))
    )


def _estep_word(word: str, probs: dict[str, float],
                max_len: int = MAX_PIECE_LEN) -> dict[str, float]:
    """Expected piece counts for one word under the current unigram LM:
    forward-backward over the segmentation lattice.  Pure function —
    the Spark E-step and the sequential reference both call it, so the
    distributed trainer can only differ from the classic one in the
    reduction (which the integer micro-unit scaling makes exact)."""
    out: dict[str, float] = {}
    for s in range(0, len(word), MAX_WORD_SEG):
        seg = word[s:s + MAX_WORD_SEG]
        n = len(seg)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            a = 0.0
            for j in range(max(0, i - max_len), i):
                p = probs.get(seg[j:i])
                if p:
                    a += alpha[j] * p
            alpha[i] = a
        if alpha[n] == 0.0:
            continue  # unreachable under seed coverage; defensive
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for j in range(n - 1, -1, -1):
            b = 0.0
            for i in range(j + 1, min(n, j + max_len) + 1):
                p = probs.get(seg[j:i])
                if p:
                    b += p * beta[i]
            beta[j] = b
        z = alpha[n]
        for j in range(n):
            for i in range(j + 1, min(n, j + max_len) + 1):
                piece = seg[j:i]
                p = probs.get(piece)
                if p:
                    out[piece] = out.get(piece, 0.0) + alpha[j] * p * beta[i] / z
    return out


def _expected_counts(wc: DataFrame, probs: dict[str, float]) -> DataFrame:
    """One distributed E-step: (piece, total) integer micro-unit
    expected counts.  Each word's contribution floors to int64 BEFORE
    the sum, so the result is identical under any partitioning."""
    schema = "piece string, micro long"

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                for piece, e in _estep_word(word, probs).items():
                    acc[piece] = acc.get(piece, 0) + int(e * cnt * _SCALE)
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "micro": list(acc.values())}
            )

    frame = wc.mapInPandas(gen, schema)
    return frame.groupBy("piece").agg(F.sum("micro").alias("total"))


def _normalize(totals: list[tuple[str, int]]) -> dict[str, float]:
    """M-step: micro-unit totals -> probabilities.  max(total, 1) keeps
    kept-by-policy pieces (single chars) at a nonzero floor."""
    grand = sum(max(t, 1) for _, t in totals)
    return {p: max(t, 1) / grand for p, t in totals}


def unigram_train(docs, vocab_size: int = 256, seed_size: int = 1024,
                  em_iters: int = 4,
                  max_len: int = MAX_PIECE_LEN) -> list[tuple[str, int]]:
    """Train the unigram LM vocabulary.  Returns [(piece, cost)] sorted
    by (cost asc, piece asc), cost = round(-ln(p) * 1e6) micro-nats —
    integer, so Viterbi encoding is exact min-plus in every engine.

    Schedule: seed -> EM x (em_iters // 2) -> prune to vocab_size ->
    EM x (em_iters - em_iters // 2), the SentencePiece shrink-then-
    refit shape with one pruning round.  Single characters are never
    pruned (full coverage of the training corpus's alphabet)."""
    wc = word_table(docs).persist()
    wc.count()
    try:
        seeds = (
            seed_counts(wc, max_len)
            .orderBy(F.desc("total"), F.asc("piece"))
            .limit(seed_size)
            .collect()
        )
        chars = {
            r["piece"]: r["total"]
            for r in seed_counts(wc, 1).collect()
        }
        totals = {r["piece"]: int(r["total"]) * _SCALE for r in seeds}
        for c, t in chars.items():
            totals.setdefault(c, int(t) * _SCALE)
        if not totals:
            return []
        probs = _normalize(list(totals.items()))

        first = max(em_iters // 2, 1) if em_iters else 0
        for it in range(em_iters):
            got = {
                r["piece"]: int(r["total"])
                for r in _expected_counts(wc, probs).collect()
            }
            totals = {p: got.get(p, 0) for p in probs}
            if it == first - 1 and len(totals) > vocab_size:
                ranked = sorted(
                    totals.items(), key=lambda kv: (-kv[1], kv[0]))
                keep = {p for p, _ in ranked[:vocab_size]}
                keep |= {p for p in totals if len(p) == 1}
                totals = {p: t for p, t in totals.items() if p in keep}
            probs = _normalize(list(totals.items()))
    finally:
        wc.unpersist()
    vocab = [
        (p, int(round(-math.log(pr) * _SCALE))) for p, pr in probs.items()
    ]
    vocab.sort(key=lambda kv: (kv[1], kv[0]))
    return vocab


def encode_word_unigram(word: str, costs: dict[str, int],
                        max_len: int = MAX_PIECE_LEN) -> list[str]:
    """Viterbi segmentation of one word: minimize (total cost, piece
    count), tie-break preferring the LONGEST final piece at each DP
    cell — fully deterministic.  Characters absent from the vocabulary
    fall back to single-char UNK pieces at UNK_COST."""
    n = len(word)
    INF = (1 << 62, 1 << 30)
    dp: list[tuple[int, int]] = [INF] * (n + 1)
    back: list[int] = [-1] * (n + 1)
    dp[0] = (0, 0)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if dp[j] is INF:
                continue
            piece = word[j:i]
            c = costs.get(piece)
            if c is None:
                if i - j != 1:
                    continue
                c = UNK_COST
            cand = (dp[j][0] + c, dp[j][1] + 1)
            # strict < keeps the SMALLEST j (longest piece) on ties
            if cand < dp[i]:
                dp[i] = cand
                back[i] = j
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def unigram_encode(docs, vocab: list[tuple[str, int]]) -> DataFrame:
    """(doc_id, n_words, n_tokens) per document under the trained
    vocabulary — Arrow-batched pandas UDF, cost table shipped once per
    executor via the closure (vocab_size entries, never corpus-sized)."""
    from pyspark.sql.functions import pandas_udf

    costs = dict(vocab)
    splitter = re.compile(WORD_SPLIT)

    @pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        def count(t):
            if t is None:
                return 0
            total = 0
            for w in splitter.split(t.lower()):
                if w:
                    total += len(encode_word_unigram(w, costs))
            return total

        return text.map(count)

    words = words_expr()
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        n_tokens("text").alias("n_tokens"),
    )


def unigram_train_reference(word_counts: list[tuple[str, int]],
                            vocab_size: int = 256, seed_size: int = 1024,
                            em_iters: int = 4,
                            max_len: int = MAX_PIECE_LEN
                            ) -> list[tuple[str, int]]:
    """Sequential single-process reference of unigram_train over an
    in-memory (word, cnt) list — same seeding, same E-step kernel, same
    integer micro-unit flooring, same M-step and pruning.  The
    distributed trainer must match it exactly (tests)."""
    seeds: dict[str, int] = {}
    chars: dict[str, int] = {}
    for w, c in word_counts:
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                piece = w[i:i + l]
                seeds[piece] = seeds.get(piece, 0) + c
            chars[w[i]] = chars.get(w[i], 0) + c
    ranked = sorted(seeds.items(), key=lambda kv: (-kv[1], kv[0]))
    totals = {p: t * _SCALE for p, t in ranked[:seed_size]}
    for ch, t in chars.items():
        totals.setdefault(ch, t * _SCALE)
    if not totals:
        return []
    probs = _normalize(list(totals.items()))

    first = max(em_iters // 2, 1) if em_iters else 0
    for it in range(em_iters):
        got: dict[str, int] = {}
        for w, c in word_counts:
            for piece, e in _estep_word(w, probs, max_len).items():
                got[piece] = got.get(piece, 0) + int(e * c * _SCALE)
        totals = {p: got.get(p, 0) for p in probs}
        if it == first - 1 and len(totals) > vocab_size:
            rank2 = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))
            keep = {p for p, _ in rank2[:vocab_size]}
            keep |= {p for p in totals if len(p) == 1}
            totals = {p: t for p, t in totals.items() if p in keep}
        probs = _normalize(list(totals.items()))
    vocab = [
        (p, int(round(-math.log(pr) * _SCALE))) for p, pr in probs.items()
    ]
    vocab.sort(key=lambda kv: (kv[1], kv[0]))
    return vocab
